# Development gates. `make check` is the REQUIRED pre-commit smoke gate:
# it traces the jitted hot path at non-default rigs (the class of failure
# that broke round 2's HEAD) plus the fast test subset. `make test` is the
# full suite; `make bench` the single-chip benchmark (real TPU).

.PHONY: check test bench tpu-parity

check:
	python scripts/trace_check.py
	python -m pytest tests/test_pipeline.py tests/test_estimation.py \
	  tests/test_system.py tests/test_bal.py -q

test:
	python -m pytest tests/ -q

bench:
	python bench.py

# compiled-vs-interpret Pallas kernel parity on the REAL chip (the suite
# forces CPU, so the @pytest.mark.tpu tests only run through this entry)
tpu-parity:
	python scripts/tpu_kernel_parity.py
