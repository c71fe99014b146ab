# Development gates. `make check` is the REQUIRED pre-commit smoke gate:
# it traces the jitted hot path at non-default rigs (the class of failure
# that broke round 2's HEAD) plus the fast test subset. `make test` is the
# full suite; `make bench` the single-chip benchmark (real TPU).

.PHONY: check test bench

check:
	python scripts/trace_check.py
	python -m pytest tests/test_pipeline.py tests/test_estimation.py \
	  tests/test_system.py tests/test_bal.py -q

test:
	python -m pytest tests/ -q

bench:
	python bench.py
