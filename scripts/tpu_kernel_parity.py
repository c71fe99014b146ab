"""Run the TPU-marked kernel parity tests on the REAL chip.

The pytest suite forces the CPU platform (tests/conftest.py), so the
`@pytest.mark.tpu` tests always skip there. This entry sets ZENSLAM_TEST_TPU=1
(which conftest honors by leaving the axon TPU backend as default) and runs
just the tpu-marked tests — asserting that the Mosaic-COMPILED Pallas kernels
agree with interpret mode (bf16 one-hot MXU matmul, SMEM scalar I/O,
border-tile clipping).

Usage: timeout 600 python scripts/tpu_kernel_parity.py
"""

import os
import sys

os.environ["ZENSLAM_TEST_TPU"] = "1"
_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _ROOT)
os.chdir(_ROOT)

import pytest

if __name__ == "__main__":
    # name the tpu-marked files explicitly: collecting all of tests/ imports
    # every module, and some of them stall when the axon platform is default
    sys.exit(pytest.main(["tests/test_orb_pallas.py", "-m", "tpu", "-q",
                          "-rs", "-p", "no:cacheprovider"]))
