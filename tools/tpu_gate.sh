#!/bin/bash
# On-hardware parity gates for Pallas kernels (VERDICT r3: interpret mode is
# not trusted).  Runs only the hardware-marked tests against the real chip.
set -e
cd "$(dirname "$0")/.."
ESVIO_TEST_BACKEND=tpu python -m pytest tests/test_chol_pallas.py \
    tests/test_corners_pallas.py -q "$@"
