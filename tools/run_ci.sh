#!/bin/sh
# Full CI sweep: the plain suite, the reversed-order leg (round-1's
# failure class was cross-test state pollution, which only shows up under
# a different execution order), and the no-native leg over the host
# fallback parity files.  Each full-suite pass takes ~30 min on 4 cores.
set -e
cd "$(dirname "$0")/.."

echo "== leg 1/3: plain suite"
python -m pytest tests/ -q

echo "== leg 2/3: reversed order"
WHATSHAP_TPU_TEST_ORDER=reverse python -m pytest tests/ -q

echo "== leg 3/3: pure-python fallbacks (no native engines)"
WHATSHAP_TPU_NO_NATIVE=1 python -m pytest \
    tests/test_variants.py tests/test_run_phase.py tests/test_run_genotype.py \
    tests/test_oracle_parity.py -q

echo "CI sweep green"
