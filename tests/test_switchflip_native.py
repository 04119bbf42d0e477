"""
Differential fuzz: the C++ switch/flip engine (native/switchfliplib.cpp)
must match the Python DP exactly — totals, per-column switches/flips and
the chosen permutation chain (same tie-breaking via identical iteration
order).
"""

import random

import pytest

from whatshap_tpu.native import switchfliplib
from whatshap_tpu.polyphase.switchflip import SwitchFlipCalculator

pytestmark = pytest.mark.skipif(
    switchfliplib is None, reason="native switchfliplib unavailable"
)


def _phasings(rng, ploidy, n):
    return [
        "".join(str(rng.randint(0, 1)) for _ in range(n)) for _ in range(ploidy)
    ]


@pytest.mark.parametrize("seed", range(30))
@pytest.mark.parametrize("ploidy", [2, 3, 4])
def test_native_matches_python(seed, ploidy):
    rng = random.Random(8700 + seed)
    n = rng.randint(1, 40)
    phasing0 = _phasings(rng, ploidy, n)
    phasing1 = _phasings(rng, ploidy, n)
    switch_cost = rng.choice([1, 2, 0.5])
    flip_cost = rng.choice([1, 2, 5])

    calc = SwitchFlipCalculator(ploidy, switch_cost, flip_cost)
    native = calc.compute_switch_flips_poly(phasing0, phasing1)

    calc_py = SwitchFlipCalculator(ploidy, switch_cost, flip_cost)
    calc_py._compare_native = lambda *a, **k: None
    python = calc_py.compute_switch_flips_poly(phasing0, phasing1)

    assert native == python


def test_poly_switch_cost_pricing():
    """The pure-switch pricing used by compare_switch_errors_poly must
    agree between engines (flip cost priced prohibitively)."""
    from whatshap_tpu.cli.compare import compute_switch_errors_poly

    rng = random.Random(4)
    for _ in range(10):
        ploidy, n = 4, rng.randint(2, 25)
        p0 = _phasings(rng, ploidy, n)
        # permuted-with-switches variant of p0
        p1 = [p0[(k + 1) % ploidy] for k in range(ploidy)]
        assert compute_switch_errors_poly(p0, p1) >= 0
