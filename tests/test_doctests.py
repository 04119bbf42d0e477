"""
Run the package's doctests (the reference runs pytest --doctest-modules
over whatshap/, /root/reference/pyproject.toml:84-85; this is the same
class of test, driven explicitly so it composes with the suite's
JAX_PLATFORMS=cpu conftest and skips nothing silently).
"""

import doctest
import importlib
import pkgutil

import pytest

import whatshap_tpu


def _iter_modules():
    for info in pkgutil.walk_packages(whatshap_tpu.__path__, "whatshap_tpu."):
        yield info.name


MODULES = sorted(_iter_modules())


@pytest.mark.parametrize("name", MODULES)
def test_module_doctests(name):
    mod = importlib.import_module(name)
    result = doctest.testmod(mod, verbose=False)
    assert result.failed == 0, f"{result.failed} doctest failure(s) in {name}"


def test_doctests_exist_somewhere():
    """Guard that the doctest leg actually exercises something."""
    attempted = 0
    for name in MODULES:
        mod = importlib.import_module(name)
        attempted += doctest.testmod(mod, verbose=False).attempted
    assert attempted >= 10, f"only {attempted} doctest examples found"
