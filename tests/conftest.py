"""
Test configuration: run JAX on a virtual 8-device CPU mesh so the full test
suite (including multi-device sharding tests) runs anywhere, fast, without
TPU hardware.

The environment may pre-register a TPU platform plugin via sitecustomize
(and pre-import jax), so setting JAX_PLATFORMS alone is not enough — we also
update the config directly.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
xla_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in xla_flags:
    os.environ["XLA_FLAGS"] = (
        xla_flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")


def pytest_configure(config):
    """tests/data/pacbio/.gitignore excludes *.bai, so a fresh checkout has
    no indexes for the pacbio fixtures; regenerate any missing ones here so
    tests do not depend on untracked leftovers from earlier runs."""
    import glob

    from whatshap_tpu.io.sam import build_minimal_index

    pacbio_dir = os.path.join(os.path.dirname(__file__), "data", "pacbio")
    for bam in glob.glob(os.path.join(pacbio_dir, "*.bam")):
        if not os.path.exists(bam + ".bai"):
            build_minimal_index(bam)


def pytest_collection_modifyitems(config, items):
    """Optional order scrambling: cross-test state pollution (round-1's
    failure class) only shows up under a different execution order, so CI
    runs an extra leg with WHATSHAP_TPU_TEST_ORDER=reverse or
    =shuffle[:seed] to keep that class of bug out."""
    order = os.environ.get("WHATSHAP_TPU_TEST_ORDER", "")
    if not order:
        return
    if order == "reverse":
        items.reverse()
    elif order.startswith("shuffle"):
        import random

        seed = int(order.split(":", 1)[1]) if ":" in order else 0
        random.Random(seed).shuffle(items)
