"""
Persistent XLA compilation cache setup.

A whole-genome run launches a handful of distinct kernel shapes — each
(C, K, T) launch bucket is a separate XLA (and, on TPU, Mosaic) compile that
can take minutes cold.  The persistent compilation cache makes every process
after the first start warm: compiled executables (including the embedded
Mosaic kernels) are serialized to disk keyed by HLO + compile options +
compiler version.

Enabled by default the first time the compute layer is imported; opt out
with WHATSHAP_TPU_NO_COMPILE_CACHE=1, relocate with
WHATSHAP_TPU_COMPILE_CACHE_DIR=<dir> (default ~/.cache/whatshap_tpu/xla).
"""

import logging
import os

logger = logging.getLogger(__name__)

_done = False


def enable_persistent_cache() -> None:
    """Idempotently point JAX's persistent compilation cache at a local
    directory, on accelerator backends only.

    Call from dispatch sites that already consulted
    ``jax.default_backend()`` (so this never forces backend init itself) and
    before the first kernel compile of the process.  Accelerator-only
    because XLA:CPU AOT replay warns about machine-feature mismatches
    (potential SIGILL on feature drift) — and the cold-start pain this
    solves is the minutes-long Mosaic TPU compiles, not CPU jits."""
    global _done
    if _done:
        return
    _done = True
    if os.environ.get("WHATSHAP_TPU_NO_COMPILE_CACHE"):
        return
    try:
        import jax

        if jax.default_backend() == "cpu":
            return
        cache_dir = os.environ.get("WHATSHAP_TPU_COMPILE_CACHE_DIR") or os.path.join(
            os.path.expanduser("~"), ".cache", "whatshap_tpu", "xla"
        )
        os.makedirs(cache_dir, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        # threshold 0: on a tunneled backend even a trivial broadcast/reshape
        # compile is a ~0.5 s compiler round trip, and a cold CLI run makes
        # dozens of them — cache every executable, not just the big kernels
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
        logger.debug("persistent compilation cache at %s", cache_dir)
    except Exception as exc:  # pragma: no cover - cache is best-effort
        logger.debug("persistent compilation cache unavailable: %s", exc)


_warm_thread = None


def warm_backend_async() -> None:
    """Start backend + tunnel initialization in a daemon thread.

    Cold accelerator bring-up (client handshake, platform registration,
    first tiny executable) costs ~1-2 s on a tunneled backend and needs no
    Python state from the caller, while the CLI's first pipeline stages
    (BAM read, VCF parse, read selection) are host-only — kicking the
    device bring-up off first overlaps the two.  Idempotent; never raises.
    """
    global _warm_thread
    if _warm_thread is not None or os.environ.get("WHATSHAP_TPU_NO_BACKEND_WARM"):
        return
    import threading

    def _warm():
        try:
            import jax

            if jax.default_backend() == "cpu":
                return
            enable_persistent_cache()
            import jax.numpy as jnp

            # one trivial executable forces the full client handshake and
            # primes the compile-cache read path
            jax.device_get(jnp.zeros((1,), jnp.int32) + 1)
        except Exception as exc:  # pragma: no cover - purely opportunistic
            logger.debug("backend warm-up failed: %s", exc)

    # non-daemon: a process exiting mid-handshake/mid-compile can wedge the
    # shared compile service, so the interpreter must wait the ~1 s out;
    # callers only warm on pipelines whose own work dwarfs that anyway
    _warm_thread = threading.Thread(target=_warm, name="wh-backend-warm", daemon=False)
    _warm_thread.start()
