"""Device/backend selection helpers.

This image's TPU PJRT plugin overrides the JAX_PLATFORMS environment
variable at import time, so backend selection must go through the config
API before the backend initialises. `configure_platform()` honours the
VOLSEG_TPU_PLATFORM env var (e.g. "cpu" for CPU-only runs or CI) and turns
on the persistent compilation cache.
"""

import os


def configure_platform():
    import jax

    platform = os.environ.get("VOLSEG_TPU_PLATFORM")
    if platform:
        jax.config.update("jax_platforms", platform)
    cache_dir = os.environ.get(
        "JAX_COMPILATION_CACHE_DIR", os.path.expanduser("~/.cache/jax_comp_cache")
    )
    try:
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:  # pragma: no cover - older jax without the option
        pass
