"""Device/backend selection helpers.

This image's TPU PJRT plugin overrides the JAX_PLATFORMS environment
variable at import time, so backend selection must go through the config
API before the backend initialises. `configure_platform()` honours the
VOLSEG_TPU_PLATFORM env var (e.g. "cpu" for CPU-only runs or CI) and turns
on the persistent compilation cache.

The persistent cache is keyed by requested platform AND a host-machine
fingerprint: XLA:CPU persists AOT-compiled results that embed the build
host's ISA features, so a cache directory shared across heterogeneous
hosts (e.g. a bench box and a CI box on NFS/home) can hand one machine
code compiled for another ("could lead to execution errors such as
SIGILL"). Sub-dirs per (platform, machine fingerprint) make that reuse
structurally impossible while still sharing everything that IS safe to
share (same machine, repeated runs).
"""

import hashlib
import os
import platform as _platform


def host_fingerprint() -> str:
    """Short digest of the machine features that XLA:CPU AOT results bake
    in: architecture plus the CPU feature flags (x86 `flags`, arm
    `Features`). Stable across runs on one machine, different across
    machines with different ISAs."""
    parts = [_platform.machine()]
    try:
        with open("/proc/cpuinfo") as f:
            for line in f:
                if line.startswith(("flags", "Features")):
                    parts.append(line.split(":", 1)[1].strip())
                    break
    except OSError:
        parts.append(_platform.processor() or "unknown")
    return hashlib.sha256(" ".join(parts).encode()).hexdigest()[:12]


def compilation_cache_dir() -> str:
    """Machine-safe persistent compile-cache directory (see module doc)."""
    base = os.environ.get(
        "JAX_COMPILATION_CACHE_DIR",
        os.path.expanduser("~/.cache/jax_comp_cache"),
    )
    requested = os.environ.get("VOLSEG_TPU_PLATFORM", "auto")
    return os.path.join(base, f"{requested}-{host_fingerprint()}")


def configure_platform():
    import jax

    platform = os.environ.get("VOLSEG_TPU_PLATFORM")
    if platform:
        jax.config.update("jax_platforms", platform)
    # Persistent-cache policy: always on for TPU (where compiles cost
    # 20-40 s), but on CPU only by explicit opt-in via
    # JAX_COMPILATION_CACHE_DIR. XLA:CPU caches AOT-compiled machine code
    # and logs loud machine-feature warnings on EVERY load (its compile-side
    # feature list carries pseudo-features like +prefer-no-scatter that
    # host detection never reports), so an always-on CPU cache makes every
    # cached run look broken even on one machine.
    explicit = os.environ.get("JAX_COMPILATION_CACHE_DIR")
    if not explicit and platform == "cpu":
        return
    try:
        jax.config.update("jax_compilation_cache_dir", compilation_cache_dir())
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:  # pragma: no cover - older jax without the option
        pass
