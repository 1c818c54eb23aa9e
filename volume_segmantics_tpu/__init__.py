"""TPU-native rebuild of Volume Segmantics (JAX/Flax/XLA).

Public API mirrors DiamondLightSource/volume-segmantics so existing users
can switch imports: `volume_segmantics_tpu.model` exports the trainer and
prediction manager, `volume_segmantics_tpu.data` the settings loader and
slicer, `volume_segmantics_tpu.utils` the parsers and Quality enum.
"""

__version__ = "0.1.0"

# Honour VOLSEG_TPU_PLATFORM and enable the persistent compile cache for
# every consumer (CLI and library alike). No-op unless the env var is set /
# jax is importable; must run before the first JAX backend initialisation.
try:
    from volume_segmantics_tpu.utils.device import configure_platform as _cfg

    _cfg()
    del _cfg
except Exception:  # pragma: no cover
    pass
