"""TPU-native rebuild of Volume Segmantics (JAX/Flax/XLA).

Public API mirrors DiamondLightSource/volume-segmantics so existing users
can switch imports: `volume_segmantics_tpu.model` exports the trainer and
prediction manager, `volume_segmantics_tpu.data` the settings loader and
slicer, `volume_segmantics_tpu.utilities` the parsers and Quality enum.
"""

__version__ = "0.1.0"
