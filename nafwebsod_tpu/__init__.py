"""TPU-native rebuild of shenyunhang/NA-fWebSOD (JAX / XLA / Pallas / pjit)."""

__version__ = "0.1.0"
