"""dlrm_tpu: TPU-native DLRM framework (JAX/XLA/Pallas)."""

__version__ = "0.1.0"
