"""lmsu_tpu — TPU-native lightweight multi-modal scene understanding with
knowledge distillation.

A from-scratch JAX/XLA/Pallas framework with the capabilities of the
PyTorch reference KELVIN-ASU/Lightweight-Multi-Modal-Scene-Understanding-
via-Knowledge-Distillation, redesigned TPU-first: NHWC models in flax,
fixed-shape jitted data paths, shard_map/pjit data parallelism over a device
mesh, Pallas kernels for the hot ops, and a first-class teacher->student
distillation subsystem.
"""

__version__ = "0.1.0"

from lmsu_tpu import config

__all__ = ["config", "__version__"]
