"""TPU-native multimodal (camera + LiDAR + radar) BEV 3D object detection framework.

A ground-up JAX / XLA / Pallas re-design with the capabilities of the PyTorch
reference `meg89/bevfusion_multimodal_3d_object_detection`:

- camera (ResNet-18), LiDAR (PointNet), radar (multi-sensor PointNet) encoders
- BEV / attention / late fusion over any modality subset
- CenterNet and MLP detection heads
- on-device (jit) target assignment, decode, loss, and metrics
- data-parallel scaling over a `jax.sharding.Mesh`

Public surface mirrors the reference CLIs (`train_detect.py`, `eval.py`,
`inference.py`, `data_converter.py`, ...) and `configs/base.yaml` schema.
"""

__version__ = "0.1.0"

from .config import load_config, CompatFlags  # noqa: F401
