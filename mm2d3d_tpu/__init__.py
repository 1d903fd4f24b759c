"""mm2d3d_tpu — a TPU-native (JAX/XLA/Pallas) framework for cross-modal
RGB+LiDAR unsupervised-domain-adaptation 3D semantic segmentation.

Re-implements the capabilities of CVLAB-Unibo/MM2D3D (CVPR-W 2023) with a
TPU-first architecture:

- static-shape, sort-based voxelization + sparse-grid hierarchy (replaces
  SparseConvNet's CUDA hash tables / rulebooks),
- submanifold & strided sparse convolutions as gather -> dense matmul (MXU),
- a dual-encoder 2D U-Net (RGB + sparse depth) on XLA convolutions,
- pure-functional jitted train/eval steps with cross-modal KL consistency,
- data parallelism via jax.sharding over a device mesh.
"""

__version__ = "0.1.0"
