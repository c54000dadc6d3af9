"""pix2pix3d_tpu: TPU-native JAX framework for 3D-aware conditional image synthesis.

A from-scratch rebuild of the capabilities of pix2pix3D (CVPR 2023,
"3D-aware Conditional Image Synthesis") designed TPU-first:

- All compute runs through jax/XLA; hot inner loops (tri-plane sampling +
  decoder MLP + ray marching) have fused Pallas kernels.
- Arrays are NHWC / feature-last (TPU-friendly layouts).
- Parameters are plain pytrees (nested dicts) whose key structure mirrors the
  reference PyTorch module tree so released checkpoints convert 1:1.
- Data parallelism is a `jax.sharding.Mesh` + `shard_map` with psum gradient
  reduction (the reference uses process-per-GPU NCCL all_reduce).
"""

__version__ = "0.1.0"
