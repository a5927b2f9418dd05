"""riggs_tpu — a TPU-native (JAX/XLA/Pallas) framework for rigging 3D Gaussians.

A from-scratch re-design of the capabilities of RigGS (CVPR 2025,
reference: yaoyx689/RigGS): differentiable 3D Gaussian splatting, node-based
deformation fields, skeleton extraction from learned trajectories, and
skeleton-driven (rigged) Gaussian avatars — built TPU-first:

  * functional core: all model state is explicit pytrees, train steps are jit-ed
  * static shapes everywhere: densification uses capacity padding + alive masks
  * the rasterizer is a tiled, depth-sorted, GEMM-style blend that maps onto the
    MXU/VPU (with a Pallas fused path), not a port of the CUDA kernel
  * multi-chip scaling via jax.sharding.Mesh + shard_map (pixel/tile sharding,
    frame-parallel batching), not NCCL

Package layout:
  ops/       pure-jnp math: quaternions, SH, SE(3), FK chain, KNN, FPS
  camera/    camera models and projection
  render/    the differentiable rasterizer (oracle + tiled fast path + pallas)
  models/    Gaussian cloud, deformation networks, skeleton warp
  skeleton/  offline skeleton-tree extraction (MST, prune, simplify, symmetry)
  data/      dataset readers (blender/D-NeRF, ZJU, colmap) + synthetic scenes
  train/     losses, schedules, stage-1 / stage-2 trainers
  parallel/  mesh construction and sharded train-step wrappers
  io/        PLY / OBJ / checkpoint round-trips
  eval/      PSNR / SSIM / MS-SSIM / LPIPS metrics
"""

__version__ = "0.1.0"
