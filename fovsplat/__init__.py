"""fovsplat — TPU-native foveated differentiable Gaussian splatting.

A from-scratch JAX/XLA/Pallas framework with the capabilities of
horizon-research/Fov-3DGS (MetaSapiens, ASPLOS 2025): a single tile
rasterizer family (with stats / foveated / loss-weighted modes) replacing the
reference's nine CUDA diff-gaussian-rasterization variants, HVS metameric
losses, efficiency-aware pruning, PS-mask learning, model composition, and
multi-chip scaling over a `jax.sharding.Mesh`.

Layout:
  fovsplat.utils       math/graphics helpers, config
  fovsplat.ops         rasterizer: projection, binning, blending, foveation
  fovsplat.models      GaussianParams pytree, densify/prune, composed models
  fovsplat.data        COLMAP/Blender readers, PLY IO, cameras
  fovsplat.perception  steerable-pyramid HVS (metameric) losses
  fovsplat.train       losses, optimizers, training loops, pipeline
  fovsplat.eval        PSNR/SSIM/LPIPS/HVS metrics, FPS bench
  fovsplat.parallel    mesh sharding of Gaussians and tiles
"""

__version__ = "0.1.0"
