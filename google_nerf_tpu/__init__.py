"""google_nerf_tpu — a TPU-native (JAX/XLA/Pallas/pjit) rebuild of the
mikacuy/google-nerf stack: depth-supervised Instant-NGP NeRF + ScanNet tooling
+ LeReS/cIMLE monocular depth priors.

This is a from-scratch framework, not a port: all hot paths are dense, padded,
batch-regular XLA/Pallas programs with no per-step host synchronisation
(contrast the reference's CUDA CSR compaction, `ngp_pl/models/custom_functions.py:92-97`).

Subpackages
-----------
core      camera & ray math (pure jnp)
ops       compute kernels: ray-AABB, occupancy marching, compositing,
          morton/packbits, grid maintenance, trunc-exp (+ ops.pallas kernels)
models    NGP model (hash/frequency encoders, SH dir encoder, bias-free MLPs)
data      dataset readers (nsvf/colmap/nerfpp/rtmv/scannet/synthetic)
train     training system: TrainState, jitted train step, losses, schedules
eval      metrics (PSNR/SSIM/LPIPS) and the test-time renderer
parallel  device-mesh helpers and sharded train steps (dp over rays)
utils     checkpointing, config, logging
scannet_tools  ScanNet .sens decoding / export / split (host-side)
depth     LeReS monocular-depth networks + cIMLE (flax)
"""

__version__ = "0.1.0"
