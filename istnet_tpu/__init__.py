"""istnet_tpu — a TPU-native (JAX/XLA/Pallas) category-level 6D pose estimation framework.

A from-scratch rebuild of the capabilities of CVMI-Lab/IST-Net (ICCV 2023,
"Prior-free Category-level Pose Estimation with Implicit Space Transformation")
designed TPU-first:

- the pointnet2 CUDA ops (reference `model/pointnet2/_ext_src/`) are fused
  Pallas kernels + pure-XLA fallbacks (`istnet_tpu.ops`),
- the RGB encoder / implicit space transformation / pose heads compile as one
  XLA graph (`istnet_tpu.nn`, `istnet_tpu.models`),
- training runs data-parallel over a `jax.sharding.Mesh` (`istnet_tpu.parallel`),
- the CPU data pipeline's hot loops (depth completion, mask sampling) have a
  native C++ core (`istnet_tpu.native`) with numpy fallbacks.

Layout convention: images are NHWC, point clouds are (B, N, 3), and per-point
features are channel-last (B, N, C) — the reference uses NCHW/(B, C, N); we
transpose at the I/O boundary only.
"""

__version__ = "0.1.0"
