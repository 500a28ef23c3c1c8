"""vvc_mm_tpu — TPU-native VVC/H.266 video codec with 360° multi-model motion.

A brand-new JAX/XLA/Pallas framework providing the capabilities of the reference
FAU-LMS/vvc-extension-mm (VTM-17.2 + 360Lib + multi-model motion prediction for
360-degree video), re-architected TPU-first:

* pixel/transform math is batched tensor math on the MXU/VPU (int32-exact core),
* the per-4x4 sphere-reprojected motion compensation runs as fused Pallas kernels,
* entropy coding is restructured into per-CTU-row substreams finalized by a native
  C range coder (bins produced in bulk by the batched search),
* multi-chip scaling uses jax.sharding Meshes (CTU-tile x GOP-frame sharding) with
  XLA collectives over ICI — not threads or MPI (the reference is single-threaded).

Layer map (mirrors SURVEY.md §1):
  common/    codec data model + prediction/transform/filter/entropy primitives
             (reference: source/Lib/CommonLib)
  common/mm/ the 360 multi-model motion extension (reference: CommonLib/MotionModels,
             MVReprojection.cpp, Projection.cpp, Coordinate.cpp, EpipoleList.cpp)
  ops/       Pallas TPU kernels (reference analog: source/Lib/CommonLib/x86 SIMD)
  encoder/   encoder library (reference: source/Lib/EncoderLib)
  decoder/   decoder library (reference: source/Lib/DecoderLib)
  lib360/    projection geometry + spherical metrics (reference: source/Lib/Lib360)
  parallel/  device-mesh sharding, halo exchange, GOP pipeline (no reference analog;
             maps the bitstream-structural parallelism of SURVEY.md §2.8 onto TPU)
  utils/     YUV I/O, options, MD5 picture hash (reference: source/Lib/Utilities,
             source/Lib/libmd5)
  apps/      CLI apps (reference: source/App)
"""

__version__ = "0.1.0"
