"""orbslam2_tpu — a TPU-native sparse visual SLAM engine (JAX/XLA/Pallas).

A from-scratch re-design of the capabilities of ORB-SLAM2 (reference:
/root/reference, raulmur/ORB_SLAM2 fork) for TPU hardware:

- ORB feature extraction (image pyramid, FAST, spatial suppression,
  orientation, rotated BRIEF) as batched XLA/Pallas device kernels
  (reference: src/ORBextractor.cc).
- Descriptor matching as MXU-friendly batched Hamming distance
  (reference: src/ORBmatcher.cc).
- Map state as fixed-capacity structure-of-arrays with validity masks
  instead of pointer graphs + mutexes (reference: src/Map.cc,
  src/KeyFrame.cc, src/MapPoint.cc).
- g2o replaced by a JAX Gauss-Newton/Levenberg-Marquardt solver with
  Schur-complement reduction (reference: src/Optimizer.cc,
  Thirdparty/g2o).
- DBoW2 replaced by a tensorized binary bag-of-words vocabulary
  (reference: Thirdparty/DBoW2).
- Threads replaced by a host-side orchestrator over functional map
  snapshots (reference: src/System.cc threading).
- Distributed bundle adjustment over a jax.sharding.Mesh for multi-chip
  scaling (no reference equivalent; the TPU-native scaling axis).
"""

__version__ = "0.1.0"

import jax as _jax

# Geometry/BA math needs true f32 matmuls; TPU's default bf16 matmul passes
# introduce ~2e-3 error that destroys pose-chain accuracy. Hot kernels that
# tolerate low precision (e.g. Hamming-distance matmuls over {-1,+1}) opt
# back in explicitly via precision=... at the call site.
_jax.config.update("jax_default_matmul_precision", "float32")

from orbslam2_tpu.system import SLAMSystem, Sensor  # noqa: F401
