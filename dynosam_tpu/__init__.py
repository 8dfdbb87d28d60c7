"""dynosam_tpu — TPU-native dynamic SLAM framework.

A from-scratch JAX/XLA/Pallas re-design of the DynoSAM dynamic-SLAM pipeline
(reference: DeskFanzin/DynOSAM): batched stereo/RGB-D frontend (feature
tracking over optical flow + instance masks, vectorized RANSAC motion
solvers) and a factor-graph backend (camera poses, SE(3) object motions,
static/dynamic landmarks) optimized with matrix-free Levenberg-Marquardt and
distributed Schur/PCG over a TPU device mesh.
"""

__version__ = "0.1.0"
