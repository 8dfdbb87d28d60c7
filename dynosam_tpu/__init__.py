"""dynosam_tpu — TPU-native dynamic SLAM framework.

A from-scratch JAX/XLA/Pallas re-design of the DynoSAM dynamic-SLAM pipeline
(reference: DeskFanzin/DynOSAM): batched stereo/RGB-D frontend (feature
tracking over optical flow + instance masks, vectorized RANSAC motion
solvers) and a factor-graph backend (camera poses, SE(3) object motions,
static/dynamic landmarks) optimized with matrix-free Levenberg-Marquardt and
distributed Schur/PCG over a TPU device mesh.

Public API (lazy imports keep `import dynosam_tpu` light):

    from dynosam_tpu import DynoPipeline, DynoConfig
    from dynosam_tpu.data.factory import create_dataset
"""

__version__ = "0.1.0"

_LAZY = {
    "DynoPipeline": ("dynosam_tpu.pipeline", "DynoPipeline"),
    "run_and_log": ("dynosam_tpu.pipeline", "run_and_log"),
    "run_from_packets": ("dynosam_tpu.pipeline", "run_from_packets"),
    "DynoConfig": ("dynosam_tpu.utils.config", "DynoConfig"),
    "load_config": ("dynosam_tpu.utils.config", "load_config"),
    "SE3": ("dynosam_tpu.core.lie", "SE3"),
    "CameraParams": ("dynosam_tpu.core.camera", "CameraParams"),
    "RGBDBackend": ("dynosam_tpu.backend.backend", "RGBDBackend"),
    "FrontendState": ("dynosam_tpu.frontend.frontend", "FrontendState"),
    "frontend_step": ("dynosam_tpu.frontend.frontend", "frontend_step"),
    "FrameImages": ("dynosam_tpu.frontend.frontend", "FrameImages"),
    "run_offline": ("dynosam_tpu.throughput", "run_offline"),
    "make_streaming_runner": (
        "dynosam_tpu.throughput", "make_streaming_runner"
    ),
    "make_rectifier": ("dynosam_tpu.frontend.rectify", "make_rectifier"),
}


def __getattr__(name):
    if name in _LAZY:
        import importlib

        mod, attr = _LAZY[name]
        return getattr(importlib.import_module(mod), attr)
    raise AttributeError(f"module 'dynosam_tpu' has no attribute {name!r}")


def __dir__():
    return sorted(list(globals()) + list(_LAZY))
