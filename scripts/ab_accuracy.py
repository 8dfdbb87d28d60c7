#!/usr/bin/env python
"""End-to-end accuracy A/B on the rendered sequence (CPU backend).

Renders a KITTI-like synthetic sequence, runs the frontend pipeline under
config overrides given as `dotted.key=value` CLI args, and prints the ego
ATE / object AME metrics.  Used for solver-knob A/Bs (e.g. KLT warm start,
refinement LM caps) where the question is "does the cheaper setting lose
accuracy?".

Usage:
  JAX_PLATFORMS=cpu python scripts/ab_accuracy.py \
      frontend.refinement_max_lm_iterations=5 [n_frames=16] [flow_noise=0.5]
"""

import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    overrides = {}
    n_frames = 16
    flow_noise = 0.5
    for a in sys.argv[1:]:
        k, v = a.split("=", 1)
        if k == "n_frames":
            n_frames = int(v)
        elif k == "flow_noise":
            flow_noise = float(v)
        else:
            overrides[k] = v

    import jax.numpy as jnp

    from dynosam_tpu.data.base import DatasetProvider, GroundTruthFrame
    from dynosam_tpu.eval.evaluator import evaluate_all
    from dynosam_tpu.pipeline import run_and_log
    from dynosam_tpu.testing.render import RenderConfig, RenderedScene
    from dynosam_tpu.utils.config import load_config

    cfg = load_config(overrides=overrides)
    # frontend-only (the knob A/Bs here are frontend knobs; backend solves
    # triple the runtime)
    cfg = load_config(
        overrides={**overrides, "pipeline.use_backend": "false"}
    )

    rcfg = RenderConfig(
        n_frames=n_frames, h=384, w=1280, fx=718.0,
        bg_depth=14.0, obj_depth=9.0, cam_step=0.10, obj_step=0.18,
    )
    scene = RenderedScene(rcfg)

    class RenderedDataset(DatasetProvider):
        def __init__(self, sc):
            super().__init__("<rendered>")
            self.scene = sc
            fr = sc.frames()
            rng = np.random.default_rng(0)
            self._frames = [
                f._replace(
                    flow=jnp.asarray(
                        np.asarray(f.flow)
                        + rng.normal(0, flow_noise, f.flow.shape).astype(
                            np.float32
                        )
                    )
                )
                for f in fr
            ]

        def __len__(self):
            return len(self._frames)

        def camera_params(self):
            return self.scene.cam

        def frame(self, idx):
            return self._frames[idx]

        def ground_truth(self, idx):
            X = self.scene.X_gt[idx]
            T = np.eye(4)
            T[:3, :3] = np.asarray(X.R)
            T[:3, 3] = np.asarray(X.t)
            Hm = np.eye(4)
            Hm[:3, :3] = np.asarray(self.scene.H_gt.R)
            Hm[:3, 3] = np.asarray(self.scene.H_gt.t)
            L = self.scene._object_pose_at(idx)
            Lm = np.eye(4)
            Lm[:3, :3] = np.asarray(L.R)
            Lm[:3, 3] = np.asarray(L.t)
            return GroundTruthFrame(
                frame_id=idx,
                timestamp=idx * 0.1,
                X_world=T,
                object_poses={self.scene.cfg.obj_label: Lm},
                object_motions={self.scene.cfg.obj_label: Hm},
            )

    ds = RenderedDataset(scene)
    with tempfile.TemporaryDirectory() as td:
        run_and_log(ds, cfg, td)
        results = evaluate_all(td)
    cam = results["frontend"]["camera"]
    line = (
        f"overrides={overrides} -> ATE trans {cam['ate_trans_rmse']:.4f} m, "
        f"rot {cam.get('ate_rot_rmse_deg', float('nan')):.3f} deg, "
        f"RPE trans {cam.get('rpe_trans_rmse', float('nan')):.4f} m"
    )
    if "objects_mean" in results["frontend"]:
        om = results["frontend"]["objects_mean"]
        line += f", AME trans {om['ame_trans_rmse']:.4f} m"
    print(line)


if __name__ == "__main__":
    main()
