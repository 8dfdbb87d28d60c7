"""Full end-to-end pipeline test: rendered frames -> frontend -> backend ->
CSV logs -> evaluation (the minimum end-to-end slice of SURVEY §7)."""

import numpy as np
import pytest

from dynosam_tpu.core.lie import SE3
from dynosam_tpu.data.base import DatasetProvider, GroundTruthFrame
from dynosam_tpu.pipeline import DynoPipeline, run_and_log
from dynosam_tpu.testing.render import RenderConfig, RenderedScene
from dynosam_tpu.utils.config import (
    BackendConfig,
    CapacityConfig,
    DynoConfig,
    FrontendConfig,
    PipelineConfig,
    TrackerConfig,
)


class RenderedDataset(DatasetProvider):
    """Adapter: RenderedScene -> DatasetProvider."""

    def __init__(self, scene: RenderedScene):
        super().__init__("<rendered>")
        self.scene = scene
        self._frames = scene.frames()

    def __len__(self):
        return len(self._frames)

    def camera_params(self):
        return self.scene.cam

    def frame(self, idx):
        return self._frames[idx]

    def ground_truth(self, idx):
        def mat(se3):
            T = np.eye(4)
            T[:3, :3] = np.asarray(se3.R)
            T[:3, 3] = np.asarray(se3.t)
            return T

        poses, motions = {}, {}
        for o, label in enumerate(self.scene.object_labels):
            poses[label] = mat(self.scene.object_pose_at(idx, o))
            motions[label] = mat(self.scene.H_gt_list[o])
        return GroundTruthFrame(
            frame_id=idx,
            timestamp=idx * 0.1,
            X_world=mat(self.scene.X_gt[idx]),
            object_poses=poses,
            object_motions=motions,
        )


def small_config(n_frames: int) -> DynoConfig:
    return DynoConfig(
        frontend=FrontendConfig(
            tracker=TrackerConfig(
                max_features_per_frame=300, klt_window=13, klt_levels=2
            ),
            min_dynamic_features_per_object=20,
        ),
        backend=BackendConfig(
            use_full_batch_opt=True,
            lm_max_iterations=15,
            cg_max_iterations=250,
        ),
        capacity=CapacityConfig(
            max_static_tracks=400,
            max_dynamic_tracks=1024,
            max_objects=8,
            max_frames=n_frames,
        ),
        pipeline=PipelineConfig(use_backend=True),
    )


@pytest.mark.slow
def test_full_pipeline_end_to_end(tmp_path):
    scene = RenderedScene(RenderConfig(n_frames=5))
    ds = RenderedDataset(scene)
    cfg = small_config(len(ds))

    result = run_and_log(ds, cfg, str(tmp_path))
    assert result.fps > 0
    assert len(result.packets) == 5

    # logs exist and evaluate
    from dynosam_tpu.eval.evaluator import evaluate_all

    results = evaluate_all(str(tmp_path))
    assert "frontend" in results
    cam = results["frontend"]["camera"]
    assert cam["ate_trans_rmse"] < 0.1, cam
    # backend camera at least as logged
    assert "rgbd_motion_world_backend" in results
    be = results["rgbd_motion_world_backend"]["camera"]
    assert be["ate_trans_rmse"] < 0.15, be
    # object motion metrics present for the frontend
    if "objects_mean" in results["frontend"]:
        om = results["frontend"]["objects_mean"]
        assert om["ame_trans_rmse"] < 0.5, om
