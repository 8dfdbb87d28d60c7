"""Multi-sequence batched (data-parallel) frontend test on the 8-device
virtual mesh."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dynosam_tpu.core import lie
from dynosam_tpu.parallel.batch_eval import MultiSequencePipeline
from dynosam_tpu.parallel.mesh import make_mesh
from dynosam_tpu.testing.render import RenderConfig, RenderedScene
from dynosam_tpu.utils.config import FrontendConfig, TrackerConfig
from tests.test_pipeline import RenderedDataset


@pytest.mark.slow
def test_multi_sequence_batch():
    scenes = [
        RenderedScene(RenderConfig(n_frames=4, seed=s)) for s in (0, 1)
    ]
    datasets = [RenderedDataset(s) for s in scenes]
    cfg = FrontendConfig(
        tracker=TrackerConfig(
            max_features_per_frame=200, klt_window=11, klt_levels=2
        ),
        min_dynamic_features_per_object=20,
        refine_motion_with_3d=False,
    )
    pipe = MultiSequencePipeline(
        datasets, cfg, caps=(256, 512, 8), mesh=None
    )
    packets = pipe.run(4)
    assert len(packets) == 4
    # per-sequence camera poses close to each GT
    last = packets[-1]
    for s, scene in enumerate(scenes):
        X = lie.SE3(last.X_world.R[s], last.X_world.t[s])
        err = np.asarray(lie.se3_local(scene.X_gt[3], X))
        assert np.linalg.norm(err[3:]) < 0.08, (s, err)
    # batched static observations exist for both sequences
    v = np.asarray(last.static_obs.valid)
    assert v.shape[0] == 2 and (v.sum(axis=1) > 30).all()
