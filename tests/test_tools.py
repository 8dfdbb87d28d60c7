"""Tests: graph tools (outliers, debug info, sparsity), histogram, stats
registry (analogs of reference test_tools/test_histogram/stats tests)."""

import jax.numpy as jnp
import numpy as np

from dynosam_tpu.backend import graph_tools
from dynosam_tpu.backend.solver import RobustSpec
from dynosam_tpu.utils.histogram import Histogram
from dynosam_tpu.utils import stats


def test_factor_outliers():
    # family of 4 factors: 2 small, 1 big, 1 masked(zero)
    r = jnp.asarray(
        [[1e-5, 0, 0], [2e-5, 0, 0], [5.0, 5.0, 5.0], [0, 0, 0]],
        jnp.float32,
    )
    out = graph_tools.factor_outliers([r], [RobustSpec("huber", 1e-4)])[0]
    np.testing.assert_array_equal(np.asarray(out), [False, False, True, False])


def test_debug_info_and_sparsity():
    from dynosam_tpu.backend import formulation as fm
    from dynosam_tpu.backend.map import MeasurementMap, slice_window, update_map
    from dynosam_tpu.testing.simulator import Scenario, ScenarioConfig
    from dynosam_tpu.utils.config import BackendConfig

    scfg = ScenarioConfig(n_frames=6, n_static=30, n_objects=1,
                          pts_per_object=10, ns=40, nd=32, no=4)
    sc = Scenario(scfg)
    m = MeasurementMap.create(6, 40, 32, 4)
    for k, pkt in enumerate(sc.frontend_outputs()):
        m = update_map(m, pkt, k)
    masks = fm.build_masks(slice_window(m, 0, 6), BackendConfig())
    info = graph_tools.DebugInfo.from_masks(masks)
    assert info.num_poses == 6
    assert info.num_static_points == 30
    assert info.num_static_factors == 180          # 30 pts x 6 frames
    assert info.num_motion_factors == 50           # 10 pts x 5 pairs
    assert info.num_odometry_factors == 5
    st = graph_tools.sparsity_stats(masks)
    assert st.total_variable_dims > 0
    assert 0.0 < st.fill_ratio < 0.2               # very sparse


def test_histogram():
    h = Histogram([0, 1, 2, 5], name="t")
    h.add_all([-1, 0.5, 0.7, 1.5, 4.9, 5.0, 100])
    assert h.underflow == 1
    assert h.overflow == 2
    np.testing.assert_array_equal(h.counts, [2, 1, 1])
    assert h.bin_of(0.5) == 0
    assert h.bin_of(-3) == -1
    assert h.bin_of(7) == 3
    assert h.total == 7


def test_stats_registry(tmp_path):
    stats.reset()
    with stats.timer("unit.test_op"):
        pass
    stats.add_sample("custom_tag", 5.0)
    stats.add_sample("custom_tag", 7.0)
    a = stats.get("custom_tag")
    assert a.count == 2
    assert a.mean == 6.0
    p = str(tmp_path / "summary.csv")
    stats.write_summary_csv(p)
    content = open(p).read()
    assert "custom_tag" in content and "unit.test_op [ms]" in content
    stats.reset()


def test_public_api_surface():
    import dynosam_tpu

    assert dynosam_tpu.SE3 is not None
    assert dynosam_tpu.DynoConfig is not None
    assert dynosam_tpu.CameraParams is not None
    assert "DynoPipeline" in dir(dynosam_tpu)


def test_visualizer_smoke(rng):
    import numpy as np

    from dynosam_tpu.viz import visualizer as viz

    img = viz.gray_to_bgr(rng.uniform(0, 255, (60, 80)))
    mask = np.zeros((60, 80), np.int32)
    mask[10:30, 20:50] = 3
    out = viz.overlay_mask(img, mask)
    assert out.shape == (60, 80, 3)
    # mask region tinted
    assert not np.array_equal(out[15, 25], img[15, 25])
    uv = rng.uniform(0, [79, 59], size=(10, 2))
    out2 = viz.draw_tracks(out, uv, np.ones(10, bool))
    assert out2.shape == out.shape
    flow = rng.normal(0, 3, (60, 80, 2)).astype(np.float32)
    fb = viz.flow_to_bgr(flow)
    assert fb.shape == (60, 80, 3)
    db = viz.depth_to_bgr(rng.uniform(0, 40, (60, 80)))
    assert db.shape == (60, 80, 3)


def test_debug_utilities(rng):
    import jax
    import jax.numpy as jnp

    from dynosam_tpu.utils import debug

    # check_finite flags bad leaves with their path
    import pytest

    good = {"a": jnp.ones(3), "b": {"c": jnp.zeros(2)}}
    assert debug.check_finite(good)
    bad = {"a": jnp.asarray([1.0, float("nan")])}
    with pytest.raises(FloatingPointError, match="a"):
        debug.check_finite(bad, "state")

    # deterministic replay passes for a pure jitted fn
    f = jax.jit(lambda x: jnp.cumsum(x * 2))
    x = jnp.asarray(rng.normal(size=32), jnp.float32)
    out = debug.deterministic_replay(f, x)
    assert out.shape == (32,)


def test_deterministic_frontend_step():
    """The whole frontend step must be bit-deterministic (race-detection
    analog, SURVEY §5.2)."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from dynosam_tpu.core.camera import CameraParams
    from dynosam_tpu.frontend.frontend import (
        FrameImages,
        FrontendState,
        frontend_step,
    )
    from dynosam_tpu.utils.config import FrontendConfig, TrackerConfig
    from dynosam_tpu.utils.debug import deterministic_replay

    rng = np.random.default_rng(3)
    h, w = 64, 96
    cam = CameraParams.create(80.0, 80.0, 48.0, 32.0, w, h)
    cfg = FrontendConfig(
        tracker=TrackerConfig(max_features_per_frame=50, klt_window=9,
                              klt_levels=2)
    )
    img = FrameImages(
        gray=jnp.asarray(rng.uniform(0, 255, (h, w)), jnp.float32),
        depth=jnp.asarray(rng.uniform(2, 20, (h, w)), jnp.float32),
        flow=jnp.zeros((h, w, 2), jnp.float32),
        mask=jnp.zeros((h, w), jnp.int32),
    )
    st = FrontendState.create(64, 64, 4)
    deterministic_replay(
        lambda: frontend_step(
            st, img, img, cam, cfg, jax.random.PRNGKey(0),
            use_klt=True, first_frame=True,
        )[1].X_world.t
    )


def test_graph_export(tmp_path):
    """writeDynosamGraphFile + saveGraph dot analogs
    (`FactorGraphTools.cc:316-380`, `FactorGraphTools.hpp:291-358`)."""
    from dynosam_tpu.backend import formulation as fm
    from dynosam_tpu.backend.map import MeasurementMap, slice_window, update_map
    from dynosam_tpu.testing.simulator import Scenario, ScenarioConfig
    from dynosam_tpu.utils.config import BackendConfig

    scfg = ScenarioConfig(n_frames=4, n_static=10, n_objects=1,
                          pts_per_object=5, ns=16, nd=16, no=2)
    sc = Scenario(scfg)
    m = MeasurementMap.create(4, 16, 16, 2)
    for k, pkt in enumerate(sc.frontend_outputs()):
        m = update_map(m, pkt, k)
    w = slice_window(m, 0, 4)
    cfg = BackendConfig()
    masks = fm.build_masks(w, cfg)
    vals = fm.init_values(w, masks, cfg)

    gpath = tmp_path / "graph.txt"
    n = graph_tools.write_dynosam_graph_file(
        str(gpath), vals, masks, dyn_obj=w.dyn_obj
    )
    text = gpath.read_text()
    info = graph_tools.DebugInfo.from_masks(masks)
    expected = (
        1 + info.num_odometry_factors + info.num_static_factors
        + info.num_dynamic_factors + info.num_motion_factors
        + info.num_smoothing_factors
    )
    assert n == expected
    assert text.count("POSE_TO_POINT_FACTOR") == (
        info.num_static_factors + info.num_dynamic_factors
    )
    assert text.count("SE3_MOTION_FACTOR") == info.num_motion_factors
    assert text.count("SE3_POSE_VALUE") == info.num_poses
    # every factor key must have a matching value line
    assert "SE3_PRIOR_FACTOR x0" in text
    assert "POINT3_STATIC_VALUE" in text and "POINT3_DYNAMIC_VALUE" in text

    dpath = tmp_path / "graph.dot"
    graph_tools.save_graph_dot(str(dpath), masks, dyn_obj=w.dyn_obj)
    dot = dpath.read_text()
    assert dot.startswith("graph dynosam {") and dot.rstrip().endswith("}")
    assert dot.count("-- x0;") >= 1 and "shape=box" in dot


def test_frontend_display_video(tmp_path, rng):
    """FrontendDisplay writes a playable video file (display-loop/video-dump
    analog of `visualizer/Display.hpp:36`)."""
    import cv2
    import jax

    from dynosam_tpu.pipeline import DynoPipeline
    from dynosam_tpu.testing.render import RenderConfig, RenderedScene
    from dynosam_tpu.utils.config import (
        DynoConfig, FrontendConfig, PipelineConfig, TrackerConfig,
    )
    from dynosam_tpu.viz.visualizer import FrontendDisplay

    scene = RenderedScene(RenderConfig(n_frames=3))
    cfg = DynoConfig(
        frontend=FrontendConfig(
            tracker=TrackerConfig(
                max_features_per_frame=200, klt_window=13, klt_levels=2
            )
        ),
        pipeline=PipelineConfig(use_backend=False),
    )
    vid = str(tmp_path / "tracks.avi")
    disp = FrontendDisplay(video_path=vid, fps=5.0)
    pipe = DynoPipeline(scene.cam, cfg, display=disp)
    pipe.run(scene.frames())
    cap = cv2.VideoCapture(vid)
    assert cap.isOpened()
    n = int(cap.get(cv2.CAP_PROP_FRAME_COUNT))
    cap.release()
    assert n == 3
    assert disp.last_frame is not None and disp.last_frame.ndim == 3
