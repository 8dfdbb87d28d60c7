"""Frontend end-to-end test on rendered synthetic RGB-D sequences:
tracking + ego PnP + object motion through real (synthetic) images."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dynosam_tpu.core import lie
from dynosam_tpu.frontend.frontend import FrontendState, frontend_step
from dynosam_tpu.testing.render import RenderConfig, RenderedScene
from dynosam_tpu.utils.config import FrontendConfig, TrackerConfig


@pytest.fixture(scope="module")
def scene():
    cfg = RenderConfig(n_frames=5)
    sc = RenderedScene(cfg)
    return sc, sc.frames()


def run_frontend(scene, frames, use_klt=True, refine=True):
    tcfg = TrackerConfig(
        max_features_per_frame=300,
        klt_window=13,
        klt_levels=2,
        semantic_mask_step_size=4,
    )
    cfg = FrontendConfig(
        tracker=tcfg,
        refine_camera_pose_with_joint_of=refine,
        refine_motion_with_3d=refine,
        min_dynamic_features_per_object=20,
    )
    st = FrontendState.create(ns=400, nd=1024, no=8)
    packets, egos = [], []
    prev = frames[0]
    for k, img in enumerate(frames):
        st, pkt, rep, ego = frontend_step(
            st, prev, img, scene.cam, cfg,
            jax.random.PRNGKey(k), use_klt=use_klt, first_frame=(k == 0),
        )
        packets.append(pkt)
        egos.append(ego)
        prev = img
    return st, packets


def test_frontend_ego_motion(scene):
    sc, frames = scene
    st, packets = run_frontend(sc, frames)
    # camera poses close to GT
    for k in [1, 2, 3, 4]:
        X = packets[k].X_world
        err = np.asarray(lie.se3_local(sc.X_gt[k], X))
        assert np.linalg.norm(err[3:]) < 0.05, (k, err)
        assert np.linalg.norm(err[:3]) < 0.02, (k, err)


def test_frontend_object_motion(scene):
    sc, frames = scene
    st, packets = run_frontend(sc, frames)
    found = 0
    for k in [2, 3, 4]:
        pkt = packets[k]
        mv = np.asarray(pkt.objects.motion_valid)
        if not mv.any():
            continue
        j = int(np.argmax(mv))
        H = pkt.objects.motion[j]
        # point-transfer error on the object's GT center
        c_prev = np.asarray(sc._object_pose_at(k - 1).t)
        c_cur = np.asarray(sc._object_pose_at(k).t)
        moved = np.asarray(lie.se3_apply(H, jnp.asarray(c_prev, jnp.float32)))
        err = np.linalg.norm(moved - c_cur)
        assert err < 0.08, (k, err)
        found += 1
    assert found >= 2


def test_frontend_emits_valid_packets(scene):
    sc, frames = scene
    st, packets = run_frontend(sc, frames)
    pkt = packets[-1]
    assert int(np.asarray(pkt.static_obs.valid).sum()) > 50
    assert int(np.asarray(pkt.dynamic_obs.valid).sum()) > 20
    # all valid dynamic obs carry a valid object slot
    v = np.asarray(pkt.dynamic_obs.valid)
    assert (np.asarray(pkt.dynamic_obs.obj)[v] >= 0).all()
    # depth-consistent backprojections
    xyz = np.asarray(pkt.static_obs.xyz)[np.asarray(pkt.static_obs.valid)]
    assert (xyz[:, 2] > 0).all()


def test_static_object_demotion_feeds_ego():
    """A zero-motion object must be classified static, excluded from the
    dynamic packet, and its points must join the ego solve (demotion to the
    static set, `vision_tools::trackDynamic` / VisionTools.cc rule)."""
    cfg_r = RenderConfig(n_frames=5, obj_step=0.0)
    sc = RenderedScene(cfg_r)
    frames = sc.frames()
    tcfg = TrackerConfig(
        max_features_per_frame=300,
        klt_window=13,
        klt_levels=2,
        semantic_mask_step_size=4,
    )
    cfg = FrontendConfig(tracker=tcfg, min_dynamic_features_per_object=20)
    st = FrontendState.create(ns=400, nd=1024, no=8)
    prev = frames[0]
    inliers_per_frame = []
    for k, img in enumerate(frames):
        st, pkt, rep, ego = frontend_step(
            st, prev, img, sc.cam, cfg,
            jax.random.PRNGKey(k), use_klt=True, first_frame=(k == 0),
        )
        inliers_per_frame.append(int(np.asarray(ego.n_inliers)))
        prev = img
        if k >= 2:
            # object classified static...
            assert bool(np.asarray(st.obj_static).any()), k
            # ...and therefore absent from the dynamic packet
            assert not bool(np.asarray(pkt.objects.motion_valid).any()), k
            assert int(np.asarray(pkt.dynamic_obs.valid).sum()) == 0, k
        # ego stays accurate with the demoted points included
        if k >= 1:
            err = np.asarray(lie.se3_local(sc.X_gt[k], pkt.X_world))
            assert np.linalg.norm(err[3:]) < 0.05, (k, err)

    # once demotion kicks in (frame >= 3 uses frame-2 classification), the
    # ego solve should see MORE inliers than the static pool alone provided
    cfg_off = FrontendConfig(
        tracker=tcfg, min_dynamic_features_per_object=20,
        use_static_object_points_for_ego=False,
    )
    st2 = FrontendState.create(ns=400, nd=1024, no=8)
    prev = frames[0]
    inliers_off = []
    for k, img in enumerate(frames):
        st2, pkt2, rep2, ego2 = frontend_step(
            st2, prev, img, sc.cam, cfg_off,
            jax.random.PRNGKey(k), use_klt=True, first_frame=(k == 0),
        )
        inliers_off.append(int(np.asarray(ego2.n_inliers)))
        prev = img
    assert max(inliers_per_frame[3:]) > max(inliers_off[3:]), (
        inliers_per_frame, inliers_off,
    )


def test_frontend_2d2d_ego_mode(scene):
    """The 2d2d essential-matrix ego mode (geometricOutlierRejection2d2d
    analog) reaches GT-level accuracy on the rendered sequence, with metric
    scale recovered from the depth channel."""
    sc, frames = scene
    tcfg = TrackerConfig(
        max_features_per_frame=300, klt_window=13, klt_levels=2,
        semantic_mask_step_size=4,
    )
    cfg = FrontendConfig(
        tracker=tcfg,
        ego_motion_solver="2d2d",
        refine_camera_pose_with_joint_of=True,
        refine_motion_with_3d=False,
        min_dynamic_features_per_object=20,
    )
    st = FrontendState.create(ns=400, nd=1024, no=8)
    packets = []
    prev = frames[0]
    for k, img in enumerate(frames):
        st, pkt, rep, ego = frontend_step(
            st, prev, img, sc.cam, cfg,
            jax.random.PRNGKey(k), use_klt=True, first_frame=(k == 0),
        )
        packets.append(pkt)
        prev = img
    for k in [1, 2, 3, 4]:
        X = packets[k].X_world
        err = np.asarray(lie.se3_local(sc.X_gt[k], X))
        assert np.linalg.norm(err[3:]) < 0.08, (k, err)
        assert np.linalg.norm(err[:3]) < 0.03, (k, err)
