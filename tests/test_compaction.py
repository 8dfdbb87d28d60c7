"""Window track/object compaction (`backend/map.py:compact_window`).

A window solve over oversized pools must gather only the in-window slots
(the reference's `constructGraph(from,to)` likewise rebuilds window graphs
from only the in-range map nodes, `RGBDBackendModule.cc:280-341`) and
scatter results back to pool coordinates.  These tests pin:

  * solve equivalence: padded + slot-permuted pools with compaction give
    the same estimates as exact-size pools without it;
  * expansion: values/masks land at the original pool slots, untouched
    slots stay at their defaults.
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dynosam_tpu.backend.backend import optimize_window_jit
from dynosam_tpu.backend.map import MeasurementMap, update_map
from dynosam_tpu.backend.solver import LMConfig
from dynosam_tpu.core.lie import SE3, se3_identity
from dynosam_tpu.core.types import INVALID_ID
from dynosam_tpu.testing.simulator import Scenario, ScenarioConfig
from dynosam_tpu.utils.config import BackendConfig


SCFG = ScenarioConfig(
    n_frames=8, n_static=40, n_objects=3, pts_per_object=10,
    ns=48, nd=32, no=4,
)


def _permute_packet(pkt, sperm, dperm, operm, ns_big, nd_big, no_big):
    """Embed a packet into bigger pools with content at permuted slots."""
    ns, nd, no = SCFG.ns, SCFG.nd, SCFG.no

    def scatter(arr, perm, cap, fill=0.0):
        shape = (cap,) + arr.shape[1:]
        if arr.dtype == jnp.int32:
            base = jnp.full(shape, INVALID_ID, jnp.int32)
        elif arr.dtype == bool:
            base = jnp.zeros(shape, bool)
        else:
            base = jnp.full(shape, fill, arr.dtype)
        return base.at[perm].set(arr)

    st = pkt.static_obs._replace(
        uv=scatter(pkt.static_obs.uv, sperm, ns_big),
        xyz=scatter(pkt.static_obs.xyz, sperm, ns_big),
        valid=scatter(pkt.static_obs.valid, sperm, ns_big),
    )
    # remap object ids through operm
    obj = pkt.dynamic_obs.obj
    obj_new = jnp.where(obj >= 0, operm[jnp.clip(obj, 0, no - 1)], INVALID_ID)
    dy = pkt.dynamic_obs._replace(
        uv=scatter(pkt.dynamic_obs.uv, dperm, nd_big),
        xyz=scatter(pkt.dynamic_obs.xyz, dperm, nd_big),
        obj=scatter(obj_new, dperm, nd_big),
        valid=scatter(pkt.dynamic_obs.valid, dperm, nd_big),
    )
    idp = se3_identity((no_big,), jnp.float32)
    ob = pkt.objects._replace(
        motion=SE3(
            idp.R.at[operm].set(pkt.objects.motion.R),
            idp.t.at[operm].set(pkt.objects.motion.t),
        ),
        motion_valid=scatter(pkt.objects.motion_valid, operm, no_big),
        pose=SE3(
            idp.R.at[operm].set(pkt.objects.pose.R),
            idp.t.at[operm].set(pkt.objects.pose.t),
        ),
        pose_valid=scatter(pkt.objects.pose_valid, operm, no_big),
        label=scatter(pkt.objects.label, operm, no_big),
    )
    return pkt._replace(static_obs=st, dynamic_obs=dy, objects=ob)


@pytest.mark.parametrize("updater", [0, 1])
def test_compacted_solve_matches_exact_pools(updater):
    sc = Scenario(SCFG)
    pkts = sc.frontend_outputs()
    W = SCFG.n_frames
    ns_big, nd_big, no_big = 96, 80, 7

    rng = np.random.default_rng(3)
    sperm = jnp.asarray(rng.permutation(ns_big)[: SCFG.ns], jnp.int32)
    dperm = jnp.asarray(rng.permutation(nd_big)[: SCFG.nd], jnp.int32)
    operm = jnp.asarray(rng.permutation(no_big)[: SCFG.no], jnp.int32)

    m_small = MeasurementMap.create(W, SCFG.ns, SCFG.nd, SCFG.no)
    m_big = MeasurementMap.create(W, ns_big, nd_big, no_big)
    for k, pkt in enumerate(pkts):
        m_small = update_map(m_small, pkt, k)
        m_big = update_map(
            m_big,
            _permute_packet(pkt, sperm, dperm, operm, ns_big, nd_big, no_big),
            k,
        )

    cfg = dataclasses.replace(
        BackendConfig(),
        lm_max_iterations=12,
        window_max_static=SCFG.ns,
        window_max_dynamic=SCFG.nd,
        window_max_objects=SCFG.no,
    )
    lm_cfg = LMConfig(max_iterations=12)
    anchor = se3_identity((), jnp.float32)
    res_a, masks_a = optimize_window_jit(
        m_small, 0, W, cfg, lm_cfg, anchor, jnp.asarray(False), updater
    )
    res_b, masks_b = optimize_window_jit(
        m_big, 0, W, cfg, lm_cfg, anchor, jnp.asarray(False), updater
    )

    # f32 track reordering perturbs sum order and LM accept/reject branches,
    # so these bands are loose; the SHARP equivalence is the f64 subprocess
    # check below (test_compaction_equivalence_f64: err diff ~1e-10)
    assert np.isclose(float(res_a.error), float(res_b.error), rtol=5e-2)

    # camera poses
    np.testing.assert_allclose(
        np.asarray(res_b.values["X"].t), np.asarray(res_a.values["X"].t),
        atol=5e-3,
    )

    # object poses/motions land at the permuted slots
    key = "H" if updater == 0 else "L"
    np.testing.assert_allclose(
        np.asarray(res_b.values[key].t[:, operm]),
        np.asarray(res_a.values[key].t),
        atol=2e-2,
    )
    # masks scatter back to pool coordinates
    np.testing.assert_array_equal(
        np.asarray(masks_b.dyn_obs[:, dperm]), np.asarray(masks_a.dyn_obs)
    )
    np.testing.assert_array_equal(
        np.asarray(masks_b.static_obs[:, sperm]),
        np.asarray(masks_a.static_obs),
    )
    np.testing.assert_array_equal(
        np.asarray(masks_b.motion_active[:, operm]),
        np.asarray(masks_a.motion_active),
    )
    # untouched pool slots: masks stay False
    nsel = jnp.zeros((nd_big,), bool).at[dperm].set(True)
    assert not bool(jnp.any(masks_b.dyn_obs[:, ~nsel]))

    # points at the permuted slots
    da = np.asarray(res_a.values["dp"])
    db = np.asarray(res_b.values["dp"][:, dperm])
    ma = np.asarray(masks_a.dyn_obs)
    np.testing.assert_allclose(db[ma], da[ma], atol=2e-2)
    sa = np.asarray(res_a.values["sp"])
    sb = np.asarray(res_b.values["sp"][sperm])
    sm = np.asarray(masks_a.static_obs).any(0)
    np.testing.assert_allclose(sb[sm], sa[sm], atol=2e-2)


def test_compaction_equivalence_f64():
    """The sharp pin: compacted == exact-pool solve to ~1e-9 in f64 (run in
    a subprocess — `jax_enable_x64` is process-global)."""
    import os
    import subprocess
    import sys

    out = subprocess.run(
        [sys.executable,
         os.path.join(os.path.dirname(__file__), "f64_check.py"),
         "compaction"],
        capture_output=True, text=True, timeout=900,
    )
    assert out.returncode == 0, out.stdout + out.stderr
    assert "COMPACTION_F64_OK" in out.stdout, out.stdout + out.stderr


def test_pool_at_cap_bypasses_compaction():
    """Pools at or below the window caps take the untouched path
    (bit-identical to a build without compaction)."""
    sc = Scenario(SCFG)
    m = MeasurementMap.create(SCFG.n_frames, SCFG.ns, SCFG.nd, SCFG.no)
    for k, pkt in enumerate(sc.frontend_outputs()):
        m = update_map(m, pkt, k)
    cfg_def = dataclasses.replace(BackendConfig(), lm_max_iterations=6)
    cfg_off = dataclasses.replace(
        cfg_def, window_max_static=0, window_max_dynamic=0,
        window_max_objects=0,
    )
    lm_cfg = LMConfig(max_iterations=6)
    anchor = se3_identity((), jnp.float32)
    args = (m, 0, SCFG.n_frames, cfg_def, lm_cfg, anchor,
            jnp.asarray(False), 0)
    res_a, _ = optimize_window_jit(*args)
    res_b, _ = optimize_window_jit(
        m, 0, SCFG.n_frames, cfg_off, lm_cfg, anchor, jnp.asarray(False), 0
    )
    np.testing.assert_array_equal(
        np.asarray(res_a.values["X"].t), np.asarray(res_b.values["X"].t)
    )
    assert float(res_a.error) == float(res_b.error)
