"""f64 equivalence checks (run as a SUBPROCESS by test_distributed.py —
`jax_enable_x64` is process-global and would poison the f32 suite).

The f32 versions of these tests need loose tolerances (2e-2 m) that could
hide real indexing/algebra bugs behind "reduction-order divergence"; in f64
the same comparisons pin to ~1e-6:

  1. SPIKE frame-sharded chain elimination == block-Thomas (atol 1e-9);
  2. direct Schur step == dense solve of the same damped normal equations
     (atol 3e-6: the damped normal system's conditioning is ~1e10, so two
     algebraically-identical f64 solves agree only to ~cond * eps ~ 2e-6;
     measured max diff 1.3e-6);
  3. distributed Schur LM on the 8-device mesh == 1-device mesh
     (camera translations atol 1e-6).
"""

import sys

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 8)
jax.config.update("jax_enable_x64", True)

import jax.numpy as jnp
import numpy as np

sys.path.insert(0, "/root/repo")


def _cast_tree(tree, dtype=jnp.float64):
    return jax.tree.map(
        lambda a: a.astype(dtype)
        if hasattr(a, "dtype") and jnp.issubdtype(a.dtype, jnp.floating)
        else a,
        tree,
    )


def check_spike_vs_thomas():
    from dynosam_tpu.backend.schur import chain_solve
    from dynosam_tpu.parallel.mesh import make_mesh
    from dynosam_tpu.parallel.schur_dist import make_spike_chain_solver

    rng = np.random.default_rng(3)
    W, N, M = 8, 4, 5
    A = np.zeros((W, N, 3, 3))
    B = np.zeros((W, N, 3, 3))
    rhs = rng.normal(size=(W, N, 3, M))
    for n in range(N):
        C = np.zeros((3 * W, 3 * W))
        for k in range(W):
            C[3 * k : 3 * k + 3, 3 * k : 3 * k + 3] = rng.normal(size=(3, 3))
            if k > 0:
                C[3 * k : 3 * k + 3, 3 * k - 3 : 3 * k] = rng.normal(
                    size=(3, 3)
                )
        G = C @ C.T + np.eye(3 * W)
        for k in range(W):
            A[k, n] = G[3 * k : 3 * k + 3, 3 * k : 3 * k + 3]
            if k > 0:
                B[k, n] = G[3 * k - 3 : 3 * k, 3 * k : 3 * k + 3]
    want = np.asarray(
        chain_solve(jnp.asarray(A), jnp.asarray(B), jnp.asarray(rhs))
    )
    solver = make_spike_chain_solver(make_mesh(8))
    got = np.asarray(solver(jnp.asarray(A), jnp.asarray(B), jnp.asarray(rhs)))
    assert want.dtype == np.float64 and got.dtype == np.float64
    np.testing.assert_allclose(got, want, rtol=1e-9, atol=1e-9)
    print("spike-vs-thomas f64 ok")


def _problem_f64():
    from dynosam_tpu.backend.map import MeasurementMap, update_map
    from dynosam_tpu.testing.simulator import Scenario, ScenarioConfig

    scfg = ScenarioConfig(
        n_frames=8, n_static=30, n_objects=2, pts_per_object=10,
        ns=40, nd=32, no=4, point_noise=0.02,
    )
    sc = Scenario(scfg)
    m = MeasurementMap.create(8, 40, 32, 4)
    for k, pkt in enumerate(sc.frontend_outputs()):
        m = update_map(m, pkt, k)
    return _cast_tree(m)


def check_step_vs_dense():
    from dynosam_tpu.backend import formulation as fm
    from dynosam_tpu.backend import schur
    from dynosam_tpu.backend.map import slice_window
    from dynosam_tpu.backend.solver import dense_normal_solve, retract_tree
    from dynosam_tpu.ops.robust import robust_sqrt_weights
    from dynosam_tpu.utils.config import BackendConfig

    m = _problem_f64()
    w = slice_window(m, 0, 8)
    cfg = BackendConfig(motion_ternary_factor_noise_sigma=0.05)
    masks = fm.build_masks(w, cfg)
    anchor = w.X_init[0]
    vals = fm.init_values(w, masks, cfg)
    assert vals["sp"].dtype == jnp.float64
    spec = fm.world_motion_families(cfg)

    def resid(v):
        return fm.world_motion_residuals(v, w, masks, cfg, anchor)

    lam = 1e-3
    res0 = resid(vals)
    sqrt_w = [
        robust_sqrt_weights(r, s.k, s.kind) if s.kind != "none"
        else jnp.ones(r.shape[:-1], r.dtype)
        for r, s in zip(res0, spec.robust)
    ]
    sys = schur.build_normal_system(vals, sqrt_w, w, masks, cfg, anchor, res0)
    delta = schur.schur_step(sys, jnp.asarray(lam, jnp.float64), 1e-6,
                             formulation=0)
    delta = {
        "X": delta["X"], "H": delta["P"], "sp": delta["sp"], "dp": delta["dp"]
    }
    got = retract_tree(vals, delta)
    want, _ = dense_normal_solve(resid, spec.robust, vals, lam)

    np.testing.assert_allclose(
        np.asarray(got["X"].t), np.asarray(want["X"].t), atol=3e-6
    )
    np.testing.assert_allclose(
        np.asarray(got["X"].R), np.asarray(want["X"].R), atol=3e-6
    )
    np.testing.assert_allclose(
        np.asarray(got["H"].t), np.asarray(want["H"].t), atol=3e-6
    )
    np.testing.assert_allclose(
        np.asarray(got["sp"]), np.asarray(want["sp"]), atol=3e-6
    )
    ok = np.asarray(masks.dyn_obs)[..., None]
    # dp recovers via chain back-substitution (an extra conditioning-limited
    # solve on top of the reduced one); measured max diff 5.0e-6
    np.testing.assert_allclose(
        np.asarray(got["dp"]) * ok, np.asarray(want["dp"]) * ok, atol=1e-5
    )
    print("step-vs-dense f64 ok")


def check_distributed_vs_single():
    from dynosam_tpu.backend.solver import LMConfig
    from dynosam_tpu.parallel.mesh import make_mesh
    from dynosam_tpu.parallel.schur_dist import distributed_schur_optimize
    from dynosam_tpu.utils.config import BackendConfig

    from dynosam_tpu.backend import formulation as fm
    from dynosam_tpu.backend.map import slice_window
    from dynosam_tpu.backend.schur import lm_optimize_schur

    m = _problem_f64()
    cfg = BackendConfig()
    lm = LMConfig(max_iterations=8)
    w = slice_window(m, 0, 8)
    masks = fm.build_masks(w, cfg)
    for updater, key in ((0, "H"), (1, "L")):
        res8 = distributed_schur_optimize(
            m, 8, cfg, mesh=make_mesh(8), lm_cfg=lm, updater=updater
        )
        # reference: the single-chip production solver on the same window
        # (pins the explicit shard_map path against independently-written
        # algebra — a 1-device mesh instantiation would only compare the
        # explicit path against itself, at the cost of two more large
        # compiles in the suite budget)
        vals0 = (fm.init_values(w, masks, cfg) if updater == 0
                 else fm.init_values_world_pose(w, masks, cfg))
        res_ref = lm_optimize_schur(
            vals0, w, masks, cfg, lm, w.X_init[0], formulation=updater
        )
        assert np.isfinite(float(res8.error))
        # WorldPose's rel_R products condition the stable elimination a
        # little worse than WorldMotion, so psum-vs-local reduction order
        # amplifies further over the LM trajectory: measured single-step
        # agreement 2e-10 (algebra exact), 2.4e-8 @3 iters, 3.4e-6 @8.
        tol = 1e-6 if updater == 0 else 1e-5
        for res_d in (res8,):
            np.testing.assert_allclose(
                np.asarray(res_ref.values["X"].t),
                np.asarray(res_d.values["X"].t), atol=tol,
            )
            np.testing.assert_allclose(
                np.asarray(res_ref.values[key].t),
                np.asarray(res_d.values[key].t), atol=tol,
            )
            # reduction order differs (psum tree vs local sums)
            np.testing.assert_allclose(
                float(res_ref.error), float(res_d.error),
                rtol=(1e-6 if updater == 0 else 1e-4),
            )
        print(f"distributed-vs-single f64 ok (updater {updater})")


def check_compaction():
    """Window track/object compaction (backend/map.py:compact_window) is
    algebraically exact: a solve over padded + slot-permuted pools equals
    the exact-pool solve to f64 round-off (measured err diff ~1e-10)."""
    import dataclasses
    import os

    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from test_compaction import SCFG, _permute_packet

    from dynosam_tpu.backend.backend import optimize_window_jit
    from dynosam_tpu.backend.map import MeasurementMap, update_map
    from dynosam_tpu.backend.solver import LMConfig
    from dynosam_tpu.core.lie import se3_identity
    from dynosam_tpu.testing.simulator import Scenario
    from dynosam_tpu.utils.config import BackendConfig

    sc = Scenario(SCFG)
    W = SCFG.n_frames
    ns_big, nd_big, no_big = 96, 80, 7
    rng = np.random.default_rng(3)
    sperm = jnp.asarray(rng.permutation(ns_big)[: SCFG.ns], jnp.int32)
    dperm = jnp.asarray(rng.permutation(nd_big)[: SCFG.nd], jnp.int32)
    operm = jnp.asarray(rng.permutation(no_big)[: SCFG.no], jnp.int32)

    m_small = MeasurementMap.create(W, SCFG.ns, SCFG.nd, SCFG.no, jnp.float64)
    m_big = MeasurementMap.create(W, ns_big, nd_big, no_big, jnp.float64)
    for k, pkt in enumerate(sc.frontend_outputs()):
        m_small = update_map(m_small, _cast_tree(pkt), k)
        m_big = update_map(
            m_big,
            _cast_tree(
                _permute_packet(pkt, sperm, dperm, operm,
                                ns_big, nd_big, no_big)
            ),
            k,
        )
    cfg = dataclasses.replace(
        BackendConfig(), lm_max_iterations=10,
        window_max_static=SCFG.ns, window_max_dynamic=SCFG.nd,
        window_max_objects=SCFG.no,
    )
    lm_cfg = LMConfig(max_iterations=10)
    anchor = se3_identity((), jnp.float64)
    res_a, _ = optimize_window_jit(
        m_small, 0, W, cfg, lm_cfg, anchor, jnp.asarray(False), 0
    )
    res_b, _ = optimize_window_jit(
        m_big, 0, W, cfg, lm_cfg, anchor, jnp.asarray(False), 0
    )
    assert abs(float(res_a.error) - float(res_b.error)) < 1e-8
    np.testing.assert_allclose(
        np.asarray(res_b.values["X"].t), np.asarray(res_a.values["X"].t),
        atol=1e-7,
    )
    np.testing.assert_allclose(
        np.asarray(res_b.values["H"].t[:, operm]),
        np.asarray(res_a.values["H"].t),
        atol=1e-6,
    )
    print("COMPACTION_F64_OK")


if __name__ == "__main__":
    if "compaction" in sys.argv[1:]:
        check_compaction()
    else:
        check_spike_vs_thomas()
        check_step_vs_dense()
        check_distributed_vs_single()
        print("F64_ALL_OK")
