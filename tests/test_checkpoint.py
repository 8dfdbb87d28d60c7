"""Checkpoint/resume + packet serialization tests (SURVEY §5.4)."""

import jax
import jax.numpy as jnp
import numpy as np

from dynosam_tpu.backend.backend import (
    RGBDBackend,
    load_backend_checkpoint,
    save_backend_checkpoint,
)
from dynosam_tpu.testing.simulator import Scenario, ScenarioConfig
from dynosam_tpu.utils.config import BackendConfig, CapacityConfig
from dynosam_tpu.utils.serialization import load_packets, save_packets


def caps(scfg):
    return CapacityConfig(
        max_static_tracks=scfg.ns,
        max_dynamic_tracks=scfg.nd,
        max_objects=scfg.no,
        max_frames=scfg.n_frames,
    )


def test_packet_save_load_roundtrip(tmp_path):
    scfg = ScenarioConfig(n_frames=4, n_static=20, n_objects=1,
                          pts_per_object=8, ns=32, nd=16, no=2)
    packets = Scenario(scfg).frontend_outputs()
    p = str(tmp_path / "packets.npz")
    save_packets(p, packets)
    loaded = load_packets(p)
    assert len(loaded) == 4
    for a, b in zip(packets, loaded):
        np.testing.assert_allclose(
            np.asarray(a.static_obs.xyz), np.asarray(b.static_obs.xyz),
            atol=1e-6,
        )
        np.testing.assert_array_equal(
            np.asarray(a.dynamic_obs.obj), np.asarray(b.dynamic_obs.obj)
        )


def test_offline_replay_matches_online(tmp_path):
    """Saved packets replayed through the backend give the same solve."""
    from dynosam_tpu.pipeline import run_from_packets
    from dynosam_tpu.utils.config import DynoConfig

    scfg = ScenarioConfig(n_frames=6, n_static=30, n_objects=1,
                          pts_per_object=10, ns=40, nd=16, no=2)
    packets = Scenario(scfg).frontend_outputs()
    p = str(tmp_path / "pk.npz")
    save_packets(p, packets)
    loaded = load_packets(p)

    cfg = DynoConfig(
        backend=BackendConfig(use_full_batch_opt=True, lm_max_iterations=8),
        capacity=caps(scfg),
    )
    b1 = run_from_packets(packets, cfg)
    b2 = run_from_packets(loaded, cfg)
    np.testing.assert_allclose(
        np.asarray(b1.est.X.t), np.asarray(b2.est.X.t), atol=1e-5
    )


def test_backend_checkpoint_resume(tmp_path):
    scfg = ScenarioConfig(n_frames=10, n_static=30, n_objects=1,
                          pts_per_object=10, ns=40, nd=16, no=2)
    packets = Scenario(scfg).frontend_outputs()
    cfg = BackendConfig(opt_window_size=5, opt_window_overlap=2,
                        lm_max_iterations=8)

    # run A: all 10 frames straight through
    ba = RGBDBackend(cfg, caps(scfg))
    for pkt in packets:
        ba.spin(pkt)
    ba.finish()

    # run B: 6 frames, checkpoint, restore into a fresh backend, resume
    bb = RGBDBackend(cfg, caps(scfg))
    for pkt in packets[:6]:
        bb.spin(pkt)
    ck = str(tmp_path / "ck")
    save_backend_checkpoint(bb, ck)
    bc = RGBDBackend(cfg, caps(scfg))
    bc = load_backend_checkpoint(bc, ck)
    assert bc.n_frames == 6
    for pkt in packets[6:]:
        bc.spin(pkt)
    bc.finish()

    # same estimates (deterministic solves)
    np.testing.assert_allclose(
        np.asarray(ba.est.X.t), np.asarray(bc.est.X.t), atol=1e-4
    )
