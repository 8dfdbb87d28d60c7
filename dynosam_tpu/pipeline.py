"""Pipeline manager: dataset -> frontend -> backend -> logs.

The analog of `DynoPipelineManager` (`src/pipeline/PipelineManager.cc:45-203`)
— but where the reference wires thread-backed queues between modules, here
the "pipeline" is a host loop dispatching one fused frontend computation and
(on window triggers) one fused backend optimization per frame; the device
pipeline parallelism comes from XLA's async dispatch (the host enqueues
frame k+1 while the device still runs frame k).
"""

from __future__ import annotations

import dataclasses
import time
from typing import Iterable, Optional

import jax
import jax.numpy as jnp
import numpy as np

from .backend.backend import RGBDBackend
from .core.camera import CameraParams
from .core.types import FrontendOutput
from .frontend.frontend import FrameImages, FrontendState, frontend_step
from .utils.config import DynoConfig
from .utils import stats as stats_mod


@dataclasses.dataclass
class PipelineResult:
    packets: list            # FrontendOutput per frame
    backend: Optional[RGBDBackend]
    frontend_state: FrontendState
    fps: float


class DynoPipeline:
    """Sequential (reference `parallel_run: False`) full pipeline."""

    def __init__(
        self,
        cam: CameraParams,
        cfg: DynoConfig,
        use_klt: bool = True,
        display=None,
    ):
        self.cam = cam
        self.cfg = cfg
        self.use_klt = use_klt
        # optional viz.visualizer.FrontendDisplay (display loop / video dump)
        self.display = display
        cap = cfg.capacity
        self.frontend_state = FrontendState.create(
            cap.max_static_tracks, cap.max_dynamic_tracks, cap.max_objects
        )
        self.backend = (
            RGBDBackend(cfg.backend, cap) if cfg.pipeline.use_backend else None
        )
        self.packets: list = []
        self._prev_images: Optional[FrameImages] = None
        self._k = 0
        self._byte_tracker = None
        if cfg.frontend.tracker.use_byte_tracker:
            from .frontend.byte_tracker import ByteTracker

            self._byte_tracker = ByteTracker()

    def spin_once(self, images: FrameImages) -> FrontendOutput:
        if self._byte_tracker is not None:
            # temporally consistent instance ids (reference --use_byte_tracker)
            from .frontend.byte_tracker import relabel_mask

            relabelled = relabel_mask(
                self._byte_tracker,
                np.asarray(images.mask),
                score_pixel_norm=self.cfg.frontend.tracker.byte_score_pixel_norm,
            )
            images = images._replace(mask=jnp.asarray(relabelled))
        first = self._k == 0
        prev = self._prev_images if self._prev_images is not None else images
        with stats_mod.timer("frontend.spin"):
            self.frontend_state, packet, report, _ = frontend_step(
                self.frontend_state,
                prev,
                images,
                self.cam,
                self.cfg.frontend,
                jax.random.PRNGKey(self._k),
                use_klt=self.use_klt,
                first_frame=first,
            )
        self.packets.append(packet)
        if self.display is not None:
            self.display.spin_once(images, packet)
        if self.backend is not None:
            with stats_mod.timer("backend.spin"):
                self.backend.spin(packet)
        self._prev_images = images
        self._k += 1
        return packet

    def run(self, frames: Iterable[FrameImages]) -> PipelineResult:
        t0 = time.perf_counter()
        n = 0
        for images in frames:
            self.spin_once(images)
            n += 1
        if self.backend is not None:
            with stats_mod.timer("backend.finish"):
                self.backend.finish()
        if self.display is not None:
            self.display.close()
        # VALUE-FETCH barrier for honest timing (jax.block_until_ready
        # does not wait under the axon remote backend)
        np.asarray(self.packets[-1].X_world.t)
        dt = time.perf_counter() - t0
        return PipelineResult(
            packets=self.packets,
            backend=self.backend,
            frontend_state=self.frontend_state,
            fps=n / max(dt, 1e-9),
        )


def run_and_log(
    dataset,
    cfg: DynoConfig,
    output_path: str,
    use_klt: bool = True,
    module_prefix: str = "frontend",
):
    """Run the full pipeline over a dataset and write the reference-format
    CSV logs (frontend + backend modules), the analog of the eval harness
    entry (`dynosam_utils/.../runner.py:53-146`)."""
    import os

    from .utils.logger import EstimationLogger

    # `prefer_data_provider_camera_params` (reference PipelineParams): the
    # dataset's own calibration wins unless explicitly overridden by a
    # camera_params_yaml
    if (
        not cfg.pipeline.prefer_data_provider_camera_params
        and cfg.pipeline.camera_params_yaml
    ):
        from .core.camera import camera_params_from_yaml

        cam = camera_params_from_yaml(cfg.pipeline.camera_params_yaml)
    else:
        cam = dataset.camera_params()
    pipe = DynoPipeline(cam, cfg, use_klt=use_klt)
    result = pipe.run(dataset.prefetched_frames())

    os.makedirs(output_path, exist_ok=True)
    fe_log = EstimationLogger(output_path, module_prefix)
    base = dataset.start
    for k, pkt in enumerate(result.packets):
        gt = dataset.ground_truth(base + k)
        T = np.asarray(
            jnp.concatenate(
                [
                    jnp.concatenate(
                        [pkt.X_world.R, pkt.X_world.t[:, None]], axis=1
                    ),
                    jnp.asarray([[0.0, 0.0, 0.0, 1.0]]),
                ],
                axis=0,
            )
        )
        fe_log.log_camera_pose(
            base + k, T, None if gt is None else gt.X_world
        )
        fe_log.log_timestamp(base + k, float(np.asarray(pkt.timestamp)))
        labels = np.asarray(pkt.objects.label)
        mvalid = np.asarray(pkt.objects.motion_valid)
        for j in np.nonzero(mvalid)[0]:
            H = pkt.objects.motion[int(j)]
            Hm = np.eye(4)
            Hm[:3, :3] = np.asarray(H.R)
            Hm[:3, 3] = np.asarray(H.t)
            gt_H = None
            if gt is not None and int(labels[j]) in gt.object_motions:
                gt_H = gt.object_motions[int(labels[j])]
            fe_log.log_object_motion(base + k, int(labels[j]), Hm, gt_H)
            L = pkt.objects.pose[int(j)]
            Lm = np.eye(4)
            Lm[:3, :3] = np.asarray(L.R)
            Lm[:3, 3] = np.asarray(L.t)
            gt_L = None
            if gt is not None and int(labels[j]) in gt.object_poses:
                gt_L = gt.object_poses[int(labels[j])]
            fe_log.log_object_pose(base + k, int(labels[j]), Lm, gt_L)
    fe_log.flush()

    if result.backend is not None:
        be_prefix = (
            "rgbd_motion_world_backend"
            if cfg.backend.backend_updater_enum == 0
            else "rgbd_LL_world_backend"
        )
        be_log = EstimationLogger(output_path, be_prefix)
        X, xvalid = result.backend.camera_poses()
        H, hvalid = result.backend.object_motions()
        labels_map = np.asarray(result.backend.map.obj_label)
        xv = np.asarray(xvalid)
        hv = np.asarray(hvalid)
        for k in range(len(result.packets)):
            if not xv[k]:
                continue
            gt = dataset.ground_truth(base + k)
            T = np.eye(4)
            T[:3, :3] = np.asarray(X.R[k])
            T[:3, 3] = np.asarray(X.t[k])
            be_log.log_camera_pose(base + k, T, None if gt is None else gt.X_world)
            be_log.log_timestamp(base + k, k * 0.1)
            for j in np.nonzero(hv[k])[0]:
                label = int(labels_map[k, int(j)])
                if label < 0:
                    continue
                Hm = np.eye(4)
                Hm[:3, :3] = np.asarray(H.R[k, int(j)])
                Hm[:3, 3] = np.asarray(H.t[k, int(j)])
                gt_H = None
                if gt is not None and label in gt.object_motions:
                    gt_H = gt.object_motions[label]
                be_log.log_object_motion(base + k, label, Hm, gt_H)
        be_log.flush()

    from .utils import stats as _stats

    _stats.write_summary_csv(os.path.join(output_path, "statistics_summary.csv"))
    _stats.write_samples_csv(os.path.join(output_path, "statistics_samples.csv"))
    return result


def run_from_packets(
    packets,
    cfg: DynoConfig,
    output_path: Optional[str] = None,
):
    """Offline replay: feed saved frontend packets straight to the backend,
    bypassing vision (the analog of `--frontend_from_file` /
    `FrontendOfflinePipeline`, `src/pipeline/PipelineManager.cc:228-256`).
    """
    backend = RGBDBackend(cfg.backend, cfg.capacity)
    for pkt in packets:
        backend.spin(pkt)
    backend.finish()
    if output_path is not None:
        from .utils import stats as _stats
        import os

        os.makedirs(output_path, exist_ok=True)
        _stats.write_summary_csv(
            os.path.join(output_path, "statistics_summary.csv")
        )
    return backend
