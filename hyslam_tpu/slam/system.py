"""System: the public API orchestrating the full pipeline.

Replaces src/main/System.{h,cc} + ImageProcessing.cpp: per-camera
Camera/Map/Tracker construction from config (System.cc:53-177), the
image-processing front end (extract + stereo match), frame dispatch
(TrackStereo/TrackMonocular, System.cc:179-222), loop closing, periodic
global BA in non-realtime mode (Mapping.cpp:88-110), shutdown, and the data
exporters (trajectory TSV, COLMAP, Agisoft XML, map points, checkpoints).

Synchronous by default (deterministic, testable); the threaded pipeline
with the native C++ queue lives in hyslam_tpu.runtime.pipeline and wraps
the same stage functions.
"""

from __future__ import annotations

import os
from typing import Dict, Optional

import numpy as np
import jax
import jax.numpy as jnp

from hyslam_tpu.core import mapstate as M_live
from hyslam_tpu.core.frame import FrameFeatures
from hyslam_tpu.features.bow import PlaceRecognizer, train_vocabulary
from hyslam_tpu.features.factory import make_family
from hyslam_tpu.io.config import SystemConfig
from hyslam_tpu.io import export as EXP
from hyslam_tpu.ops.pyramid import preprocess_image
from hyslam_tpu.ops.stereo import match_stereo_refined
from hyslam_tpu.slam.loop_closing import LoopCloser
from hyslam_tpu.slam.tracker import State, Tracker
from hyslam_tpu.slam.global_ba import run_global_ba

VOCAB_TRAIN_KFS = 4   # train the BoW vocabulary once this many KFs exist


def default_vocab_path() -> Optional[str]:
    """The shipped pretrained vocabulary (Vocabulary/synthetic_orb.npz,
    built by tools/train_synthetic_vocab.py), or None if absent."""
    import os

    p = os.path.join(os.path.dirname(os.path.dirname(
        os.path.dirname(os.path.abspath(__file__)))),
        "Vocabulary", "synthetic_orb.npz")
    return p if os.path.exists(p) else None


class System:
    def __init__(self, config: SystemConfig | None = None):
        self.config = config or SystemConfig()
        self.trackers: Dict[str, Tracker] = {}
        self.cameras = {}
        self.loop_closers: Dict[str, LoopCloser] = {}
        self._vocab = None
        self._frame_counter = 0
        self._kfs_since_gba = 0
        self._shutdown = False
        self._tracking_log = None
        self._mapping_log = None
        self.timer = None
        self._open_logs()
        self._families = {}   # per-camera feature family (FeatureFactory)
        for name, cc in self.config.cameras.items():
            cam = cc.camera()
            self.cameras[name] = cam
            self._families[name] = make_family(cc.extractor)
            self.trackers[name] = Tracker(
                cam=cam,
                cam_id=list(self.config.cameras).index(name),
                caps=self.config.caps,
                is_mono=cc.mono,
                policy=cc.policy,
                opt_info=self.config.optimizer,
                n_levels=cc.extractor.n_levels,
                scale_factor=cc.extractor.scale_factor,
                params=cc.tracking,
                commit_lag=self.config.commit_lag,
            )
        self._pipe = None
        if self.config.pipelined:
            from hyslam_tpu.runtime.pipeline import SystemPipeline

            self._pipe = SystemPipeline(self)
        self._lc_worker = None
        if self.config.async_tracking and self.config.enable_loop_closing:
            self._start_lc_worker()

    def flush(self):
        """Pipelined mode: block until both pipeline stages are drained and
        all map snapshots are adopted; async mode: commit every in-flight
        frame and block until the device queue settles (use before reading
        trackers/maps mid-run). No-op in synchronous mode."""
        if self._pipe is not None:
            self._pipe.drain_all()
        if self.config.async_tracking:
            for t in self.trackers.values():
                t.drain_pending()
            if self._lc_worker is not None:
                self._lc_queue.join()
                for name in list(self.trackers):
                    self._apply_pending_loop(name)
            for t in self.trackers.values():
                jax.block_until_ready(t.ms.next_kf)

    # ------------------------------------------------------------------ input

    def track_stereo(self, img_left, img_right, timestamp: float,
                     camera: str = "SLAM", frame_id: int | None = None,
                     sensor_data=None):
        """Full stereo entry (System::TrackStereo -> ImageProcessing::
        ProcessStereoImage): grayscale, extract both images, stereo match +
        sub-pixel refine, then track. sensor_data (SensorData) attaches
        GPS/IMU/depth readings to any keyframe made from this frame."""
        cc = self.config.cameras[camera]
        cam = self.cameras[camera]
        il = preprocess_image(jnp.asarray(img_left), cam.scale)
        ir = preprocess_image(jnp.asarray(img_right), cam.scale)
        F = self._capacity(cc)
        fam = self._families[camera]
        # both images through ONE batched program (the reference's two
        # extractor threads, ImageProcessing.cpp:82-84)
        feats2 = fam.extract_batch(jnp.stack([il, ir]), capacity=F)
        fl = jax.tree.map(lambda x: x[0], feats2)
        fr = jax.tree.map(lambda x: x[1], feats2)
        fl = match_stereo_refined(fl, fr, il, ir, bf=cam.bf)
        self._maybe_dump_frame(camera, il, fl)
        return self.track_features(fl, timestamp, camera, frame_id,
                                   sensor_data)

    def track_rgbd(self, img, depth, timestamp: float, camera: str = "SLAM",
                   frame_id: int | None = None, sensor_data=None):
        """RGB-D entry (BASELINE config #3; the reference retains only the
        RGBD sensor enum, src/main/System.h:81 — ORB-SLAM2's TrackRGBD
        synthesizes a stereo channel from registered depth, and this does
        the same): extract mono features, sample the depth image at each
        keypoint, and fill ur = u - bf/z + depth so the entire stereo
        pipeline (close-point seeding, stereo BA residuals, culling
        thresholds) applies unchanged.

        `depth` is a registered metric depth image [H, W] (meters; <= 0 or
        non-finite = no reading) at the RGB image's native resolution."""
        cc = self.config.cameras[camera]
        cam = self.cameras[camera]
        gray = preprocess_image(jnp.asarray(img), cam.scale)
        fam = self._families[camera]
        feats = fam.extract(gray, capacity=self._capacity(cc))
        dep = jnp.asarray(depth, jnp.float32)
        H0, W0 = dep.shape
        # sample depth at keypoints (nearest neighbor, native-res coords)
        uv0 = feats.uv / cam.scale
        ui = jnp.clip(jnp.round(uv0[:, 0]).astype(jnp.int32), 0, W0 - 1)
        vi = jnp.clip(jnp.round(uv0[:, 1]).astype(jnp.int32), 0, H0 - 1)
        z = dep[vi, ui]
        ok = feats.valid & jnp.isfinite(z) & (z > 0.05)
        feats = feats._replace(
            ur=jnp.where(ok, feats.uv[:, 0] - cam.bf / jnp.maximum(z, 1e-6),
                         -1.0),
            depth=jnp.where(ok, z, -1.0),
        )
        self._maybe_dump_frame(camera, gray, feats)
        return self.track_features(feats, timestamp, camera, frame_id,
                                   sensor_data)

    def track_monocular(self, img, timestamp: float, camera: str = "SLAM",
                        frame_id: int | None = None, sensor_data=None):
        """System::TrackMonocular -> ImageProcessing::ProcessMonoImage:
        while the tracker is initializing, the 3x-feature "init" extractor
        of the per-camera trio is used (ImageProcessing.cpp:28-37,49-54)."""
        cc = self.config.cameras[camera]
        gray = preprocess_image(jnp.asarray(img),
                                self.cameras[camera].scale)
        fam = self._families[camera]
        if (self.trackers[camera].state == State.INITIALIZE
                and cc.init_feature_factor > 1):
            fam = self._init_family(camera)
        feats = fam.extract(gray, capacity=self._capacity(cc))
        self._maybe_dump_frame(camera, gray, feats)
        return self.track_features(feats, timestamp, camera, frame_id,
                                   sensor_data)

    def track_features(self, feats: FrameFeatures, timestamp: float,
                       camera: str = "SLAM", frame_id: int | None = None,
                       sensor_data=None):
        """Feature-level entry (tracking_queue analog). In pipelined mode
        the frame is queued to the tracking thread (bounded queue,
        backpressure at depth 2 — System.cc:194) and None is returned; the
        synchronous path returns this frame's TrackerTelemetry."""
        if self._shutdown:
            raise RuntimeError("System is shut down")
        if frame_id is None:
            frame_id = self._frame_counter
        self._frame_counter += 1
        if self._pipe is not None:
            self._pipe.feed(camera, feats, timestamp, frame_id, sensor_data)
            return None
        if self.config.async_tracking:
            if self._lc_worker is not None:
                if self._lc_error is not None:
                    e, self._lc_error = self._lc_error, None
                    raise RuntimeError(f"loop-closing worker died: {e!r}")
                self._apply_pending_loop(camera)
            tracker = self.trackers[camera]
            tel = tracker.track_async(feats, timestamp, frame_id,
                                      sensor_data=sensor_data)
            self._transition_states()
            return tel   # None while the frame is in flight
        return self._track_features_inline(feats, timestamp, camera,
                                           frame_id, sensor_data)

    def _track_features_inline(self, feats, timestamp, camera, frame_id,
                               sensor_data, defer_maintenance=False):
        """One frame through the state machine (+ telemetry). With
        defer_maintenance, loop closing / periodic GBA are left to the
        mapping thread (runtime.pipeline.SystemPipeline)."""
        tracker = self.trackers[camera]
        tel = tracker.track(feats, timestamp, frame_id,
                            sensor_data=sensor_data)
        if self._tracking_log is not None:
            import numpy as _np

            self._tracking_log.log(
                camera, tel, timestamp,
                n_kfs=int(_np.asarray(tracker.ms.next_kf)),
                # live count, not the cumulative allocation counter —
                # with slot recycling next_lm can exceed both the live
                # size and capacity L (ADVICE r4)
                n_landmarks=int(_np.asarray(
                    M_live.n_live_landmarks(tracker.ms))),
            )
        if tel.kf_inserted >= 0:
            if self._mapping_log is not None and tel.mapper_stats:
                self._mapping_log.log(camera, tel.kf_inserted,
                                      tel.mapper_stats)
            if not defer_maintenance:
                self._on_new_keyframe(camera, tel.kf_inserted)
        self._transition_states()
        return tel

    def _transition_states(self):
        """Cross-camera state coupling (TrackingStateTransitionReinit.cpp:
        101-119): while the SLAM camera is lost, accessory cameras are held
        in NULL_STATE (their poses ride the SLAM trajectory and cannot be
        placed); when SLAM recovers they re-enter INITIALIZATION (their new
        init map becomes a submap aligned via the SLAM trajectory,
        TrackingStateInitialize.cpp:34-41 / slam.imaging)."""
        slam = self.trackers.get("SLAM")
        if slam is None or len(self.trackers) < 2:
            return
        lost = slam.state in (State.REINITIALIZE, State.RELOCALIZE)
        for name, t in self.trackers.items():
            if name == "SLAM":
                continue
            if lost and t.state != State.NULL:
                t.state = State.NULL
            elif not lost and t.state == State.NULL:
                # re-init in a fresh private submap so the old map keeps a
                # single origin/gauge; the submap is aligned + registered
                # later by imaging BA (ADVICE r1: a plain INITIALIZE here
                # would add a second origin to the still-active map)
                t.reenter_initialize()

    # ----------------------------------------------------------- loop closing

    def _start_lc_worker(self):
        """Async-mode loop closing: the reference's LoopClosing THREAD
        (System.cc:145-152). Detection + Sim3 verification run off-thread
        on immutable map snapshots; a verified closure is applied to the
        authoritative map between frames (the reference's CorrectLoop
        stops mapping for the same reason). Backlogged keyframes beyond
        depth 2 get recognizer indexing only — the same shedding the
        reference's bounded queues impose."""
        import queue as _q
        import threading

        self._lc_queue = _q.Queue()
        self._pending_loop = {}
        self._lc_error = None

        for name, t in self.trackers.items():
            if name == "SLAM":
                t.on_keyframe = (
                    lambda kf_id, _n=name: self._lc_queue.put((_n, kf_id)))

        def loop():
            while True:
                item = self._lc_queue.get()
                if item is None:
                    return
                camera, kf_id = item
                try:
                    tracker = self.trackers[camera]
                    closer = self._get_loop_closer(camera)
                    if closer is None:
                        continue
                    ms = tracker.ms   # immutable snapshot
                    if self._lc_queue.qsize() > 2:
                        # shed: index the keyframe, skip detection
                        closer.recognizer.add_keyframe(
                            kf_id, ms.kf.desc[kf_id], ms.kf.kp_valid[kf_id])
                        continue
                    found, cand, g_cl, n = closer.detect_and_verify(
                        ms, kf_id)
                    if found:
                        self._pending_loop[camera] = (kf_id, cand, g_cl)
                except Exception as e:   # surface at the next frame
                    self._lc_error = e
                finally:
                    self._lc_queue.task_done()

        self._lc_worker = threading.Thread(
            target=loop, daemon=True, name="hyslam-loopclosing")
        self._lc_worker.start()

    def _apply_pending_loop(self, camera: str):
        """Apply a worker-verified loop closure to the authoritative map
        (CorrectLoop + the post-loop GBA, LoopClosing.cc:421-614) between
        frames: the tracker's device state stores poses RELATIVE to its
        reference keyframe, so it re-anchors onto the corrected map
        automatically at the next dispatched frame."""
        pend = self._pending_loop.pop(camera, None)
        if pend is None:
            return
        kf_id, cand, g_cl = pend
        tracker = self.trackers[camera]
        tracker.drain_pending()
        closer = self.loop_closers[camera]
        ms = closer.correct(tracker.ms, kf_id, cand, g_cl)
        closer.n_closed += 1
        ex = self.config.cameras[camera].extractor
        ms, _ = run_global_ba(
            ms, self.cameras[camera], n_iters=10,
            sensors=tracker.sensors, opt_info=self.config.optimizer,
            n_levels=ex.n_levels, scale_factor=ex.scale_factor,
        )
        tracker.ms = ms
        self._refresh_trajectory(camera)

    def _on_new_keyframe(self, camera: str, kf_id: int):
        tracker = self.trackers[camera]
        tracker.ms, moved = self._maintain_map(camera, tracker.ms, kf_id)
        if moved:
            self._refresh_trajectory(camera)

    def _maintain_map(self, camera: str, ms, kf_id: int):
        """Per-keyframe map maintenance on a map snapshot: loop closing (+
        post-loop GBA) and periodic GBA in non-realtime mode (Mapping::
        RunGlobalBA cadence). Returns (ms, map_moved). Runs inline in the
        synchronous path and on the mapping thread in pipelined mode."""
        tracker = self.trackers[camera]
        map_moved = False
        if self.config.enable_loop_closing and camera == "SLAM":
            closer = self._get_loop_closer(camera, ms)
            if closer is not None:
                ms, closed, info = closer.process_keyframe(ms, kf_id)
                if closed:
                    # reference spawns a GBA thread after CorrectLoop
                    ex = self.config.cameras[camera].extractor
                    ms, _ = run_global_ba(
                        ms, self.cameras[camera], n_iters=10,
                        sensors=tracker.sensors,
                        opt_info=self.config.optimizer,
                        n_levels=ex.n_levels, scale_factor=ex.scale_factor,
                    )
                    map_moved = True
        self._kfs_since_gba += 1
        if (not self.config.optimizer.realtime
                and self._kfs_since_gba >= self.config.optimizer.gba_interval):
            ex = self.config.cameras[camera].extractor
            ms, _ = run_global_ba(
                ms, self.cameras[camera],
                sensors=tracker.sensors, opt_info=self.config.optimizer,
                n_levels=ex.n_levels, scale_factor=ex.scale_factor,
            )
            self._kfs_since_gba = 0
            map_moved = True
        return ms, map_moved

    def _refresh_trajectory(self, camera: str):
        """Re-derive every trajectory pose from its (re-optimized) reference
        keyframe (Trajectory::updatePoses, Trajectory.cc:152 — hySLAM's
        continuously re-anchored per-frame trajectory)."""
        from hyslam_tpu.core import trajectory as TJ

        t = self.trackers[camera]
        t.traj = TJ.refresh(t.traj, t.ms.kf.Tcw, t.ms.kf.bad,
                            t.ms.kf.span_parent, t.ms.kf.Tcp)

    def _get_loop_closer(self, camera: str, ms=None) -> Optional[LoopCloser]:
        if camera in self.loop_closers:
            return self.loop_closers[camera]
        tracker = self.trackers[camera]
        if ms is None:
            ms = tracker.ms
        n_kf = int(np.asarray(ms.next_kf))
        if n_kf < VOCAB_TRAIN_KFS:
            return None
        vp = self.config.vocab_path or default_vocab_path()
        if self._vocab is None and vp:
            # pretrained vocabulary (npz from tools.vocabulary /
            # tools.train_synthetic_vocab, or a DBoW2 text file —
            # System.cc:86 loads the DBoW2 binary voc). When no vocab_path
            # is configured, the shipped Vocabulary/synthetic_orb.npz is
            # the default (the reference always loads a pretrained voc;
            # a vocab trained on the map's first seconds cannot
            # discriminate places at map scale).
            from hyslam_tpu.features.vocab_io import load_dbow2_text, load_vocabulary

            self._vocab = (load_vocabulary(vp) if vp.endswith(".npz")
                           else load_dbow2_text(vp))
        if self._vocab is None:
            # last resort: train on the map's own descriptors
            descs = np.asarray(ms.kf.desc[:n_kf]).reshape(-1, 8)
            valid = np.asarray(ms.kf.kp_valid[:n_kf]).reshape(-1)
            self._vocab = train_vocabulary(descs[valid][:20000], k=10, depth=3)
        pr = PlaceRecognizer(self._vocab, K=self.config.caps.K)
        # backfill existing keyframes
        for k in range(n_kf):
            pr.add_keyframe(k, ms.kf.desc[k], ms.kf.kp_valid[k])
        closer = LoopCloser(
            cam=self.cameras[camera], recognizer=pr,
            fix_scale=not self.config.cameras[camera].mono,
        )
        self.loop_closers[camera] = closer
        # share the recognizer with the tracker's relocalization path
        # (TrackPlaceRecognition ranks candidates through the same
        # place-recognition index, PlaceRecognizer.h:25-96)
        tracker.recognizer = pr
        return closer

    # ------------------------------------------------------------- dual-camera

    def place_imaging_frame(self, timestamp: float,
                            imaging_camera: str = "Imaging"):
        """System::placeImagingFrame (System.cc:267-271): decide whether an
        imaging frame at this timestamp is worth keeping — pose it from the
        SLAM trajectory + rig transform, keep when its landmark overlap
        with the previously retained frame drops below the threshold and
        enough landmarks are visible. Returns (keep, Tcw)."""
        from hyslam_tpu.slam.imaging import ImagingFramePlacer

        if not hasattr(self, "_frame_placer"):
            self._frame_placer = ImagingFramePlacer(
                self.cameras[imaging_camera])
        slam = self.trackers["SLAM"]
        Tcam = self.config.cameras[imaging_camera].Tcam
        Tcam = None if Tcam is None else jnp.asarray(Tcam, jnp.float32)
        return self._frame_placer.should_keep(
            slam.ms, slam.traj, timestamp, Tcam)

    def set_imaging_frame_placer_params(self, overlap_threshold: float,
                                        min_visible: int,
                                        imaging_camera: str = "Imaging"):
        """System::setImagingFramePlacerParams (System.cc:274-281)."""
        from hyslam_tpu.slam.imaging import ImagingFramePlacer

        if not hasattr(self, "_frame_placer"):
            self._frame_placer = ImagingFramePlacer(
                self.cameras[imaging_camera])
        self._frame_placer.overlap_threshold = overlap_threshold
        self._frame_placer.min_visible = min_visible

    def run_imaging_bundle_adjustment(self, imaging_camera: str = "Imaging",
                                      sparsify_overlap: float = 0.98):
        """System::RunImagingBundleAdjustment: align + register all imaging
        sub-maps via the SLAM trajectory, run the trajectory-time BA
        (hyslam_tpu.slam.imaging), then sparsify the imaging map
        (GenUtils::sparsifyMap with 0.98, System.cc:262-263). Pass
        sparsify_overlap=None to skip sparsification."""
        from hyslam_tpu.slam.imaging import run_imaging_ba
        from hyslam_tpu.slam.sparsify import sparsify_map

        # re-anchor the SLAM trajectory to the latest optimized keyframes
        # before using it to place imaging poses (System.cc:256 converts the
        # freshly-updated trajectory)
        self._refresh_trajectory("SLAM")
        slam = self.trackers["SLAM"]
        imaging = self.trackers[imaging_camera]
        imaging.ms = run_imaging_ba(
            imaging.ms, self.cameras[imaging_camera], slam.traj,
            self.config.cameras[imaging_camera].Tcam,
        )
        if sparsify_overlap is not None:
            imaging.ms, _ = sparsify_map(
                imaging.ms, self.cameras[imaging_camera], sparsify_overlap)

    # ----------------------------------------------------------------- export

    def save_trajectory(self, path: str, camera: str = "SLAM"):
        self._refresh_trajectory(camera)
        t = self.trackers[camera]
        EXP.save_trajectory_tsv(path, t.traj, name=camera)

    def save_trajectory_tum(self, path: str, camera: str = "SLAM"):
        self._refresh_trajectory(camera)
        EXP.save_trajectory_tum(path, self.trackers[camera].traj)

    def export_colmap(self, folder: str):
        for name, t in self.trackers.items():
            EXP.export_colmap(folder, t.ms, self.cameras[name], name)

    def save_keyframes_agisoft(self, path: str, camera: str = "SLAM"):
        EXP.save_keyframes_agisoft(path, self.trackers[camera].ms,
                                   self.cameras[camera], camera)

    def save_map(self, path: str, camera: str = "SLAM"):
        EXP.save_map_state(path, self.trackers[camera].ms)

    def load_map(self, path: str, camera: str = "SLAM"):
        self.trackers[camera].ms = EXP.load_map_state(path)

    def save_checkpoint(self, path: str, camera: str = "SLAM"):
        """Full resume checkpoint: map + trajectory + sensors + tracker
        state + System counters (capability the reference stubs,
        System.h:131-134)."""
        EXP.save_checkpoint(
            path, self.trackers[camera],
            system_scalars=(self._frame_counter, self._kfs_since_gba),
        )

    def load_checkpoint(self, path: str, camera: str = "SLAM"):
        sys_scalars = EXP.load_checkpoint(path, self.trackers[camera])
        if sys_scalars is not None:
            self._frame_counter, self._kfs_since_gba = (
                int(x) for x in sys_scalars)

    def save_map_points(self, path: str, camera: str = "SLAM"):
        EXP.save_map_points_tsv(path, self.trackers[camera].ms)

    # --------------------------------------------------------------- shutdown

    def _open_logs(self):
        if not self.config.run_data_dir:
            return
        from hyslam_tpu.utils.telemetry import (
            MappingLog, StageTimer, TrackingLog,
        )

        d = self.config.run_data_dir
        self._tracking_log = TrackingLog(os.path.join(d, "tracking_data.txt"))
        self._mapping_log = MappingLog(
            os.path.join(d, "localmapping_data.txt"))
        self.timer = StageTimer()

    def _close_logs(self):
        if self._tracking_log is not None:
            self._tracking_log.close()
            self._tracking_log = None
        if self._mapping_log is not None:
            self._mapping_log.close()
            self._mapping_log = None

    def shutdown(self):
        """System::Shutdown: flush + join the pipeline threads (synchronous
        mode: no-op), close telemetry logs and refuse further input."""
        if self._pipe is not None:
            self._pipe.join()
            self._pipe = None
        if self._lc_worker is not None:
            self._lc_queue.put(None)
            self._lc_worker.join(timeout=60)
            self._lc_worker = None
        self._shutdown = True
        self._close_logs()

    def reset(self):
        """System::Reset: fresh trackers + reopened telemetry logs (usable
        again after shutdown())."""
        if self._pipe is not None:
            self._pipe.join()
            self._pipe = None
        for name, cc in self.config.cameras.items():
            self.trackers[name] = Tracker(
                cam=self.cameras[name],
                cam_id=list(self.config.cameras).index(name),
                caps=self.config.caps, is_mono=cc.mono, policy=cc.policy,
                opt_info=self.config.optimizer,
                n_levels=cc.extractor.n_levels,
                scale_factor=cc.extractor.scale_factor,
                params=cc.tracking,
            )
        self.loop_closers.clear()
        self._close_logs()
        self._open_logs()
        self._shutdown = False
        if self.config.pipelined:
            from hyslam_tpu.runtime.pipeline import SystemPipeline

            self._pipe = SystemPipeline(self)
        if self._lc_worker is not None:
            self._lc_queue.put(None)
            self._lc_worker.join(timeout=60)
            self._lc_worker = None
        if self.config.async_tracking and self.config.enable_loop_closing:
            self._start_lc_worker()

    # ------------------------------------------------------------------ misc

    def _capacity(self, cc) -> int:
        cap = self.config.caps.F
        if cc.extractor.n_features > cap:
            raise ValueError("feature budget exceeds arena capacity F")
        return cap

    def _init_family(self, camera: str):
        """Cached 3x-feature extractor family used during initialization
        (the extractor_init of the per-camera trio). The budget is capped
        at the arena capacity so frame shapes stay static."""
        if not hasattr(self, "_init_families"):
            self._init_families = {}
        if camera not in self._init_families:
            cc = self.config.cameras[camera]
            n = min(cc.extractor.n_features * cc.init_feature_factor,
                    self.config.caps.F)
            self._init_families[camera] = make_family(
                cc.extractor._replace(n_features=n))
        return self._init_families[camera]

    def _maybe_dump_frame(self, camera: str, gray, feats, every: int = 20):
        """Periodic annotated feature-image dump (ImageProcessing.cpp:87-98
        writes a debug feature image every 20 frames when enabled)."""
        if not self.config.run_data_dir:
            return
        if self.config.async_tracking:
            # the dump forces blocking image+feature fetches mid-stream —
            # the async driver's telemetry lives in tracker.telemetry
            return
        if self._frame_counter % every != 0:
            return
        import numpy as _np
        from hyslam_tpu.viz.draw2d import write_png
        from hyslam_tpu.viz.frame_drawer import draw_frame

        t = self.trackers[camera]
        img = draw_frame(
            _np.asarray(gray), _np.asarray(feats.uv),
            _np.asarray(feats.valid), state=t.state.name,
            n_kfs=int(_np.asarray(t.ms.next_kf)),
            n_landmarks=int(_np.asarray(M_live.n_live_landmarks(t.ms))),
        )
        write_png(os.path.join(
            self.config.run_data_dir,
            f"features_{camera}_{self._frame_counter:06d}.png"), img)
