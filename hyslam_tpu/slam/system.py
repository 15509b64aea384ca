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
import jax.numpy as jnp

from hyslam_tpu.core.frame import FrameFeatures
from hyslam_tpu.features.bow import PlaceRecognizer, train_vocabulary
from hyslam_tpu.features.factory import make_family
from hyslam_tpu.io.config import SystemConfig
from hyslam_tpu.io import export as EXP
from hyslam_tpu.ops.pyramid import to_grayscale
from hyslam_tpu.ops.stereo import match_stereo_refined
from hyslam_tpu.slam.loop_closing import LoopCloser
from hyslam_tpu.slam.tracker import State, Tracker
from hyslam_tpu.slam.global_ba import run_global_ba

VOCAB_TRAIN_KFS = 4   # train the BoW vocabulary once this many KFs exist


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
        if self.config.run_data_dir:
            from hyslam_tpu.utils.telemetry import (
                MappingLog, StageTimer, TrackingLog,
            )

            d = self.config.run_data_dir
            self._tracking_log = TrackingLog(os.path.join(d, "tracking_data.txt"))
            self._mapping_log = MappingLog(
                os.path.join(d, "localmapping_data.txt"))
            self.timer = StageTimer()
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
            )

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
        il = to_grayscale(jnp.asarray(img_left))
        ir = to_grayscale(jnp.asarray(img_right))
        F = self._capacity(cc)
        extract = self._families[camera].extract
        fl = extract(il, capacity=F)
        fr = extract(ir, capacity=F)
        fl = match_stereo_refined(fl, fr, il, ir, bf=cam.bf)
        return self.track_features(fl, timestamp, camera, frame_id,
                                   sensor_data)

    def track_monocular(self, img, timestamp: float, camera: str = "SLAM",
                        frame_id: int | None = None, sensor_data=None):
        cc = self.config.cameras[camera]
        gray = to_grayscale(jnp.asarray(img))
        feats = self._families[camera].extract(
            gray, capacity=self._capacity(cc))
        return self.track_features(feats, timestamp, camera, frame_id,
                                   sensor_data)

    def track_features(self, feats: FrameFeatures, timestamp: float,
                       camera: str = "SLAM", frame_id: int | None = None,
                       sensor_data=None):
        """Feature-level entry (tracking_queue analog)."""
        if self._shutdown:
            raise RuntimeError("System is shut down")
        if frame_id is None:
            frame_id = self._frame_counter
        self._frame_counter += 1
        tracker = self.trackers[camera]
        tel = tracker.track(feats, timestamp, frame_id,
                            sensor_data=sensor_data)
        if self._tracking_log is not None:
            import numpy as _np

            self._tracking_log.log(
                camera, tel, timestamp,
                n_kfs=int(_np.asarray(tracker.ms.next_kf)),
                n_landmarks=int(_np.asarray(tracker.ms.next_lm)),
            )
        if tel.kf_inserted >= 0:
            if self._mapping_log is not None and tel.mapper_stats:
                self._mapping_log.log(camera, tel.kf_inserted,
                                      tel.mapper_stats)
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
                t.state = State.INITIALIZE

    # ----------------------------------------------------------- loop closing

    def _on_new_keyframe(self, camera: str, kf_id: int):
        tracker = self.trackers[camera]
        if self.config.enable_loop_closing and camera == "SLAM":
            closer = self._get_loop_closer(camera)
            if closer is not None:
                ms, closed, info = closer.process_keyframe(tracker.ms, kf_id)
                tracker.ms = ms
                if closed:
                    # reference spawns a GBA thread after CorrectLoop
                    tracker.ms, _ = run_global_ba(
                        tracker.ms, self.cameras[camera], n_iters=10,
                        sensors=tracker.sensors,
                        opt_info=self.config.optimizer,
                    )
        # periodic GBA in non-realtime mode (Mapping::RunGlobalBA cadence)
        self._kfs_since_gba += 1
        if (not self.config.optimizer.realtime
                and self._kfs_since_gba >= self.config.optimizer.gba_interval):
            tracker.ms, _ = run_global_ba(
                tracker.ms, self.cameras[camera],
                sensors=tracker.sensors, opt_info=self.config.optimizer,
            )
            self._kfs_since_gba = 0

    def _get_loop_closer(self, camera: str) -> Optional[LoopCloser]:
        if camera in self.loop_closers:
            return self.loop_closers[camera]
        tracker = self.trackers[camera]
        n_kf = int(np.asarray(tracker.ms.next_kf))
        if n_kf < VOCAB_TRAIN_KFS:
            return None
        if self._vocab is None and self.config.vocab_path:
            # pretrained vocabulary (npz from tools.vocabulary, or a DBoW2
            # text file — System.cc:86 loads the DBoW2 binary voc)
            from hyslam_tpu.features.vocab_io import load_dbow2_text, load_vocabulary

            vp = self.config.vocab_path
            self._vocab = (load_vocabulary(vp) if vp.endswith(".npz")
                           else load_dbow2_text(vp))
        if self._vocab is None:
            # otherwise train on the map's own descriptors
            descs = np.asarray(tracker.ms.kf.desc[:n_kf]).reshape(-1, 8)
            valid = np.asarray(tracker.ms.kf.kp_valid[:n_kf]).reshape(-1)
            self._vocab = train_vocabulary(descs[valid][:20000], k=10, depth=3)
        pr = PlaceRecognizer(self._vocab, K=self.config.caps.K)
        # backfill existing keyframes
        for k in range(n_kf):
            pr.add_keyframe(k, tracker.ms.kf.desc[k], tracker.ms.kf.kp_valid[k])
        closer = LoopCloser(
            cam=self.cameras[camera], recognizer=pr,
            fix_scale=not self.config.cameras[camera].mono,
        )
        self.loop_closers[camera] = closer
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

    def run_imaging_bundle_adjustment(self, imaging_camera: str = "Imaging"):
        """System::RunImagingBundleAdjustment: align + register all imaging
        sub-maps via the SLAM trajectory, then run the trajectory-time BA
        (hyslam_tpu.slam.imaging)."""
        from hyslam_tpu.slam.imaging import run_imaging_ba

        slam = self.trackers["SLAM"]
        imaging = self.trackers[imaging_camera]
        imaging.ms = run_imaging_ba(
            imaging.ms, self.cameras[imaging_camera], slam.traj,
            self.config.cameras[imaging_camera].Tcam,
        )

    # ----------------------------------------------------------------- export

    def save_trajectory(self, path: str, camera: str = "SLAM"):
        t = self.trackers[camera]
        EXP.save_trajectory_tsv(path, t.traj, name=camera)

    def save_trajectory_tum(self, path: str, camera: str = "SLAM"):
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
        state (capability the reference stubs, System.h:131-134)."""
        EXP.save_checkpoint(path, self.trackers[camera])

    def load_checkpoint(self, path: str, camera: str = "SLAM"):
        EXP.load_checkpoint(path, self.trackers[camera])

    def save_map_points(self, path: str, camera: str = "SLAM"):
        EXP.save_map_points_tsv(path, self.trackers[camera].ms)

    # --------------------------------------------------------------- shutdown

    def shutdown(self):
        """System::Shutdown: flush pipelines (synchronous mode: no-op),
        close telemetry logs and refuse further input."""
        self._shutdown = True
        if self._tracking_log is not None:
            self._tracking_log.close()
        if self._mapping_log is not None:
            self._mapping_log.close()

    def reset(self):
        for name, cc in self.config.cameras.items():
            self.trackers[name] = Tracker(
                cam=self.cameras[name],
                cam_id=list(self.config.cameras).index(name),
                caps=self.config.caps, is_mono=cc.mono, policy=cc.policy,
                opt_info=self.config.optimizer,
            )
        self.loop_closers.clear()
        self._shutdown = False

    # ------------------------------------------------------------------ misc

    def _capacity(self, cc) -> int:
        cap = self.config.caps.F
        if cc.extractor.n_features > cap:
            raise ValueError("feature budget exceeds arena capacity F")
        return cap
