"""Threaded pipeline: the reference's 4-thread topology over native queues.

Mirrors SURVEY.md §1: caller thread runs ImageProcessing (device extraction),
pushes feature payloads into a bounded tracking queue (backpressure at
depth 2, System.cc:194); the tracking thread consumes frames and runs the
state machine; keyframes flow to the mapping thread over a second queue
(overflow clearing at depth > 2, Mapping.cpp:285-304). Loop closing +
periodic GBA run on the mapping thread after the per-keyframe jobs (the
reference's separate LoopClosing thread exists to keep LC off the tracking
thread — with jitted device programs one maintenance thread preserves that
property without a third hand-off).

Because MapState updates are pure functions, the mapper works on a SNAPSHOT
and the tracker adopts the mapper's output at the next frame boundary; the
tracker drains the mapper (Tracker.mapping_status.sync) before inserting a
new keyframe so insertions form a linear chain — the functional-state
translation of the reference's accepting-input/queue-length protocol
(InterThread.h:37-89). There are no data races by construction: arrays are
immutable, only the `ms` reference is swapped under the status flags.

`SystemPipeline` is the production driver (System(config.pipelined=True));
`PipelinedTracker` is the single-tracker building block used by the
runtime tests.
"""

from __future__ import annotations

import threading
import time
from dataclasses import dataclass

from hyslam_tpu.runtime.native import NativeQueue, ThreadStatus


@dataclass
class FramePayload:
    feats: object
    timestamp: float
    frame_id: int
    camera: str = "SLAM"
    sensor_data: object = None


class _MappingStatus:
    """Tracker-facing view of the mapping stage (Tracker.mapping_status)."""

    def __init__(self, pipe, camera: str):
        self._pipe = pipe
        self._camera = camera

    def idle(self) -> bool:
        return (self._pipe.mapping_queue.size() == 0
                and not self._pipe._mapper_busy)

    def queue_len(self) -> int:
        return self._pipe.mapping_queue.size() + int(self._pipe._mapper_busy)

    def sync(self, tracker) -> None:
        self._pipe.drain_mapping(self._camera)


class SystemPipeline:
    """The reference's thread topology lifted to the System level: ONE
    tracking thread runs all cameras' state machines (like Tracking::Run),
    ONE mapping thread runs per-keyframe jobs + loop closing + periodic GBA
    on map snapshots. The caller thread does ImageProcessing (extraction)
    and feeds the bounded tracking queue (System.cc:125-159)."""

    def __init__(self, system, tracking_depth: int = 2,
                 mapping_depth: int = 3):
        self.sys = system
        self.tracking_queue = NativeQueue(tracking_depth)
        self.mapping_queue = NativeQueue(mapping_depth)
        self.status = ThreadStatus()
        self._adopt = {}            # camera -> (ms, map_moved)
        self._orig_integrate = {}   # camera -> Mapper.integrate_keyframe
        self._lock = threading.Lock()
        self._idle_cv = threading.Condition(self._lock)
        self._mapper_busy = False
        self._pending_frames = 0    # fed but not yet fully tracked
        self._error = None
        self.telemetry = []
        for name, tracker in system.trackers.items():
            tracker.mapping_status = _MappingStatus(self, name)
            self._patch_mapper(tracker, name)
        self._t_thread = threading.Thread(
            target=self._tracking_loop, daemon=True, name="hyslam-tracking")
        self._m_thread = threading.Thread(
            target=self._mapping_loop, daemon=True, name="hyslam-mapping")
        self._t_thread.start()
        self._m_thread.start()

    # -- caller side ----------------------------------------------------------

    def feed(self, camera, feats, timestamp, frame_id, sensor_data=None):
        """Blocking push with backpressure (the caller-side spin while
        tracking_queue.size() > depth, System.cc:194)."""
        if self._error is not None:
            raise RuntimeError(f"pipeline thread died: {self._error!r}")
        with self._idle_cv:
            self._pending_frames += 1
        if not self.tracking_queue.push(
                FramePayload(feats, timestamp, frame_id, camera,
                             sensor_data)):
            # queue closed: undo the accounting so drain_all cannot stall
            # on a frame that never entered the pipeline (ADVICE r3)
            with self._idle_cv:
                self._pending_frames -= 1
                self._idle_cv.notify_all()
            raise RuntimeError("tracking queue is closed; frame rejected")

    def join(self):
        """Flush both stages and stop the threads (System::Shutdown)."""
        self.tracking_queue.close()
        self._t_thread.join(timeout=600)
        self.mapping_queue.close()
        self._m_thread.join(timeout=600)
        for name in self.sys.trackers:
            self._adopt_for(name)
        if self._error is not None:
            raise RuntimeError(f"pipeline thread died: {self._error!r}")
        return self.telemetry

    def drain_mapping(self, camera: str, timeout: float = 600.0):
        """Block until the mapping stage is empty and idle, then adopt its
        output for `camera` (called from the tracking thread before a
        keyframe insertion, and by tests)."""
        deadline = time.monotonic() + timeout
        with self._idle_cv:
            while (self.mapping_queue.size() > 0 or self._mapper_busy):
                if self._error is not None:
                    # surface the stored exception instead of stalling for
                    # the full timeout on a dead mapping thread (ADVICE r3)
                    raise RuntimeError(
                        f"pipeline thread died: {self._error!r}")
                if not self._idle_cv.wait(timeout=max(
                        0.0, deadline - time.monotonic())):
                    raise TimeoutError("mapping stage did not drain")
        self._adopt_for(camera)

    # -- tracking thread ------------------------------------------------------

    def _patch_mapper(self, tracker, camera: str):
        mapper = tracker.mapper
        self._orig_integrate[camera] = mapper.integrate_keyframe

        def deferred_integrate(ms, kf_id, **kw):
            # mandatory, cheap part stays inline so tracking sees fresh
            # covisibility (ProcessNewKeyFrame); optional jobs + loop
            # closing go to the mapping thread
            from hyslam_tpu.core import mapstate as M

            ms = M.refresh_covisibility(ms)
            ms = M.compute_spanning_parents(ms)
            ms = M.update_landmark_stats(ms)
            with self._lock:
                self._mapper_busy = True
            self.status.set("accepting_input", 0)
            self.status.set("queue_length", self.mapping_queue.size() + 1)
            self.mapping_queue.push((camera, ms, kf_id, kw))
            return ms, {"deferred": True}

        mapper.integrate_keyframe = deferred_integrate

    def _adopt_for(self, camera: str):
        with self._lock:
            out = self._adopt.pop(camera, None)
        if out is None:
            return
        ms, moved = out
        tracker = self.sys.trackers[camera]
        tracker.ms = ms
        if moved:
            self.sys._refresh_trajectory(camera)

    def drain_all(self, timeout: float = 600.0):
        """Block until both stages are empty and idle, then adopt all
        pending map snapshots (System.flush)."""
        deadline = time.monotonic() + timeout
        with self._idle_cv:
            while (self._pending_frames > 0
                   or self.mapping_queue.size() > 0 or self._mapper_busy):
                if self._error is not None:
                    raise RuntimeError(
                        f"pipeline thread died: {self._error!r}")
                if not self._idle_cv.wait(timeout=max(
                        0.0, deadline - time.monotonic())):
                    raise TimeoutError("pipeline did not drain")
        for name in self.sys.trackers:
            self._adopt_for(name)

    def _tracking_loop(self):
        try:
            while True:
                payload = self.tracking_queue.pop()
                if payload is None:
                    break
                self._adopt_for(payload.camera)
                tel = self.sys._track_features_inline(
                    payload.feats, payload.timestamp, payload.camera,
                    payload.frame_id, payload.sensor_data,
                    defer_maintenance=True,
                )
                self.telemetry.append(tel)
                with self._idle_cv:
                    self._pending_frames -= 1
                    self._idle_cv.notify_all()
        except BaseException as e:   # surface thread death to the caller
            self._error = e
            with self._idle_cv:
                self._pending_frames = 0
                self._idle_cv.notify_all()
        finally:
            self.status.set("finished", 1)

    # -- mapping thread -------------------------------------------------------

    def _mapping_loop(self):
        try:
            while True:
                item = self.mapping_queue.pop()
                if item is None:
                    break
                camera, ms, kf_id, kw = item
                tracker = self.sys.trackers[camera]
                mapper = tracker.mapper
                # overflow shedding: if more KFs are queued, run only the
                # mandatory jobs (Mapping.cpp:285-304 / budget_level)
                budget = 2 if self.mapping_queue.size() == 0 else 1
                ms, _ = self._orig_integrate[camera](
                    ms, kf_id, budget_level=budget,
                    sensors=kw.get("sensors"), opt_info=kw.get("opt_info"))
                # loop closing + periodic GBA (the maintenance the sync
                # path runs in System._on_new_keyframe)
                ms, moved = self.sys._maintain_map(camera, ms, kf_id)
                with self._idle_cv:
                    self._adopt[camera] = (ms, moved)
                    self._mapper_busy = (self.mapping_queue.size() > 0)
                    self.status.set("queue_length", self.mapping_queue.size())
                    self.status.set("accepting_input", 1)
                    self._idle_cv.notify_all()
        except BaseException as e:
            self._error = e
            # unblock producers and close the queue so drain waiters fail
            # fast instead of timing out (ADVICE r3)
            self.mapping_queue.close()
            with self._idle_cv:
                self._mapper_busy = False
                self._idle_cv.notify_all()


class _TrackerMappingStatus:
    """Tracker-facing mapping view for PipelinedTracker (same protocol as
    SystemPipeline's _MappingStatus): sync() drains the mapper and adopts
    its map BEFORE a keyframe insertion so insertions form a linear chain —
    a KF inserted on a snapshot the mapper never saw would be lost at
    adoption (its arena slot later reallocated, silently corrupting
    trajectory re-anchoring)."""

    def __init__(self, pipe):
        self._pipe = pipe

    def idle(self) -> bool:
        return (self._pipe.mapping_queue.size() == 0
                and not self._pipe._mapper_busy)

    def queue_len(self) -> int:
        return self._pipe.mapping_queue.size() + int(self._pipe._mapper_busy)

    def sync(self, tracker) -> None:
        self._pipe.drain_mapping()


class PipelinedTracker:
    """Runs a hyslam_tpu.slam.tracker.Tracker across tracking + mapping
    threads with native queues. Synchronous results available via join()."""

    def __init__(self, tracker, tracking_depth: int = 2, mapping_depth: int = 3):
        self.tracker = tracker
        # detach the tracker's inline mapper: the pipeline owns it
        self._mapper = tracker.mapper
        self.tracking_queue = NativeQueue(tracking_depth)
        self.mapping_queue = NativeQueue(mapping_depth)
        self.status = ThreadStatus()
        self._mapper_out = None
        self._mapper_lock = threading.Lock()
        self._idle_cv = threading.Condition(self._mapper_lock)
        self._mapper_busy = False
        self._telemetry = []
        tracker.mapping_status = _TrackerMappingStatus(self)
        self._t_thread = threading.Thread(target=self._tracking_loop, daemon=True)
        self._m_thread = threading.Thread(target=self._mapping_loop, daemon=True)
        self._t_thread.start()
        self._m_thread.start()

    def drain_mapping(self, timeout: float = 600.0):
        """Block until the mapping stage is idle, then adopt its output."""
        deadline = time.monotonic() + timeout
        with self._idle_cv:
            while self.mapping_queue.size() > 0 or self._mapper_busy:
                if not self._idle_cv.wait(timeout=max(
                        0.0, deadline - time.monotonic())):
                    raise TimeoutError("mapping stage did not drain")
        self._adopt_mapper_output()

    # -- caller side ---------------------------------------------------------

    def feed(self, feats, timestamp: float, frame_id: int):
        """Blocking push with backpressure (caller-side spin analog)."""
        self.tracking_queue.push(FramePayload(feats, timestamp, frame_id))

    def join(self):
        """Flush both stages and stop the threads (System::Shutdown)."""
        self.tracking_queue.close()
        self._t_thread.join(timeout=600)
        self.mapping_queue.close()
        self._m_thread.join(timeout=600)
        self._adopt_mapper_output()
        return self._telemetry

    # -- tracking thread -----------------------------------------------------

    def _adopt_mapper_output(self):
        with self._mapper_lock:
            if self._mapper_out is not None:
                self.tracker.ms = self._mapper_out
                self._mapper_out = None

    def _tracking_loop(self):
        tr = self.tracker
        # monkey-patch the tracker's inline keyframe integration: the
        # pipeline routes mapping work to the mapping thread instead
        orig_integrate = self._mapper.integrate_keyframe

        def deferred_integrate(ms, kf_id, **kw):
            # mandatory, cheap part stays inline so tracking sees fresh
            # covisibility; optional jobs go to the mapping thread
            from hyslam_tpu.core import mapstate as M

            ms = M.refresh_covisibility(ms)
            ms = M.compute_spanning_parents(ms)
            ms = M.update_landmark_stats(ms)
            with self._mapper_lock:
                self._mapper_busy = True
            self.status.set("queue_length", self.mapping_queue.size() + 1)
            self.status.set("accepting_input", 0)
            self.mapping_queue.push((ms, kf_id))
            return ms, {"deferred": True}

        self._mapper.integrate_keyframe = deferred_integrate
        try:
            while True:
                payload = self.tracking_queue.pop()
                if payload is None:
                    break
                # adopt mapper output at the frame boundary; while the
                # mapper is busy, suppress further (optional) keyframes
                if self.status.accepting_input:
                    self._adopt_mapper_output()
                tel = tr.track(payload.feats, payload.timestamp, payload.frame_id)
                self._telemetry.append(tel)
        finally:
            self._mapper.integrate_keyframe = orig_integrate
            self.status.set("finished", 1)

    # -- mapping thread ------------------------------------------------------

    def _mapping_loop(self):
        while True:
            item = self.mapping_queue.pop()
            if item is None:
                break
            ms, kf_id = item
            # overflow shedding: if more KFs queued, do mandatory-only
            budget = 2 if self.mapping_queue.size() == 0 else 1
            ms, _ = type(self._mapper).integrate_keyframe(
                self._mapper, ms, kf_id, budget_level=budget)
            with self._idle_cv:
                self._mapper_out = ms
                self._mapper_busy = (self.mapping_queue.size() > 0)
                self.status.set("queue_length", self.mapping_queue.size())
                self.status.set("accepting_input", 1)
                self._idle_cv.notify_all()
