"""Threaded pipeline: the reference's 4-thread topology over native queues.

Mirrors SURVEY.md §1: caller thread runs ImageProcessing (device extraction),
pushes feature payloads into a bounded tracking queue (backpressure at
depth 2, System.cc:194); the tracking thread consumes frames and runs the
state machine; keyframes flow to the mapping thread over a second queue
(overflow clearing at depth > 2, Mapping.cpp:285-304).

Because MapState updates are pure functions, the mapper works on a SNAPSHOT
and the tracker adopts the mapper's output at the next frame boundary; the
tracker defers further keyframe insertions while the mapper is busy
(definite insertions wait for completion) — the functional-state translation
of the reference's accepting-input/queue-length protocol. There are no data
races by construction: arrays are immutable, only the `ms` reference is
swapped under the status flags.
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
        self._telemetry = []
        self._t_thread = threading.Thread(target=self._tracking_loop, daemon=True)
        self._m_thread = threading.Thread(target=self._mapping_loop, daemon=True)
        self._t_thread.start()
        self._m_thread.start()

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
        from hyslam_tpu.slam.mapper import (
            cull_landmarks,
            fuse_landmarks,
            local_bundle_adjustment,
            triangulate_new_landmarks,
        )

        while True:
            item = self.mapping_queue.pop()
            if item is None:
                break
            ms, kf_id = item
            # overflow shedding: if more KFs queued, do mandatory-only
            budget = 2 if self.mapping_queue.size() == 0 else 1
            p = self._mapper.params
            ms = cull_landmarks(ms, kf_id, p, self._mapper.is_mono)
            if budget >= 1:
                ms, _ = triangulate_new_landmarks(
                    ms, kf_id, self._mapper.cam, p, self._mapper.is_mono)
                ms, _, _ = fuse_landmarks(ms, kf_id, self._mapper.cam, p)
            if budget >= 2 and self._mapper.kf_count > 2:
                ms, _ = local_bundle_adjustment(ms, kf_id, self._mapper.cam)
            self._mapper.kf_count += 1
            with self._mapper_lock:
                self._mapper_out = ms
            self.status.set("queue_length", self.mapping_queue.size())
            self.status.set("accepting_input", 1)
