"""Benchmark: tracked frames/s of the full per-frame SLAM front-end on one
chip at the reference's SLAM-camera operating point.

Pipeline measured per frame (the reference's hot path, SURVEY.md §3.2):
stereo ORB extraction (pyramid + FAST + grid select + orientation +
descriptors, both images in one batched program) -> stereo matching +
sub-pixel refinement -> local-map projection matching (4096 landmarks) +
pose-only LM (40 iters), ALL fused into ONE device program per frame
(slam.frontend.track_stereo_frame), with the pallas single-launch pose
kernel on real TPU hardware. One dispatch per frame: on the proxied
runtime dispatch costs ~1 ms, so going from 2 programs to 1 nearly
doubles throughput over round 1.

Operating point: 1280x720 stereo @ 1000 features, 8 levels x1.2
(config/sample_primary_config_file.yaml:27-41). The reference publishes no
fps (BASELINE.md): baseline = its real-time design rate of 60 fps on CPU, so
vs_baseline = fps / 60 (target >= 5).

Runtime note: every device array rides into the jitted stages as an
ARGUMENT — closing over a device array embeds it as a program constant,
and this runtime re-uploads such constants on every dispatch (~390 ms/call
measured in round 1; chained programs with closure constants showed
~220 ms/frame in round 2 profiling). See .claude/skills/verify/SKILL.md.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""

from __future__ import annotations

import json
import sys
import time

import numpy as np


def bench_system_fps(n_warm: int = 24, n_timed: int = 60) -> float:
    """System-level frames/s: the FULL System.track_stereo path — image
    preprocessing + extraction + stereo + tracking state machine + keyframe
    insertion + mapper jobs (triangulate/fuse/cull/local BA) — on a rendered
    1280x720 sequence at 1000 features. This is the reference's hot path
    INCLUDING map maintenance at keyframe rate (VERDICT r2: the fused-kernel
    number alone is not a SLAM-system bench)."""
    import os
    import sys as _sys

    _sys.path.insert(0, os.path.join(os.path.dirname(
        os.path.abspath(__file__)), "tests"))
    import jax
    import jax.numpy as jnp
    from helpers import render_world
    from hyslam_tpu.core.mapstate import MapCaps
    from hyslam_tpu.features.extractor import ExtractorConfig
    from hyslam_tpu.geometry import se3
    from hyslam_tpu.geometry.camera import Camera
    from hyslam_tpu.io.config import CameraConfig, SystemConfig
    from hyslam_tpu.slam.system import System

    H, W = 720, 1280
    cam = Camera(fx=700.0, fy=700.0, cx=W / 2, cy=H / 2, width=W, height=H,
                 bf=84.0, th_depth=35.0)
    cc = CameraConfig(
        fx=cam.fx, fy=cam.fy, cx=cam.cx, cy=cam.cy, width=W, height=H,
        bf=cam.bf, extractor=ExtractorConfig(n_features=1000, n_levels=8),
    )
    sysm = System(SystemConfig(
        cameras={"SLAM": cc}, caps=MapCaps(K=64, L=16384, F=1024, O=8),
        enable_loop_closing=False,
        # the production driver is the reference's 4-thread topology
        # (tracking + mapping over native queues with overflow shedding,
        # System.cc:194 / Mapping.cpp:285-304); the system rate is the
        # tracking-side rate with the mapper running concurrently
        pipelined=True,
    ))

    rng = np.random.default_rng(0)
    pts = np.stack([rng.uniform(-14, 14, 4000), rng.uniform(-9, 9, 4000),
                    rng.uniform(3, 45, 4000)], -1).astype(np.float32)
    T_r_off = np.asarray(se3.from_Rt(
        jnp.eye(3), jnp.asarray([-cam.baseline, 0.0, 0.0])))
    # pre-render all frames so host-side rendering stays out of the timing
    n_total = n_warm + n_timed
    frames = []
    T = np.eye(4, dtype=np.float32)
    for i in range(n_total):
        il, _, _ = render_world(cam, T, pts)
        ir, _, _ = render_world(cam, (T_r_off @ T).astype(np.float32), pts)
        frames.append((il, ir))
        delta = np.asarray(se3.exp(jnp.asarray(
            [0, 0.002, 0, 0, 0, -0.08], dtype=jnp.float32)))
        T = (delta @ T).astype(np.float32)

    for i in range(n_warm):
        sysm.track_stereo(*frames[i], timestamp=0.05 * i, frame_id=i)
    sysm.flush()                       # drain compiles out of the timing
    t0 = time.perf_counter()
    for i in range(n_warm, n_total):
        sysm.track_stereo(*frames[i], timestamp=0.05 * i, frame_id=i)
    sysm.flush()                       # count the mapper's concurrent work
    dt = time.perf_counter() - t0
    return n_timed / dt


def main():
    import jax
    import jax.numpy as jnp
    from hyslam_tpu.features.extractor import ExtractorConfig
    from hyslam_tpu.geometry.camera import Camera
    from hyslam_tpu.slam.frontend import track_stereo_frame

    H, W = 720, 1280
    N_FEATURES = 1000
    F_CAP = 1024
    N_LANDMARKS = 4096
    cam = Camera(fx=700.0, fy=700.0, cx=W / 2, cy=H / 2, width=W, height=H,
                 bf=84.0)
    cfg = ExtractorConfig(n_features=N_FEATURES)

    rng = np.random.default_rng(0)
    # synthetic textured frames (batch of 4 pairs cycled to dodge caching)
    imgs = jnp.asarray(
        rng.uniform(0, 255, (4, 2, H, W)).astype(np.float32)
    )
    lm_pos = jnp.asarray(
        np.stack(
            [rng.uniform(-8, 8, N_LANDMARKS), rng.uniform(-5, 5, N_LANDMARKS),
             rng.uniform(3, 30, N_LANDMARKS)], -1,
        ).astype(np.float32)
    )
    lm_desc = jnp.asarray(
        rng.integers(0, 2**32, (N_LANDMARKS, 8), dtype=np.uint32)
    )
    lm_dist = jnp.linalg.norm(lm_pos, axis=-1)
    lm_normal = lm_pos / lm_dist[:, None]
    lm_maxd = lm_dist * 1.05
    lm_mind = lm_dist / 1.2**8
    lm_valid = jnp.ones(N_LANDMARKS, bool)
    Tcw = jnp.eye(4)

    # The whole frame runs as ONE jitted program; every device array rides
    # in as an argument (no closure constants).
    def frame_step(pair, Tcw0):
        res, _ = track_stereo_frame(
            cam, cfg, F_CAP, pair, Tcw0, lm_pos, lm_normal, lm_desc,
            lm_maxd, lm_mind, lm_valid, th=3.0,
        )
        return res.Tcw, res.n_inliers

    # warmup/compile + steady-state warm (first dispatches are slower on
    # the proxied runtime)
    out = frame_step(imgs[0], Tcw)
    jax.block_until_ready(out)
    for i in range(20):
        out = frame_step(imgs[i % 4], Tcw)
    jax.block_until_ready(out)

    n_frames = 400
    t0 = time.perf_counter()
    for i in range(n_frames):
        out = frame_step(imgs[i % 4], Tcw)
    jax.block_until_ready(out)
    dt = time.perf_counter() - t0
    fps = n_frames / dt

    sys_err = None
    try:
        sys_fps = bench_system_fps()
    except Exception as e:   # record WHY, never a silent 0.0 (VERDICT r3)
        import traceback

        sys_fps = 0.0
        sys_err = f"{e!r} | {traceback.format_exc()[-800:]}"

    out = {
        "metric": "tracked_frames_per_second_1chip_1280x720_stereo_1000feat",
        "value": round(fps, 2),
        "unit": "frames/s",
        "vs_baseline": round(fps / 60.0, 3),
        # full System.track_stereo incl. state machine + keyframe insertion
        # + mapper jobs (local BA etc.) on a rendered sequence — the
        # system-level rate (vs the fused device-program rate above)
        "system_fps": round(sys_fps, 2),
        "system_vs_baseline": round(sys_fps / 60.0, 3),
    }
    if sys_err is not None:
        out["system_error"] = sys_err
    # perf regression gate: the fused front-end's best-known rate is
    # 5199 fps (BENCH_r02); fail loudly below 90% of it so an unexplained
    # regression can't ship silently again (VERDICT r3 weak #4)
    BEST_KNOWN_FPS = 5199.0
    if fps < 0.9 * BEST_KNOWN_FPS:
        out["regression"] = (
            f"fused fps {fps:.0f} < 90% of best-known {BEST_KNOWN_FPS:.0f}")
    print(json.dumps(out))


if __name__ == "__main__":
    try:
        main()
    except Exception as e:  # never leave the driver without a line
        print(json.dumps({
            "metric": "tracked_frames_per_second_1chip_1280x720_stereo_1000feat",
            "value": 0.0,
            "unit": "frames/s",
            "vs_baseline": 0.0,
            "error": str(e)[:200],
        }))
        sys.exit(1)
