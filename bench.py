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

    print(json.dumps({
        "metric": "tracked_frames_per_second_1chip_1280x720_stereo_1000feat",
        "value": round(fps, 2),
        "unit": "frames/s",
        "vs_baseline": round(fps / 60.0, 3),
    }))


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
