"""Run stereo SLAM on a KITTI odometry sequence and report ATE/RPE.

The reference is driven by external apps through HYSLAM::System
(System.h:74); this is that driver for KITTI:

    python examples/run_kitti.py /data/kitti/odometry --sequence 00 \
        --frames 500 --out out_kitti/

Writes trajectory (TUM format), COLMAP export, the map checkpoint, and
prints ATE RMSE / RPE against the ground-truth poses when present.
"""

from __future__ import annotations

import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from hyslam_tpu.core.mapstate import MapCaps
from hyslam_tpu.io.config import CameraConfig, SystemConfig
from hyslam_tpu.io.datasets import KittiOdometry
from hyslam_tpu.io.evaluate import ate_rmse, rpe
from hyslam_tpu.slam.system import System


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("root", help="KITTI odometry root (contains sequences/)")
    ap.add_argument("--sequence", default="00")
    ap.add_argument("--frames", type=int, default=0, help="0 = all")
    ap.add_argument("--out", default="out_kitti")
    ap.add_argument("--viz", action="store_true",
                    help="write map/frame snapshots")
    ap.add_argument("--mode", choices=["async", "pipelined", "sync"],
                    default="async",
                    help="async = the zero-host-sync production driver "
                         "(one fused device program per frame, decisions "
                         "committed commit_lag frames later); pipelined = "
                         "the reference's thread topology; sync = "
                         "deterministic single-thread")
    ap.add_argument("--no-loop", action="store_true",
                    help="disable loop closing (drift baseline / timing "
                         "decomposition)")
    ap.add_argument("--json", default=None,
                    help="write the soak result artifact (fps / ATE / RPE "
                         "/ tracked fraction) to this path")
    args = ap.parse_args(argv)

    ds = KittiOdometry(args.root, args.sequence)
    c = ds.calib
    cfg = SystemConfig(
        caps=MapCaps(K=512, L=32768, F=1024, O=8),
        run_data_dir=os.path.join(args.out, "run_data"),
        # async: the TPU-native production driver (PROFILE_r05.md);
        # pipelined: the reference's 4-thread topology over native queues
        pipelined=args.mode == "pipelined",
        async_tracking=args.mode == "async",
        enable_loop_closing=not args.no_loop,
    )
    # long-sequence arena policy: recycle slots of landmarks that lost all
    # observations once they are orphan_age keyframes old (soaks run
    # thousands of frames through fixed-capacity arenas)
    from hyslam_tpu.slam.mapper import MapperParams

    cfg.mapper = MapperParams(orphan_age=6)
    from hyslam_tpu.slam.keyframe_policy import KeyFramePolicyParams

    cfg.cameras["SLAM"] = CameraConfig(
        fx=c.fx, fy=c.fy, cx=c.cx, cy=c.cy, width=c.width, height=c.height,
        bf=c.bf, th_depth=c.bf / c.fx * 40.0,
        # KITTI-scale scenes run ~70-250 tracked inliers; the default
        # 150/25 target makes every frame "dire" and forces a keyframe per
        # frame (mapper storm), while 90/25 triggers keyframes too late
        # under the async commit lag (measured sawtooth-to-loss on fast
        # turns). 120/25 holds the circuit with zero losses.
        policy=KeyFramePolicyParams(n_tracked_target=120,
                                    n_tracked_variance=25,
                                    max_kf_interval=15),
    )
    slam = System(cfg)
    viewer = None
    if args.viz:
        from hyslam_tpu.viz import Viewer

        viewer = Viewer(out_dir=os.path.join(args.out, "viz"))

    stop = args.frames or None
    est, gt, times = [], [], []
    t0 = time.perf_counter()
    gt_times = []
    for fr in ds.frames(stop=stop):
        tel = slam.track_stereo(fr.img_left, fr.img_right, fr.timestamp)
        times.append(fr.timestamp)
        if fr.gt_Tcw is not None:
            gt.append(fr.gt_Tcw)
            gt_times.append(fr.timestamp)
        if tel is None or args.mode == "async":
            # pipelined/async: poses are read from the re-anchored
            # trajectory at the end — fetching per-frame state here would
            # add a blocking ~23 ms device->host round trip per frame
            if len(times) % 100 == 0:
                print(f"fed {len(times)} frames "
                      f"({time.perf_counter() - t0:.0f}s)", flush=True)
            continue
        tr = slam.trackers["SLAM"]
        est.append(np.asarray(tr.last_Tcw))
        if viewer is not None:
            viewer.update(tr.ms, current_Tcw=tr.last_Tcw)
        if tel.frame_id % 50 == 0:
            print(f"frame {tel.frame_id}: state={tel.state} "
                  f"inliers={tel.n_inliers}", flush=True)
    slam.flush()
    wall = time.perf_counter() - t0
    if not est:
        # pipelined mode: read the (re-anchored) trajectory instead of
        # per-frame poses
        tr = slam.trackers["SLAM"]
        n = int(tr.traj.size)
        est = [np.asarray(tr.traj.Tcw[i]) for i in range(n)]
        if viewer is not None:
            viewer.update(tr.ms, current_Tcw=tr.last_Tcw)

    os.makedirs(args.out, exist_ok=True)
    if args.mode == "async":
        # async path bypasses the TSV telemetry logger (it would force a
        # blocking fetch per frame); dump the committed telemetry here
        with open(os.path.join(args.out, "tracking_async.txt"), "w") as f:
            f.write("frame_id\tstate\tn_motion\tn_inliers\tn_local\tkf\n")
            for t in slam.trackers["SLAM"].telemetry:
                f.write(f"{t.frame_id}\t{t.state}\t{t.n_motion}\t"
                        f"{t.n_inliers}\t{t.n_local}\t{t.kf_inserted}\n")
    slam.save_trajectory_tum(os.path.join(args.out, "trajectory_tum.txt"))
    slam.export_colmap(args.out)
    slam.save_map(os.path.join(args.out, "map.npz"))
    if viewer is not None:
        viewer.snapshot("final")

    n = len(est)
    n_fed = len(times)
    frac = n / max(n_fed, 1)
    print(f"{n_fed} frames in {wall:.1f}s -> {n_fed / wall:.1f} fps "
          f"({n} tracked, {100.0 * frac:.1f}%)")
    report = {"dataset": "kitti", "sequence": args.sequence,
              "mode": args.mode, "frames_fed": n_fed, "frames_tracked": n,
              "tracked_fraction": round(frac, 4),
              "fps": round(n_fed / wall, 2), "wall_s": round(wall, 1)}
    if gt and n > 1:
        if len(gt) != n:
            # pipelined: pair trajectory entries with gt by gt TIMESTAMP
            # (indexing gt with positions from the all-frames list shifts
            # every pairing after a frame without ground truth, ADVICE r3)
            tr = slam.trackers["SLAM"]
            tss = np.asarray(tr.traj.t[:n])
            gts = np.asarray(gt_times)
            idx = np.clip(np.searchsorted(gts, tss), 0, len(gt) - 1)
            # snap to the nearer of the two bracketing gt timestamps
            lo = np.clip(idx - 1, 0, len(gt) - 1)
            idx = np.where(
                np.abs(gts[lo] - tss) < np.abs(gts[idx] - tss), lo, idx)
            gt = [gt[i] for i in idx]
        a = ate_rmse(np.stack(est), np.stack(gt))
        r_t, r_r = rpe(np.stack(est), np.stack(gt))
        print(f"ATE RMSE: {a:.3f} m | RPE: {r_t:.4f} m/frame, "
              f"{r_r:.4f} deg/frame")
        report.update(ate_rmse_m=round(float(a), 4),
                      rpe_trans_m=round(float(r_t), 5),
                      rpe_rot_deg=round(float(r_r), 5))
    if args.json:
        import json

        with open(args.json, "w") as f:
            json.dump(report, f, indent=1)
        print("wrote", args.json)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
