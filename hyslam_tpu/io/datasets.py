"""Dataset loaders + synthetic sequence generators.

Real-data loaders for the standard benchmarks (KITTI odometry grayscale
stereo, TUM RGB-D, EuRoC) matching the configs in BASELINE.json, plus the
synthetic sequence generator used when no dataset is on disk (this
environment has no network egress; the loaders activate when the user
points them at a local copy)."""

from __future__ import annotations

import os
from dataclasses import dataclass
from typing import Iterator, Optional

import numpy as np


@dataclass
class StereoFrame:
    img_left: np.ndarray
    img_right: np.ndarray
    timestamp: float
    frame_id: int
    gt_Tcw: Optional[np.ndarray] = None


@dataclass
class KittiCalib:
    fx: float
    fy: float
    cx: float
    cy: float
    bf: float
    width: int
    height: int


def _imread_gray(path: str) -> np.ndarray:
    """Minimal PNG/PGM reader (no cv2 dependency): PIL if present, else
    pure-numpy PGM."""
    try:
        from PIL import Image

        return np.asarray(Image.open(path).convert("L"), np.float32)
    except ImportError:
        pass
    if path.endswith((".pgm", ".PGM")):
        with open(path, "rb") as f:
            assert f.readline().strip() == b"P5"
            line = f.readline()
            while line.startswith(b"#"):
                line = f.readline()
            w, h = map(int, line.split())
            maxv = int(f.readline())
            dt = np.uint8 if maxv < 256 else ">u2"
            return np.frombuffer(f.read(), dt).reshape(h, w).astype(np.float32)
    raise RuntimeError(f"no image reader available for {path}")


class KittiOdometry:
    """KITTI odometry sequence reader (dataset_root/sequences/NN with
    image_0, image_1, times.txt, calib.txt; poses from poses/NN.txt)."""

    def __init__(self, root: str, sequence: str = "00"):
        self.seq_dir = os.path.join(root, "sequences", sequence)
        self.left_dir = os.path.join(self.seq_dir, "image_0")
        self.right_dir = os.path.join(self.seq_dir, "image_1")
        self.times = np.loadtxt(os.path.join(self.seq_dir, "times.txt"))
        self.calib = self._load_calib()
        pose_file = os.path.join(root, "poses", sequence + ".txt")
        self.gt = self._load_poses(pose_file) if os.path.exists(pose_file) else None
        self.files = sorted(os.listdir(self.left_dir))

    def _load_calib(self) -> KittiCalib:
        P = {}
        with open(os.path.join(self.seq_dir, "calib.txt")) as f:
            for line in f:
                k, _, v = line.partition(":")
                P[k.strip()] = np.fromstring(v, sep=" ").reshape(3, 4)
        P0, P1 = P["P0"], P["P1"]
        fx = float(P0[0, 0])
        bf = float(-P1[0, 3])  # P1[0,3] = -fx * baseline
        sample = _imread_gray(os.path.join(self.left_dir,
                                           sorted(os.listdir(self.left_dir))[0]))
        h, w = sample.shape
        return KittiCalib(fx=fx, fy=float(P0[1, 1]), cx=float(P0[0, 2]),
                          cy=float(P0[1, 2]), bf=bf, width=w, height=h)

    @staticmethod
    def _load_poses(path: str) -> np.ndarray:
        """poses/NN.txt rows are 3x4 camera-to-world; returns Tcw [N,4,4]."""
        raw = np.loadtxt(path).reshape(-1, 3, 4)
        n = len(raw)
        Twc = np.tile(np.eye(4, dtype=np.float64), (n, 1, 1))
        Twc[:, :3, :] = raw
        return np.linalg.inv(Twc).astype(np.float32)

    def __len__(self):
        return len(self.files)

    def frames(self, start=0, stop=None) -> Iterator[StereoFrame]:
        stop = stop or len(self.files)
        for i in range(start, stop):
            fn = self.files[i]
            yield StereoFrame(
                img_left=_imread_gray(os.path.join(self.left_dir, fn)),
                img_right=_imread_gray(os.path.join(self.right_dir, fn)),
                timestamp=float(self.times[i]),
                frame_id=i,
                gt_Tcw=None if self.gt is None else self.gt[i],
            )


class TumRgbd:
    """TUM RGB-D reader: rgb.txt / depth.txt associations +
    groundtruth.txt (ts tx ty tz qx qy qz qw, camera-to-world)."""

    # default freiburg1 intrinsics
    FX, FY, CX, CY = 517.3, 516.5, 318.6, 255.3
    DEPTH_FACTOR = 5000.0

    def __init__(self, root: str):
        self.root = root
        self.rgb = self._read_list(os.path.join(root, "rgb.txt"))
        self.depth = self._read_list(os.path.join(root, "depth.txt"))
        gt_path = os.path.join(root, "groundtruth.txt")
        self.gt = self._read_gt(gt_path) if os.path.exists(gt_path) else None

    @staticmethod
    def _read_list(path):
        out = []
        with open(path) as f:
            for line in f:
                if line.startswith("#"):
                    continue
                ts, fn = line.split()[:2]
                out.append((float(ts), fn))
        return out

    @staticmethod
    def _read_gt(path):
        rows = []
        with open(path) as f:
            for line in f:
                if line.startswith("#"):
                    continue
                rows.append([float(x) for x in line.split()])
        return np.asarray(rows)

    def frames(self, start=0, stop=None):
        from hyslam_tpu.geometry import so3
        import jax.numpy as jnp

        stop = stop or len(self.rgb)
        di = 0
        for i in range(start, stop):
            ts, fn = self.rgb[i]
            while di + 1 < len(self.depth) and abs(self.depth[di + 1][0] - ts) < abs(
                    self.depth[di][0] - ts):
                di += 1
            img = _imread_gray(os.path.join(self.root, fn))
            dimg = _imread_gray(os.path.join(self.root, self.depth[di][1]))
            yield i, ts, img, dimg / self.DEPTH_FACTOR


def synthetic_stereo_sequence(rng, cam, n_frames=100, step=0.15,
                              yaw_rate=0.003, n_points=3000,
                              extent=(15.0, 8.0, 80.0)):
    """Feature-renderable synthetic stereo world (no dataset required)."""
    from hyslam_tpu.geometry import se3
    import jax.numpy as jnp

    pts = np.stack(
        [rng.uniform(-extent[0], extent[0], n_points),
         rng.uniform(-extent[1], extent[1], n_points),
         rng.uniform(1.5, extent[2], n_points)], -1,
    ).astype(np.float32)
    T = np.eye(4, dtype=np.float32)
    Ts = []
    for i in range(n_frames):
        Ts.append(T.copy())
        delta = np.asarray(se3.exp(jnp.asarray(
            [0, yaw_rate, 0, 0, 0, -step], dtype=jnp.float32)))
        T = (delta @ T).astype(np.float32)
    return pts, np.stack(Ts)
