"""Tests for the dataset loaders (io.datasets) and trajectory evaluation
(io.evaluate): a tiny KITTI-odometry / TUM-RGBD tree is synthesized on disk
(PGM images, no cv2/PIL needed) and read back through the real loaders."""

import os

import numpy as np

from hyslam_tpu.io.datasets import KittiOdometry, TumRgbd, _imread_gray
from hyslam_tpu.io.evaluate import ate_rmse, rpe


def _write_pgm(path, img):
    img = np.asarray(img, np.uint8)
    with open(path, "wb") as f:
        f.write(b"P5\n%d %d\n255\n" % (img.shape[1], img.shape[0]))
        f.write(img.tobytes())


def _make_kitti(root, n=4, w=64, h=32):
    seq = os.path.join(root, "sequences", "00")
    os.makedirs(os.path.join(seq, "image_0"))
    os.makedirs(os.path.join(seq, "image_1"))
    os.makedirs(os.path.join(root, "poses"))
    rng = np.random.default_rng(0)
    for i in range(n):
        img = rng.integers(0, 255, (h, w))
        _write_pgm(os.path.join(seq, "image_0", "%06d.pgm" % i), img)
        _write_pgm(os.path.join(seq, "image_1", "%06d.pgm" % i), img)
    np.savetxt(os.path.join(seq, "times.txt"), 0.1 * np.arange(n))
    fx, cx, cy, b = 718.856, 607.19, 185.22, 0.537
    P0 = np.zeros((3, 4))
    P0[0, 0] = P0[1, 1] = fx
    P0[0, 2], P0[1, 2] = cx, cy
    P0[2, 2] = 1.0
    P1 = P0.copy()
    P1[0, 3] = -fx * b
    with open(os.path.join(seq, "calib.txt"), "w") as f:
        for k, P in (("P0", P0), ("P1", P1)):
            f.write(k + ": " + " ".join("%.9e" % v for v in P.ravel()) + "\n")
    # ground truth: camera moving +z (Twc rows are 3x4)
    Twc = np.tile(np.eye(4), (n, 1, 1))
    Twc[:, 2, 3] = 0.5 * np.arange(n)
    np.savetxt(os.path.join(root, "poses", "00.txt"),
               Twc[:, :3, :].reshape(n, 12))
    return Twc


class TestKitti:
    def test_roundtrip(self, tmp_path):
        root = str(tmp_path / "kitti")
        os.makedirs(root)
        Twc = _make_kitti(root)
        ds = KittiOdometry(root, "00")
        assert len(ds) == 4
        c = ds.calib
        assert abs(c.fx - 718.856) < 1e-3
        assert abs(c.bf - 718.856 * 0.537) < 1e-3
        assert (c.width, c.height) == (64, 32)
        frames = list(ds.frames())
        assert frames[0].img_left.shape == (32, 64)
        assert abs(frames[2].timestamp - 0.2) < 1e-9
        # gt loads as Tcw = inv(Twc)
        np.testing.assert_allclose(
            frames[3].gt_Tcw, np.linalg.inv(Twc[3]), atol=1e-5)

    def test_pgm_reader_exact(self, tmp_path):
        img = np.arange(12, dtype=np.uint8).reshape(3, 4)
        p = str(tmp_path / "x.pgm")
        _write_pgm(p, img)
        try:
            import PIL  # noqa: F401
            has_pil = True
        except ImportError:
            has_pil = False
        out = _imread_gray(p)
        if not has_pil:  # PIL path may not read PGM identically; pure path must
            np.testing.assert_array_equal(out, img.astype(np.float32))
        assert out.shape == (3, 4)


class TestTum:
    def test_roundtrip(self, tmp_path):
        root = str(tmp_path / "tum")
        os.makedirs(os.path.join(root, "rgb"))
        os.makedirs(os.path.join(root, "depth"))
        rng = np.random.default_rng(0)
        with open(os.path.join(root, "rgb.txt"), "w") as fr, \
                open(os.path.join(root, "depth.txt"), "w") as fd:
            fr.write("# comment\n")
            fd.write("# comment\n")
            for i in range(3):
                _write_pgm(os.path.join(root, "rgb", "%d.pgm" % i),
                           rng.integers(0, 255, (16, 24)))
                _write_pgm(os.path.join(root, "depth", "%d.pgm" % i),
                           np.full((16, 24), 100))
                fr.write("%.3f rgb/%d.pgm\n" % (0.1 * i, i))
                fd.write("%.3f depth/%d.pgm\n" % (0.1 * i + 0.01, i))
        with open(os.path.join(root, "groundtruth.txt"), "w") as f:
            f.write("# ts tx ty tz qx qy qz qw\n")
            for i in range(3):
                f.write("%.3f %f 0 0 0 0 0 1\n" % (0.1 * i, 0.2 * i))
        ds = TumRgbd(root)
        frames = list(ds.frames())
        assert len(frames) == 3
        i, ts, img, depth = frames[1]
        assert i == 1 and abs(ts - 0.1) < 1e-9
        assert img.shape == (16, 24)
        # depth scaled by 1/5000
        np.testing.assert_allclose(depth, 100 / 5000.0, atol=1e-6)
        assert ds.gt.shape == (3, 8)


class TestEvaluate:
    def _traj(self, n=10):
        Tcw = np.tile(np.eye(4, dtype=np.float32), (n, 1, 1))
        Tcw[:, 2, 3] = -0.3 * np.arange(n)  # forward motion
        return Tcw

    def test_ate_zero_for_identical(self):
        T = self._traj()
        assert ate_rmse(T, T) < 1e-6

    def test_ate_alignment_removes_rigid_offset(self):
        """ATE aligns est to gt (Horn) before the RMSE: a rigidly displaced
        copy of the trajectory scores ~0."""
        T = self._traj()
        off = np.eye(4, dtype=np.float32)
        off[0, 3] = 5.0
        T2 = np.einsum("nij,jk->nik", T, off)
        assert ate_rmse(T2, T) < 1e-4

    def test_ate_detects_noise(self):
        T = self._traj()
        T2 = T.copy()
        T2[:, :3, 3] += np.random.default_rng(0).normal(0, 0.1, (len(T), 3))
        a = ate_rmse(T2, T)
        assert 0.02 < a < 0.3

    def test_rpe_identity(self):
        T = self._traj()
        t_err, r_err = rpe(T, T)
        assert t_err < 1e-6 and r_err < 1e-6


class TestEuroc:
    @staticmethod
    def _make_euroc(root, n=4, w=48, h=32):
        import yaml

        rng = np.random.default_rng(0)
        for cam in ("cam0", "cam1"):
            os.makedirs(os.path.join(root, "mav0", cam, "data"))
        os.makedirs(os.path.join(root, "mav0",
                                 "state_groundtruth_estimate0"))
        fu, fv, cu, cv, baseline = 458.654, 457.296, 367.215, 248.375, 0.11
        for ci, cam in enumerate(("cam0", "cam1")):
            T_BS = np.eye(4)
            T_BS[0, 3] = baseline * ci   # cam1 offset along body x
            with open(os.path.join(root, "mav0", cam, "sensor.yaml"),
                      "w") as f:
                yaml.safe_dump({
                    "intrinsics": [fu, fv, cu, cv],
                    "resolution": [w, h],
                    "T_BS": {"data": T_BS.ravel().tolist()},
                }, f)
            with open(os.path.join(root, "mav0", cam, "data.csv"), "w") as f:
                f.write("#timestamp [ns],filename\n")
                for i in range(n):
                    ts_ns = 1403636579763555580 + i * 50_000_000
                    # cam1 clock offset 1 ms: within the pairing tolerance
                    if ci == 1:
                        ts_ns += 1_000_000
                    fn = "%d.pgm" % i
                    f.write("%d,%s\n" % (ts_ns, fn))
                    _write_pgm(os.path.join(root, "mav0", cam, "data", fn),
                               rng.integers(0, 255, (h, w)))
        with open(os.path.join(root, "mav0", "state_groundtruth_estimate0",
                               "data.csv"), "w") as f:
            f.write("#timestamp, p_RS_R_x [m], ...\n")
            for i in range(n):
                ts_ns = 1403636579763555580 + i * 50_000_000
                # body translating +x, identity orientation (w,x,y,z)
                f.write("%d,%f,0.0,0.0,1.0,0.0,0.0,0.0\n" % (ts_ns, 0.5 * i))
        return fu, baseline

    def test_roundtrip(self, tmp_path):
        from hyslam_tpu.io.datasets import EurocMav

        root = str(tmp_path / "euroc")
        os.makedirs(root)
        fu, baseline = self._make_euroc(root)
        ds = EurocMav(root)
        assert len(ds) == 4
        assert abs(ds.calib.fx - fu) < 1e-3
        assert abs(ds.calib.bf - fu * baseline) < 1e-3
        assert (ds.calib.width, ds.calib.height) == (48, 32)
        frames = list(ds.frames())
        assert frames[0].img_left.shape == (32, 48)
        # timestamps converted ns -> s and increasing by 0.05
        assert abs(frames[1].timestamp - frames[0].timestamp - 0.05) < 1e-6
        # gt: body at x=0.5*i, identity rotation, cam0 = body
        # => Tcw translation is -0.5*i along x
        T = frames[2].gt_Tcw
        np.testing.assert_allclose(T[:3, :3], np.eye(3), atol=1e-6)
        np.testing.assert_allclose(T[0, 3], -1.0, atol=1e-5)

    def test_unpaired_frames_dropped(self, tmp_path):
        from hyslam_tpu.io.datasets import EurocMav

        root = str(tmp_path / "euroc2")
        os.makedirs(root)
        self._make_euroc(root, n=3)
        # corrupt: remove the last cam1 entry so its nearest pair is >max_dt
        p = os.path.join(root, "mav0", "cam1", "data.csv")
        lines = open(p).read().strip().splitlines()
        open(p, "w").write("\n".join(lines[:-1]) + "\n")
        ds = EurocMav(root, max_dt=0.005)
        assert len(ds) == 2
