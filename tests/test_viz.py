"""Headless visualization layer (src/viz parity): frame annotation, map
rendering, PNG writing, viewer loop."""

import os
import zlib
import struct

import numpy as np
import jax.numpy as jnp
import pytest

from hyslam_tpu.viz import FrameDrawer, MapDrawer, Viewer, draw_frame, \
    draw_map, write_png
from hyslam_tpu.viz.draw2d import blank, draw_points, draw_segments, draw_text


def _read_png_header(path):
    with open(path, "rb") as f:
        data = f.read()
    assert data[:8] == b"\x89PNG\r\n\x1a\n"
    w, h = struct.unpack(">II", data[16:24])
    return w, h, data


class TestDraw2D:
    def test_points_and_segments(self):
        img = blank(50, 60)
        draw_points(img, np.array([[10.0, 20.0]]), (255, 0, 0), radius=1)
        assert tuple(img[20, 10]) == (255, 0, 0)
        draw_segments(img, np.array([[0.0, 0.0]]), np.array([[59.0, 0.0]]),
                      (0, 255, 0))
        assert tuple(img[0, 30]) == (0, 255, 0)

    def test_out_of_bounds_safe(self):
        img = blank(20, 20)
        draw_points(img, np.array([[-5.0, 100.0], [19.0, 19.0]]), (9, 9, 9))
        assert tuple(img[19, 19]) == (9, 9, 9)

    def test_text_renders_pixels(self):
        img = blank(20, 120)
        draw_text(img, "KFS: 12", 2, 2, (255, 255, 255))
        assert (img == 255).any()

    def test_png_roundtrip_decodable(self, tmp_path):
        img = blank(16, 24, (10, 200, 30))
        p = str(tmp_path / "x.png")
        write_png(p, img)
        w, h, data = _read_png_header(p)
        assert (w, h) == (24, 16)
        # IDAT decompresses to h*(1+w*3) filtered bytes
        idat_start = data.index(b"IDAT") + 4
        idat_len = struct.unpack(">I", data[idat_start - 8:idat_start - 4])[0]
        raw = zlib.decompress(data[idat_start:idat_start + idat_len])
        assert len(raw) == 16 * (1 + 24 * 3)
        assert raw[1:4] == bytes([10, 200, 30])


class TestFrameDrawer:
    def test_annotates_matches_and_statusbar(self):
        rng = np.random.default_rng(0)
        img = rng.uniform(0, 255, (120, 160)).astype(np.float32)
        uv = rng.uniform(5, 100, (32, 2)).astype(np.float32)
        valid = np.ones(32, bool)
        lm = np.where(np.arange(32) < 10, np.arange(32), -1)
        out = draw_frame(img, uv, valid, lm, state="NORMAL",
                         n_kfs=4, n_landmarks=200)
        assert out.shape == (120 + 22, 160, 3)
        # green match markers present
        green = (out[..., 1] > 200) & (out[..., 0] < 100)
        assert green.sum() >= 10

    def test_init_match_lines(self):
        uv_ref = np.array([[10.0, 10.0], [50.0, 50.0]], np.float32)
        uv = np.array([[30.0, 10.0], [70.0, 50.0]], np.float32)
        out = draw_frame(np.zeros((80, 100)), uv, np.ones(2, bool),
                         init_uv_ref=uv_ref, init_matches=np.array([0, 1]))
        # line pixels between the pairs
        assert (out[10, 10:30, 1] > 200).any()

    def test_stateful_update_draw(self):
        fd = FrameDrawer()
        assert fd.draw() is None
        fd.update(np.zeros((40, 60)), np.array([[5.0, 5.0]]),
                  np.ones(1, bool), np.array([3]), "NORMAL", 1, 10)
        assert fd.draw().shape == (62, 60, 3)


class TestMapDrawer:
    def _small_map(self):
        from hyslam_tpu.core.mapstate import MapCaps, empty_map_state
        from hyslam_tpu.core import mapstate as M
        from hyslam_tpu.core.frame import empty_features

        caps = MapCaps(K=8, L=64, F=32, O=4)
        ms = empty_map_state(caps)
        feats = empty_features(caps.F)
        for k in range(3):
            T = np.eye(4, dtype=np.float32)
            T[2, 3] = -0.5 * k
            ms, _ = M.add_keyframe(ms, feats, jnp.asarray(T), float(k), k, 0,
                                   jnp.full((caps.F,), -1, jnp.int32))
        rng = np.random.default_rng(0)
        pos = np.stack([rng.uniform(-2, 2, 20), rng.uniform(-2, 2, 20),
                        rng.uniform(2, 6, 20)], -1).astype(np.float32)
        ms = ms._replace(lm=ms.lm._replace(
            pos=ms.lm.pos.at[:20].set(jnp.asarray(pos)),
            valid=ms.lm.valid.at[:20].set(True),
        ))
        return ms

    def test_renders_scene(self):
        ms = self._small_map()
        img = draw_map(ms, size=(320, 240),
                       current_Tcw=np.eye(4, dtype=np.float32))
        assert img.shape == (240, 320, 3)
        # something was drawn beyond the background
        assert (img != img[0, 0]).any()

    def test_follow_mode(self):
        ms = self._small_map()
        md = MapDrawer(size=(160, 120), follow=True)
        img = md.draw(ms, current_Tcw=np.eye(4, dtype=np.float32),
                      trajectory_centers=np.array([[0, 0, 0], [0, 0, 0.5],
                                                   [0, 0, 1.0]], np.float32))
        assert img.shape == (120, 160, 3)

    def test_empty_map_safe(self):
        from hyslam_tpu.core.mapstate import MapCaps, empty_map_state

        ms = empty_map_state(MapCaps(K=4, L=16, F=8, O=2))
        img = draw_map(ms, size=(64, 48))
        assert img.shape == (48, 64, 3)


class TestViewer:
    def test_update_snapshot_and_debug_dump(self, tmp_path):
        fdir = str(tmp_path / "viz")
        v = Viewer(out_dir=fdir, dump_every=2)
        ms = TestMapDrawer()._small_map()
        img = np.zeros((40, 60), np.float32)
        uv = np.array([[5.0, 5.0], [20.0, 20.0]], np.float32)
        for i in range(4):
            v.update(ms, current_Tcw=np.eye(4, dtype=np.float32), img=img,
                     uv=uv, feat_valid=np.ones(2, bool),
                     lm_id=np.array([0, -1]), state="NORMAL")
        dumps = [f for f in os.listdir(fdir) if f.startswith("features_")]
        assert len(dumps) == 2  # every 2nd frame
        paths = v.snapshot()
        assert len(paths) == 2
        for p in paths:
            assert os.path.getsize(p) > 100

    def test_threaded_loop(self, tmp_path):
        import time

        v = Viewer(out_dir=str(tmp_path / "loop"), fps=20.0)
        ms = TestMapDrawer()._small_map()
        v.update(ms, current_Tcw=np.eye(4, dtype=np.float32))
        v.start()
        time.sleep(0.8)
        v.stop()
        files = os.listdir(str(tmp_path / "loop"))
        assert len(files) >= 1  # loop rendered and stop() joined cleanly
