"""SURF-family feature ops (ops.hessian) + the feature factory
(features.factory) — the reference's second feature family
(SURFExtractor/SURFFactory) re-designed as box-filter DoH + binary Haar."""

import numpy as np
import jax.numpy as jnp
import pytest

from hyslam_tpu.features.extractor import ExtractorConfig
from hyslam_tpu.features.factory import extract_hessian, make_family
from hyslam_tpu.ops.hamming import hamming_pairwise
from hyslam_tpu.ops.hessian import box_filter, doh_response


def _blob_image(h=120, w=160, centers=((40, 60, 4.0), (80, 110, 6.0)),
                seed=0):
    """Gaussian blobs on mild noise — classic Hessian-detector targets."""
    rng = np.random.default_rng(seed)
    yy, xx = np.mgrid[0:h, 0:w].astype(np.float32)
    img = rng.uniform(0, 8, (h, w)).astype(np.float32)
    for (cy, cx, s) in centers:
        img += 200.0 * np.exp(-((yy - cy) ** 2 + (xx - cx) ** 2) / (2 * s * s))
    return img


class TestBoxFilter:
    def test_matches_naive(self):
        rng = np.random.default_rng(0)
        img = rng.uniform(0, 1, (20, 17)).astype(np.float32)
        out = np.asarray(box_filter(jnp.asarray(img), 3, 5))
        # naive centered box sum with zero padding
        pad = np.pad(img, ((1, 1), (2, 2)))
        want = np.zeros_like(img)
        for y in range(20):
            for x in range(17):
                want[y, x] = pad[y:y + 3, x:x + 5].sum()
        np.testing.assert_allclose(out, want, rtol=1e-5, atol=1e-4)


class TestDoH:
    def test_peak_at_blob(self):
        img = _blob_image(centers=((60, 80, 3.0),))
        r = np.array(doh_response(jnp.asarray(img), 9))
        # mask borders, find argmax
        r[:12] = r[-12:] = 0
        r[:, :12] = r[:, -12:] = 0
        y, x = np.unravel_index(np.argmax(r), r.shape)
        assert abs(y - 60) <= 2 and abs(x - 80) <= 2

    def test_scale_selectivity(self):
        """A larger blob responds more strongly at a larger filter size."""
        img = _blob_image(centers=((60, 80, 9.0),))
        r9 = float(np.asarray(doh_response(jnp.asarray(img), 9))[60, 80])
        r27 = float(np.asarray(doh_response(jnp.asarray(img), 27))[60, 80])
        assert r27 > r9


class TestHessianExtractor:
    CFG = ExtractorConfig(n_features=128, family="SURF")

    def test_detects_blobs(self):
        img = jnp.asarray(_blob_image())
        f = extract_hessian(img, self.CFG, capacity=128)
        assert bool(f.valid.any())
        uv = np.asarray(f.uv)[np.asarray(f.valid)]
        d = np.linalg.norm(uv - np.array([60.0, 40.0]), axis=-1).min()
        assert d < 3.0   # blob 1 found
        d2 = np.linalg.norm(uv - np.array([110.0, 80.0]), axis=-1).min()
        assert d2 < 3.0  # blob 2 found

    def test_descriptor_repeatable_under_shift(self):
        """The same physical point yields a nearby descriptor after an
        integer image shift; a random other point does not."""
        img = _blob_image(seed=1)
        f0 = extract_hessian(jnp.asarray(img), self.CFG, capacity=128)
        img_s = np.roll(img, (0, 7), axis=(0, 1))
        f1 = extract_hessian(jnp.asarray(img_s), self.CFG, capacity=128)

        v0 = np.asarray(f0.valid)
        v1 = np.asarray(f1.valid)
        uv0 = np.asarray(f0.uv)[v0]
        uv1 = np.asarray(f1.uv)[v1]
        d0 = np.asarray(f0.desc)[v0]
        d1 = np.asarray(f1.desc)[v1]
        # correspondences: uv1 ~ uv0 + (7, 0)
        match_d = []
        rand_d = []
        rng = np.random.default_rng(0)
        for i in range(len(uv0)):
            err = np.linalg.norm(uv1 - (uv0[i] + [7.0, 0.0]), axis=-1)
            j = int(np.argmin(err))
            if err[j] < 1.5:
                match_d.append(int(np.asarray(hamming_pairwise(
                    jnp.asarray(d0[i:i + 1]), jnp.asarray(d1[j:j + 1])))[0]))
                k = int(rng.integers(0, len(d1)))
                rand_d.append(int(np.asarray(hamming_pairwise(
                    jnp.asarray(d0[i:i + 1]), jnp.asarray(d1[k:k + 1])))[0]))
        assert len(match_d) >= 10
        assert np.mean(match_d) < 0.6 * np.mean(rand_d)
        assert np.mean(match_d) < 60


class TestFactory:
    def test_orb_family(self):
        fam = make_family(ExtractorConfig(n_features=64))
        assert fam.name == "ORB" and fam.th_high == 100.0
        img = jnp.asarray(_blob_image())
        f = fam.extract(img, capacity=64)
        assert bool(f.valid.any())

    def test_surf_family_via_config(self):
        fam = make_family(ExtractorConfig(n_features=64, family="SURF"))
        assert fam.name == "SURF"
        f = fam.extract(jnp.asarray(_blob_image()), capacity=64)
        assert bool(f.valid.any())

    def test_unknown_family_raises(self):
        with pytest.raises(ValueError):
            make_family(ExtractorConfig(family="SIFT"))
