"""Frontend tests: FAST vs OpenCV golden masks, ORB descriptor properties,
full extractor on synthetic imagery, Hamming matching kernels."""
import cv2
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from morb_slam_tpu import frontend
from morb_slam_tpu.ops import fast as fast_ops
from morb_slam_tpu.ops import hamming
from morb_slam_tpu.ops import image as image_ops
from morb_slam_tpu.ops import orb_descriptor as orb_desc

RNG = np.random.default_rng(3)


def synthetic_image(h=240, w=320, seed=3):
    """Blurred noise + geometric structure: plenty of corners at all scales."""
    rng = np.random.default_rng(seed)
    img = rng.uniform(0, 255, (h, w)).astype(np.float32)
    img = cv2.GaussianBlur(img, (0, 0), 2.0)
    # add high-contrast squares
    for _ in range(40):
        y, x = rng.integers(10, h - 30), rng.integers(10, w - 30)
        s = rng.integers(5, 20)
        img[y:y + s, x:x + s] = rng.uniform(0, 255)
    return np.clip(img, 0, 255).astype(np.uint8)


class TestFast:
    def test_corner_mask_matches_opencv(self):
        img = synthetic_image()
        th = 20
        det = cv2.FastFeatureDetector_create(
            threshold=th, nonmaxSuppression=False,
            type=cv2.FAST_FEATURE_DETECTOR_TYPE_9_16)
        kps = det.detect(img)
        cv_mask = np.zeros(img.shape, bool)
        for k in kps:
            cv_mask[int(round(k.pt[1])), int(round(k.pt[0]))] = True
        ours = np.asarray(fast_ops.fast_corners(
            jnp.asarray(img, jnp.float32), float(th)))
        inner = np.s_[3:-3, 3:-3]
        np.testing.assert_array_equal(ours[inner], cv_mask[inner])

    def test_score_positive_only_at_corners(self):
        img = jnp.asarray(synthetic_image(), jnp.float32)
        score = fast_ops.fast_score(img)
        corners = fast_ops.fast_corners(img, 20.0)
        assert bool(jnp.all(jnp.where(corners, score > 20.0, True)))

    def test_nms_keeps_local_maxima(self):
        img = jnp.asarray(synthetic_image(), jnp.float32)
        score = fast_ops.fast_score(img)
        nms = np.asarray(fast_ops.nms3(score))
        s = np.asarray(score)
        ys, xs = np.nonzero(nms[3:-3, 3:-3])
        ys, xs = ys + 3, xs + 3
        for y, x in list(zip(ys, xs))[:200]:
            assert s[y, x] >= s[y - 1:y + 2, x - 1:x + 2].max() - 1e-6


class TestDescriptors:
    def test_orientation_equivariance(self):
        """Rotating the image rotates the estimated orientation."""
        img = synthetic_image(128, 128, seed=5).astype(np.float32)
        c = 64
        ang0 = float(orb_desc.compute_orientations(
            jnp.asarray(img), jnp.asarray([[c, c]], jnp.int32))[0])
        for deg in (30, 90, 150):
            M = cv2.getRotationMatrix2D((c, c), -deg, 1.0)  # cv2: CCW positive
            rot = cv2.warpAffine(img, M, (128, 128))
            ang = float(orb_desc.compute_orientations(
                jnp.asarray(rot), jnp.asarray([[c, c]], jnp.int32))[0])
            diff = (ang - ang0 - np.deg2rad(deg) + np.pi) % (2 * np.pi) - np.pi
            assert abs(diff) < 0.15, (deg, ang, ang0)

    def test_descriptor_rotation_invariance(self):
        img = synthetic_image(128, 128, seed=6).astype(np.float32)
        c = 64
        blur = image_ops.gaussian_blur(jnp.asarray(img))
        yx = jnp.asarray([[c, c]], jnp.int32)
        a0 = orb_desc.compute_orientations(jnp.asarray(img), yx)
        d0 = orb_desc.compute_descriptors(blur, yx, a0)
        M = cv2.getRotationMatrix2D((c, c), -45, 1.0)
        rot = cv2.warpAffine(img, M, (128, 128))
        blur_r = image_ops.gaussian_blur(jnp.asarray(rot))
        a1 = orb_desc.compute_orientations(jnp.asarray(rot), yx)
        d1 = orb_desc.compute_descriptors(blur_r, yx, a1)
        dist = int(hamming.hamming_matrix(d0, d1)[0, 0])
        # random descriptors differ by ~128 bits; oriented BRIEF should hold
        assert dist < 55, dist

    def test_descriptor_distinctiveness(self):
        img = synthetic_image(240, 320, seed=7).astype(np.float32)
        blur = image_ops.gaussian_blur(jnp.asarray(img))
        pts = jnp.asarray(RNG.integers(40, 200, (64, 2)), jnp.int32)
        ang = orb_desc.compute_orientations(jnp.asarray(img), pts)
        d = orb_desc.compute_descriptors(blur, pts, ang)
        dist = np.asarray(hamming.hamming_matrix(d, d))
        assert np.all(np.diag(dist) == 0)
        off = dist[~np.eye(64, dtype=bool)]
        assert off.mean() > 80, off.mean()  # far apart on average


class TestExtractor:
    def test_extract_on_synthetic(self):
        img = jnp.asarray(synthetic_image(480, 752), jnp.float32)
        cfg = frontend.OrbConfig(n_features=1200)
        feats = jax.jit(frontend.extract_orb,
                        static_argnames="cfg")(img, cfg)
        n = int(feats.n)
        assert n > 600, n
        uv = np.asarray(feats.uv[np.asarray(feats.valid)])
        assert uv[:, 0].min() >= 0 and uv[:, 0].max() < 752
        assert uv[:, 1].min() >= 0 and uv[:, 1].max() < 480
        # multiple octaves populated
        octs = np.asarray(feats.octave[np.asarray(feats.valid)])
        assert len(np.unique(octs)) >= 4
        # spatial spread: features in all quadrants
        assert (uv[:, 0] < 376).any() and (uv[:, 0] > 376).any()
        assert (uv[:, 1] < 240).any() and (uv[:, 1] > 240).any()

    def test_matching_across_shift(self):
        """Features must match between an image and its shifted copy."""
        base = synthetic_image(240, 320, seed=8)
        shift = 8
        moved = np.roll(base, shift, axis=1)
        cfg = frontend.OrbConfig(n_features=500, n_levels=4)
        f = jax.jit(frontend.extract_orb, static_argnames="cfg")
        fa = f(jnp.asarray(base, jnp.float32), cfg)
        fb = f(jnp.asarray(moved, jnp.float32), cfg)
        dist = hamming.hamming_matrix(fa.desc, fb.desc)
        idx, dbest = hamming.match_nn(dist, fa.valid, fb.valid,
                                      max_dist=50, ratio=0.9)
        m = np.asarray(idx)
        good = 0
        ok = 0
        uva, uvb = np.asarray(fa.uv), np.asarray(fb.uv)
        for i, j in enumerate(m):
            if j < 0:
                continue
            good += 1
            duv = uvb[j] - uva[i]
            if abs(duv[0] - shift) < 2 and abs(duv[1]) < 2:
                ok += 1
        assert good > 100, good
        assert ok / good > 0.9, (ok, good)


class TestHamming:
    def test_matrix_matches_numpy(self):
        a = jnp.asarray(RNG.integers(0, 2 ** 32, (33, 8), dtype=np.uint32))
        b = jnp.asarray(RNG.integers(0, 2 ** 32, (47, 8), dtype=np.uint32))
        ours = np.asarray(hamming.hamming_matrix(a, b))
        an = np.unpackbits(np.asarray(a).view(np.uint8), axis=-1)
        bn = np.unpackbits(np.asarray(b).view(np.uint8), axis=-1)
        ref = (an[:, None, :] != bn[None, :, :]).sum(-1)
        np.testing.assert_array_equal(ours, ref)

    def test_mxu_form_matches_vpu_form(self):
        a = jnp.asarray(RNG.integers(0, 2 ** 32, (128, 8), dtype=np.uint32))
        b = jnp.asarray(RNG.integers(0, 2 ** 32, (96, 8), dtype=np.uint32))
        np.testing.assert_array_equal(
            np.asarray(hamming.hamming_matrix(a, b)),
            np.asarray(hamming.hamming_matrix_mxu(a, b)))

    def test_match_nn_crosscheck(self):
        a = jnp.asarray(RNG.integers(0, 2 ** 32, (10, 8), dtype=np.uint32))
        b = jnp.concatenate([a[5:], a[:2]])  # b = a[5..9] + a[0..1]
        dist = hamming.hamming_matrix(a, b)
        idx, _ = hamming.match_nn(dist, jnp.ones(10, bool), jnp.ones(7, bool),
                                  max_dist=0, ratio=1.0)
        m = np.asarray(idx)
        assert m[5] == 0 and m[9] == 4 and m[0] == 5 and m[1] == 6
        assert all(m[i] == -1 for i in (2, 3, 4))

    def test_rotation_consistency(self):
        n = 100
        idx = jnp.arange(n, dtype=jnp.int32)
        ang_a = jnp.zeros(n)
        ang_b = jnp.zeros(n).at[:5].set(1.5)  # 5 outliers rotated differently
        keep = hamming.rotation_consistency_mask(ang_a, ang_b, idx)
        assert not bool(keep[:5].any())
        assert bool(keep[5:].all())
