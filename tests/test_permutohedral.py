"""Permutohedral-lattice Gaussian filtering (ops/permutohedral.py) and the
DenseCRF mean-field built on it (ops/seg.dense_crf).

The reference's densecrf submodule is empty upstream (crf_op.cc wraps
code that cannot build there), so the anchor here is the published
algorithm itself: the lattice filter is pinned against brute-force
O(N^2) Gaussian filtering, and the mean-field against a literal numpy
transcription of the Krähenbühl–Koltun update."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from nafwebsod_tpu.ops import permutohedral as ph
from nafwebsod_tpu.ops import seg


def _grid_features(h, w, sigma_s, image=None, sigma_r=None):
    ys, xs = np.mgrid[0:h, 0:w].astype(np.float32)
    f = np.stack([xs, ys], -1).reshape(-1, 2) / sigma_s
    if image is not None:
        f = np.concatenate([f, image.reshape(-1, 3) / sigma_r], -1)
    return f.astype(np.float32)


def _smooth_image(h, w, seed=0):
    rng = np.random.RandomState(seed)
    img = rng.rand(h, w, 3).astype(np.float32) * 255
    # separable smoothing (repeated [1,2,1]/4 ~ sigma 3) so colors form a
    # smooth manifold — the regime the CRF actually filters in
    k = np.array([0.25, 0.5, 0.25], np.float32)
    for _ in range(9):
        for ax in (0, 1):
            img = np.apply_along_axis(
                lambda r: np.convolve(r, k, mode='same'), ax, img)
    return img.astype(np.float32)


def _brute_normalized(f, v):
    d2 = ((f[:, None, :] - f[None, :, :]) ** 2).sum(-1)
    kmat = np.exp(-0.5 * d2)
    dn = 1.0 / np.sqrt(kmat.sum(1))
    return dn[:, None] * (kmat @ (dn[:, None] * v))


class TestLatticeVsBruteForce:
    def test_spatial_d2(self):
        h = w = 24
        rng = np.random.RandomState(1)
        f = _grid_features(h, w, sigma_s=3.0)
        v = rng.rand(h * w, 4).astype(np.float32)
        out, _ = ph.gaussian_filter(jnp.asarray(v), jnp.asarray(f))
        ref = _brute_normalized(f, v)
        rel = np.abs(np.asarray(out) - ref) / (np.abs(ref) + 1e-6)
        assert rel.mean() < 0.02, rel.mean()
        assert rel.max() < 0.10, rel.max()

    def test_bilateral_d5(self):
        h = w = 24
        rng = np.random.RandomState(2)
        img = _smooth_image(h, w)
        f = _grid_features(h, w, sigma_s=5.0, image=img, sigma_r=13.0)
        v = rng.rand(h * w, 4).astype(np.float32)
        out, _ = ph.gaussian_filter(jnp.asarray(v), jnp.asarray(f))
        ref = _brute_normalized(f, v)
        rel = np.abs(np.asarray(out) - ref) / (np.abs(ref) + 1e-6)
        # published accuracy class of the lattice approximation at d=5
        assert rel.mean() < 0.05, rel.mean()
        assert np.quantile(rel, 0.99) < 0.15

    def test_lattice_reuse_matches_fresh_build(self):
        f = _grid_features(12, 12, sigma_s=2.0)
        v1 = np.random.RandomState(3).rand(144, 2).astype(np.float32)
        v2 = np.random.RandomState(4).rand(144, 2).astype(np.float32)
        out1, lat = ph.gaussian_filter(jnp.asarray(v1), jnp.asarray(f))
        out2, _ = ph.gaussian_filter(jnp.asarray(v2), None, lattice=lat)
        fresh2, _ = ph.gaussian_filter(jnp.asarray(v2), jnp.asarray(f))
        np.testing.assert_allclose(np.asarray(out2), np.asarray(fresh2),
                                   rtol=1e-5, atol=1e-6)
        assert not np.allclose(np.asarray(out1), np.asarray(out2))

    def test_jittable(self):
        f = _grid_features(10, 10, sigma_s=2.0)
        v = np.random.RandomState(5).rand(100, 3).astype(np.float32)

        @jax.jit
        def run(vv, ff):
            out, _ = ph.gaussian_filter(vv, ff)
            return out

        eager, _ = ph.gaussian_filter(jnp.asarray(v), jnp.asarray(f))
        np.testing.assert_allclose(np.asarray(run(jnp.asarray(v),
                                                  jnp.asarray(f))),
                                   np.asarray(eager), rtol=1e-5, atol=1e-6)


def _numpy_mean_field(unary, feats_list, weights, iters):
    """Literal KK mean-field with EXACT brute-force kernels."""
    c = unary.shape[0]
    u = unary.reshape(c, -1).T
    q = np.exp(-u - (-u).max(1, keepdims=True))
    q /= q.sum(1, keepdims=True)
    mats = []
    for f in feats_list:
        d2 = ((f[:, None, :] - f[None, :, :]) ** 2).sum(-1)
        kmat = np.exp(-0.5 * d2)
        dn = 1.0 / np.sqrt(kmat.sum(1))
        mats.append(dn[:, None] * kmat * dn[None, :])
    for _ in range(iters):
        msg = sum(wk * (mk @ q) for wk, mk in zip(weights, mats))
        e = -u + msg
        q = np.exp(e - e.max(1, keepdims=True))
        q /= q.sum(1, keepdims=True)
    return q.T.reshape(unary.shape)


class TestDenseCRF:
    def test_mean_field_matches_numpy_oracle(self):
        """dense_crf == the literal KK update with exact kernels, up to the
        lattice filter's approximation error."""
        c, h, w = 3, 16, 16
        rng = np.random.RandomState(6)
        img = _smooth_image(h, w, seed=7)
        probs = rng.dirichlet(np.ones(c), size=h * w).T.reshape(
            c, h, w).astype(np.float32)
        unary = -np.log(np.maximum(probs, 1e-4))

        out = np.asarray(seg.dense_crf(
            jnp.asarray(unary), jnp.asarray(img), num_iters=5))

        scale = 500.0 / max(h, w)
        f_pos = _grid_features(h, w, sigma_s=3.0 / scale)
        f_bi = _grid_features(h, w, sigma_s=80.0 / scale, image=img,
                              sigma_r=13.0)
        ref = _numpy_mean_field(unary, [f_pos, f_bi], [3.0, 10.0], iters=5)
        assert out.shape == ref.shape
        np.testing.assert_allclose(out.sum(0), np.ones((h, w)), rtol=1e-4)
        # probabilities to the lattice approximation tolerance; argmax
        # labels agree except near ties (the Dirichlet unary has many —
        # a ~2% filter error legitimately flips those)
        agree = (out.argmax(0) == ref.argmax(0)).mean()
        assert agree > 0.90, agree
        # mean-field polarizes probs to ~one-hot, so each tie flip costs
        # ~2/C of abs error — use the median, which ignores the flipped
        # tail and pins the bulk agreement tightly
        assert np.median(np.abs(out - ref)) < 0.005

    def test_gaussian_only_limit_matches_separable_blur_path(self):
        """With the bilateral term off, one mean-field step's message is a
        normalized spatial Gaussian — the same operator the previous
        separable-blur implementation applied (its kernel was normalized
        to sum 1). Compare the resulting single-step distributions on
        interior pixels (the two differ at borders: truncated 'same'
        convolution vs the lattice's exact normalization)."""
        c, h, w = 3, 24, 24
        rng = np.random.RandomState(8)
        probs = rng.dirichlet(np.ones(c), size=h * w).T.reshape(
            c, h, w).astype(np.float32)
        unary = -np.log(np.maximum(probs, 1e-4))
        img = np.zeros((h, w, 3), np.float32)

        pos_sigma = 3.0  # pass size_std so scale_factor == 1
        out = np.asarray(seg.dense_crf(
            jnp.asarray(unary), jnp.asarray(img), num_iters=1,
            pos_w=3.0, pos_std=pos_sigma, bi_w=0.0, size_std=float(max(h, w))))

        q0 = jax.nn.softmax(jnp.asarray(-unary), axis=0)
        msg = 3.0 * seg._gaussian_blur(q0, pos_sigma)
        old = np.asarray(jax.nn.softmax(jnp.asarray(-unary) + msg, axis=0))
        inner = (slice(None), slice(6, -6), slice(6, -6))
        assert np.abs(out[inner] - old[inner]).mean() < 0.01
        assert np.abs(out[inner] - old[inner]).max() < 0.06

    def test_bf16_filter_dtype_matches_f32(self):
        """filter_dtype=bfloat16 (the TPU bandwidth path for the bilateral
        lattice) must stay within bf16 rounding of the f32 CRF: the
        output is a stop-gradient'd pseudo-label target in the deeplab
        family, so agreement is a target-quality bound, not bit parity."""
        c, h, w = 4, 20, 20
        rng = np.random.RandomState(3)
        img = _smooth_image(h, w, seed=5)
        probs = rng.dirichlet(np.ones(c) * 2, size=h * w).T.reshape(
            c, h, w).astype(np.float32)
        unary = -np.log(np.maximum(probs, 1e-4))
        q32 = np.asarray(seg.dense_crf(jnp.asarray(unary), jnp.asarray(img),
                                       num_iters=10))
        q16 = np.asarray(seg.dense_crf(jnp.asarray(unary), jnp.asarray(img),
                                       num_iters=10,
                                       filter_dtype=jnp.bfloat16))
        assert q16.dtype == np.float32  # filtering dtype is internal
        np.testing.assert_allclose(q16.sum(0), np.ones((h, w)), rtol=1e-4)
        agree = (q16.argmax(0) == q32.argmax(0)).mean()
        assert agree > 0.97, agree
        assert np.median(np.abs(q16 - q32)) < 0.002
        assert np.abs(q16 - q32).mean() < 0.01

    def test_crf_respects_color_edges(self):
        """The true bilateral term must stop label bleed at a color edge —
        the qualitative property the approximated bilateral was weakest
        at: a noisy-unary region bounded by a sharp color boundary comes
        out clean."""
        c, h, w = 2, 24, 24
        img = np.zeros((h, w, 3), np.float32)
        img[:, 12:] = 200.0  # sharp vertical color edge
        rng = np.random.RandomState(9)
        probs = np.full((c, h, w), 0.5, np.float32)
        # weak, noisy evidence for class 1 on the right half only
        noise = rng.rand(h, 12).astype(np.float32)
        probs[1, :, 12:] = 0.5 + 0.2 * (noise - 0.5)
        probs[1, :, 12:] += 0.1
        probs[0] = 1 - probs[1]
        unary = -np.log(np.maximum(probs, 1e-4))
        q = np.asarray(seg.dense_crf(jnp.asarray(unary), jnp.asarray(img),
                                     num_iters=10))
        right = q[1, :, 14:]
        left = q[1, :, :10]
        assert right.mean() > 0.9, right.mean()   # solidified by the CRF
        # the left half has uniform unary and NO cross-edge color affinity:
        # mean field must leave it at 0.5 — any drift toward class 1 would
        # be bleed through the bilateral term
        assert np.abs(left - 0.5).max() < 0.05, np.abs(left - 0.5).max()
