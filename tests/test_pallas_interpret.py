"""Pallas kernel logic under interpret mode (runs on CPU): the RoI pool /
ring pool / align kernels must match their XLA reference formulations.
Bit-exactness on real TPU hardware is additionally checked by
scripts/check_roi_pool_parity.py / check_roi_loop_pool_parity.py."""

import numpy as np
import jax
import jax.numpy as jnp

from nafwebsod_tpu.ops.context import roi_context, roi_loop_pool_xla
from nafwebsod_tpu.ops.pallas.roi_align_pallas import roi_align_pallas
from nafwebsod_tpu.ops.pallas.roi_loop_pool_pallas import roi_loop_pool_pallas
from nafwebsod_tpu.ops.pallas.roi_pool_pallas import roi_pool_pallas
from nafwebsod_tpu.ops.roi_pool import roi_align_xla, roi_pool_xla


def _rois(rng, r, span=700):
    x1 = rng.uniform(-10, span - 50, r)
    y1 = rng.uniform(-10, span - 50, r)
    rois = np.stack([np.zeros(r), x1, y1,
                     x1 + rng.choice([8, 60, 250, span], r),
                     y1 + rng.choice([8, 60, 250, span], r)], 1)
    return np.clip(rois, 0, span - 1).astype(np.float32)


def test_roi_pool_interpret_matches_xla():
    rng = np.random.RandomState(0)
    feat = jnp.asarray(rng.randn(40, 40, 8).astype(np.float32))
    rois = jnp.asarray(_rois(rng, 24, span=320))
    out = roi_pool_pallas(feat, rois, 7, 7, 0.125, interpret=True)
    ref = roi_pool_xla(feat, rois, 7, 7, 0.125)
    np.testing.assert_array_equal(np.asarray(out), np.asarray(ref))


def test_roi_loop_pool_interpret_matches_xla():
    rng = np.random.RandomState(1)
    feat = jnp.asarray(rng.randn(40, 40, 8).astype(np.float32))
    base = jnp.asarray(_rois(rng, 16, span=320))
    frame, context = roi_context(base, 320, 320, 1.8)
    for r9 in (frame, context):
        out = roi_loop_pool_pallas(feat, r9, 7, 7, 0.125, interpret=True)
        ref = roi_loop_pool_xla(feat, r9, 7, 7, 0.125)
        np.testing.assert_array_equal(np.asarray(out), np.asarray(ref))


def test_roi_loop_pool_interpret_tiered_paths():
    """A map wide enough to enable the small AND tiny predicated tiers
    (W=96 > mbwu_s+mbw_s=88 > mbwu_t+mbw_t=56); rois spanning 8..760 px
    route through tiny, small, and full paths."""
    rng = np.random.RandomState(3)
    feat = jnp.asarray(rng.randn(96, 96, 8).astype(np.float32))
    base = jnp.asarray(_rois(rng, 24, span=760))
    frame, context = roi_context(base, 760, 760, 1.8)
    for r9 in (frame, context):
        out = roi_loop_pool_pallas(feat, r9, 7, 7, 0.125, interpret=True)
        ref = roi_loop_pool_xla(feat, r9, 7, 7, 0.125)
        np.testing.assert_array_equal(np.asarray(out), np.asarray(ref))


def test_roi_align_interpret_matches_xla():
    rng = np.random.RandomState(2)
    feat = jnp.asarray(rng.randn(40, 40, 8).astype(np.float32))
    rois = jnp.asarray(_rois(rng, 24, span=320))
    for res in (7, 14):
        out = roi_align_pallas(feat, rois, res, res, 0.125, 2,
                               interpret=True)
        ref = roi_align_xla(feat, rois, res, res, 0.125, 2)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   rtol=1e-5, atol=1e-6)


def test_roi_align_interpret_ladder_tiers_and_bf16():
    """An 88x88 map makes every ladder tier usable ((8,16)..(40,56) plus
    the full path); rois spanning 8..700 px route through all of them.
    Covers the bf16-residency path too (windows convert to f32 at the
    GEMM operand, so bf16 FEATURES pool identically to their f32 cast)."""
    rng = np.random.RandomState(5)
    feat32 = rng.randn(88, 88, 8).astype(np.float32)
    rois = jnp.asarray(_rois(rng, 32, span=700))
    ref = roi_align_xla(jnp.asarray(feat32), rois, 7, 7, 0.125, 2)
    out = roi_align_pallas(jnp.asarray(feat32), rois, 7, 7, 0.125, 2,
                           interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-5, atol=1e-6)
    fbf = jnp.asarray(feat32, jnp.bfloat16)
    out_bf = roi_align_pallas(fbf, rois, 7, 7, 0.125, 2, interpret=True)
    ref_bf = roi_align_xla(fbf.astype(jnp.float32), rois, 7, 7, 0.125, 2)
    np.testing.assert_allclose(np.asarray(out_bf), np.asarray(ref_bf),
                               rtol=1e-5, atol=1e-6)


def test_bwd_kernel_tiers_match_xla_grad():
    """Tiered argmax-scatter backward (interpret mode) vs the XLA autodiff
    gradient of roi_pool_xla — exact on tie-free features, across roi
    sizes that exercise every tier (tiny 4x16, small 8x16, full)."""
    from nafwebsod_tpu.ops.pallas.roi_pool_pallas import roi_pool_pallas_bwd
    from nafwebsod_tpu.ops.roi_pool import roi_pool_xla

    rng = np.random.RandomState(0)
    H = W = 40
    C = 8
    # tie-free features: a permutation of distinct values
    feat = rng.permutation(H * W * C).astype(np.float32).reshape(H, W, C)
    rois = np.array([
        [0, 0, 0, 8 * W - 1, 8 * H - 1],    # full map -> full path
        [0, 16, 16, 100, 100],              # ~11 cells  -> tiny tier
        [0, 8, 8, 300, 130],                # ~37x16     -> small tier
        [0, 24, 24, 280, 290],              # ~33 tall   -> full path
        [0, 40, 40, 44, 44],                # degenerate point
    ], np.float32)
    g = rng.randn(len(rois), 7, 7, C).astype(np.float32)

    def pooled_sum(f):
        return jnp.sum(roi_pool_xla(f, jnp.asarray(rois), 7, 7, 0.125)
                       * jnp.asarray(g))

    want = np.asarray(jax.grad(pooled_sum)(jnp.asarray(feat)))
    got = np.asarray(roi_pool_pallas_bwd(
        jnp.asarray(feat), jnp.asarray(rois), jnp.asarray(g), 7, 7, 0.125,
        interpret=True))
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


def test_bwd_kernel_batched_seeds_interpret():
    """The custom_vmap seed batching (CSC's per-class cotangents) in
    interpret mode."""
    from nafwebsod_tpu.ops.pallas.roi_pool_pallas import roi_pool_pallas_bwd
    from nafwebsod_tpu.ops.roi_pool import roi_pool_xla

    rng = np.random.RandomState(1)
    H = W = 24
    C = 8
    feat = rng.permutation(H * W * C).astype(np.float32).reshape(H, W, C)
    rois = np.array([[0, 8, 8, 100, 80], [0, 0, 0, 50, 60]], np.float32)
    gs = rng.randn(3, len(rois), 7, 7, C).astype(np.float32)

    got = np.asarray(jax.vmap(
        lambda gg: roi_pool_pallas_bwd(
            jnp.asarray(feat), jnp.asarray(rois), gg, 7, 7, 0.125,
            interpret=True))(jnp.asarray(gs)))
    for k in range(3):
        def pooled_sum(f):
            return jnp.sum(roi_pool_xla(f, jnp.asarray(rois), 7, 7, 0.125)
                           * jnp.asarray(gs[k]))
        want = np.asarray(jax.grad(pooled_sum)(jnp.asarray(feat)))
        np.testing.assert_allclose(got[k], want, rtol=1e-5, atol=1e-5)
