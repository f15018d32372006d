"""Pallas kernel logic under interpret mode (runs on CPU): the RoI pool /
ring pool / align kernels must match their XLA reference formulations.
Bit-exactness on real TPU hardware is additionally checked by
scripts/check_roi_pool_parity.py / check_roi_loop_pool_parity.py."""

import numpy as np
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
