"""Context-aware RoI ops: frame/context ring rois + ring max pooling.

TPU-native re-implementations of:

  * ``roi_context`` — ``detectron/ops/roi_context_op.cu:10-95`` (RoIContext):
    each 5-col roi becomes two 9-col rois (batch, outer x1y1x2y2, inner
    x1y1x2y2): the FRAME roi keeps the original box as outer and shrinks it
    by ``context_ratio`` for the inner; the CONTEXT roi expands the box by
    ``context_ratio`` for the outer and keeps the original as inner. Inner /
    expanded coords are clipped to the image.
  * ``roi_loop_pool`` — ``detectron/ops/roi_loop_pool_op.{cc,cu}``
    (RoILoopPool): RoIPool-style max pooling over the outer box's bins but
    EXCLUDING cells strictly inside the inner box; ``maxval`` starts at 0
    (the op assumes post-ReLU inputs, ``roi_loop_pool_op.cu:74-76``) so all
    outputs are >= 0 and empty bins give 0. The ring decomposes as
    max(rows outside the inner row-span, cols outside the inner col-span),
    which keeps the two-pass row-max/col-max structure XLA can fuse.

Gradients flow through the max gathers exactly like the reference's
argmax-scatter backward (``roi_loop_pool_op.cu:118-170``).
"""

import math
from functools import partial

import jax
import jax.numpy as jnp

from nafwebsod_tpu.ops.roi_pool import _round_half_away


def roi_context(rois, im_h, im_w, context_ratio=1.8):
    """(R, 5) rois -> (frame_rois (R, 9), context_rois (R, 9))."""
    b, x1, y1, x2, y2 = [rois[:, i] for i in range(5)]
    w = x2 - x1
    h = y2 - y1
    inner_res_w = (w - w / context_ratio) / 2.0
    inner_res_h = (h - h / context_ratio) / 2.0
    outer_res_w = (w * context_ratio - w) / 2.0
    outer_res_h = (h * context_ratio - h) / 2.0

    # bounds may be python ints (full canvas) OR traced scalars (the true
    # image extent inside a padded batch canvas)
    def clipx(v):
        return jnp.clip(v, 0.0, jnp.float32(im_w))

    def clipy(v):
        return jnp.clip(v, 0.0, jnp.float32(im_h))

    frame = jnp.stack([
        b, x1, y1, x2, y2,
        clipx(x1 + inner_res_w), clipy(y1 + inner_res_h),
        clipx(x2 - inner_res_w), clipy(y2 - inner_res_h),
    ], axis=1)
    context = jnp.stack([
        b,
        clipx(x1 - outer_res_w), clipy(y1 - outer_res_h),
        clipx(x2 + outer_res_w), clipy(y2 + outer_res_h),
        x1, y1, x2, y2,
    ], axis=1)
    return frame, context


@partial(jax.jit,
         static_argnames=('pooled_h', 'pooled_w', 'spatial_scale', 'chunk'))
def roi_loop_pool(feat, rois9, pooled_h=7, pooled_w=7, spatial_scale=0.125,
                  chunk=16):
    """Ring max pooling over 9-col rois. feat: (H, W, C); returns
    (R, pooled_h, pooled_w, C).

    On TPU this dispatches to the Pallas kernel
    (ops/pallas/roi_loop_pool_pallas.py — the context head's two ring
    pools cost ~170 ms/step in the XLA gather formulation); gradients fall
    back to autodiff of the XLA implementation."""
    from nafwebsod_tpu.ops import roi_pool as rp

    if rp._on_tpu() and not rp._FORCE_PORTABLE:
        return _roi_loop_pool_tpu(feat, rois9, pooled_h, pooled_w,
                                  spatial_scale)
    return roi_loop_pool_xla(feat, rois9, pooled_h, pooled_w, spatial_scale,
                             chunk)


@partial(jax.custom_vjp, nondiff_argnums=(2, 3, 4))
def _roi_loop_pool_tpu(feat, rois9, pooled_h, pooled_w, spatial_scale):
    from nafwebsod_tpu.ops.pallas.roi_loop_pool_pallas import (
        roi_loop_pool_pallas)
    return roi_loop_pool_pallas(feat, rois9, pooled_h, pooled_w,
                                spatial_scale).astype(feat.dtype)


def _roi_loop_pool_tpu_fwd(feat, rois9, pooled_h, pooled_w, spatial_scale):
    return (_roi_loop_pool_tpu(feat, rois9, pooled_h, pooled_w,
                               spatial_scale), (feat, rois9))


def _roi_loop_pool_tpu_bwd(pooled_h, pooled_w, spatial_scale, res, g):
    feat, rois9 = res
    # checkpoint: see ops/roi_pool.py:_roi_pool_tpu_bwd — the gather
    # residuals of all rois at once exceed HBM at flagship shapes
    _, vjp = jax.vjp(
        jax.checkpoint(lambda f: roi_loop_pool_xla(
            f, rois9, pooled_h, pooled_w, spatial_scale)), feat)
    return vjp(g)[0], None


_roi_loop_pool_tpu.defvjp(_roi_loop_pool_tpu_fwd, _roi_loop_pool_tpu_bwd)


@partial(jax.jit, static_argnames=('pooled_h', 'pooled_w', 'spatial_scale',
                                   'chunk'))
def roi_loop_pool_xla(feat, rois9, pooled_h=7, pooled_w=7,
                      spatial_scale=0.125, chunk=16):
    """Pure-XLA ring max pooling (gather formulation; the portable and
    autodiff path)."""
    H, W, C = feat.shape
    mbh = int(math.ceil(H / pooled_h)) + 2
    mbw = int(math.ceil(W / pooled_w)) + 2

    def one_roi(roi):
        def r(v):
            return _round_half_away(v * spatial_scale).astype(jnp.int32)
        x1, y1, x2, y2 = r(roi[1]), r(roi[2]), r(roi[3]), r(roi[4])
        ix1, iy1, ix2, iy2 = r(roi[5]), r(roi[6]), r(roi[7]), r(roi[8])
        roi_h = jnp.maximum(y2 - y1 + 1, 1)
        roi_w = jnp.maximum(x2 - x1 + 1, 1)

        ph = jnp.arange(pooled_h, dtype=jnp.int32)
        pw = jnp.arange(pooled_w, dtype=jnp.int32)
        # exact integer bin boundaries (the CUDA op uses float32 floor/ceil,
        # which is platform-unstable at exact multiples: XLA's
        # excess-precision fusion can ceil(7 * (9/7)) to 10 on CPU while
        # strict f32 gives 9 — the same one-cell misround the RoIPoolF
        # docstring describes; the integer form is the mathematical
        # definition and deterministic everywhere)
        hstart = jnp.clip((ph * roi_h) // pooled_h + y1, 0, H)
        hend = jnp.clip(-((-(ph + 1) * roi_h) // pooled_h) + y1, 0, H)
        wstart = jnp.clip((pw * roi_w) // pooled_w + x1, 0, W)
        wend = jnp.clip(-((-(pw + 1) * roi_w) // pooled_w) + x1, 0, W)

        dy = jnp.arange(mbh)
        ys = hstart[:, None] + dy[None, :]                    # (PH, MBH)
        in_h = ys < hend[:, None]
        inside_h = (ys > iy1) & (ys < iy2)
        rows = feat[jnp.clip(ys, 0, H - 1)]                   # (PH, MBH, W, C)

        dx = jnp.arange(mbw)
        xs = wstart[:, None] + dx[None, :]                    # (PW, MBW)
        in_w = xs < wend[:, None]
        cols_idx = jnp.clip(xs, 0, W - 1)
        xcoord = jnp.arange(W)
        inside_w_full = (xcoord > ix1) & (xcoord < ix2)       # (W,)

        # A: rows OUTSIDE the inner row-span, all cols of the bin
        rows_a = jnp.where((in_h & ~inside_h)[:, :, None, None], rows,
                           -jnp.inf)
        rowmax_a = jnp.max(rows_a, axis=1)                    # (PH, W, C)
        cols_a = rowmax_a[:, cols_idx]                        # (PH, PW, MBW, C)
        max_a = jnp.max(jnp.where(in_w[None, :, :, None], cols_a, -jnp.inf),
                        axis=2)

        # B: any row of the bin, cols OUTSIDE the inner col-span
        rows_b = jnp.where(
            (in_h[:, :, None] & ~inside_w_full[None, None, :])[..., None],
            rows, -jnp.inf)
        rowmax_b = jnp.max(rows_b, axis=1)
        cols_b = rowmax_b[:, cols_idx]
        max_b = jnp.max(jnp.where(in_w[None, :, :, None], cols_b, -jnp.inf),
                        axis=2)

        out = jnp.maximum(max_a, max_b)
        # maxval initialized to 0 in the op: empty rings AND all-negative
        # rings both give 0 (roi_loop_pool_op.cu:74-76)
        return jnp.maximum(jnp.where(jnp.isfinite(out), out, 0.0), 0.0)

    r = rois9.shape[0]
    if chunk <= 1:
        # checkpoint the map body (see ops/roi_pool.py:roi_pool_xla)
        return jax.lax.map(jax.checkpoint(one_roi), rois9)
    pad = (-r) % chunk
    rois_p = jnp.pad(rois9, ((0, pad), (0, 0)))
    batched = rois_p.reshape(-1, chunk, 9)
    out = jax.lax.map(jax.checkpoint(jax.vmap(one_roi)), batched)
    return out.reshape(-1, pooled_h, pooled_w, C)[:r]
