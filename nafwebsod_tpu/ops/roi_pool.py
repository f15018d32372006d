"""RoI feature extraction ops (pure JAX, statically shaped, jittable).

TPU-native equivalents of the reference's RoI transform ops:

  * ``roi_pool`` — Caffe2 ``RoIPoolF`` max pooling semantics (the flagship
    config's ROI_XFORM_METHOD): roi coords scaled by ``spatial_scale`` and
    rounded half-away-from-zero to ints; roi width/height floored at 1;
    bin boundaries ``floor(p*bin)``/``ceil((p+1)*bin)`` clipped to the map;
    empty bins output 0. Used by ``wsl_heads.add_VGG16_roi_2fc_head``
    (reference wsl_heads.py:659-666).
  * ``roi_align`` — Detectron RoIAlign with a static sampling grid
    (ROI_XFORM_SAMPLING_RATIO must be > 0 for static shapes on TPU).
  * ``roi_feature_boost`` — ``detectron/ops/roi_feature_boost_op.cc``:
    multiply each RoI's pooled features by its scalar objectness score; the
    score input receives no gradient (fwd :25-31, grad :54-61).

Feature layout is NHWC with a leading batch of 1 dropped: ``feat`` is
(H, W, C); ``rois`` are (R, 5) rows of (batch_idx, x1, y1, x2, y2) in image
coordinates. Padded rois (e.g. all-zero rows) are handled by the caller via
masks; they simply pool a valid region and are ignored downstream.
"""

import math
import os
from functools import partial

import jax
import jax.numpy as jnp


def _round_half_away(x):
    """C-style round(): half away from zero (numpy rounds half to even)."""
    return jnp.sign(x) * jnp.floor(jnp.abs(x) + 0.5)


def roi_pool(feat, rois, pooled_h=7, pooled_w=7, spatial_scale=0.125,
             chunk=16):
    """Exact RoIPoolF max pooling. Returns (R, pooled_h, pooled_w, C).

    On TPU this dispatches to the Pallas kernel
    (``ops/pallas/roi_pool_pallas.py``, ~11x faster at the flagship shapes:
    152ms -> 14ms on v5e); gradients fall back to autodiff of the XLA
    implementation (only needed when the conv body is not frozen). On CPU
    it prefers the native XLA custom call (native/roi_pool_ffi.cpp, with a
    saved-argmax scatter backward), falling back to pure XLA when the
    library is unavailable (NAFWEBSOD_NO_FFI disables it)."""
    if _FORCE_PORTABLE:
        return roi_pool_xla(feat, rois, pooled_h, pooled_w, spatial_scale,
                            chunk)
    if _on_tpu():
        return _roi_pool_tpu(feat, rois, pooled_h, pooled_w, spatial_scale)
    if _ffi_ok():
        return _roi_pool_ffi(feat, rois, pooled_h, pooled_w, spatial_scale)
    return roi_pool_xla(feat, rois, pooled_h, pooled_w, spatial_scale, chunk)


_FORCE_PORTABLE = False


def set_portable_ops(flag):
    """Force the pure-XLA implementations (no FFI custom calls). Needed for
    ``jax.export`` serialization: custom-call targets carry no forward
    compatibility guarantee, so deploy artifacts must lower the portable
    path (tools/export_model.py sets this)."""
    global _FORCE_PORTABLE
    if bool(flag) != _FORCE_PORTABLE:
        # jitted callers (detector.forward_test, ...) may hold traces that
        # captured the previous dispatch choice
        jax.clear_caches()
    _FORCE_PORTABLE = bool(flag)


def _ffi_ok():
    if _FORCE_PORTABLE:
        return False
    try:
        if jax.default_backend() != 'cpu':
            return False
        from nafwebsod_tpu.native import ffi
        return ffi.roi_pool_registered()
    except Exception:
        return False


def _on_tpu():
    try:
        return jax.default_backend() == 'tpu'
    except Exception:
        return False


@partial(jax.custom_vjp, nondiff_argnums=(2, 3, 4))
def _roi_pool_tpu(feat, rois, pooled_h, pooled_w, spatial_scale):
    from nafwebsod_tpu.ops.pallas.roi_pool_pallas import roi_pool_pallas
    return roi_pool_pallas(feat, rois, pooled_h, pooled_w,
                           spatial_scale).astype(feat.dtype)


def _roi_pool_tpu_fwd(feat, rois, pooled_h, pooled_w, spatial_scale):
    return (_roi_pool_tpu(feat, rois, pooled_h, pooled_w, spatial_scale),
            (feat, rois))


def _roi_pool_tpu_bwd(pooled_h, pooled_w, spatial_scale, res, g):
    feat, rois = res
    if os.environ.get('NAFWEBSOD_POOL_BWD') != 'xla':
        # Pallas argmax-scatter backward (roi_pool_pallas_bwd): routes each
        # cotangent to the first max cell of its bin, VMEM-resident
        # accumulator. The XLA fallback below splits exact-tie gradients
        # evenly instead — identical on real conv features.
        from nafwebsod_tpu.ops.pallas.roi_pool_pallas import (
            roi_pool_pallas_bwd)
        d = roi_pool_pallas_bwd(feat, rois, g, pooled_h, pooled_w,
                                spatial_scale)
        return d.astype(feat.dtype), None
    # jax.checkpoint: without it the XLA pool's vjp stores the per-roi
    # (PH, MBH, W, C) gather residuals for ALL 2048 rois at once — ~19 GB
    # at flagship shapes (observed HBM OOM on the CSC image-gradient
    # path); rematerializing recomputes them chunk-by-chunk in the
    # backward scan instead.
    _, vjp = jax.vjp(
        jax.checkpoint(lambda f: roi_pool_xla(
            f, rois, pooled_h, pooled_w, spatial_scale)),
        feat)
    return vjp(g)[0], None


_roi_pool_tpu.defvjp(_roi_pool_tpu_fwd, _roi_pool_tpu_bwd)


def _roi_pool_ffi_raw(feat, rois, pooled_h, pooled_w, spatial_scale):
    """CPU XLA custom call (native/roi_pool_ffi.cpp). Returns
    (pooled (R,PH,PW,C) f32, argmax (R,PH,PW,C) i32 flat y*W+x, -1=empty)."""
    import numpy as np
    r = rois.shape[0]
    c = feat.shape[2]
    call = jax.ffi.ffi_call(
        'nafwebsod_roi_pool_fwd',
        (jax.ShapeDtypeStruct((r, pooled_h, pooled_w, c), jnp.float32),
         jax.ShapeDtypeStruct((r, pooled_h, pooled_w, c), jnp.int32)),
        # the C kernel is single-image; run batched calls one by one
        # (eval_step vmaps forward_train over the stacked device batch)
        vmap_method='sequential')
    return call(feat.astype(jnp.float32), rois.astype(jnp.float32),
                pooled_h=np.int64(pooled_h), pooled_w=np.int64(pooled_w),
                spatial_scale=np.float32(spatial_scale))


@partial(jax.custom_vjp, nondiff_argnums=(2, 3, 4))
def _roi_pool_ffi(feat, rois, pooled_h, pooled_w, spatial_scale):
    out, _ = _roi_pool_ffi_raw(feat, rois, pooled_h, pooled_w, spatial_scale)
    return out.astype(feat.dtype)


def _roi_pool_ffi_fwd(feat, rois, pooled_h, pooled_w, spatial_scale):
    # Residuals are the primal inputs and the bwd differentiates the pure-
    # XLA pool (like _roi_pool_tpu): keeping raw ffi_calls out of BOTH the
    # fwd residual computation and the bwd keeps the op differentiable at
    # higher orders (the CSC/CPG branches take grad-of-grad through the
    # pool). argmax_scatter_grad below is the saved-argmax alternative,
    # kept for direct use/tests.
    return (_roi_pool_ffi(feat, rois, pooled_h, pooled_w, spatial_scale),
            (feat, rois))


def _roi_pool_ffi_bwd(pooled_h, pooled_w, spatial_scale, res, g):
    feat, rois = res
    # differentiate at f32: roi_pool_xla PRESERVES the input dtype (pure
    # max selection), so a bf16 feat would make the vjp expect a bf16
    # cotangent while g is cast to f32 below — the f32 primal keeps the
    # max routing identical (bf16 values embed exactly in f32) and the
    # cotangent dtypes consistent on the bf16 CPU path (CSC/CPG take
    # grad-of-grad through this pool)
    _, vjp = jax.vjp(
        jax.checkpoint(lambda f: roi_pool_xla(
            f, rois, pooled_h, pooled_w, spatial_scale)),
        feat.astype(jnp.float32))
    return vjp(g.astype(jnp.float32))[0].astype(feat.dtype), None


_roi_pool_ffi.defvjp(_roi_pool_ffi_fwd, _roi_pool_ffi_bwd)


def argmax_scatter_grad(am, g, h, w):
    """RoIPoolF saved-argmax backward: route each output cell's cotangent
    to its argmax feature cell (the scatter the Caffe2 op performs). am:
    (R, PH, PW, C) flat y*W+x indices (-1 = empty bin) from the FFI call;
    g: matching cotangents. Returns (h, w, C) f32."""
    c = am.shape[-1]
    valid = am >= 0
    flat = jnp.where(valid, am, 0).reshape(-1)            # (R*PH*PW*C,)
    cidx = jnp.broadcast_to(jnp.arange(c), am.shape).reshape(-1)
    contrib = jnp.where(valid, g.astype(jnp.float32), 0.0).reshape(-1)
    dflat = jnp.zeros((h * w, c), jnp.float32)
    dflat = dflat.at[flat, cidx].add(contrib)
    return dflat.reshape(h, w, c)


@partial(jax.jit, static_argnames=('pooled_h', 'pooled_w', 'spatial_scale', 'chunk'))
def roi_pool_xla(feat, rois, pooled_h=7, pooled_w=7, spatial_scale=0.125, chunk=16):
    """Exact RoIPoolF max pooling (pure XLA). Returns (R, PH, PW, C)."""
    H, W, C = feat.shape
    # Static cap on cells per bin. Rois are clipped to the image by the data
    # pipeline, so roi_h <= H+1 cells and a bin spans at most
    # ceil((H+1)/pooled)+1 <= ceil(H/pooled)+2 rows (likewise for W).
    mbh = int(math.ceil(H / pooled_h)) + 2
    mbw = int(math.ceil(W / pooled_w)) + 2

    def one_roi(roi):
        x1 = _round_half_away(roi[1] * spatial_scale).astype(jnp.int32)
        y1 = _round_half_away(roi[2] * spatial_scale).astype(jnp.int32)
        x2 = _round_half_away(roi[3] * spatial_scale).astype(jnp.int32)
        y2 = _round_half_away(roi[4] * spatial_scale).astype(jnp.int32)
        roi_h = jnp.maximum(y2 - y1 + 1, 1)
        roi_w = jnp.maximum(x2 - x1 + 1, 1)

        # Bin boundaries in exact integer arithmetic:
        #   floor(p * roi/pool) == (p * roi) // pool
        #   ceil((p+1) * roi/pool) == ((p+1) * roi + pool - 1) // pool
        # The CUDA op computes these through a float32 division, which can
        # misround by one cell when p*roi is an exact multiple of pool; the
        # integer form is the mathematical definition and is deterministic
        # across platforms (CPU XLA, TPU, and the numpy golds all agree).
        ph = jnp.arange(pooled_h, dtype=jnp.int32)
        pw = jnp.arange(pooled_w, dtype=jnp.int32)
        hstart = jnp.clip((ph * roi_h) // pooled_h + y1, 0, H)
        hend = jnp.clip(((ph + 1) * roi_h + pooled_h - 1) // pooled_h + y1, 0, H)
        wstart = jnp.clip((pw * roi_w) // pooled_w + x1, 0, W)
        wend = jnp.clip(((pw + 1) * roi_w + pooled_w - 1) // pooled_w + x1, 0, W)

        # pass 1: per h-bin row max -> (pooled_h, W, C)
        dy = jnp.arange(mbh)
        ys = hstart[:, None] + dy[None, :]                      # (PH, MBH)
        ymask = ys < hend[:, None]
        rows = feat[jnp.clip(ys, 0, H - 1)]                     # (PH, MBH, W, C)
        rows = jnp.where(ymask[:, :, None, None], rows, -jnp.inf)
        rowmax = jnp.max(rows, axis=1)                          # (PH, W, C)

        # pass 2: per w-bin col max -> (PH, PW, C)
        dx = jnp.arange(mbw)
        xs = wstart[:, None] + dx[None, :]                      # (PW, MBW)
        xmask = xs < wend[:, None]
        cols = rowmax[:, jnp.clip(xs, 0, W - 1)]                # (PH, PW, MBW, C)
        cols = jnp.where(xmask[None, :, :, None], cols, -jnp.inf)
        out = jnp.max(cols, axis=2)                             # (PH, PW, C)
        return jnp.where(jnp.isfinite(out), out, 0.0)           # empty bins -> 0

    r = rois.shape[0]
    # checkpoint the MAP BODY: without it the vjp stacks every chunk's
    # (PH, MBH, W, C) gather residuals across the whole map (~19 GB at
    # flagship shapes — HBM OOM on image-gradient paths like CSC);
    # rematerializing confines the backward to one chunk at a time
    if chunk <= 1:
        return jax.lax.map(jax.checkpoint(one_roi), rois)
    pad = (-r) % chunk
    rois_p = jnp.pad(rois, ((0, pad), (0, 0)))
    batched = rois_p.reshape(-1, chunk, 5)
    out = jax.lax.map(jax.checkpoint(jax.vmap(one_roi)), batched)
    return out.reshape(-1, pooled_h, pooled_w, C)[:r]


def roi_align(feat, rois, pooled_h=7, pooled_w=7, spatial_scale=0.125,
              sampling_ratio=2, out_dtype=None):
    """Detectron RoIAlign (legacy, non-aligned offsets) with a static
    sampling grid. Returns (R, pooled_h, pooled_w, C) in ``out_dtype``
    (default: ``feat.dtype`` on every dispatch path).

    ``out_dtype=jnp.float32`` with a bf16 ``feat`` keeps the Pallas
    kernel's cheap bf16 VMEM residency while returning the contraction's
    natural f32 result un-rounded — exactly what an f32 upcast of the
    bf16 features BEFORE pooling would produce, without the 2x window
    copy/residency cost (used by the f32 mask head, detector._mask_pooled).

    On TPU this dispatches to the separable-bilinear-GEMM Pallas kernel
    (ops/pallas/roi_align_pallas.py — two MXU matmuls per roi against a
    VMEM-resident feature block instead of 4-corner gathers); gradients
    fall back to autodiff of the XLA implementation."""
    out_dtype = feat.dtype if out_dtype is None else jnp.dtype(out_dtype)
    if not _FORCE_PORTABLE and _on_tpu():
        return _roi_align_tpu(feat, rois, pooled_h, pooled_w,
                              spatial_scale, sampling_ratio, out_dtype)
    return roi_align_xla(feat, rois, pooled_h, pooled_w, spatial_scale,
                         sampling_ratio).astype(out_dtype)


@partial(jax.custom_vjp, nondiff_argnums=(2, 3, 4, 5, 6))
def _roi_align_tpu(feat, rois, pooled_h, pooled_w, spatial_scale,
                   sampling_ratio, out_dtype):
    from nafwebsod_tpu.ops.pallas.roi_align_pallas import roi_align_pallas
    return roi_align_pallas(feat, rois, pooled_h, pooled_w, spatial_scale,
                            sampling_ratio).astype(out_dtype)


def _roi_align_tpu_fwd(feat, rois, pooled_h, pooled_w, spatial_scale,
                       sampling_ratio, out_dtype):
    return (_roi_align_tpu(feat, rois, pooled_h, pooled_w, spatial_scale,
                           sampling_ratio, out_dtype), (feat, rois))


def _roi_align_tpu_bwd(pooled_h, pooled_w, spatial_scale, sampling_ratio,
                       out_dtype, res, g):
    feat, rois = res
    _, vjp = jax.vjp(
        lambda f: roi_align_xla(f, rois, pooled_h, pooled_w, spatial_scale,
                                sampling_ratio), feat)
    return vjp(g.astype(jnp.float32))[0].astype(feat.dtype), None


_roi_align_tpu.defvjp(_roi_align_tpu_fwd, _roi_align_tpu_bwd)


@partial(jax.jit, static_argnames=('pooled_h', 'pooled_w', 'spatial_scale',
                                   'sampling_ratio'))
def roi_align_xla(feat, rois, pooled_h=7, pooled_w=7, spatial_scale=0.125,
                  sampling_ratio=2):
    """Pure-XLA RoIAlign (4-corner gathers; the portable and autodiff
    path)."""
    assert sampling_ratio > 0, 'static TPU path requires a fixed sampling grid'
    H, W, C = feat.shape
    sr = sampling_ratio

    def one_roi(roi):
        start_w = roi[1] * spatial_scale
        start_h = roi[2] * spatial_scale
        end_w = roi[3] * spatial_scale
        end_h = roi[4] * spatial_scale
        roi_w = jnp.maximum(end_w - start_w, 1.0)
        roi_h = jnp.maximum(end_h - start_h, 1.0)
        bin_w = roi_w / pooled_w
        bin_h = roi_h / pooled_h

        ph = jnp.arange(pooled_h, dtype=jnp.float32)
        pw = jnp.arange(pooled_w, dtype=jnp.float32)
        iy = jnp.arange(sr, dtype=jnp.float32)
        ix = jnp.arange(sr, dtype=jnp.float32)
        # sample coordinates (PH, SR) / (PW, SR)
        y = start_h + ph[:, None] * bin_h + (iy[None, :] + 0.5) * bin_h / sr
        x = start_w + pw[:, None] * bin_w + (ix[None, :] + 0.5) * bin_w / sr
        y = y.reshape(-1)  # (PH*SR,)
        x = x.reshape(-1)  # (PW*SR,)

        # bilinear interpolation with border zeroing (y < -1 or y > H -> 0)
        valid_y = (y >= -1.0) & (y <= H * 1.0)
        valid_x = (x >= -1.0) & (x <= W * 1.0)
        yc = jnp.clip(y, 0.0, H - 1.0)
        xc = jnp.clip(x, 0.0, W - 1.0)
        y0 = jnp.floor(yc).astype(jnp.int32)
        x0 = jnp.floor(xc).astype(jnp.int32)
        y1 = jnp.minimum(y0 + 1, H - 1)
        x1 = jnp.minimum(x0 + 1, W - 1)
        ly = yc - y0.astype(jnp.float32)
        lx = xc - x0.astype(jnp.float32)

        # gather 4 corners: (PH*SR, PW*SR, C)
        f00 = feat[y0[:, None], x0[None, :]]
        f01 = feat[y0[:, None], x1[None, :]]
        f10 = feat[y1[:, None], x0[None, :]]
        f11 = feat[y1[:, None], x1[None, :]]
        wy = ly[:, None, None]
        wx = lx[None, :, None]
        val = (f00 * (1 - wy) * (1 - wx) + f01 * (1 - wy) * wx +
               f10 * wy * (1 - wx) + f11 * wy * wx)
        val = val * (valid_y[:, None, None] & valid_x[None, :, None])
        val = val.reshape(pooled_h, sr, pooled_w, sr, C)
        return jnp.mean(val, axis=(1, 3))

    return jax.vmap(one_roi)(rois)


def roi_feature_boost(roi_feat, obn_scores):
    """Scale each RoI's features by its objectness score (no grad to scores).

    roi_feat: (R, ...) pooled features; obn_scores: (R,) or (R, 1).
    """
    s = jax.lax.stop_gradient(obn_scores.reshape(obn_scores.shape[0], -1)[:, 0])
    s = s.astype(roi_feat.dtype)  # keep bf16 activations bf16
    shape = (roi_feat.shape[0],) + (1,) * (roi_feat.ndim - 1)
    return roi_feat * s.reshape(shape)
