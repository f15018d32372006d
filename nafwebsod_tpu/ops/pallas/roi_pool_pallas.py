"""Pallas TPU kernel for RoIPoolF max pooling.

The pure-XLA `ops.roi_pool` gathers ~(7*MBH, W, C) rows per RoI from HBM —
at the flagship operating point (88x88x512 map, 2048 RoIs) that is ~40 GB of
HBM traffic and ~67 ms of the 172 ms train step. This kernel instead keeps a
(H, W, CBLK) channel block RESIDENT in VMEM across all RoIs (grid =
(C/CBLK, R) with the feature block index independent of the RoI axis, so the
Pallas pipeline skips re-fetching it), reducing HBM traffic to one feature
read + the output write (~0.25 GB).

Semantics match ``ops.roi_pool`` exactly (Caffe2 RoIPoolF): integer bin
boundaries (computed on the host side of the kernel in exact integer math),
max over the bin window, empty bins = 0. Gradients are not needed on the
flagship path (the conv body is frozen and RoI features are stop-gradient'd
— wsl_heads.py:671-672); for unfrozen configs the wrapper's custom VJP falls
back to differentiating the XLA implementation.
"""

import functools
import math

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG = -3.0e38  # effectively -inf in fp32 without inf/nan arithmetic


def _round_half_away(x):
    return jnp.sign(x) * jnp.floor(jnp.abs(x) + 0.5)


def _bin_bounds(rois, pooled_h, pooled_w, spatial_scale, H, W):
    """Exact RoIPoolF integer bin boundaries (same math as ops.roi_pool)."""
    x1 = _round_half_away(rois[:, 1] * spatial_scale).astype(jnp.int32)
    y1 = _round_half_away(rois[:, 2] * spatial_scale).astype(jnp.int32)
    x2 = _round_half_away(rois[:, 3] * spatial_scale).astype(jnp.int32)
    y2 = _round_half_away(rois[:, 4] * spatial_scale).astype(jnp.int32)
    roi_h = jnp.maximum(y2 - y1 + 1, 1)[:, None]
    roi_w = jnp.maximum(x2 - x1 + 1, 1)[:, None]
    ph = jnp.arange(pooled_h, dtype=jnp.int32)[None, :]
    pw = jnp.arange(pooled_w, dtype=jnp.int32)[None, :]
    hs = jnp.clip((ph * roi_h) // pooled_h + y1[:, None], 0, H)
    he = jnp.clip(((ph + 1) * roi_h + pooled_h - 1) // pooled_h + y1[:, None],
                  0, H)
    ws = jnp.clip((pw * roi_w) // pooled_w + x1[:, None], 0, W)
    we = jnp.clip(((pw + 1) * roi_w + pooled_w - 1) // pooled_w + x1[:, None],
                  0, W)
    return hs, he, ws, we


def _kernel(rois_ref, feat_ref, out_ref, rowmax_ref,
            *, pooled_h, pooled_w, mbh, mbw, H, W, clip_h, clip_w,
            spatial_scale):
    r = pl.program_id(1)

    def scaled(i):
        v = rois_ref[i, r] * spatial_scale
        return jnp.floor(jnp.abs(v) + 0.5).astype(jnp.int32) * jnp.where(
            v < 0, -1, 1)

    x1, y1, x2, y2 = scaled(1), scaled(2), scaled(3), scaled(4)
    roi_h = jnp.maximum(y2 - y1 + 1, 1)
    roi_w = jnp.maximum(x2 - x1 + 1, 1)

    # pass 1: per h-bin masked row max over the full width -> rowmax scratch
    for ph in range(pooled_h):
        a = jnp.clip((ph * roi_h) // pooled_h + y1, 0, clip_h)
        b = jnp.clip(((ph + 1) * roi_h + pooled_h - 1) // pooled_h + y1,
                     0, clip_h)
        start = jnp.minimum(a, H - mbh)
        rows = feat_ref[pl.ds(start, mbh), :, :]            # (MBH, W, CBLK)
        y = start + jax.lax.broadcasted_iota(jnp.int32, (mbh, 1, 1), 0)
        mask = (y >= a) & (y < b)
        rows = jnp.where(mask, rows, NEG)
        rowmax_ref[ph, :, :] = jnp.max(rows, axis=0)

    # pass 2: per w-bin masked col max -> (PH, CBLK) written per pw
    for pw in range(pooled_w):
        c = jnp.clip((pw * roi_w) // pooled_w + x1, 0, clip_w)
        d = jnp.clip(((pw + 1) * roi_w + pooled_w - 1) // pooled_w + x1,
                     0, clip_w)
        start = jnp.minimum(c, W - mbw)
        cols = rowmax_ref[:, pl.ds(start, mbw), :]          # (PH, MBW, CBLK)
        x = start + jax.lax.broadcasted_iota(jnp.int32, (1, mbw, 1), 1)
        mask = (x >= c) & (x < d)
        cols = jnp.where(mask, cols, NEG)
        val = jnp.max(cols, axis=1)                          # (PH, CBLK)
        out_ref[0, :, pw, :] = jnp.where(val <= NEG / 2, 0.0, val)


@functools.partial(
    jax.jit,
    static_argnames=('pooled_h', 'pooled_w', 'spatial_scale', 'cblk'))
def roi_pool_pallas(feat, rois, pooled_h=7, pooled_w=7, spatial_scale=0.125,
                    cblk=128):
    """RoIPoolF forward on TPU. feat: (H, W, C) fp32/bf16; rois: (R, 5).
    Returns (R, pooled_h, pooled_w, C) in fp32."""
    H, W, C = feat.shape
    R = rois.shape[0]
    feat = feat.astype(jnp.float32)

    # pad W to a sublane multiple and C to the channel block
    wpad = (-W) % 8
    cpad = (-C) % cblk
    if wpad or cpad:
        feat = jnp.pad(feat, ((0, 0), (0, wpad), (0, cpad)),
                       constant_values=NEG)
    Hp, Wp, Cp = feat.shape

    mbh = int(math.ceil(H / pooled_h)) + 2
    mbw = int(math.ceil(W / pooled_w)) + 2
    mbh = min(mbh, Hp)
    mbw = min(mbw, Wp)

    kernel = functools.partial(
        _kernel, pooled_h=pooled_h, pooled_w=pooled_w, mbh=mbh, mbw=mbw,
        H=Hp, W=Wp, clip_h=H, clip_w=W, spatial_scale=spatial_scale)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        # raw rois ride in SMEM; bin bounds are scalar math in-kernel
        num_scalar_prefetch=1,
        grid=(Cp // cblk, R),
        in_specs=[
            # feature channel block: index independent of r -> stays
            # resident in VMEM across the whole RoI axis
            pl.BlockSpec((Hp, Wp, cblk), lambda cb, r, *_: (0, 0, cb),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, pooled_h, pooled_w, cblk), lambda cb, r, *_: (r, 0, 0, cb),
            memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM((pooled_h, Wp, cblk), jnp.float32)],
    )
    out = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((R, pooled_h, pooled_w, Cp),
                                       jnp.float32),
    )(rois.T, feat)  # (5, R): SMEM pads the LAST dim to the lane
    # width, so (R, 5) would blow the 1MB SMEM budget at R=2048

    if cpad:
        out = out[..., :C]
    return out
