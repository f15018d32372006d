"""Pallas TPU kernel for Detectron RoIAlign — separable bilinear GEMMs.

Bilinear sampling + the sr x sr in-bin mean are both LINEAR in the
feature map and separable by axis, so the whole RoIAlign of one roi is
two small matrix products on the MXU:

    pooled = Wy @ window @ Wx^T        # (PH, hw) (hw, ww, C) (ww, PW)

where Wy[(p, k)] = (1/sr) * sum over the bin's sr sample rows of that
row's 1-D bilinear weight on window row k (and likewise Wx). No gathers
at all — the XLA formulation's 4-corner dynamic gathers
(ops/roi_pool.py:roi_align) become dense contractions against a
VMEM-resident feature block. Border zeroing (samples outside [-1, H])
and coordinate clipping fold into the weight vectors exactly, so the
result matches the XLA path to float-accumulation order.

Semantics: Detectron legacy RoIAlign (no half-pixel alignment), static
sampling grid (sampling_ratio > 0), mean over samples.
"""

import functools
import math

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _axis_weights(start, end, pooled, sr, n, base, window, limit):
    """(pooled, window) pooled-bilinear weight matrix along one axis.

    start/end: roi extent in feature coords (already scaled); base: window
    origin (aligned); limit: H or W (clip bound). Folds the 1/sr mean
    factor in.

    Everything stays 2-D — (pooled*sr, window) sample weights reduced to
    (pooled, window) by a tiny 0/1-indicator GEMM. (The original 3-D
    formulation with [..., None] broadcasts and a middle-axis sum
    mis-lowered under Mosaic: interpret mode was exact, compiled output
    was not.)"""
    roi = jnp.maximum(end - start, 1.0)
    bin_sz = roi / pooled
    ps = pooled * sr
    # integer iota + cast: Mosaic's tpu.iota is integer-only
    i = jax.lax.broadcasted_iota(jnp.int32, (ps, 1), 0)
    p = (i // sr).astype(jnp.float32)
    s = (i % sr).astype(jnp.float32)
    coord = start + p * bin_sz + (s + 0.5) * bin_sz / sr    # (PS, 1)
    validf = jnp.where((coord >= -1.0) & (coord <= limit * 1.0), 1.0, 0.0)
    cc = jnp.clip(coord, 0.0, limit - 1.0)
    c0 = jnp.floor(cc)
    frac = cc - c0
    c1 = jnp.minimum(c0 + 1.0, limit - 1.0)

    k = (base + jax.lax.broadcasted_iota(
        jnp.int32, (1, window), 1)).astype(jnp.float32)     # (1, window)
    w = (jnp.where(k == c0, 1.0 - frac, 0.0) +
         jnp.where(k == c1, frac, 0.0)) * validf            # (PS, window)
    # group-sum the sr samples of each bin: (pooled, PS) 0/1 @ (PS, window)
    grp = jnp.where(
        jax.lax.broadcasted_iota(jnp.int32, (pooled, ps), 1) // sr ==
        jax.lax.broadcasted_iota(jnp.int32, (pooled, ps), 0), 1.0, 0.0)
    return jax.lax.dot_general(
        grp, w, (((1,), (0,)), ((), ())),
        precision=jax.lax.Precision.HIGHEST,
        preferred_element_type=jnp.float32) / sr            # (pooled, window)


def _kernel(rois_ref, feat_ref, out_ref,
            *, pooled_h, pooled_w, sr, H, W, clip_h, clip_w, spatial_scale,
            tiers):
    r = pl.program_id(1)
    start_w = rois_ref[1, r] * spatial_scale
    start_h = rois_ref[2, r] * spatial_scale
    end_w = rois_ref[3, r] * spatial_scale
    end_h = rois_ref[4, r] * spatial_scale

    def run(h_window, w_window):
        hb = jnp.clip(jnp.floor(start_h).astype(jnp.int32),
                      0, H - h_window)
        wb = (jnp.clip(jnp.floor(start_w).astype(jnp.int32),
                       0, W - w_window) // 8) * 8
        wy = _axis_weights(start_h, end_h, pooled_h, sr, H, hb, h_window,
                           clip_h)                          # (PH, hw)
        wx = _axis_weights(start_w, end_w, pooled_w, sr, W, wb, w_window,
                           clip_w)                          # (PW, ww)
        window = feat_ref[pl.ds(hb, h_window),
                          pl.ds(wb, w_window), :].astype(jnp.float32)
        # (PH, hw) @ (hw, ww*C) -> (PH, ww, C)
        # HIGHEST precision: the MXU's default f32 matmul runs bf16
        # passes — ~1e-2 relative error on bilinear weights
        tmp = jax.lax.dot_general(
            wy, window.reshape(h_window, -1),
            (((1,), (0,)), ((), ())),
            precision=jax.lax.Precision.HIGHEST,
            preferred_element_type=jnp.float32).reshape(
                pooled_h, w_window, -1)
        # (PW, ww) @ (ww, PH*C) -> transpose to (PH, PW, C)
        out = jax.lax.dot_general(
            wx, tmp.transpose(1, 0, 2).reshape(w_window, -1),
            (((1,), (0,)), ((), ())),
            precision=jax.lax.Precision.HIGHEST,
            preferred_element_type=jnp.float32).reshape(
                pooled_w, pooled_h, -1)
        out_ref[0, :, :, :] = out.transpose(1, 0, 2)

    # ascending window-size ladder: each roi takes the SMALLEST window
    # that covers its sample extent (floor(start)..ceil(end)+1, +8 on w
    # for the aligned base slack) — the per-roi VMEM window copy is the
    # kernel's dominant cost, so typical MCG-scale rois must not pay the
    # worst-case window (same structure as the RoIPool/RoILoopPool
    # ladders; profiled at 10.2 ms/step in the seg family with the old
    # single 40x40 tier)
    roi_h_cells = jnp.ceil(end_h) - jnp.floor(start_h) + 2.0
    roi_w_cells = jnp.ceil(end_w) - jnp.floor(start_w) + 2.0
    live = (start_h >= 0) & (start_w >= 0)
    usable = [(th, tw) for th, tw in tiers if th < H and tw + 8 < W]
    taken = jnp.zeros((), jnp.bool_)
    for th, tw in usable:
        fits = live & (roi_h_cells <= th) & (roi_w_cells + 8.0 <= tw)
        this = fits & jnp.logical_not(taken)
        pl.when(this)(lambda th=th, tw=tw: run(th, tw))
        taken = taken | fits
    pl.when(jnp.logical_not(taken))(lambda: run(H, W))


@functools.partial(
    jax.jit,
    static_argnames=('pooled_h', 'pooled_w', 'spatial_scale',
                     'sampling_ratio', 'cblk', 'interpret'))
def roi_align_pallas(feat, rois, pooled_h=7, pooled_w=7,
                     spatial_scale=0.125, sampling_ratio=2, cblk=256,
                     interpret=False):
    """RoIAlign forward on TPU via separable bilinear GEMMs. feat:
    (H, W, C) f32 or bf16 — the resident VMEM block keeps the input
    dtype (a bf16 body block halves VMEM residency and window-copy
    bytes; windows are converted to f32 at the GEMM operand, so the
    contraction itself is full precision either way); rois: (R, 5).
    Returns (R, PH, PW, C) f32."""
    H, W, C = feat.shape
    R = rois.shape[0]
    if feat.dtype not in (jnp.float32, jnp.bfloat16):
        feat = feat.astype(jnp.float32)
    esize = feat.dtype.itemsize

    # resident feat block + the full-path window COPY both live in VMEM
    cblk = min(cblk, max(-(-C // 128) * 128, 128))
    while cblk > 128 and H * W * cblk * esize > 6 * 1024 * 1024:
        cblk //= 2
    if H * W * cblk * esize > 6 * 1024 * 1024:
        from nafwebsod_tpu.ops.roi_pool import roi_align_xla
        return roi_align_xla(feat, rois, pooled_h, pooled_w, spatial_scale,
                             sampling_ratio)
    wpad = (-W) % 8
    cpad = (-C) % cblk
    if wpad or cpad:
        feat = jnp.pad(feat, ((0, 0), (0, wpad), (0, cpad)))
    Hp, Wp, Cp = feat.shape

    kernel = functools.partial(
        _kernel, pooled_h=pooled_h, pooled_w=pooled_w, sr=sampling_ratio,
        H=Hp, W=Wp, clip_h=H, clip_w=W, spatial_scale=spatial_scale,
        tiers=((8, 16), (16, 24), (24, 40), (40, 56)))

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(Cp // cblk, R),
        in_specs=[
            pl.BlockSpec((Hp, Wp, cblk), lambda cb, r, *_: (0, 0, cb),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, pooled_h, pooled_w, cblk), lambda cb, r, *_: (r, 0, 0, cb),
            memory_space=pltpu.VMEM),
    )
    out = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((R, pooled_h, pooled_w, Cp),
                                       jnp.float32),
        interpret=interpret,
    )(rois.T, feat)
    if cpad:
        out = out[..., :C]
    return out
