"""Pallas TPU kernel for RoILoopPool ring max pooling.

The XLA formulation (ops/context.py:roi_loop_pool) gathers (PH, MBH, W, C)
rows per RoI from HBM — at flagship shapes the two ring pools of the
context head cost ~170 ms of its 210 ms step. Same cure as the RoIPool
kernel (ops/pallas/roi_pool_pallas.py): keep a (H, W, CBLK) channel block
VMEM-resident across all RoIs and predicate tiered small-RoI windows.

Semantics match ops/context.py:roi_loop_pool exactly (Caffe2 RoILoopPool,
roi_loop_pool_op.cu): 9-col rois (batch, outer x1 y1 x2 y2, inner x1 y1
x2 y2), FLOAT bin boundaries (floor/ceil of float division, unlike
RoIPoolF's integer formula), ring max decomposed as
  A = rows outside the inner row-span, any bin column
  B = any bin row, columns outside the inner col-span
with maxval initialized to 0 (empty rings and all-negative rings -> 0).
Pooling runs in the input dtype (bf16 exact: max picks the same element).
"""

import functools
import math

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG = -3.0e38


def _kernel(rois_ref, feat_ref, out_ref, rmall_ref, rmout_ref,
            *, pooled_h, pooled_w, mbh, mbw, H, W, clip_h, clip_w,
            spatial_scale, tiers):
    r = pl.program_id(1)

    def scaled(i):
        v = rois_ref[i, r] * spatial_scale
        return jnp.floor(jnp.abs(v) + 0.5).astype(jnp.int32) * jnp.where(
            v < 0, -1, 1)

    x1, y1, x2, y2 = scaled(1), scaled(2), scaled(3), scaled(4)
    ix1, iy1, ix2, iy2 = scaled(5), scaled(6), scaled(7), scaled(8)
    roi_h = jnp.maximum(y2 - y1 + 1, 1)
    roi_w = jnp.maximum(x2 - x1 + 1, 1)

    def pass1(ph, h_window, w_base, w_window):
        # integer-exact bins (see ops/context.py:roi_loop_pool_xla)
        a = jnp.clip((ph * roi_h) // pooled_h + y1, 0, clip_h)
        b = jnp.clip(((ph + 1) * roi_h + pooled_h - 1) // pooled_h + y1,
                     0, clip_h)
        start = jnp.minimum(a, H - h_window)
        rows = feat_ref[pl.ds(start, h_window),
                        pl.ds(w_base, w_window), :]
        y = start + jax.lax.broadcasted_iota(jnp.int32, (h_window, 1, 1), 0)
        in_bin = (y >= a) & (y < b)
        out_row = in_bin & ~((y > iy1) & (y < iy2))
        rmall_ref[ph, pl.ds(0, w_window), :] = jnp.max(
            jnp.where(in_bin, rows, NEG), axis=0)
        rmout_ref[ph, pl.ds(0, w_window), :] = jnp.max(
            jnp.where(out_row, rows, NEG), axis=0)

    def pass2(pw, w_base, w_window):
        c = jnp.clip((pw * roi_w) // pooled_w + x1, 0, clip_w)
        d = jnp.clip(((pw + 1) * roi_w + pooled_w - 1) // pooled_w + x1,
                     0, clip_w)
        # align LAST for Mosaic's divisibility proof; clip bound is an
        # 8-multiple (see roi_pool_pallas.py)
        start = (jnp.clip(c - w_base, 0,
                          rmall_ref.shape[1] - w_window) // 8) * 8
        cols_all = rmall_ref[:, pl.ds(start, w_window), :]
        cols_out = rmout_ref[:, pl.ds(start, w_window), :]
        x = w_base + start + jax.lax.broadcasted_iota(
            jnp.int32, (1, w_window, 1), 1)
        in_w = (x >= c) & (x < d)
        outside_col = in_w & ~((x > ix1) & (x < ix2))
        max_a = jnp.max(jnp.where(in_w, cols_out, NEG), axis=1)
        max_b = jnp.max(jnp.where(outside_col, cols_all, NEG), axis=1)
        val = jnp.maximum(max_a, max_b)
        # maxval starts at 0 in the op (roi_loop_pool_op.cu:74-76)
        empty = val.astype(jnp.float32) <= NEG / 2
        out_ref[0, :, pw, :] = jnp.maximum(jnp.where(empty, 0.0, val), 0.0)

    def _full_path():
        for ph in range(pooled_h):
            pass1(ph, mbh, 0, rmall_ref.shape[1])
        for pw in range(pooled_w):
            pass2(pw, 0, mbw)

    def sized_path(h_window, w_union, w_window):
        w_base = (jnp.clip(jnp.minimum(x1, W - w_union),
                           0, W - w_union) // 8) * 8
        for ph in range(pooled_h):
            pass1(ph, h_window, w_base, w_union)
        for pw in range(pooled_w):
            pass2(pw, w_base, w_window)

    # predicated size tiers (ascending windows; same pattern as
    # roi_pool_pallas): VPU work per roi scales with h_window * w_union, so
    # each roi takes the smallest window set its ring fits in
    usable = [(th, twu, tw) for (th, twu, tw) in tiers
              if th < mbh and twu + tw < W and th < H]
    if not usable:
        _full_path()
        return

    # float bins: bin height <= ceil(roi_h / PH) + 1
    bin_rows = (roi_h + pooled_h - 1) // pooled_h + 1
    taken = None
    for th, twu, tw in usable:
        fits = (bin_rows <= th) & (roi_w + 8 <= twu)
        cond = fits if taken is None else (fits & jnp.logical_not(taken))
        pl.when(cond)(functools.partial(sized_path, th, twu, tw))
        taken = fits if taken is None else (taken | fits)
    pl.when(jnp.logical_not(taken))(_full_path)


@functools.partial(
    jax.jit,
    static_argnames=('pooled_h', 'pooled_w', 'spatial_scale', 'cblk',
                     'interpret'))
def roi_loop_pool_pallas(feat, rois9, pooled_h=7, pooled_w=7,
                         spatial_scale=0.125, cblk=512, interpret=False):
    """RoILoopPool forward on TPU. feat: (H, W, C); rois9: (R, 9).
    Returns (R, pooled_h, pooled_w, C) in the feature dtype."""
    H, W, C = feat.shape
    R = rois9.shape[0]
    if feat.dtype not in (jnp.float32, jnp.bfloat16):
        feat = feat.astype(jnp.float32)

    bytes_per = 2 if feat.dtype == jnp.bfloat16 else 4
    cblk = min(cblk, max(-(-C // 128) * 128, 128))
    # the scoped VMEM stack limit is 16 MB: block + scratch + temporaries
    # must fit (an FPN level-2 map at 704px is 176x176 — budget for it)
    while cblk > 128 and H * W * cblk * bytes_per > 10 * 1024 * 1024:
        cblk //= 2
    if H * W * cblk * bytes_per > 12 * 1024 * 1024:
        # even one 128-lane block cannot fit; fall back to XLA
        from nafwebsod_tpu.ops.context import roi_loop_pool_xla
        return roi_loop_pool_xla(feat, rois9, pooled_h, pooled_w,
                                 spatial_scale)

    wpad = (-W) % (16 if feat.dtype == jnp.bfloat16 else 8)
    cpad = (-C) % cblk
    if wpad or cpad:
        feat = jnp.pad(feat, ((0, 0), (0, wpad), (0, cpad)),
                       constant_values=NEG)
    Hp, Wp, Cp = feat.shape

    mbh = min(int(math.ceil(H / pooled_h)) + 2, Hp)
    mbw = min(int(math.ceil(W / pooled_w)) + 2, Wp)
    mbw_full = min(-(-(mbw + 7) // 8) * 8, Wp)

    # the context head's ring rois are ~1.8x the proposal: ascending tier
    # ladder from outer boxes ~128 px (xtiny: proposals ~70 px, where most
    # MCG/selective-search boxes live) up to ~448 px (small); bigger rings
    # take the full-map path
    kernel = functools.partial(
        _kernel, pooled_h=pooled_h, pooled_w=pooled_w, mbh=mbh,
        mbw=mbw_full, H=Hp, W=Wp, clip_h=H, clip_w=W,
        spatial_scale=spatial_scale,
        tiers=((4, 24, 16), (6, 40, 16), (8, 48, 16), (12, 64, 24)))

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
        scratch_shapes=[pltpu.VMEM((pooled_h, Wp, cblk), feat.dtype),
                        pltpu.VMEM((pooled_h, Wp, cblk), feat.dtype)],
    )
    out = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((R, pooled_h, pooled_w, Cp),
                                       feat.dtype),
        interpret=interpret,
    )(rois9.T, feat)  # (9, R) in SMEM (last dim padded to lanes)

    if cpad:
        out = out[..., :C]
    return out
