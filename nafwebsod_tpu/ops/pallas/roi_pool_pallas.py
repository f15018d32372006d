"""Pallas TPU kernel for RoIPoolF max pooling.

The pure-XLA `ops.roi_pool` gathers ~(7*MBH, W, C) rows per RoI from HBM —
at the flagship operating point (88x88x512 map, 2048 RoIs) that is ~40 GB of
HBM traffic and ~67 ms of the 172 ms train step. This kernel instead keeps a
(H, W, CBLK) channel block RESIDENT in VMEM across all RoIs (grid =
(C/CBLK, R) with the feature block index independent of the RoI axis, so the
Pallas pipeline skips re-fetching it), reducing HBM traffic to one feature
read + the output write (~0.25 GB).

Round-3 optimizations (all measured on v5e at the flagship shapes,
13.7 ms -> 4.1 ms standalone / ~5.5 -> ~2.5 ms in the train step):
  * pooling runs in the input dtype — bf16 features stay bf16 (same max
    element selected; halves VMEM traffic);
  * a predicated small-RoI fast path (`pl.when`): typical MCG/selective-
    search proposals span a small fraction of the map, so bins run ~4x
    smaller windows when the roi fits (rois up to ~256 px at 1/8 scale);
    large rois take the original full-window path — both exact;
  * CBLK 256 (fewer grid steps; the per-roi scalar math is duplicated
    per channel block).

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


def _kernel(rois_ref, feat_ref, out_ref, rowmax_ref,
            *, pooled_h, pooled_w, mbh, mbw, H, W, clip_h, clip_w,
            spatial_scale, mbh_s, mbwu_s, mbw_s, mbh_t, mbwu_t, mbw_t):
    r = pl.program_id(1)

    def scaled(i):
        v = rois_ref[i, r] * spatial_scale
        return jnp.floor(jnp.abs(v) + 0.5).astype(jnp.int32) * jnp.where(
            v < 0, -1, 1)

    x1, y1, x2, y2 = scaled(1), scaled(2), scaled(3), scaled(4)
    roi_h = jnp.maximum(y2 - y1 + 1, 1)
    roi_w = jnp.maximum(x2 - x1 + 1, 1)

    def pass1(ph, h_window, w_base, w_window):
        """Masked row-max of bin ph over (h_window, w_window) cells starting
        at column w_base; writes rowmax_ref[ph, :w_window]."""
        a = jnp.clip((ph * roi_h) // pooled_h + y1, 0, clip_h)
        b = jnp.clip(((ph + 1) * roi_h + pooled_h - 1) // pooled_h + y1,
                     0, clip_h)
        start = jnp.minimum(a, H - h_window)
        rows = feat_ref[pl.ds(start, h_window),
                        pl.ds(w_base, w_window), :]
        y = start + jax.lax.broadcasted_iota(jnp.int32, (h_window, 1, 1), 0)
        mask = (y >= a) & (y < b)
        rows = jnp.where(mask, rows, NEG)
        rowmax_ref[ph, pl.ds(0, w_window), :] = jnp.max(rows, axis=0)

    def pass2(pw, w_base, w_window):
        """Masked col-max of bin pw from rowmax_ref columns relative to
        w_base; writes out_ref[0, :, pw]. The dynamic column start is
        8-aligned (Mosaic requires it for sublane slices); ``w_window``
        must therefore exceed the max bin width by >= 7 columns — the
        [c, d) mask discards the slack."""
        c = jnp.clip((pw * roi_w) // pooled_w + x1, 0, clip_w)
        d = jnp.clip(((pw + 1) * roi_w + pooled_w - 1) // pooled_w + x1,
                     0, clip_w)
        # align LAST so Mosaic can statically prove 8-divisibility (it
        # cannot track it through clip/min); the clip bound
        # shape[1]-w_window is an 8-multiple, so aligning after the clip
        # loses nothing at the boundary.
        start = (jnp.clip(c - w_base, 0,
                          rowmax_ref.shape[1] - w_window) // 8) * 8
        cols = rowmax_ref[:, pl.ds(start, w_window), :]
        x = w_base + start + jax.lax.broadcasted_iota(
            jnp.int32, (1, w_window, 1), 1)
        mask = (x >= c) & (x < d)
        cols = jnp.where(mask, cols, NEG)
        val = jnp.max(cols, axis=1)                          # (PH, CBLK)
        # empty-bin test in f32: Mosaic lacks bf16 comparisons on v5e
        empty = val.astype(jnp.float32) <= NEG / 2
        out_ref[0, :, pw, :] = jnp.where(empty, 0.0, val)

    def _full_path():
        # fori + per-bin windows + a tiny (PH, PW, CBLK) accumulator
        # carry: unrolled full-width passes blow Mosaic's 16 MB VMEM
        # stack on large maps (FPN level 2 at 704px is 176x176)
        phi = jax.lax.broadcasted_iota(jnp.int32, (pooled_h, 1, 1), 0)
        pwi = jax.lax.broadcasted_iota(jnp.int32, (1, pooled_w, 1), 1)

        def ph_body(ph, acc):
            a = jnp.clip((ph * roi_h) // pooled_h + y1, 0, clip_h)
            b = jnp.clip(((ph + 1) * roi_h + pooled_h - 1) // pooled_h + y1,
                         0, clip_h)
            hstart = jnp.minimum(a, H - mbh)

            def pw_body(pw, acc):
                c = jnp.clip((pw * roi_w) // pooled_w + x1, 0, clip_w)
                d = jnp.clip(((pw + 1) * roi_w + pooled_w - 1) // pooled_w
                             + x1, 0, clip_w)
                wstart = (jnp.clip(c, 0, W - mbw) // 8) * 8
                win = feat_ref[pl.ds(hstart, mbh), pl.ds(wstart, mbw), :]
                y = hstart + jax.lax.broadcasted_iota(
                    jnp.int32, (mbh, 1, 1), 0)
                x = wstart + jax.lax.broadcasted_iota(
                    jnp.int32, (1, mbw, 1), 1)
                mask = (y >= a) & (y < b) & (x >= c) & (x < d)
                m = jnp.max(jnp.where(mask, win, NEG),
                            axis=(0, 1)).astype(jnp.float32)
                val = jnp.where(m <= NEG / 2, 0.0, m)
                sel = (phi == ph) & (pwi == pw)
                return jnp.where(sel, val[None, None, :], acc)

            return jax.lax.fori_loop(0, pooled_w, pw_body, acc)

        # f32 accumulator: an i1-select against bf16 hits a Mosaic
        # relayout bug ("Invalid relayout ... vector<...xi1>")
        acc0 = jnp.zeros((pooled_h, pooled_w, feat_ref.shape[-1]),
                         jnp.float32)
        out_ref[0, :, :, :] = jax.lax.fori_loop(
            0, pooled_h, ph_body, acc0).astype(out_ref.dtype)

    # Small-RoI fast path: typical proposals (MCG/selective-search) span a
    # small fraction of the feature map, but static shapes force the
    # full-image worst-case window on every bin. Predicate on the actual
    # roi size and run ~4x smaller windows when they suffice (the common
    # case); big rois take the full-window path. Both paths are exact:
    # pass2 may read scratch columns the small pass1 did not write, but the
    # [c, d) mask discards them before the max.
    use_small = (mbh_s < mbh and mbwu_s + mbw_s < W and mbh_s < H)
    if not use_small:
        _full_path()
        return

    def sized_path(h_window, w_union, w_window):
        # align LAST (Mosaic divisibility proof); W (= padded width) and
        # w_union are 8-multiples so the clip bounds stay aligned.
        w_base = (jnp.clip(jnp.minimum(x1, W - w_union),
                           0, W - w_union) // 8) * 8
        for ph in range(pooled_h):
            pass1(ph, h_window, w_base, w_union)
        for pw in range(pooled_w):
            pass2(pw, w_base, w_window)

    # roi_w + 8 <= w_union: the 8-aligned window base can sit up to 7
    # columns left of x1 and must still cover x1 + roi_w (inclusive).
    bin_rows = (roi_h + pooled_h - 1) // pooled_h + 1
    use_tiny = (mbh_t < mbh_s and mbwu_t + mbw_t < W and mbh_t < H)
    tiny = (bin_rows <= mbh_t) & (roi_w + 8 <= mbwu_t) if use_tiny else False
    small = (bin_rows <= mbh_s) & (roi_w + 8 <= mbwu_s)

    if use_tiny:
        pl.when(tiny)(lambda: sized_path(mbh_t, mbwu_t, mbw_t))
        small = jnp.logical_not(tiny) & small

    pl.when(small)(lambda: sized_path(mbh_s, mbwu_s, mbw_s))
    notsmall = jnp.logical_not(small)
    if use_tiny:
        notsmall = notsmall & jnp.logical_not(tiny)
    pl.when(notsmall)(_full_path)


@functools.partial(
    jax.jit,
    static_argnames=('pooled_h', 'pooled_w', 'spatial_scale', 'cblk',
                     'interpret'))
def roi_pool_pallas(feat, rois, pooled_h=7, pooled_w=7, spatial_scale=0.125,
                    cblk=512, interpret=False):
    """RoIPoolF forward on TPU. feat: (H, W, C) fp32/bf16; rois: (R, 5).
    Returns (R, pooled_h, pooled_w, C) in the feature dtype.

    The kernel runs in the input dtype: bf16 features are pooled in bf16
    (halves VMEM traffic). This is bit-identical to pooling in fp32 and
    casting back — max() selects the same element either way."""
    H, W, C = feat.shape
    R = rois.shape[0]
    if feat.dtype not in (jnp.float32, jnp.bfloat16):
        feat = feat.astype(jnp.float32)

    # The (H, W, cblk) feature block stays VMEM-resident: shrink the
    # channel block until it fits a conservative budget (large test-time
    # augmentation images produce maps far bigger than the train-time
    # 88x88). Also never pad tiny C up to a big block.
    bytes_per = 2 if feat.dtype == jnp.bfloat16 else 4
    cblk = min(cblk, max(-(-C // 128) * 128, 128))
    # the scoped VMEM stack limit is 16 MB: block + scratch + temporaries
    # must fit (an FPN level-2 map at 704px is 176x176 — budget for it)
    while cblk > 128 and H * W * cblk * bytes_per > 10 * 1024 * 1024:
        cblk //= 2
    if H * W * cblk * bytes_per > 12 * 1024 * 1024:
        # even a single 128-lane block cannot fit (f32 maps > ~170px at
        # 128 channels): fall back to the XLA formulation
        from nafwebsod_tpu.ops.roi_pool import roi_pool_xla
        return roi_pool_xla(feat, rois, pooled_h, pooled_w, spatial_scale)

    # pad W to a sublane multiple and C to the channel block
    wpad = (-W) % (16 if feat.dtype == jnp.bfloat16 else 8)
    cpad = (-C) % cblk
    if wpad or cpad:
        feat = jnp.pad(feat, ((0, 0), (0, wpad), (0, cpad)),
                       constant_values=NEG)
    Hp, Wp, Cp = feat.shape

    mbh = int(math.ceil(H / pooled_h)) + 2
    mbw = int(math.ceil(W / pooled_w)) + 2
    mbh = min(mbh, Hp)
    mbw = min(mbw, Wp)

    # pass-2 windows need bin width + 7 columns of 8-alignment slack
    mbw_full = min(-(-(mbw + 7) // 8) * 8, Wp)

    # small-roi fast-path windows: 8 rows/bin (rois up to ~7*pooled_h
    # cells tall), a 40-column width union (rois up to 32 cells wide),
    # 16 columns/bin (6 max + alignment slack). At 1/8 scale that covers
    # proposals up to ~256 px — the vast majority of MCG/selective-search
    # boxes.
    # tiny tier: rois up to ~128 px wide / ~168 px tall at 1/8 scale
    kernel = functools.partial(
        _kernel, pooled_h=pooled_h, pooled_w=pooled_w, mbh=mbh,
        mbw=mbw_full, H=Hp, W=Wp, clip_h=H, clip_w=W,
        spatial_scale=spatial_scale,
        mbh_s=8, mbwu_s=40, mbw_s=16,
        mbh_t=4, mbwu_t=24, mbw_t=16)

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
        scratch_shapes=[pltpu.VMEM((pooled_h, Wp, cblk), feat.dtype)],
    )
    out = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((R, pooled_h, pooled_w, Cp),
                                       feat.dtype),
        interpret=interpret,
    )(rois.T, feat)  # (5, R): SMEM pads the LAST dim to the lane
    # width, so (R, 5) would blow the 1MB SMEM budget at R=2048

    if cpad:
        out = out[..., :C]
    return out


# --------------------------------------------------------------------------- #
# Backward: argmax scatter (RoIPoolF gradient)
# --------------------------------------------------------------------------- #

def _bwd_kernel(rois_ref, feat_ref, g_ref, out_ref,
                *, pooled_h, pooled_w, H, W, clip_h, clip_w, spatial_scale,
                n_rois, mbh_s, mbwu_s, tier_hs=(), tier_ws=()):
    """Accumulate each output cell's cotangent into its bin's max feature
    cell (roi_pool_f gradient). The (H, W, CBLK) accumulator block is
    VMEM-resident across the whole RoI axis (index map constant in r):
    zeroed at r == 0, accumulated into per roi.

    Like the forward, the per-bin windows are TIERED on the actual roi
    size (``tier_hs``/``tier_ws``, ascending): typical proposals span a
    few cells per bin, so the common case runs ~3-6x smaller read/RMW
    slices than the worst-case (mbh_s, mbwu_s) window; every tier is
    exact via the [a,b) x [c,d) masks.

    Tie semantics: the cotangent is routed to the FIRST max cell in
    row-major window order (the CUDA op's argmax scan order). The XLA
    autodiff fallback splits ties evenly instead — identical on real conv
    features (exact float ties are measure-zero)."""
    r = pl.program_id(1)

    @pl.when(r == 0)
    def _init():
        out_ref[...] = jnp.zeros_like(out_ref)

    def scaled(i):
        v = rois_ref[i, r] * spatial_scale
        return jnp.floor(jnp.abs(v) + 0.5).astype(jnp.int32) * jnp.where(
            v < 0, -1, 1)

    x1, y1, x2, y2 = scaled(1), scaled(2), scaled(3), scaled(4)
    roi_h = jnp.maximum(y2 - y1 + 1, 1)
    roi_w = jnp.maximum(x2 - x1 + 1, 1)

    n_seeds = g_ref.shape[0]
    gall = g_ref[:, 0].astype(jnp.float32)             # (G, PH, PW, CBLK)
    phi = jax.lax.broadcasted_iota(jnp.int32, (pooled_h, 1, 1), 0)
    pwi = jax.lax.broadcasted_iota(jnp.int32, (1, pooled_w, 1), 1)

    def scatter_path(h_window, w_window):
        def ph_body(ph, _):
            a = jnp.clip((ph * roi_h) // pooled_h + y1, 0, clip_h)
            b = jnp.clip(((ph + 1) * roi_h + pooled_h - 1) // pooled_h + y1,
                         0, clip_h)
            hstart = jnp.minimum(a, H - h_window)

            def pw_body(pw, _):
                c = jnp.clip((pw * roi_w) // pooled_w + x1, 0, clip_w)
                d = jnp.clip(((pw + 1) * roi_w + pooled_w - 1) // pooled_w
                             + x1, 0, clip_w)
                wstart = (jnp.clip(c, 0, W - w_window) // 8) * 8
                rows = feat_ref[pl.ds(hstart, h_window),
                                pl.ds(wstart, w_window), :].astype(
                                    jnp.float32)
                y = hstart + jax.lax.broadcasted_iota(
                    jnp.int32, (h_window, 1, 1), 0)
                x = wstart + jax.lax.broadcasted_iota(
                    jnp.int32, (1, w_window, 1), 1)
                mask = (y >= a) & (y < b) & (x >= c) & (x < d)
                m = jnp.max(jnp.where(mask, rows, NEG), axis=(0, 1))
                is_max = (rows >= m[None, None, :]) & mask
                # first max in row-major order, via a max-reduction over
                # negated linear indices (Pallas TPU has no cumsum
                # lowering)
                lin = (y * W + x).astype(jnp.int32)
                best = jnp.max(jnp.where(is_max, -lin, -(1 << 30)),
                               axis=(0, 1))            # (CBLK,)
                # dynamic (ph, pw) select via masked reduction (no dynamic
                # sublane indexing); empty bins (m == NEG) excluded
                ok = m > NEG / 2                       # (CBLK,)
                take = (is_max & (lin == -best[None, None, :]) &
                        ok[None, None, :])
                # the argmax routing (take) is SHARED across the seed
                # batch — only the scattered value differs per seed
                binsel = (phi == ph) & (pwi == pw)
                for gi in range(n_seeds):
                    gbin = jnp.sum(jnp.where(binsel, gall[gi], 0.0),
                                   axis=(0, 1))
                    cur = out_ref[gi, pl.ds(hstart, h_window),
                                  pl.ds(wstart, w_window), :]
                    out_ref[gi, pl.ds(hstart, h_window),
                            pl.ds(wstart, w_window), :] = (
                        cur + jnp.where(take, gbin[None, None, :], 0.0))
                return 0

            jax.lax.fori_loop(0, pooled_w, pw_body, 0)
            return 0

        jax.lax.fori_loop(0, pooled_h, ph_body, 0)

    # zero-cotangent early exit: CPG/CSC seed batches carry all-zero
    # cotangents for padded / pred-below-tau classes (cpg_op.cu:149-166
    # skips those classes outright) — their scatter contributes nothing
    live = jnp.any(gall != 0.0)

    # tier dispatch on the actual bin extents (ascending window sizes)
    bin_rows = (roi_h + pooled_h - 1) // pooled_h + 1
    bin_cols = (roi_w + pooled_w - 1) // pooled_w + 1
    tiers = [(th, tw) for th, tw in zip(tier_hs, tier_ws)
             if th < mbh_s and th < H and tw < mbwu_s and tw <= W]
    taken = None
    for th, tw in tiers:
        fits = (bin_rows <= th) & (bin_cols + 7 <= tw)
        this = fits if taken is None else fits & jnp.logical_not(taken)
        pl.when(this & live)(lambda th=th, tw=tw: scatter_path(th, tw))
        taken = fits if taken is None else (taken | fits)
    if taken is None:
        pl.when(live)(lambda: scatter_path(mbh_s, mbwu_s))
    else:
        pl.when(jnp.logical_not(taken) & live)(
            lambda: scatter_path(mbh_s, mbwu_s))


def roi_pool_pallas_bwd(feat, rois, g, pooled_h=7, pooled_w=7,
                        spatial_scale=0.125, interpret=False):
    """RoIPoolF backward on TPU: dfeat (H, W, C) f32 from cotangents g
    (R, PH, PW, C). Under vmap over the cotangents (the CSC path batches
    per-class seeds) the whole seed batch runs as ONE kernel launch that
    shares the per-bin argmax pass across seeds (G accumulator blocks in
    VMEM, narrower cblk); batches over feat/rois map sequentially."""
    return _bwd_vmap_wrapped(pooled_h, pooled_w, spatial_scale,
                             interpret)(feat, rois, g)


@functools.lru_cache(maxsize=None)
def _bwd_vmap_wrapped(pooled_h, pooled_w, spatial_scale, interpret=False):
    from jax.custom_batching import custom_vmap

    @custom_vmap
    def f(feat, rois, g):
        return _roi_pool_pallas_bwd_impl(feat, rois, g[None], pooled_h,
                                         pooled_w, spatial_scale,
                                         interpret=interpret)[0]

    @f.def_vmap
    def _rule(axis_size, in_batched, feat, rois, g):
        fb, rb, gb = in_batched
        if gb and not fb and not rb:
            # seed batch (the CSC per-class cotangents): ONE kernel
            # launch sharing the per-bin argmax pass across seeds
            return _roi_pool_pallas_bwd_impl(
                feat, rois, g, pooled_h, pooled_w, spatial_scale,
                interpret=interpret), True

        def one(i):
            return f(feat[i] if fb else feat,
                     rois[i] if rb else rois,
                     g[i] if gb else g)

        return jax.lax.map(one, jnp.arange(axis_size)), True

    return f


@functools.partial(
    jax.jit,
    static_argnames=('pooled_h', 'pooled_w', 'spatial_scale', 'cblk',
                     'interpret'))
def _roi_pool_pallas_bwd_impl(feat, rois, g, pooled_h=7, pooled_w=7,
                              spatial_scale=0.125, cblk=256,
                              interpret=False):
    # g: (G, R, PH, PW, C) seed-batched cotangents -> (G, H, W, C). The
    # seed batch (CSC per-class CPG seeds) shares one argmax pass per
    # launch; the channel block cannot shrink below 128 lanes (Mosaic),
    # so big seed batches split into VMEM-sized chunks instead.
    H, W, C = feat.shape
    G = g.shape[0]
    R = rois.shape[0]
    feat = feat.astype(jnp.float32)
    g = g.astype(jnp.float32)

    bytes_per = 4
    cblk = min(cblk, max(-(-C // 128) * 128, 128))
    # feature + G accumulator blocks resident in f32 within the 16 MB
    # scoped VMEM limit. Mosaic double-buffers the output blocks even with
    # a constant index map (measured: G=2 at 88x88x128 OOMs at 22.5 MB),
    # so the accumulators count TWICE; last-dim blocks must stay 128-lane
    # multiples. At flagship conv5 maps this limits chunks to one seed —
    # the argmax-sharing pays off on smaller maps only.
    budget = 13 * 1024 * 1024
    while (cblk > 128 and
           (1 + 2 * G) * H * W * cblk * bytes_per > budget):
        cblk //= 2
    block = H * W * cblk * bytes_per
    g_max = max((budget - block) // (2 * block), 1)
    if G > g_max:
        # seed-chunked launches: argmax sharing within each chunk
        parts = [
            _roi_pool_pallas_bwd_impl(
                feat, rois, g[i:i + g_max], pooled_h, pooled_w,
                spatial_scale, cblk, interpret=interpret)
            for i in range(0, G, g_max)]
        return jnp.concatenate(parts, axis=0)
    if 3 * block + 1024 * 1024 > 16 * 1024 * 1024:
        # feature + a double-buffered single accumulator cannot fit at 128
        # lanes (f32 maps beyond ~96 cells): XLA autodiff fallback, like
        # the forward's
        from nafwebsod_tpu.ops.roi_pool import roi_pool_xla

        def pooled(f, gg):
            return jnp.vdot(
                roi_pool_xla(f, rois, pooled_h, pooled_w, spatial_scale),
                gg)

        return jax.vmap(
            lambda gg: jax.grad(pooled)(feat[:H, :W, :C], gg))(g)

    wpad = (-W) % 8
    cpad = (-C) % cblk
    if wpad or cpad:
        feat = jnp.pad(feat, ((0, 0), (0, wpad), (0, cpad)),
                       constant_values=NEG)
        g = jnp.pad(g, ((0, 0), (0, 0), (0, 0), (0, 0), (0, cpad)))
    Hp, Wp, Cp = feat.shape

    # per-BIN windows: tall enough for the largest bin (ceil(H/PH)+1 rows)
    # and wide enough for the largest bin plus 7 columns of 8-alignment
    # slack — small regardless of roi size
    mbh = min(int(math.ceil(H / pooled_h)) + 2, Hp)
    mbw = min(int(math.ceil(W / pooled_w)) + 2, Wp)
    mbw = min(-(-(mbw + 7) // 8) * 8, Wp)

    kernel = functools.partial(
        _bwd_kernel, pooled_h=pooled_h, pooled_w=pooled_w, H=Hp, W=Wp,
        clip_h=H, clip_w=W, spatial_scale=spatial_scale, n_rois=R,
        mbh_s=mbh, mbwu_s=mbw,
        # small-roi tiers (ascending): bins up to 3 rows / 9 cols (rois to
        # ~112x448 px at 1/8 scale) run 4x16 windows; up to 7 rows, 8x16
        tier_hs=(4, 8), tier_ws=(16, 16))

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(Cp // cblk, R),
        in_specs=[
            pl.BlockSpec((Hp, Wp, cblk), lambda cb, r, *_: (0, 0, cb),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((G, 1, pooled_h, pooled_w, cblk),
                         lambda cb, r, *_: (0, r, 0, 0, cb),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((G, Hp, Wp, cblk),
                               lambda cb, r, *_: (0, 0, 0, cb),
                               memory_space=pltpu.VMEM),
    )
    out = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((G, Hp, Wp, Cp), jnp.float32),
        interpret=interpret,
    )(rois.T, feat, g)
    return out[:, :H, :W, :C]
