"""WSDDN / webly (noise-aware) heads — functional JAX.

Capability parity with ``detectron/modeling/wsl_heads.py`` and
``webly_heads.py``:

  * ``vgg16_roi_2fc_head``      — wsl_heads.py:654-681 (RoIPool -> boost ->
                                  stop-grad if frozen -> fc6/fc7 + dropout)
  * ``vgg16_roi_2fc_noise_head``— webly_heads.py:463-502 (clean tower + a
                                  noisy fc6/fc7 tower shared-initialized from
                                  the clean weights via '_[noisy]_' aliases)
  * ``wsl_outputs``             — wsl_heads.py:23-67 (two-stream: per-class
                                  softmax x per-RoI softmax -> rois_pred;
                                  test-time background column)
  * ``webly_outputs``           — webly_heads.py:32-74 (noisy residual logits
                                  added to clean logits -> second stream)
  * ``cls_pred``                — wsl_heads.py:213-227 (image score = sum of
                                  rois_pred over RoIs)

All RoI-dimension ops are padding-aware: ``valid_mask`` marks real rois; the
RoI softmax masks padded rows before normalizing, and padded rows of
``rois_pred`` are zeroed so image-level sums match the dynamic-shape reference.
"""

import jax
import jax.numpy as jnp
import numpy as np

from nafwebsod_tpu.ops.roi_pool import roi_pool, roi_align, roi_feature_boost


# --------------------------------------------------------------------------- #
# Parameter construction
# --------------------------------------------------------------------------- #

def _xavier(rng, shape, dtype=jnp.float32):
    """Caffe2 XavierFill: uniform(-a, a) with a = sqrt(3 / fan_in)."""
    fan_in = shape[0]
    a = np.sqrt(3.0 / fan_in)
    return jax.random.uniform(rng, shape, dtype, minval=-a, maxval=a)


def head_param_shapes(num_classes, roi_feat_dim=512 * 7 * 7, hidden=4096,
                      webly=True, context=False):
    """Flat name -> shape map for the box head + output layers.

    FC weights are stored (in, out) — the transpose of Caffe2's (out, in);
    ``utils/checkpoint.py`` converts at the pkl boundary. With ``context``
    the det stream uses the shared 'fc8d_frame' layer instead of 'fc8d'
    (wsl_heads.py:185-212).
    """
    c = num_classes - 1
    shapes = {
        'fc6_w': (roi_feat_dim, hidden), 'fc6_b': (hidden,),
        'fc7_w': (hidden, hidden), 'fc7_b': (hidden,),
        'fc8c_w': (hidden, c), 'fc8c_b': (c,),
    }
    if context:
        shapes.update({'fc8d_frame_w': (hidden, c), 'fc8d_frame_b': (c,)})
    else:
        shapes.update({'fc8d_w': (hidden, c), 'fc8d_b': (c,)})
    if webly:
        shapes.update({
            '_[noisy]_fc6_w': (roi_feat_dim, hidden), '_[noisy]_fc6_b': (hidden,),
            '_[noisy]_fc7_w': (hidden, hidden), '_[noisy]_fc7_b': (hidden,),
            'noisy_fc8c_w': (hidden, c), 'noisy_fc8c_b': (c,),
            'noisy_fc8d_w': (hidden, c), 'noisy_fc8d_b': (c,),
        })
    return shapes


def init_head_params(rng, num_classes, roi_feat_dim=512 * 7 * 7, hidden=4096,
                     webly=True, context=False, dtype=jnp.float32):
    shapes = head_param_shapes(num_classes, roi_feat_dim, hidden, webly,
                               context)
    params = {}
    keys = jax.random.split(rng, len(shapes))
    for i, (name, shape) in enumerate(sorted(shapes.items())):
        if name.endswith('_b'):
            params[name] = jnp.zeros(shape, dtype)
        else:
            params[name] = _xavier(keys[i], shape, dtype)
    return params


# --------------------------------------------------------------------------- #
# Building blocks
# --------------------------------------------------------------------------- #

def _fc(x, params, name, out_dtype=None):
    """FC layer in the input dtype. Params are stored fp32; weights are cast
    to the activation dtype so the matmul rides the MXU bf16 fast path (the
    MXU accumulates bf16 products in fp32 internally regardless).

    Hidden layers (no out_dtype) intentionally do NOT set
    ``preferred_element_type=float32``: that would make the dot OUTPUT fp32
    and, through autodiff, run every backward GEMM (incl. the dominant
    R x 25088 x 4096 fc6 weight grad) as fp32 x bf16 at 1/2-1/4 MXU rate.
    Only the fc8 logit layers request fp32 outputs (softmax numerics)."""
    w = params[name + '_w'].astype(x.dtype)
    if out_dtype is not None and out_dtype != x.dtype:
        y = jnp.dot(x, w, preferred_element_type=out_dtype)
        return y + params[name + '_b'].astype(out_dtype)
    y = jnp.dot(x, w)
    return y + params[name + '_b'].astype(x.dtype)


def _dropout(x, rate, rng, train):
    if not train or rate <= 0 or rng is None:
        return x
    keep = 1.0 - rate
    mask = jax.random.bernoulli(rng, keep, x.shape)
    return jnp.where(mask, x / keep, 0.0)


def _fc_tower(feat_flat, params, prefix, rng, train):
    """fc6 -> relu -> drop -> fc7 -> relu -> drop."""
    r1 = r2 = None
    if rng is not None:
        r1, r2 = jax.random.split(rng)
    x = jax.nn.relu(_fc(feat_flat, params, prefix + 'fc6'))
    x = _dropout(x, 0.5, r1, train)
    x = jax.nn.relu(_fc(x, params, prefix + 'fc7'))
    x = _dropout(x, 0.5, r2, train)
    return x


def roi_transform(feat, rois, obn_scores, spatial_scale, method='RoIPoolF',
                  resolution=7, sampling_ratio=2, freeze_body=True,
                  flatten=True):
    """RoIPool/RoIAlign + RoIFeatureBoost + optional stop-gradient, flattened
    to (R, resolution*resolution*C) (``flatten=False``: keep the
    (R, res, res, C) grid for conv heads)."""
    if method == 'RoIAlign':
        pooled = roi_align(feat, rois, resolution, resolution, spatial_scale,
                           sampling_ratio)
    else:
        pooled = roi_pool(feat, rois, resolution, resolution, spatial_scale)
    pooled = roi_feature_boost(pooled, obn_scores)
    if freeze_body:
        pooled = jax.lax.stop_gradient(pooled)
    if not flatten:
        return pooled
    r = pooled.shape[0]
    # Caffe2 flattens NCHW (C, H, W); we pool NHWC, so transpose to match the
    # fc6 weight ordering of the reference checkpoints: (C*H*W).
    pooled = jnp.transpose(pooled, (0, 3, 1, 2)).reshape(r, -1)
    return pooled


# --------------------------------------------------------------------------- #
# Heads
# --------------------------------------------------------------------------- #

def init_xconv1fc_gn_params(rng, dim_in, resolution=7, conv_dim=256,
                            num_convs=4, mlp_dim=1024, dtype=jnp.float32):
    """X stacked 3x3 convs (no bias) + GroupNorm + 1 fc
    (fast_rcnn_heads.add_roi_Xconv1fc_gn_head:129-163); blob names follow
    the reference ('head_conv{i}_w' / '_gn_s' / '_gn_b', 'fc6')."""
    params = {}
    keys = jax.random.split(rng, num_convs + 1)
    d = dim_in
    for i in range(num_convs):
        fan_in = 3 * 3 * d
        params['head_conv{}_w'.format(i + 1)] = (
            np.sqrt(2.0 / fan_in) *
            jax.random.normal(keys[i], (3, 3, d, conv_dim), dtype))
        params['head_conv{}_gn_s'.format(i + 1)] = jnp.ones((conv_dim,),
                                                            dtype)
        params['head_conv{}_gn_b'.format(i + 1)] = jnp.zeros((conv_dim,),
                                                             dtype)
        d = conv_dim
    params['fc6_w'] = _xavier(keys[-1],
                              (conv_dim * resolution * resolution, mlp_dim),
                              dtype)
    params['fc6_b'] = jnp.zeros((mlp_dim,), dtype)
    return params


def xconv1fc_gn_head(params, pooled, *, num_convs=4):
    """pooled: (R, res, res, C) RoI grid. Returns (R, mlp_dim)."""
    from nafwebsod_tpu.ops.norm import get_group_gn, group_norm

    x = pooled
    for i in range(num_convs):
        w = params['head_conv{}_w'.format(i + 1)].astype(x.dtype)
        x = jax.lax.conv_general_dilated(
            x, w, (1, 1), ((1, 1), (1, 1)),
            dimension_numbers=('NHWC', 'HWIO', 'NHWC'),
            preferred_element_type=x.dtype)
        c = x.shape[-1]
        x = group_norm(
            x.astype(jnp.float32),
            params['head_conv{}_gn_s'.format(i + 1)],
            params['head_conv{}_gn_b'.format(i + 1)],
            num_groups=get_group_gn(c, num_groups=min(32, c))).astype(
                pooled.dtype)
        x = jax.nn.relu(x)
    r = x.shape[0]
    flat = jnp.transpose(x, (0, 3, 1, 2)).reshape(r, -1)
    return jax.nn.relu(_fc(flat, params, 'fc6'))


def vgg16_roi_2fc_head(params, feat, rois, obn_scores, spatial_scale, *,
                       method='RoIPoolF', resolution=7, sampling_ratio=2,
                       freeze_body=True, train=False, rng=None,
                       tower_fn=None):
    """``tower_fn``: optional replacement for ``_fc_tower`` with the same
    (feat_flat, params, prefix, rng, train) signature — the tensor-parallel
    step injects its hidden-sharded tower here so the rest of the forward
    (pooling, tails) stays the unsharded code."""
    roi_feat = roi_transform(feat[0], rois, obn_scores, spatial_scale,
                             method, resolution, sampling_ratio, freeze_body)
    tower = _fc_tower if tower_fn is None else tower_fn
    return tower(roi_feat, params, '', rng, train), roi_feat


def vgg16_roi_2fc_noise_head(params, feat, rois, obn_scores, spatial_scale, *,
                             method='RoIPoolF', resolution=7, sampling_ratio=2,
                             freeze_body=True, train=False, rng=None,
                             fused=False, fused_fc7=False):
    """Clean tower + noisy tower on the same boosted RoI features
    (webly_heads.py:463-502).

    ``fused=True`` runs both towers as one width-doubled GEMM pair
    (fc6: (25088, 2H); fc7: batched (2, H, H)) — mathematically identical
    (independent output columns), fewer/larger MXU launches; dropout masks
    stay per-tower. MEASURED SLOWER on v5e (30.3 vs 39.6 img/s at flagship
    shapes): the per-step concat of the 25088x8192 weight matrix costs more
    HBM traffic than the launch savings recover — kept as a documented
    negative result (ROADMAP perf lever 1), default off.

    ``fused_fc7=True`` batches ONLY the fc7 GEMMs across the two towers
    (fc6 stays per-tower, avoiding the 25088x8192 concat that sank the full
    fusion): the (H, H) weights stack into one (2, H, H) batched matmul —
    the two smallest/lowest-MXU-utilization GEMMs of the step become one.
    ALSO MEASURED SLOWER on v5e (48.8 vs 53.2 img/s at flagship shapes):
    the per-step stack/cast of the two 4096x4096 fp32 weights costs more
    HBM traffic than the batched launch recovers. Both fusions are kept as
    documented negative results; avoiding the stack needs pre-stacked
    weights. Default off.

    PRE-STACKED weights (``TPU.STACKED_TOWERS``): when the param dict
    carries ``fc6s_w``/``fc6s_b``/``fc7s_w``/``fc7s_b`` (the stacked
    layout produced by ``detector.stack_tower_params``; the ON-DISK
    reference pkl schema is UNCHANGED — checkpoints are split back into
    the per-tower blobs at save and joined at load), the fused GEMM pair
    runs with ZERO per-step concat traffic: fc6 is one
    (R, 25088) x (25088, 2H) dot, fc7 one batched (2, R, H) x (2, H, H)
    matmul. Detected by leaf presence, so eval/export paths running
    unstacked checkpoints are unaffected. Dropout draws per-tower from
    the same key splits as the unfused path, so the layouts are
    comparable draw-for-draw."""
    stacked = 'fc6s_w' in params
    r1 = r2 = None
    if rng is not None:
        r1, r2 = jax.random.split(rng)
    roi_feat = roi_transform(feat[0], rois, obn_scores, spatial_scale,
                             method, resolution, sampling_ratio, freeze_body)
    if fused_fc7 and not fused and not stacked:
        r1a = r1b = r2a = r2b = None
        if r1 is not None:
            r1a, r1b = jax.random.split(r1)
            r2a, r2b = jax.random.split(r2)
        hc = _dropout(jax.nn.relu(_fc(roi_feat, params, 'fc6')),
                      0.5, r1a, train)
        hn = _dropout(jax.nn.relu(_fc(roi_feat, params, '_[noisy]_fc6')),
                      0.5, r2a, train)
        w7 = jnp.stack([params['fc7_w'], params['_[noisy]_fc7_w']]).astype(
            roi_feat.dtype)
        b7 = jnp.stack([params['fc7_b'], params['_[noisy]_fc7_b']])
        y2 = jax.nn.relu(jnp.einsum('trh,tho->tro', jnp.stack([hc, hn]), w7)
                         + b7[:, None, :].astype(roi_feat.dtype))
        clean = _dropout(y2[0], 0.5, r1b, train)
        noisy = _dropout(y2[1], 0.5, r2b, train)
        return (clean, noisy), roi_feat
    if not fused and not stacked:
        clean = _fc_tower(roi_feat, params, '', r1, train)
        noisy = _fc_tower(roi_feat, params, '_[noisy]_', r2, train)
        return (clean, noisy), roi_feat

    if stacked:
        hidden = params['fc7s_b'].shape[-1]
        w6 = params['fc6s_w'].astype(roi_feat.dtype)   # (roi_dim, 2H)
        b6 = params['fc6s_b']                          # (2H,)
    else:
        hidden = params['fc6_b'].shape[0]
        w6 = jnp.concatenate([params['fc6_w'], params['_[noisy]_fc6_w']],
                             axis=1).astype(roi_feat.dtype)
        b6 = jnp.concatenate([params['fc6_b'], params['_[noisy]_fc6_b']])
    h = jax.nn.relu(jnp.dot(roi_feat, w6) + b6.astype(roi_feat.dtype))
    hc, hn = h[:, :hidden], h[:, hidden:]
    if train:
        r1a = r1b = r2a = r2b = None
        if r1 is not None:
            r1a, r1b = jax.random.split(r1)
            r2a, r2b = jax.random.split(r2)
        hc = _dropout(hc, 0.5, r1a, train)
        hn = _dropout(hn, 0.5, r2a, train)
    # fc7 as one batched GEMM over the two towers
    if stacked:
        w7 = params['fc7s_w'].astype(roi_feat.dtype)  # (2, H, H)
        b7 = params['fc7s_b']                         # (2, H)
    else:
        w7 = jnp.stack([params['fc7_w'], params['_[noisy]_fc7_w']]).astype(
            roi_feat.dtype)
        b7 = jnp.stack([params['fc7_b'], params['_[noisy]_fc7_b']])
    x2 = jnp.stack([hc, hn])                          # (2, R, H)
    y2 = jax.nn.relu(jnp.einsum('trh,tho->tro', x2, w7) +
                     b7[:, None, :].astype(roi_feat.dtype))
    clean, noisy = y2[0], y2[1]
    if train:
        clean = _dropout(clean, 0.5, r1b, train)
        noisy = _dropout(noisy, 0.5, r2b, train)
    return (clean, noisy), roi_feat


def context_pooled_feats(feat, rois, obn_scores, spatial_scale, im_h, im_w, *,
                         context_ratio=1.8, resolution=7, freeze_body=True):
    """The three flattened RoI feature streams of the context head
    (wsl_heads.py:684-766): the original roi through RoIPool plus
    frame/context ring rois through RoILoopPool, boosted and flattened.
    Shared by the unsharded head below and the tensor-parallel tower path
    (parallel/tensor_shard.py)."""
    from nafwebsod_tpu.ops.context import roi_context, roi_loop_pool

    f = feat[0]
    frame, context = roi_context(rois, im_h, im_w, context_ratio)
    pooled = roi_pool(f, rois, resolution, resolution, spatial_scale)
    pooled_f = roi_loop_pool(f, frame, resolution, resolution, spatial_scale)
    pooled_c = roi_loop_pool(f, context, resolution, resolution,
                             spatial_scale)
    outs = []
    for p in (pooled, pooled_f, pooled_c):
        x = roi_feature_boost(p, obn_scores)
        if freeze_body:
            x = jax.lax.stop_gradient(x)
        outs.append(jnp.transpose(x, (0, 3, 1, 2)).reshape(x.shape[0], -1))
    return tuple(outs)


def vgg16_roi_context_2fc_head(params, feat, rois, obn_scores, spatial_scale,
                               im_h, im_w, *, context_ratio=1.8,
                               resolution=7, freeze_body=True, train=False,
                               rng=None):
    """Three-stream context head (wsl_heads.py:684-766
    add_VGG16_roi_context_2fc_head): the original roi through RoIPool plus
    frame/context ring rois through RoILoopPool; all three share the fc6/fc7
    WEIGHTS but have independent dropout."""
    flats = context_pooled_feats(
        feat, rois, obn_scores, spatial_scale, im_h, im_w,
        context_ratio=context_ratio, resolution=resolution,
        freeze_body=freeze_body)
    rngs = [None] * 3
    if rng is not None:
        rngs = list(jax.random.split(rng, 3))
    return tuple(_fc_tower(x, params, '', r, train)
                 for x, r in zip(flats, rngs))  # (fc7, fc7_frame, fc7_ctx)


def wsl_context_outputs(params, fc7s, valid_mask=None, prefix=''):
    """Context two-stream (wsl_heads.py:185-212 add_wsl_context_outputs):
    fc8c from the plain stream; fc8d = FC(frame) - FC(context) with SHARED
    'fc8d_frame' weights."""
    fc7, fc7_frame, fc7_context = fc7s
    fc8c = _fc(fc7, params, prefix + 'fc8c', out_dtype=jnp.float32)
    fc8d_f = _fc(fc7_frame, params, prefix + 'fc8d_frame',
                 out_dtype=jnp.float32)
    fc8d_c = _fc(fc7_context, params, prefix + 'fc8d_frame',
                 out_dtype=jnp.float32)
    fc8d = fc8d_f - fc8d_c
    rois_pred = _two_stream(fc8c, fc8d, valid_mask)
    return {'fc8c': fc8c, 'fc8d': fc8d, 'rois_pred': rois_pred}


def _two_stream(fc8c, fc8d, valid_mask):
    """Softmax over classes (alpha_cls) x masked softmax over RoIs (alpha_det)
    -> rois_pred (wsl_heads.py:51-56). Padded rows are excluded from the
    RoI-dimension softmax and zeroed in the product."""
    alpha_cls = jax.nn.softmax(fc8c, axis=1)
    if valid_mask is not None:
        neg_inf = jnp.finfo(fc8d.dtype).min
        fc8d = jnp.where(valid_mask[:, None], fc8d, neg_inf)
    alpha_det = jax.nn.softmax(fc8d, axis=0)
    rois_pred = alpha_cls * alpha_det
    if valid_mask is not None:
        rois_pred = rois_pred * valid_mask[:, None]
    return rois_pred


def wsl_outputs(params, fc7, valid_mask=None, prefix=''):
    # logits emerge in fp32 regardless of tower dtype: the RoI-dimension
    # softmax over thousands of rows needs fp32 (SURVEY.md §7 numerics)
    fc8c = _fc(fc7, params, prefix + 'fc8c', out_dtype=jnp.float32)
    fc8d = _fc(fc7, params, prefix + 'fc8d', out_dtype=jnp.float32)
    rois_pred = _two_stream(fc8c, fc8d, valid_mask)
    return {'fc8c': fc8c, 'fc8d': fc8d, 'rois_pred': rois_pred}


def webly_outputs(params, fc7_clean, fc7_noisy, valid_mask=None, prefix=''):
    out = wsl_outputs(params, fc7_clean, valid_mask, prefix)
    noisy_fc8c = _fc(fc7_noisy, params, prefix + 'noisy_fc8c',
                     out_dtype=jnp.float32)
    noisy_fc8d = _fc(fc7_noisy, params, prefix + 'noisy_fc8d',
                     out_dtype=jnp.float32)
    fc8c_noise = out['fc8c'] + noisy_fc8c
    fc8d_noise = out['fc8d'] + noisy_fc8d
    out['rois_pred_noise'] = _two_stream(fc8c_noise, fc8d_noise, valid_mask)
    return out


def init_refine_params(rng, num_classes, hidden=4096, k_refine=3,
                       dtype=jnp.float32):
    """Refinement classifier FCs cls_score1..K (wsl_heads.py:110-180:
    gauss(0.01) weights, zero bias, ``num_classes`` outputs incl background).
    """
    params = {}
    keys = jax.random.split(rng, k_refine)
    for k in range(1, k_refine + 1):
        params['cls_score{}_w'.format(k)] = (
            0.01 * jax.random.normal(keys[k - 1], (hidden, num_classes),
                                     dtype))
        params['cls_score{}_b'.format(k)] = jnp.zeros((num_classes,), dtype)
    return params


def refine_score(params, fc7, k):
    """Logits of the k-th refinement classifier, fp32."""
    return _fc(fc7, params, 'cls_score{}'.format(k), out_dtype=jnp.float32)


def cmil_outputs(params, fc7, rois, valid_mask, lam, prefix=''):
    """C-MIL continuation path (wsl_heads.py:81-110 add_wsl_cmil): raw
    fc8c/fc8d -> pre-merge two-stream 'cmil_rois_pred' -> per-RoI max score
    -> RoIMerge with IoU >= lambda -> merged logits feed the main WSDDN
    two-stream. Returns the wsl_outputs dict plus cmil_rois_pred and the
    merged-row validity mask."""
    from nafwebsod_tpu.ops.jbox import roi_iou
    from nafwebsod_tpu.ops.refine import roi_merge

    fc8c = _fc(fc7, params, prefix + 'fc8c', out_dtype=jnp.float32)
    fc8d = _fc(fc7, params, prefix + 'fc8d', out_dtype=jnp.float32)
    cmil_rois_pred = _two_stream(fc8c, fc8d, valid_mask)
    obn = jnp.max(cmil_rois_pred, axis=1, keepdims=True)  # ReduceMax axes=[1]
    iou = roi_iou(rois)
    mc, md, clique, counts, merged_valid = roi_merge(
        obn, iou, fc8c, fc8d, lam, valid_mask)
    rois_pred = _two_stream(mc, md, merged_valid)
    return {'fc8c': mc, 'fc8d': md, 'rois_pred': rois_pred,
            'cmil_rois_pred': cmil_rois_pred, 'merged_valid': merged_valid}


def cls_pred(rois_pred):
    """Image-level class score: sum over RoIs (wsl_heads.py:227), (1, C)."""
    return jnp.sum(rois_pred, axis=0, keepdims=True)


def add_background_column(rois_pred):
    """Test-time: prepend a dummy background column so downstream NMS sees
    num_classes columns (wsl_heads.py:58-67 Split/Concat trick — the first
    foreground class's scores are duplicated as 'background')."""
    return jnp.concatenate([rois_pred[:, :1], rois_pred], axis=1)
