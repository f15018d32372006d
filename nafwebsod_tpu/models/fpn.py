"""Feature Pyramid Network over a ResNet body (functional JAX, NHWC).

Capability parity with ``detectron/modeling/FPN.py`` (add_fpn_onto_conv_body:
lateral 1x1 convs + nearest-neighbor top-down pathway + 3x3 post-hoc convs;
RetinaNet's extra coarse levels P6/P7 from stride-2 convs on the previous
level, with P7 preceded by ReLU — FPN.py LOWEST_BACKBONE_LVL..retinanet
variant). Param names are simplified but documented: fpn_inner{k}_w/b
(lateral at backbone level k), fpn_post{k}_w/b, fpn_extra{k}_w/b for P6/P7.
"""

import jax
import jax.numpy as jnp
import numpy as np


def _conv(x, params, name, stride=1, pad=None):
    w = params[name + '_w'].astype(x.dtype)
    k = w.shape[0]
    if pad is None:
        pad = (k - 1) // 2
    y = jax.lax.conv_general_dilated(
        x, w, (stride, stride), ((pad, pad), (pad, pad)),
        dimension_numbers=('NHWC', 'HWIO', 'NHWC'),
        preferred_element_type=x.dtype)
    return y + params[name + '_b'].astype(x.dtype)


def _upsample2(x):
    """Nearest-neighbor 2x (FPN.py UpsampleNearest)."""
    n, h, w, c = x.shape
    return jnp.repeat(jnp.repeat(x, 2, axis=1), 2, axis=2)


def param_shapes(stage_dims, fpn_dim=256, min_level=3, max_level=7,
                 lowest_backbone=2, highest_backbone=5,
                 extra_conv_levels=True):
    """stage_dims: channel counts of res2..res5 (index 0 = res2).

    ``extra_conv_levels=False`` (the Fast/Faster R-CNN FPN default,
    cfg.FPN.EXTRA_CONV_LEVELS): levels above the backbone are parameter-free
    stride-2 subsampling of the top level; True (RetinaNet) gives them
    stride-2 convs."""
    shapes = {}
    for k in range(max(min_level, lowest_backbone), highest_backbone + 1):
        d = stage_dims[k - 2]
        shapes['fpn_inner{}_w'.format(k)] = (1, 1, d, fpn_dim)
        shapes['fpn_inner{}_b'.format(k)] = (fpn_dim,)
        shapes['fpn_post{}_w'.format(k)] = (3, 3, fpn_dim, fpn_dim)
        shapes['fpn_post{}_b'.format(k)] = (fpn_dim,)
    if extra_conv_levels:
        for k in range(highest_backbone + 1, max_level + 1):
            d_in = stage_dims[-1] if k == highest_backbone + 1 else fpn_dim
            shapes['fpn_extra{}_w'.format(k)] = (3, 3, d_in, fpn_dim)
            shapes['fpn_extra{}_b'.format(k)] = (fpn_dim,)
    return shapes


def init_params(rng, stage_dims, fpn_dim=256, min_level=3, max_level=7,
                extra_conv_levels=True, dtype=jnp.float32):
    shapes = param_shapes(stage_dims, fpn_dim, min_level, max_level,
                          highest_backbone=len(stage_dims) + 1,
                          extra_conv_levels=extra_conv_levels)
    params = {}
    keys = jax.random.split(rng, len(shapes))
    for i, (name, shape) in enumerate(sorted(shapes.items())):
        if name.endswith('_b'):
            params[name] = jnp.zeros(shape, dtype)
        else:
            std = 0.01
            params[name] = std * jax.random.normal(keys[i], shape, dtype)
    return params


def map_rois_to_fpn_levels(rois_xyxy, k_min, k_max, canonical_scale=224,
                           canonical_level=4):
    """FPN paper Eqn.(1) level assignment (FPN.py:500-512). rois: (R, 4)."""
    w = rois_xyxy[:, 2] - rois_xyxy[:, 0] + 1
    h = rois_xyxy[:, 3] - rois_xyxy[:, 1] + 1
    s = np.sqrt(np.maximum(w * h, 0))
    target = np.floor(canonical_level + np.log2(s / canonical_scale + 1e-6))
    return np.clip(target, k_min, k_max).astype(np.int64)


def distribute_rois_over_fpn_levels(rois5, k_min, k_max, canonical_scale=224,
                                    canonical_level=4):
    """Split (R, 5) rois into per-level blobs plus the restore permutation
    (FPN.add_multilevel_roi_blobs / roi_data/wsl.py:184-209). Returns
    ({lvl: rois}, restore_index) where concatenating the per-level blobs in
    level order and indexing with restore_index recovers the input order."""
    lvls = map_rois_to_fpn_levels(rois5[:, 1:5], k_min, k_max,
                                  canonical_scale, canonical_level)
    per_level = {}
    order = []
    for lvl in range(k_min, k_max + 1):
        idx = np.where(lvls == lvl)[0]
        per_level[lvl] = rois5[idx]
        order.append(idx)
    order = np.concatenate(order) if order else np.zeros((0,), np.int64)
    restore = np.argsort(order)
    return per_level, restore


def map_rois_to_fpn_levels_dev(rois_xyxy, k_min, k_max, canonical_scale=224,
                               canonical_level=4):
    """Device twin of ``map_rois_to_fpn_levels`` (FPN paper Eqn.1,
    FPN.py:500-512). rois: (R, 4) jnp. Returns int32 levels (R,)."""
    w = rois_xyxy[:, 2] - rois_xyxy[:, 0] + 1
    h = rois_xyxy[:, 3] - rois_xyxy[:, 1] + 1
    s = jnp.sqrt(jnp.maximum(w * h, 0.0))
    target = jnp.floor(canonical_level +
                       jnp.log2(s / canonical_scale + 1e-6))
    return jnp.clip(target, k_min, k_max).astype(jnp.int32)


def multilevel_roi_pool(levels, scales, rois5, obn_scores, *, k_min, k_max,
                        method='RoIAlign', resolution=7, sampling_ratio=2,
                        canonical_scale=224, canonical_level=4,
                        freeze_body=False, flatten=True):
    """FPN-aware RoIFeatureTransform (detector.py:268-331), TPU-first.

    The reference splits rois into per-level blobs on the host and
    BatchPermutation-restores the order; with XLA's static shapes we instead
    pool EVERY roi on EVERY level and select each roi's assigned level with
    a mask — L small pooling passes, no dynamic shapes, no permutation.
    Returns flattened (R, C*res*res) boosted features.
    """
    import jax
    from nafwebsod_tpu.ops.roi_pool import roi_align, roi_pool
    from nafwebsod_tpu.ops.roi_pool import roi_feature_boost

    lvls = map_rois_to_fpn_levels_dev(rois5[:, 1:5], k_min, k_max,
                                      canonical_scale, canonical_level)
    out = None
    for lvl in range(k_min, k_max + 1):
        feat = levels[lvl][0]  # (H, W, C)
        if method == 'RoIAlign':
            pooled = roi_align(feat, rois5, resolution, resolution,
                               scales[lvl], max(sampling_ratio, 1))
        else:
            pooled = roi_pool(feat, rois5, resolution, resolution,
                              scales[lvl])
        sel = (lvls == lvl).astype(pooled.dtype)[:, None, None, None]
        out = pooled * sel if out is None else out + pooled * sel
    out = roi_feature_boost(out, obn_scores)
    if freeze_body:
        out = jax.lax.stop_gradient(out)
    if not flatten:
        return out
    r = out.shape[0]
    return jnp.transpose(out, (0, 3, 1, 2)).reshape(r, -1)


def forward(params, stages, fpn_dim=256, min_level=3, max_level=7,
            extra_conv_levels=True):
    """stages: [res2, ..., res5] NHWC feature maps. Returns dict
    {level: feature} for levels min_level..max_level and the per-level
    spatial scales."""
    highest_backbone = len(stages) + 1  # res5 -> 5
    # top-down pathway over backbone levels
    inners = {}
    top = _conv(stages[-1], params, 'fpn_inner{}'.format(highest_backbone))
    inners[highest_backbone] = top
    for k in range(highest_backbone - 1, max(min_level, 2) - 1, -1):
        lateral = _conv(stages[k - 2], params, 'fpn_inner{}'.format(k))
        td = _upsample2(inners[k + 1])
        td = td[:, :lateral.shape[1], :lateral.shape[2]]  # odd-size crop
        inners[k] = lateral + td

    levels = {}
    scales = {}
    for k in range(max(min_level, 2), highest_backbone + 1):
        if k < min_level:
            continue
        levels[k] = _conv(inners[k], params, 'fpn_post{}'.format(k))
        scales[k] = 1.0 / (2 ** k)
    if extra_conv_levels:
        # coarse levels (retinanet): P6 from res5 conv/2; P7 from relu(P6)
        prev = stages[-1]
        for k in range(highest_backbone + 1, max_level + 1):
            if k > highest_backbone + 1:
                prev = jax.nn.relu(prev)
            prev = _conv(prev, params, 'fpn_extra{}'.format(k), stride=2)
            levels[k] = prev
            scales[k] = 1.0 / (2 ** k)
    else:
        # Fast/Faster R-CNN FPN: parameter-free stride-2 subsample of the
        # top level (FPN.py MaxPool kernel 1 stride 2)
        prev = levels.get(highest_backbone)
        for k in range(highest_backbone + 1, max_level + 1):
            prev = prev[:, ::2, ::2, :]
            levels[k] = prev
            scales[k] = 1.0 / (2 ** k)
    return levels, scales
