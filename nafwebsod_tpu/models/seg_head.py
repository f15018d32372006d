"""Weakly-supervised mask branch (MODEL.MASK_ON).

Capability parity with the reference's WSL segmentation stack:
``wsl_seg_heads.add_seg_outputs/add_seg_losses`` (wsl_seg_heads.py:34-191)
on top of ``mask_rcnn_fcn_head`` (wsl_seg_heads.py:515-570): RoI features ->
2x (3x3 conv, dilation MRCNN.DILATION) -> 2x2 stride-2 deconv -> 1x1 conv to
num_classes-1 mask logits; the weak loss max-pools each RoI's mask logits to
a per-RoI class logit and applies WeightedSigmoidCrossEntropyWithLogits
against the broadcast image labels with detection-confidence weights
(the MaskUtility reconstruction in ops/seg.py).
"""

import jax
import jax.numpy as jnp

from nafwebsod_tpu.ops.roi_pool import roi_align, roi_pool
from nafwebsod_tpu.ops.seg import (mask_utility,
                                   weighted_sigmoid_cross_entropy_with_logits)


def init_mask_head_params(rng, num_classes, dim_in=512, dim_inner=256,
                          num_convs=2, dtype=jnp.float32):
    params = {}
    keys = jax.random.split(rng, num_convs + 2)
    d = dim_in
    for i in range(num_convs):
        params['_[mask]_fcn{}_w'.format(i + 1)] = (
            0.001 * jax.random.normal(keys[i], (3, 3, d, dim_inner), dtype))
        params['_[mask]_fcn{}_b'.format(i + 1)] = jnp.zeros((dim_inner,),
                                                            dtype)
        d = dim_inner
    # ConvTranspose 2x2 stride 2 (HWIO for conv_transpose)
    params['conv5_mask_w'] = 0.001 * jax.random.normal(
        keys[-2], (2, 2, dim_inner, dim_inner), dtype)
    params['conv5_mask_b'] = jnp.zeros((dim_inner,), dtype)
    params['mask_fcn_logits_w'] = 0.001 * jax.random.normal(
        keys[-1], (1, 1, dim_inner, num_classes - 1), dtype)
    params['mask_fcn_logits_b'] = jnp.zeros((num_classes - 1,), dtype)
    return params


def mask_head_forward(params, feat, rois, spatial_scale, *, resolution=14,
                      method='RoIAlign', sampling_ratio=2, dilation=2,
                      num_convs=2):
    """feat: (H, W, C); rois: (R, 5). Returns (R, 2*res, 2*res, C-1) mask
    logits."""
    if method == 'RoIAlign':
        x = roi_align(feat, rois, resolution, resolution, spatial_scale,
                      max(sampling_ratio, 1))
    else:
        x = roi_pool(feat, rois, resolution, resolution, spatial_scale)
    x = x.astype(jnp.float32)
    for i in range(num_convs):
        w = params['_[mask]_fcn{}_w'.format(i + 1)]
        x = jax.lax.conv_general_dilated(
            x, w, window_strides=(1, 1),
            padding=((dilation, dilation), (dilation, dilation)),
            rhs_dilation=(dilation, dilation),
            dimension_numbers=('NHWC', 'HWIO', 'NHWC'))
        x = jax.nn.relu(x + params['_[mask]_fcn{}_b'.format(i + 1)])
    # 2x upsample deconv
    x = jax.lax.conv_transpose(
        x, params['conv5_mask_w'], strides=(2, 2), padding='VALID',
        dimension_numbers=('NHWC', 'HWIO', 'NHWC'))
    x = jax.nn.relu(x + params['conv5_mask_b'])
    logits = jax.lax.conv_general_dilated(
        x, params['mask_fcn_logits_w'], window_strides=(1, 1),
        padding='VALID', dimension_numbers=('NHWC', 'HWIO', 'NHWC'))
    return logits + params['mask_fcn_logits_b']


def mask_losses(mask_logits, rois_pred, rois, labels_oh, valid_mask=None):
    """add_seg_losses (wsl_seg_heads.py:169-191): max-pool each RoI's mask
    logits over space -> per-RoI class logits; weighted sigmoid CE vs the
    broadcast image labels; AveragedLoss."""
    mask_w, _, mask_labels = mask_utility(rois_pred, rois, labels_oh)
    cls_logits = jnp.max(mask_logits, axis=(1, 2))  # (R, C-1)
    xent = weighted_sigmoid_cross_entropy_with_logits(
        cls_logits, mask_labels, mask_w)
    if valid_mask is not None:
        xent = xent * valid_mask
        return jnp.sum(xent) / jnp.maximum(jnp.sum(valid_mask), 1.0)
    return jnp.mean(xent)


def mask_probs_test(mask_logits):
    """Test-time: prepend the duplicated background channel then sigmoid
    (wsl_seg_heads.py:77-89)."""
    logits = jnp.concatenate([mask_logits[..., :1], mask_logits], axis=-1)
    return jax.nn.sigmoid(logits)
