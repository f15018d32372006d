"""Supervised RetinaNet head (functional JAX, NHWC).

Capability parity with ``detectron/modeling/retinanet_heads.py:64-246``
(add_fpn_retinanet_outputs) and ``:447-510`` (add_fpn_retinanet_losses):
class and box conv subnets shared across FPN levels, prior-prob bias init on
the class predictor, sigmoid focal loss normalized by the fg count, and
select-smooth-L1 (beta = RETINANET.BBOX_REG_BETA) on fg anchors. Anchor
enumeration matches ``detectron/core/test_retinanet.py:_create_cell_anchors``
(per level: one size per octave x aspect ratios).

Runs over the pyramid from ``detector.body_forward_fpn`` (levels
FPN.RPN_MIN_LEVEL..RPN_MAX_LEVEL, conv extra levels). Training targets come
from ``ops/rpn_device.retinanet_targets`` — computed on device from padded
gt blobs instead of the reference's loader-side numpy.
"""

import numpy as np

import jax
import jax.numpy as jnp

from nafwebsod_tpu.ops import rpn_device


def cell_anchors(lvl, anchor_scale, scales_per_octave, aspect_ratios):
    """(A, 4) cell anchors for one pyramid level
    (test_retinanet.py:38-64)."""
    from nafwebsod_tpu.ops import rpn as rpn_host

    stride = 2.0 ** lvl
    out = []
    for octave in range(scales_per_octave):
        octave_scale = 2 ** (octave / float(scales_per_octave))
        for aspect in aspect_ratios:
            out.append(rpn_host.generate_anchors(
                stride=stride, sizes=(stride * octave_scale * anchor_scale,),
                aspect_ratios=(aspect,)))
    return np.vstack(out).astype(np.float32)


def init_params(rng, spec):
    """Class/box subnets (retinanet_heads.py:88-146). Weight gauss(0.01);
    class predictor bias = -log((1-p)/p) (get_retinanet_bias_init)."""
    a = spec.retinanet_scales_per_octave * len(spec.retinanet_aspect_ratios)
    c = spec.num_classes - 1
    dim = spec.fpn_dim
    bbox_out = 4 * a * (c if spec.retinanet_class_specific_bbox else 1)
    params = {}
    keys = jax.random.split(rng, 2 * spec.retinanet_num_convs + 2)
    ki = 0
    for stream in ('cls', 'bbox'):
        for n in range(spec.retinanet_num_convs):
            params['retnet_{}_conv_n{}_w'.format(stream, n)] = (
                0.01 * jax.random.normal(keys[ki], (3, 3, dim, dim)))
            params['retnet_{}_conv_n{}_b'.format(stream, n)] = (
                jnp.zeros((dim,)))
            ki += 1
    params['retnet_cls_pred_w'] = 0.01 * jax.random.normal(
        keys[ki], (3, 3, dim, a * c)); ki += 1
    bias = -float(np.log((1 - spec.retinanet_prior_prob) /
                         spec.retinanet_prior_prob))
    params['retnet_cls_pred_b'] = jnp.full((a * c,), bias)
    params['retnet_bbox_pred_w'] = 0.01 * jax.random.normal(
        keys[ki], (3, 3, dim, bbox_out))
    params['retnet_bbox_pred_b'] = jnp.zeros((bbox_out,))
    return params


def _conv3(x, params, name):
    w = params[name + '_w'].astype(x.dtype)
    y = jax.lax.conv_general_dilated(
        x, w, (1, 1), ((1, 1), (1, 1)),
        dimension_numbers=('NHWC', 'HWIO', 'NHWC'),
        preferred_element_type=x.dtype)
    return y + params[name + '_b'].astype(x.dtype)


def head_forward(spec, params, levels):
    """Apply the shared subnets to every pyramid level. Returns
    ({lvl: cls_logits (1,h,w,A*(C-1))}, {lvl: bbox_pred (1,h,w,4A[*C-1])})."""
    cls_out, bbox_out = {}, {}
    for lvl in range(spec.fpn_rpn_min_level, spec.fpn_rpn_max_level + 1):
        x = levels[lvl]
        c = x
        for n in range(spec.retinanet_num_convs):
            c = jax.nn.relu(_conv3(c, params, 'retnet_cls_conv_n{}'.format(n)))
        cls_out[lvl] = _conv3(c, params, 'retnet_cls_pred').astype(
            jnp.float32)
        b = x
        for n in range(spec.retinanet_num_convs):
            b = jax.nn.relu(_conv3(b, params,
                                   'retnet_bbox_conv_n{}'.format(n)))
        bbox_out[lvl] = _conv3(b, params, 'retnet_bbox_pred').astype(
            jnp.float32)
    return cls_out, bbox_out


def flat_anchors(spec, cls_out):
    """Concatenate each level's (H, W, A)-ordered anchor grid."""
    a = spec.retinanet_scales_per_octave * len(spec.retinanet_aspect_ratios)
    anchors = []
    for lvl in range(spec.fpn_rpn_min_level, spec.fpn_rpn_max_level + 1):
        base = cell_anchors(lvl, spec.retinanet_anchor_scale,
                            spec.retinanet_scales_per_octave,
                            spec.retinanet_aspect_ratios)
        h, w = cls_out[lvl].shape[1], cls_out[lvl].shape[2]
        anchors.append(rpn_device.shifted_anchors(h, w, 2.0 ** lvl, base))
    return jnp.concatenate(anchors)


def sigmoid_focal_loss(logits, labels, num_classes, alpha=0.25, gamma=2.0):
    """Caffe2 SigmoidFocalLoss (sigmoid_focal_loss_op): per anchor x class,
    target=1 where labels == class+1; anchors with label -1 are ignored.
    Returns the unnormalized sum."""
    c = num_classes - 1
    t = jax.nn.one_hot(labels - 1, c)            # (N, C-1); label<=0 -> 0
    valid = (labels >= 0)[:, None]
    p = jax.nn.sigmoid(logits)
    pt = jnp.where(t > 0, p, 1.0 - p)
    at = jnp.where(t > 0, alpha, 1.0 - alpha)
    fl = -at * (1.0 - pt) ** gamma * jnp.log(jnp.maximum(pt, 1e-12))
    return jnp.sum(jnp.where(valid, fl, 0.0))


def select_smooth_l1(bbox_pred, targets, fg_mask, num_fg, beta=0.11):
    """Caffe2 SelectSmoothL1Loss: smooth-L1 on fg anchors' 4 deltas,
    normalized by num_fg."""
    d = bbox_pred - targets
    ad = jnp.abs(d)
    sl1 = jnp.where(ad < beta, 0.5 * d * d / beta, ad - 0.5 * beta)
    return jnp.sum(jnp.where(fg_mask[:, None], sl1, 0.0)) / num_fg


def losses(spec, cls_out, bbox_out, gt_boxes, gt_classes, gt_valid):
    """Focal + select-smooth-L1 losses over all levels
    (retinanet_heads.py:447-510)."""
    c = spec.num_classes - 1
    anchors = flat_anchors(spec, cls_out)
    labels, targets, fg, num_fg = rpn_device.retinanet_targets(
        anchors, gt_boxes, gt_classes, gt_valid,
        positive_overlap=spec.retinanet_positive_overlap,
        negative_overlap=spec.retinanet_negative_overlap)
    logits = jnp.concatenate([
        cls_out[lvl].reshape(-1, c)
        for lvl in range(spec.fpn_rpn_min_level,
                         spec.fpn_rpn_max_level + 1)])
    if spec.retinanet_class_specific_bbox:
        # (N, C-1, 4) -> pick the gt class's 4 deltas per fg anchor
        preds = jnp.concatenate([
            bbox_out[lvl].reshape(-1, c, 4)
            for lvl in range(spec.fpn_rpn_min_level,
                             spec.fpn_rpn_max_level + 1)])
        sel = jnp.clip(labels - 1, 0, c - 1)
        pred4 = preds[jnp.arange(preds.shape[0]), sel]
    else:
        pred4 = jnp.concatenate([
            bbox_out[lvl].reshape(-1, 4)
            for lvl in range(spec.fpn_rpn_min_level,
                             spec.fpn_rpn_max_level + 1)])
    loss_cls = sigmoid_focal_loss(
        logits, labels, spec.num_classes,
        alpha=spec.retinanet_loss_alpha,
        gamma=spec.retinanet_loss_gamma) / num_fg
    loss_bbox = spec.retinanet_bbox_reg_weight * select_smooth_l1(
        pred4, targets, fg, num_fg, beta=spec.retinanet_bbox_reg_beta)
    return {'loss_retnet_cls': loss_cls, 'loss_retnet_bbox': loss_bbox}
