"""Single-scale RPN head (functional JAX, NHWC).

Capability parity with ``detectron/modeling/rpn_heads.py:55-154``
(add_single_scale_rpn_outputs/losses): 3x3 hidden conv + 1x1 cls logits (A
maps) + 1x1 bbox deltas (4A maps); losses are SigmoidCrossEntropyLoss over
labeled anchors (-1 = ignore, normalized by the labeled count) and SmoothL1
with beta=1/9 over the anchor-target weights from ``ops/rpn.rpn_targets``.
"""

import jax
import jax.numpy as jnp

from nafwebsod_tpu.ops import losses as loss_ops


def init_rpn_params(rng, dim_in, num_anchors, dtype=jnp.float32):
    k1, k2, k3 = jax.random.split(rng, 3)
    return {
        'conv_rpn_w': 0.01 * jax.random.normal(k1, (3, 3, dim_in, dim_in),
                                               dtype),
        'conv_rpn_b': jnp.zeros((dim_in,), dtype),
        'rpn_cls_logits_w': 0.01 * jax.random.normal(
            k2, (1, 1, dim_in, num_anchors), dtype),
        'rpn_cls_logits_b': jnp.zeros((num_anchors,), dtype),
        'rpn_bbox_pred_w': 0.01 * jax.random.normal(
            k3, (1, 1, dim_in, 4 * num_anchors), dtype),
        'rpn_bbox_pred_b': jnp.zeros((4 * num_anchors,), dtype),
    }


def _conv(x, w, b, pad):
    y = jax.lax.conv_general_dilated(
        x, w, (1, 1), ((pad, pad), (pad, pad)),
        dimension_numbers=('NHWC', 'HWIO', 'NHWC'),
        preferred_element_type=x.dtype)
    return y + b.astype(x.dtype)


def forward(params, feat):
    """feat: (1, H, W, C). Returns (cls_logits (1, H, W, A),
    bbox_pred (1, H, W, 4A))."""
    h = jax.nn.relu(_conv(feat, params['conv_rpn_w'].astype(feat.dtype),
                          params['conv_rpn_b'], 1))
    cls = _conv(h, params['rpn_cls_logits_w'].astype(feat.dtype),
                params['rpn_cls_logits_b'], 0).astype(jnp.float32)
    bbox = _conv(h, params['rpn_bbox_pred_w'].astype(feat.dtype),
                 params['rpn_bbox_pred_b'], 0).astype(jnp.float32)
    return cls, bbox


def losses(cls_logits, bbox_pred, labels, bbox_targets, inside_w, outside_w):
    """cls_logits: (1, H, W, A) -> flattened against per-anchor labels
    ordered (H, W, A); labels: (H*W*A,) in {-1, 0, 1}."""
    return losses_flat(cls_logits.reshape(-1), bbox_pred.reshape(-1, 4),
                       labels, bbox_targets, inside_w, outside_w)


def losses_flat(logits, bbox_pred, labels, bbox_targets, inside_w,
                outside_w):
    """Flat-anchor variant (FPN: anchors concatenated over levels).
    logits: (N,); bbox_pred: (N, 4)."""
    valid = labels >= 0
    # SigmoidCrossEntropyLoss: mean over the labeled anchors
    x = logits
    t = jnp.maximum(labels, 0).astype(jnp.float32)
    elem = jnp.maximum(x, 0) - x * t + jnp.log1p(jnp.exp(-jnp.abs(x)))
    loss_cls = jnp.sum(jnp.where(valid, elem, 0.0)) / jnp.maximum(
        jnp.sum(valid), 1)

    d = inside_w * (bbox_pred - bbox_targets)
    ad = jnp.abs(d)
    beta = 1.0 / 9.0
    sl1 = jnp.where(ad < beta, 0.5 * d * d / beta, ad - 0.5 * beta)
    loss_bbox = jnp.sum(sl1 * outside_w)
    return {'loss_rpn_cls': loss_cls, 'loss_rpn_bbox': loss_bbox}
