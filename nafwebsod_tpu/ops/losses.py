"""Loss kernels for the WSL/webly stack (pure JAX with custom VJPs).

TPU-native re-implementations of the reference's native loss operators:

  * ``cross_entropy_with_logits`` / ``weighted_cross_entropy_with_logits`` —
    ``detectron/ops/cross_entropy_wsl_op.cc:8-180``. Despite the name these
    operate on *probabilities*: binary CE summed over all elements, divided by
    C when ``is_mean`` and always by N; probabilities clamped at 1e-20 before
    log; the analytic gradient is clamped at +1e4 (kDIFF_THRESHOLD) *before*
    the 1/N scale (and before the per-element weight in the weighted variant).
    The gradient clamp requires a custom VJP — plain autodiff would differ.
  * ``min_entropy_loss`` — ``detectron/ops/min_entropy_loss_op.cc``:
    -sum(p log p) over RoIs of ground-truth classes, averaged.
  * ``softmax_with_loss_n`` — ``detectron/ops/softmax_with_loss_n_op.cc``:
    softmax cross-entropy with a per-RoI weight input (used by the OICR /
    C-MIL refinement ladders).
"""

from functools import partial

import jax
import jax.numpy as jnp

KLOG_THRESHOLD = 1e-20
KDIFF_THRESHOLD = 1e4


# --------------------------------------------------------------------------- #
# (Weighted)CrossEntropyWithLogits
# --------------------------------------------------------------------------- #

@partial(jax.custom_vjp, nondiff_argnums=(2,))
def cross_entropy_with_logits(probs, labels, is_mean=False):
    return _ce_fwd_value(probs, labels, None, is_mean)


def _ce_fwd_value(probs, labels, weights, is_mean):
    n, c = probs.shape
    norm = float(c) if is_mean else 1.0
    p = jnp.maximum(probs, KLOG_THRESHOLD)
    one_p = jnp.maximum(1.0 - probs, KLOG_THRESHOLD)
    elem = -(labels * jnp.log(p) + (1.0 - labels) * jnp.log(one_p))
    if weights is not None:
        elem = elem * weights
    return jnp.sum(elem) / norm / n


def _ce_fwd(probs, labels, is_mean):
    return _ce_fwd_value(probs, labels, None, is_mean), (probs, labels)


def _ce_bwd(is_mean, res, g):
    probs, labels = res
    n, c = probs.shape
    norm = float(c) if is_mean else 1.0
    p = jnp.maximum(probs, KLOG_THRESHOLD)
    one_p = jnp.maximum(1.0 - probs, KLOG_THRESHOLD)
    grad = g * (-labels / p + (1.0 - labels) / one_p) / norm
    grad = jnp.minimum(grad, KDIFF_THRESHOLD) / n
    return grad, None


cross_entropy_with_logits.defvjp(_ce_fwd, _ce_bwd)


@partial(jax.custom_vjp, nondiff_argnums=(3,))
def weighted_cross_entropy_with_logits(probs, labels, weights, is_mean=False):
    return _ce_fwd_value(probs, labels, weights, is_mean)


def _wce_fwd(probs, labels, weights, is_mean):
    return (
        _ce_fwd_value(probs, labels, weights, is_mean),
        (probs, labels, weights),
    )


def _wce_bwd(is_mean, res, g):
    probs, labels, weights = res
    n, c = probs.shape
    norm = float(c) if is_mean else 1.0
    p = jnp.maximum(probs, KLOG_THRESHOLD)
    one_p = jnp.maximum(1.0 - probs, KLOG_THRESHOLD)
    grad = g * (-labels / p + (1.0 - labels) / one_p) / norm
    # clamp BEFORE the weight and the 1/N scale (cross_entropy_wsl_op.cc:166-177)
    grad = jnp.minimum(grad, KDIFF_THRESHOLD) * weights / n
    return grad, None, None


weighted_cross_entropy_with_logits.defvjp(_wce_fwd, _wce_bwd)


# --------------------------------------------------------------------------- #
# MinEntropyLoss: -mean over gt classes of sum_r p log p
# --------------------------------------------------------------------------- #

def min_entropy_loss(rois_pred, labels_oh, valid_mask=None):
    """-sum_r p*log(p) over RoIs for each ground-truth class, divided by the
    number of (gt-class, RoI) contributions (min_entropy_loss_op.cc:7-46).

    rois_pred: (R, C) probabilities; labels_oh: (1, C) one-hot image labels;
    valid_mask: optional (R,) bool for padded RoIs.
    """
    p = jnp.maximum(rois_pred, KLOG_THRESHOLD)
    ent = -p * jnp.log(p)  # (R, C); clamped prob in both factors (op :36-38)
    if valid_mask is not None:
        ent = ent * valid_mask[:, None]
        r_count = jnp.sum(valid_mask)
    else:
        r_count = rois_pred.shape[0]
    per_class = jnp.sum(ent, axis=0)  # (C,)
    gt = labels_oh[0]
    num = jnp.sum(per_class * gt)
    count = jnp.maximum(jnp.sum(gt) * r_count, 1.0)
    return num / count


# --------------------------------------------------------------------------- #
# SoftmaxWithLossN: per-RoI-weighted softmax cross entropy
# --------------------------------------------------------------------------- #

@jax.custom_vjp
def softmax_with_loss_n(logits, labels, roi_weights):
    """Softmax CE over classes with a per-row weight
    (softmax_with_loss_n_op.cc). logits: (R, C); labels: (R,) int32 class
    ids; roi_weights: (R,) float — padded rows must carry weight 0.

    Forward: sum_r w_r * -log softmax(logits)_r[label_r] / sum_r w_r
    (``:209-261``). The hand-written backward normalizes by the COUNT of
    nonzero-weight rows instead of the weight sum (``:304-360``) — an
    intentional asymmetry reproduced via this custom VJP.
    """
    return _swln_value(logits, labels, roi_weights)


def _swln_value(logits, labels, roi_weights):
    logp = jax.nn.log_softmax(logits, axis=1)
    r = logits.shape[0]
    picked = logp[jnp.arange(r), labels]
    total_w = jnp.sum(roi_weights)
    loss = -jnp.sum(roi_weights * picked)
    return jnp.where(total_w != 0, loss / total_w, 0.0)


def _swln_fwd(logits, labels, roi_weights):
    return (_swln_value(logits, labels, roi_weights),
            (logits, labels, roi_weights))


def _swln_bwd(res, g):
    logits, labels, roi_weights = res
    r, c = logits.shape
    p = jax.nn.softmax(logits, axis=1)
    onehot = jax.nn.one_hot(labels, c, dtype=p.dtype)
    count = jnp.sum(roi_weights != 0)
    scale = jnp.where(count > 0, g / count, 0.0)
    grad = roi_weights[:, None] * (p - onehot) * scale
    return grad, None, None


softmax_with_loss_n.defvjp(_swln_fwd, _swln_bwd)


def smooth_l1_loss(pred, targets, inside_weights, outside_weights, beta=1.0,
                   valid_mask=None):
    """Caffe2 SmoothL1Loss (detectron op): elementwise smooth-L1 of
    inside_weights * (pred - targets), scaled by outside_weights, summed and
    divided by the number of rows (the batch dim)."""
    d = inside_weights * (pred - targets)
    ad = jnp.abs(d)
    elem = jnp.where(ad < beta, 0.5 * d * d / beta, ad - 0.5 * beta)
    elem = elem * outside_weights
    if valid_mask is not None:
        elem = elem * valid_mask[:, None]
        n = jnp.maximum(jnp.sum(valid_mask), 1.0)
    else:
        n = pred.shape[0]
    return jnp.sum(elem) / n


def softmax_with_loss(logits, labels, valid_mask=None):
    """Caffe2 SoftmaxWithLoss: mean softmax CE over rows."""
    logp = jax.nn.log_softmax(logits, axis=1)
    picked = logp[jnp.arange(logits.shape[0]), labels]
    if valid_mask is not None:
        picked = picked * valid_mask
        n = jnp.maximum(jnp.sum(valid_mask), 1.0)
    else:
        n = logits.shape[0]
    return -jnp.sum(picked) / n


def averaged_loss(x):
    """Caffe2 AveragedLoss: mean of the (already reduced) loss tensor."""
    return jnp.mean(x)


def multilabel_accuracy(cls_prob, labels_oh):
    """The reference logs Caffe2 ``Accuracy(cls_prob, labels_int32)``: whether
    the argmax class of the image-level score is one of the gt classes."""
    top = jnp.argmax(cls_prob[0])
    return labels_oh[0, top]
