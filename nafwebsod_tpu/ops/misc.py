"""Small operator-inventory ops (SURVEY.md §2.2 long tail), pure JAX.

  * ``roi_entropy``      — ``roi_entropy_op.cu:40-139`` (RoIEntropy): per
    class, 1 - H(p)/log(n) of post-NMS scores where p_i = s_i / sum s;
    classes with <= 1 rois give 1.0.
  * ``entropy_weight``   — the legacy ``webly_heads.add_entropy_weight:218``
    chain (bg-column concat -> device NMS at 0.9 -> RoIEntropy ->
    max(entropy, 1 - labels)).
  * ``roi_score_reshape`` / ``roi_score_pool`` — ``roi_score_reshape_op`` /
    ``roi_score_pool_op`` (dormant alternative to the ReduceSum image score,
    wsl_heads.py:216-225): (R, C) scores -> (B, R_max, C) and max/avg-pool
    over the RoI axis.
  * ``kl_balanced``      — ``kl_op.cu:11-17,54-85``: the reference KL
    op's ACTUAL kernel (pos/neg-balanced sigmoid-xent-style divergence
    with ignore at 0.5); ``kl_loss`` is the plain KL(label || pred)
    utility variant with the 1e-20 clamp.
  * ``label_cross_entropy_wsl`` — ``cross_entropy_wsl_op.cu:82-121``
    (CLASSWISE): per-(image, class) CE of per-pixel probabilities at gt-label
    pixels, normalized by the image's pos/neg pixel counts; gradient is the
    analytic -1/x (autodiff matches since the forward is -log(max(x, th))).
  * ``sigmoid_cross_entropy_with_logits_wsl`` — same file ``:246-300``:
    elementwise sigmoid CE with an ignore value.
  * ``self_weight_ce``   — ``webly_heads.add_cross_entropy_loss_self_weight``
    (:102-121): weight = pred on gt classes, (1 - pred) on the rest.
  * ``Stat``             — ``stat_op.cu:23-80``: running masked mean
    accumulator (functional state).
  * ``zero_even``        — ``zero_even_op.cc`` (upstream's custom-op tutorial
    exemplar, kept with its unit test like the reference keeps
    tests/test_zero_even_op.py).
"""

import jax
import jax.numpy as jnp

from nafwebsod_tpu.ops.jbox import nms as device_nms

KLOG_THRESHOLD = 1e-20


def roi_entropy(scores, classes, num_classes, valid_mask=None):
    """scores: (N,) post-NMS detection scores; classes: (N,) int class ids
    (0-based after bg removal). Returns (1, num_classes) with
    1 - H/log(n_c)."""
    if valid_mask is None:
        valid_mask = jnp.ones_like(scores, bool)
    oh = jax.nn.one_hot(classes, num_classes, dtype=scores.dtype)
    oh = oh * valid_mask[:, None].astype(scores.dtype)
    n = jnp.sum(oh, axis=0)                        # (C,)
    cs = jnp.sum(oh * scores[:, None], axis=0)     # (C,) score sums
    p = jnp.where(cs[None] > 0, scores[:, None] * oh / jnp.maximum(cs, 1e-20),
                  0.0)
    plogp = jnp.where(p > 0, p * jnp.log(p), 0.0)
    h = jnp.sum(plogp, axis=0)                     # = -H (negative entropy)
    e = jnp.where(n > 1, 1.0 + h / jnp.log(jnp.maximum(n, 2.0)), 1.0)
    return e[None, :]


def entropy_weight(rois_pred, rois, labels_oh, valid_mask=None,
                   nms_thresh=0.9, score_thresh=1e-11):
    """Legacy per-class entropy weighting (webly_heads.py:218-263): per-class
    NMS at 0.9 on the device, RoIEntropy over survivors, then
    weight = max(entropy, 1 - labels)."""
    r, c = rois_pred.shape
    boxes = rois[:, 1:5]
    es = []
    for cls in range(c):
        s = rois_pred[:, cls]
        s = jnp.where((s > score_thresh) &
                      (valid_mask if valid_mask is not None else True),
                      s, -jnp.inf)
        keep, _ = device_nms(boxes, s, nms_thresh)
        kept_scores = jnp.where(keep, rois_pred[:, cls], 0.0)
        e = roi_entropy(kept_scores, jnp.full((r,), cls), c, keep)
        es.append(e[0, cls])
    entropy = jnp.stack(es)[None, :]
    return jnp.maximum(entropy, 1.0 - labels_oh)


def roi_score_reshape(scores, num_rois, batch_size=1):
    """(R, C) -> (B, num_rois, C), zero-padded (roi_score_reshape_op)."""
    r, c = scores.shape
    out = jnp.zeros((batch_size, num_rois, c), scores.dtype)
    take = min(r, num_rois)
    return out.at[0, :take].set(scores[:take])


def roi_score_pool(scores_3d, method='sum', valid_mask=None):
    """(B, R, C) -> (B, C) pooled image scores (roi_score_pool_op)."""
    if valid_mask is not None:
        scores_3d = scores_3d * valid_mask[None, :, None]
    if method == 'max':
        return jnp.max(scores_3d, axis=1)
    return jnp.sum(scores_3d, axis=1)


def kl_loss(pred, label, valid_mask=None):
    """KL(label || pred) = sum label * (log label - log pred), averaged over
    rows (plain divergence with the 1e-20 clamps; the reference's KL *op*
    is the balanced form below — this variant is kept for utility use)."""
    p = jnp.maximum(pred, KLOG_THRESHOLD)
    q = jnp.maximum(label, KLOG_THRESHOLD)
    elem = label * (jnp.log(q) - jnp.log(p))
    if valid_mask is not None:
        elem = elem * valid_mask[:, None]
        n = jnp.maximum(jnp.sum(valid_mask), 1)
    else:
        n = pred.shape[0]
    return jnp.sum(elem) / n


def kl_balanced(p, q, ignore_value=0.5):
    """The reference KL op's actual kernel (kl_op.cu:11-17,54-85 — the op
    is CUDA-only and its sole call site feeds the un-buildable DenseCRF,
    so the kernel text is the spec): per outer index,

        out_i = -sum_{q != ignore} q * log(1/q * sigmoid(p)) / denom

    with ``denom`` the count of non-ignored targets on that element's side
    of 0.5 (pos/neg class balancing), ``p`` consumed as a sigmoid LOGIT —
    the deeplab call site passes sigmoid PROBABILITIES in that slot
    (wsl_seg_heads.py:341), faithfully reproduced. ``q`` is clamped at the
    CRF's own 1e-4 output floor (crf_op.cc result_process) so q*log(q)
    stays finite. p: (B, ...) ; q same shape. Returns (B,) divergences.
    """
    b = p.shape[0]
    pf = p.reshape(b, -1)
    qf = jnp.maximum(q.reshape(b, -1), 1e-4)
    keep = q.reshape(b, -1) != ignore_value
    pos_side = qf > 0.5
    pos = jnp.sum(keep & pos_side, axis=1).astype(pf.dtype)
    neg = jnp.sum(keep & ~pos_side, axis=1).astype(pf.dtype)
    denom = jnp.where(pos_side, pos[:, None], neg[:, None])
    # tgt * log(1/tgt/(1+exp(-lgt))) == -tgt * (log tgt + softplus(-lgt))
    term = -qf * (jnp.log(qf) + jax.nn.softplus(-pf))
    term = jnp.where(keep & (denom > 0), term / jnp.maximum(denom, 1.0),
                     0.0)
    return -jnp.sum(term, axis=1)


def label_cross_entropy_wsl(probs, labels, ignore_value=-1.0):
    """CLASSWISE LabelCrossEntropyWSL (cross_entropy_wsl_op.cu:82-121).

    probs: (B, C, H, W) per-pixel class probabilities; labels: (B, H, W)
    int32. Returns (loss (B, C), counts (B, 2)): per-(image, class) sums of
    -log(p) at that class's pixels, normalized by the image's pos/neg pixel
    counts.
    """
    b, c, h, w = probs.shape
    lab = labels.reshape(b, -1)                   # (B, HW)
    x = probs.reshape(b, c, -1)                   # (B, C, HW)
    not_ignored = lab != ignore_value
    pos = jnp.sum((lab > 0) & not_ignored, axis=1).astype(probs.dtype)
    neg = jnp.sum((lab <= 0) & not_ignored, axis=1).astype(probs.dtype)
    denom = jnp.where(lab > 0, pos[:, None], neg[:, None])
    denom = jnp.maximum(denom, 1.0)
    picked = jnp.take_along_axis(x, lab[:, None, :], axis=1)[:, 0]  # (B, HW)
    nll = -jnp.log(jnp.maximum(picked, KLOG_THRESHOLD)) / denom
    nll = jnp.where(not_ignored, nll, 0.0)
    cls_oh = jax.nn.one_hot(lab, c, dtype=probs.dtype)  # (B, HW, C)
    loss = jnp.einsum('bp,bpc->bc', nll, cls_oh)
    counts = jnp.stack([pos, neg], axis=1)
    return loss, counts


def sigmoid_cross_entropy_with_logits_wsl(logits, targets, ignore_value=0.5):
    """Elementwise sigmoid CE with ignore (cross_entropy_wsl_op.cc:246-300).
    logits/targets: (B, C, H, W). Returns (xent (B, C), counts (B, C, 2))."""
    not_ignored = targets != ignore_value
    # numerically stable: max(x,0) - x*t + log(1+exp(-|x|))
    x = logits
    elem = jnp.maximum(x, 0) - x * targets + jnp.log1p(jnp.exp(-jnp.abs(x)))
    elem = jnp.where(not_ignored, elem, 0.0)
    pos = jnp.sum((targets > 0.5) & not_ignored, axis=(2, 3))
    neg = jnp.sum((targets <= 0.5) & not_ignored, axis=(2, 3))
    denom = jnp.maximum(pos + neg, 1).astype(logits.dtype)
    xent = jnp.sum(elem, axis=(2, 3)) / denom
    counts = jnp.stack([pos, neg], axis=2).astype(logits.dtype)
    return xent, counts


def self_weight_ce_weights(pred, labels_oh):
    """webly_heads.add_cross_entropy_loss_self_weight:102-121:
    w = pred*labels + (1 - pred)*(1 - labels) expressed exactly as the
    reference's blob chain (gt + inverse-complement)."""
    labels_inv = 1.0 - labels_oh
    gt = pred * labels_oh
    gf = pred * labels_inv
    return gt + (labels_inv - gf)


def stat_init(num_classes):
    """Stat op state: masked running sums (stat_op.cu:23-80)."""
    return {'sum': jnp.zeros((num_classes,), jnp.float32),
            'count': jnp.zeros((num_classes,), jnp.float32)}


def stat_update(state, x, mask):
    """Accumulate x * mask; the caller prints sum/count every `display`
    iterations (GPU0-only print in the reference; here the trainer logs it
    through the JSON stats stream)."""
    return {'sum': state['sum'] + jnp.sum(x * mask, axis=0),
            'count': state['count'] + jnp.sum(mask, axis=0)}


def stat_means(state):
    return state['sum'] / jnp.maximum(state['count'], 1.0)


def zero_even(x):
    """Zero out even-indexed elements (zero_even_op.cc — the upstream custom
    op tutorial exemplar, kept with a unit test as the reference does)."""
    idx = jnp.arange(x.shape[0])
    return jnp.where(idx % 2 == 0, 0.0, x)
