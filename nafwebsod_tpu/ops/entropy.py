"""Spatial-entropy class weighting — the noise-aware loss weighting of
NA-fWebSOD (CVPR 2020).

TPU-native re-implementation of the graph built by
``webly_heads.add_spatial_entropy_weight`` (reference webly_heads.py:265-391):

    J      = RoIIoU(rois)                       (int-truncated coords, diag 1)
    E      = -p * log(p), NaN -> 0              (p = rois_pred, per-RoI scores)
    D      = leaky_relu(J @ E, alpha=0.01)
    Ê      = E * (E / D)                        (spatially normalized entropy)
    Ê_sum  = sum over RoIs of Ê                 (1, C)
    y_norm = cls_prob * (log N - log cls_prob)  (N = #RoIs)
    w_n    = clip(Ê_sum / y_norm, 0, 1) * (1 - labels_oh)
    w      = 1 - w_n
    both stop-gradient'd (webly_heads.py:390-391)

Returns (class_weight, class_weight_noise), each (1, C).

Padding: rows of ``rois_pred`` for padded RoIs must be exactly 0; the IoU
matrix is masked so padded rois neither receive nor contribute overlap, and N
counts only valid rois — this reproduces the dynamic-shape reference on a
fixed-shape TPU program.
"""

import jax
import jax.numpy as jnp

from nafwebsod_tpu.ops.jbox import roi_iou


def spatial_entropy_weights(rois_pred, cls_prob, rois, labels_oh,
                            valid_mask=None, return_intermediates=False):
    r = rois_pred.shape[0]
    if valid_mask is None:
        valid = jnp.ones((r,), dtype=rois_pred.dtype)
        n_valid = jnp.asarray(r, dtype=rois_pred.dtype)
    else:
        valid = valid_mask.astype(rois_pred.dtype)
        n_valid = jnp.sum(valid)

    j = roi_iou(rois)  # (R, R), diagonal 1
    j = j * valid[:, None] * valid[None, :]

    # E = -p log p with NaN (p == 0) replaced by 0 (net.Log -> Mul -> ReplaceNaN)
    logp = jnp.log(rois_pred)
    e = -(rois_pred * logp)
    e = jnp.where(jnp.isnan(e), 0.0, e)
    e = jnp.where(jnp.isinf(e), 0.0, e) * valid[:, None]

    d = j @ e                                    # (R, C)
    d = jnp.where(d >= 0, d, 0.01 * d)           # LeakyRelu(alpha=0.01)
    g = jnp.where(d != 0, e / d, 0.0)            # guarded: reference 0/0 -> NaN
    hat_e = e * g
    hat_e_sum = jnp.sum(hat_e, axis=0, keepdims=True)  # (1, C)

    # guard the log at the smallest normal float32: exact reference values
    # for every representable nonzero cls_prob, while an underflowed
    # cls_prob == 0 (which would give (logN - (-inf)) * 0 = NaN) stays
    # finite (the reference graph has no guard and would emit NaN there)
    log_y = jnp.log(jnp.maximum(cls_prob, jnp.finfo(jnp.float32).tiny))
    y_norm = (jnp.log(n_valid) - log_y) * cls_prob     # (1, C)
    norm = jnp.where(y_norm != 0, hat_e_sum / y_norm, 0.0)
    norm = jnp.clip(norm, 0.0, 1.0)

    labels_bg = 1.0 - labels_oh
    class_weight_noise = norm * labels_bg
    class_weight = 1.0 - class_weight_noise
    cw = jax.lax.stop_gradient(class_weight)
    cwn = jax.lax.stop_gradient(class_weight_noise)
    if return_intermediates:
        # observability for webly_vis.save_entropy (webly_vis.py:18-66):
        # per-RoI raw/normalized entropy and the y(logN - logy) normalizer
        inter = {'E': e, 'hatE': hat_e, 'y_logN__logy': y_norm}
        return cw, cwn, jax.lax.stop_gradient(inter)
    return cw, cwn
