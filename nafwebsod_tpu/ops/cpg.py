"""CPG (class-peak-gradient) saliency + CSC (contrastive spatial constraint).

TPU-native re-implementation of the reference's most machinery-heavy
subsystem. The reference builds per-GPU backward-only Caffe2 nets
(``detectron/utils/cpg_utils.py``) that the ``CPG`` op invokes from INSIDE
the training net (``cpg_op.cu:149-213``) to get |d cls_prob_c / d image|;
in JAX the whole nested-net machine collapses to ``jax.grad`` of the forward
(SURVEY.md §3.5). Semantics reproduced:

  * ``cpg_maps``    — CPG + CPGScale (``cpg_scale_op.cu:60-99``): per
    ground-truth class with pred in [tau, 1), the channel-max of |d
    cls_prob_c / d image|, normalized to max 1 (map dropped when its max is
    exactly 0 or 1). Maps are computed for up to ``max_gt`` classes — a
    bounded-capacity XLA-friendly version of the reference's dynamic
    per-gt-class loop.
  * ``csc_weights`` — ``csc_op.cu:83-455`` (CSC): binarize the map at
    ``fg_threshold``, integral image (two cumsums), per-RoI contrastive
    score = frame-ring density − context-ring density with sqrt-area
    normalization, per-class normalization to [-1, 1] (invalid rois →
    kMIN_SCORE → −1), then confidence blending W = pred*W + (1−pred).
    Outputs (W, labels_pos=labels, labels_neg=0) like the op's (W, PL, NL).
  * ``csc_constraint`` — ``csc_constraint_op.cu:55-118``: polar=True keeps
    positive weights (min-is-0), polar=False keeps −negative weights;
    multiply into rois_pred with the weight stop-gradient'd (the reference
    backward multiplies dY by the same clipped W).
"""

import jax
import jax.numpy as jnp

KMIN_SCORE = -1e20


def select_gt_classes(labels_oh, max_gt):
    """Indices of up to ``max_gt`` ground-truth classes (padded with -1).
    ``max_gt`` is clamped to the number of foreground classes so datasets
    with fewer than ``max_gt`` classes still compile (top_k needs
    k <= axis size)."""
    gt = labels_oh[0] >= 0.5
    score = jnp.where(gt, 1.0, 0.0)
    k = min(max_gt, int(score.shape[0]))
    _, idx = jax.lax.top_k(score, k)
    if k < max_gt:
        idx = jnp.pad(idx, (0, max_gt - k), constant_values=0)
    valid = gt[idx]
    if k < max_gt:
        valid = valid & (jnp.arange(max_gt) < k)
    return jnp.where(valid, idx, -1), valid


def cpg_maps(cls_prob_fn, image, labels_oh, cls_prob, tau=0.7, max_gt=4,
             grad_reduce=None):
    """Saliency maps for up to ``max_gt`` gt classes.

    cls_prob_fn: image -> (1, C-1) image-level scores WITHOUT the frozen-body
    stop-gradient (the reference's cpg net backprops through the frozen conv
    body to the data blob). Returns (maps (max_gt, H, W), class_idx
    (max_gt,), valid (max_gt,)).

    ``grad_reduce``: optional hook applied to each seed's raw image
    gradient before the channel-max — the RoI-sharded step passes
    ``lambda g: psum(g, axis) / n`` here, because with the RoI axis
    sharded each device's vjp covers only its local rois (and the
    check_vma=False psum transpose n-inflates it); reducing the RAW
    gradient (before abs/max) keeps |sum| != sum|...| correct, and the
    /n preserves the exact CPGScale keep-gate (``max_val != 1.0``). The
    hook sits OUTSIDE the lax.cond so no collective lives in a
    conditional branch (psum of the inactive branch's zeros is zeros).
    """
    idx, valid = select_gt_classes(labels_oh, max_gt)
    pred = cls_prob[0]

    # ONE linearization, then a lax.scan of per-class backward passes with
    # a lax.cond gate: the reference's CPG op only runs the nested backward
    # for classes with label AND pred >= tau (cpg_op.cu:149-166) — the cond
    # makes that skip STRUCTURAL, so an image with g active gt classes pays
    # exactly g backward passes instead of max_gt batched ones (the previous
    # vmapped form ran the conv-body/fc dgrads for zeroed seeds too; only
    # the Pallas pool backward could early-exit on zero cotangents).
    # Measured on v5e at flagship shapes (2 gt classes, max_gt=4): 86.5 ->
    # 65.9 ms/step for the full CSC step; an inner-forward-CSE-only
    # ablation stayed at 86.3, pinning the whole win on this gating.
    out_shape = jax.eval_shape(cls_prob_fn, image)
    _, vjp = jax.vjp(cls_prob_fn, image)
    active = valid & (pred[jnp.maximum(idx, 0)] >= tau)

    def one_seed(_, xs):
        ci, act = xs
        seed = jax.nn.one_hot(jnp.maximum(ci, 0), out_shape.shape[1],
                              dtype=out_shape.dtype)[None, :]  # (1, C)
        grad = jax.lax.cond(
            act,
            lambda s: vjp(s)[0],
            lambda s: jnp.zeros(image.shape, image.dtype),
            seed)
        if grad_reduce is not None:
            grad = grad_reduce(grad)
        # channel-max of |grad| over the image's channel axis (cpg_op.cu:58)
        return None, jnp.max(jnp.abs(grad[0]), axis=-1)

    _, maps = jax.lax.scan(one_seed, None, (idx, active))  # (max_gt, H, W)

    # CPGScale: gate on pred >= tau; normalize to max 1; drop max in {0, 1}
    pred_sel = pred[jnp.maximum(idx, 0)]
    max_val = jnp.max(maps, axis=(1, 2))
    keep = (valid & (pred_sel >= tau) &
            (max_val != 0.0) & (max_val != 1.0))
    scale = jnp.where(max_val > 0, 1.0 / jnp.maximum(max_val, 1e-20), 0.0)
    maps = maps * scale[:, None, None]
    maps = jnp.where(keep[:, None, None], maps, 0.0)
    return maps, idx, keep


def _integral(binary):
    """Inclusive 2-D integral image (csc_op.cu:binary_and_integral_cpu)."""
    return jnp.cumsum(jnp.cumsum(binary, axis=0), axis=1)


def _rect_sum(ii, y0, x0, y1, x1):
    """Sum over [y0..y1] x [x0..x1] inclusive from an integral image,
    replicating the op's guarded corner lookups."""
    h, w = ii.shape
    y1c = jnp.clip(y1, 0, h - 1)
    x1c = jnp.clip(x1, 0, w - 1)
    a1 = ii[y1c, x1c]
    a2 = jnp.where(x0 - 1 >= 0, ii[y1c, jnp.clip(x0 - 1, 0, w - 1)], 0.0)
    a3 = jnp.where(y0 - 1 >= 0, ii[jnp.clip(y0 - 1, 0, h - 1), x1c], 0.0)
    a4 = jnp.where((x0 - 1 >= 0) & (y0 - 1 >= 0),
                   ii[jnp.clip(y0 - 1, 0, h - 1), jnp.clip(x0 - 1, 0, w - 1)],
                   0.0)
    return a1 - a2 - a3 + a4


def _round(x):
    return jnp.round(x).astype(jnp.int32)


def csc_scores_one_class(cpg_map, rois, fg_threshold=0.1, context_scale=1.8,
                         area_sqrt=True):
    """Per-RoI contrastive scores for one class map (csc_op.cu:CSCPool).
    rois: (R, 5) image-coordinate rois. Returns (R,) raw scores with
    KMIN_SCORE for malformed rois."""
    h, w = cpg_map.shape
    binary = (cpg_map >= fg_threshold).astype(jnp.float32)
    ii = _integral(binary)

    ws, hs = _round(rois[:, 1]), _round(rois[:, 2])
    we, he = _round(rois[:, 3]), _round(rois[:, 4])
    ok = (ws >= 0) & (hs >= 0) & (ws < we) & (hs < he) & (we < w) & (he < h)

    width_roi = (we - ws).astype(jnp.float32)
    height_roi = (he - hs).astype(jnp.float32)
    wc = (we + ws).astype(jnp.float32) / 2.0
    hc = (he + hs).astype(jnp.float32) / 2.0
    wi, hi = width_roi / context_scale, height_roi / context_scale
    wo, ho = width_roi * context_scale, height_roi * context_scale

    ws_i, hs_i = _round(wc - wi / 2), _round(hc - hi / 2)
    we_i, he_i = _round(wc + wi / 2), _round(hc + hi / 2)
    ws_o = _round(jnp.maximum(wc - wo / 2, 0.0))
    hs_o = _round(jnp.maximum(hc - ho / 2, 0.0))
    we_o = _round(jnp.minimum(wc + wo / 2, w - 1.0))
    he_o = _round(jnp.minimum(hc + ho / 2, h - 1.0))

    area = (he - hs + 1) * (we - ws + 1)
    area_in = (he_i - hs_i + 1) * (we_i - ws_i + 1)
    area_out = (he_o - hs_o + 1) * (we_o - ws_o + 1)
    area_frame = jnp.maximum((area - area_in).astype(jnp.float32), 1.0)
    area_ctx = jnp.maximum((area_out - area).astype(jnp.float32), 1.0)

    rect = jax.vmap(lambda y0, x0, y1, x1: _rect_sum(ii, y0, x0, y1, x1))
    sum_roi = rect(hs, ws, he, we)
    sum_in = rect(hs_i, ws_i, he_i, we_i)
    sum_out = rect(hs_o, ws_o, he_o, we_o)

    sum_frame = sum_roi - sum_in
    sum_ctx = sum_out - sum_roi
    if area_sqrt:
        score = (sum_frame / jnp.sqrt(area_frame) -
                 sum_ctx / jnp.sqrt(area_ctx))
    else:
        score = sum_frame / area_frame - sum_ctx / area_ctx
    return jnp.where(ok, score, KMIN_SCORE)


def _normalize_class(scores):
    """Per-class normalization to [-1, 1] (csc_op.cu:410-448)."""
    is_min = scores == KMIN_SCORE
    max_v = jnp.maximum(jnp.max(scores), 0.0)
    min_v = jnp.minimum(jnp.min(jnp.where(is_min, 0.0, scores)), 0.0)

    def pos_neg(s):
        return jnp.where(is_min, -1.0,
                         jnp.where(s > 0, s / max_v, s / (-min_v)))

    def pos_only(s):
        return jnp.where(is_min, -1.0, s / max_v)

    return jnp.where(
        (max_v > 0) & (min_v < 0), pos_neg(scores),
        jnp.where((max_v > 0) & (min_v == 0), pos_only(scores),
                  jnp.ones_like(scores)))


def csc_weights(maps, class_idx, class_keep, rois, labels_oh, cls_prob,
                fg_threshold=0.1, context_scale=1.8, valid_mask=None,
                normalize_fn=None):
    """Full CSC: (R, C-1) weights W (default 1), plus
    (labels_pos, labels_neg) = (labels_oh, zeros) (csc_op.cu:315-323).

    ``normalize_fn``: optional replacement for the per-class [-1, 1]
    normalization — the RoI-sharded step passes a pmax/pmin variant so
    the max/min span ALL rois, not just the local shard."""
    r = rois.shape[0]
    c = labels_oh.shape[1]
    normalize = _normalize_class if normalize_fn is None else normalize_fn

    def one(m, ci, keep):
        raw = csc_scores_one_class(m, rois, fg_threshold, context_scale)
        if valid_mask is not None:
            raw = jnp.where(valid_mask, raw, KMIN_SCORE)
        norm = normalize(raw)
        pred = cls_prob[0, jnp.maximum(ci, 0)]
        blended = pred * norm + (1.0 - pred)
        return jnp.where(keep, blended, jnp.ones_like(blended))

    per_class = jax.vmap(one)(maps, class_idx, class_keep)  # (max_gt, R)
    # Scatter the selected class columns into the (R, C-1) weight matrix.
    # Padded slots must NOT alias a real column: class_idx is -1 there and
    # maximum(ci, 0) would collide with foreground class 0, overwriting
    # its blended weights with the padding's 1.0 (scatter with duplicate
    # indices keeps an arbitrary entry). Route padding to a dump column
    # past the class range instead; kept entries are distinct gt classes,
    # so no real duplicates remain.
    col = jnp.where(class_keep, jnp.maximum(class_idx, 0), c)
    w_ext = jnp.ones((r, c + 1), jnp.float32)
    w_full = w_ext.at[:, col].set(per_class.T)[:, :c]
    labels_pos = labels_oh
    labels_neg = jnp.zeros_like(labels_oh)
    return jax.lax.stop_gradient(w_full), labels_pos, labels_neg


def csc_constraint(rois_pred, w, polar=True):
    """CSCConstraint: Y = clip(W) * rois_pred with W stop-gradient'd."""
    w = jax.lax.stop_gradient(w)
    w_clipped = jnp.maximum(w, 0.0) if polar else -jnp.minimum(w, 0.0)
    return rois_pred * w_clipped
