"""Refinement-ladder ops: OICR pseudo-labeling, C-MIL continuation merging,
and PCL proposal-cluster learning.

TPU-native re-implementations of:

  * ``roi_label`` — ``detectron/ops/roi_label_op.cc:50-126`` (RoILabel): for
    each ground-truth class pick the ``top_k`` highest-scoring RoIs as seeds;
    every RoI is assigned the class/weight of its max-IoU seed — foreground
    when IoU >= fg_thresh, background (label 0) inside [bg_lo, bg_hi), else
    weight 0. The reference caps fg/bg counts after a host-side random
    shuffle; the caps default to 9999 (uncapped) for OICR and are applied in
    score order here (deterministic, XLA-friendly) for the C-MIL settings.
  * ``roi_merge`` — ``detectron/ops/roi_merge_op.cc:30-195`` (RoIMerge):
    greedy clique partition of the top-200 RoIs by score, cliques grown over
    a 40-wide score window with pairwise IoU >= lambda(t) (log schedule
    ``:9-15``); per-clique averaged cls/det logits; gradient scatters back
    divided by clique size (``:200-235``) — expressed here as a gather, so
    ``jax.grad`` reproduces the hand-written gradient exactly.
  * ``pcl_targets`` — ``detectron/ops/pcl.py`` (host numpy, like the
    reference's ``net.Python`` op): KMeans top-ranking selection, IoU-graph
    centers, proposal clusters.
  * ``pcl_loss`` — ``detectron/ops/pcl_loss_op.cc:9-90`` with the exact
    gradient of ``:93-160`` via custom VJP (the analytic grad uses eps 1e-5
    while the forward uses 1e-6 — reproduced faithfully).
"""

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from nafwebsod_tpu.ops import boxes as box_ops

# --------------------------------------------------------------------------- #
# RoILabel
# --------------------------------------------------------------------------- #


def roi_label(scores, iou, labels_oh, fg_thresh=0.5, bg_thresh_hi=0.5,
              bg_thresh_lo=-1.0, num_pos=9999, num_neg=9999, top_k=1,
              class_weights=None, valid_mask=None, cap_rng=None):
    """OICR-style pseudo labels. scores: (R, C) or (R, C+1) RoI scores;
    iou: (R, R); labels_oh: (1, C). Returns (labels int32 (R,), weights (R,)).

    ``class_weights``: optional (C,) image-level class probabilities — the
    reference's 4th RoILabel input (always passed by the OICR/C-MIL call
    sites, wsl_heads.py:468-478,525-531); when given, a labeled RoI's loss
    weight is ``class_weights[assign_c]`` instead of its seed's score
    (roi_label_op.cc:104 CWdata branch).

    ``cap_rng``: optional PRNG key selecting the reference's RANDOM-ORDER
    fg/bg caps — RoIs are visited in a shuffled order and labeling stops
    past the cap (roi_label_op.cc:76-89 std::random_shuffle; one shared
    visit order for both caps, like the single C++ loop). Default (None)
    keeps the deterministic highest-IoU cap. The caps only bind for
    C-MIL's 32/96 settings — OICR's 9999 never caps — so this mode exists
    to reproduce the reference's cap selection exactly when comparing
    ladder numerics (the reference itself seeds with time(0), so ITS runs
    are not reproducible; the key makes ours host-seeded).

    Padded RoIs (valid_mask False) get weight 0 and label 0.
    """
    r, num_class_s = scores.shape
    num_class = labels_oh.shape[1]
    offset = num_class_s - num_class
    fg_scores = scores[:, offset:]  # (R, C)
    gt = labels_oh[0]               # (C,)

    if valid_mask is None:
        valid = jnp.ones((r,), bool)
    else:
        valid = valid_mask.astype(bool)

    # Seeds are chosen sequentially over (gt class, k) with GLOBAL de-dup: an
    # RoI already chosen as a seed for any earlier class/k is skipped
    # (roi_label_op.cc:56-74 std::find over highest_n). Unrolled over the
    # static (C, K) grid — C masked argmaxes, cheap under XLA.
    masked = jnp.where(valid[:, None], fg_scores, -jnp.inf)
    chosen = jnp.zeros((r,), bool)
    seed_idx, seed_cls, seed_score, seed_ok = [], [], [], []
    for c_i in range(num_class):
        for _k in range(top_k):
            col = jnp.where(chosen, -jnp.inf, masked[:, c_i])
            idx = jnp.argmax(col)
            sc = col[idx]
            ok = (gt[c_i] > 0) & jnp.isfinite(sc)
            chosen = chosen.at[idx].set(chosen[idx] | ok)
            seed_idx.append(idx)
            seed_cls.append(c_i)
            seed_score.append(sc)
            seed_ok.append(ok)

    seed_idx_f = jnp.stack(seed_idx)                    # (C*K,)
    seed_cls_f = jnp.asarray(seed_cls, jnp.int32)
    seed_score_f = jnp.stack(seed_score)
    seed_valid_f = jnp.stack(seed_ok)

    # per-RoI max-IoU seed
    iou_to_seeds = iou[:, seed_idx_f]                       # (R, C*K)
    iou_to_seeds = jnp.where(seed_valid_f[None, :], iou_to_seeds, -jnp.inf)
    best = jnp.argmax(iou_to_seeds, axis=1)                 # (R,)
    max_iou = jnp.max(iou_to_seeds, axis=1)
    assign_c = seed_cls_f[best]
    if class_weights is not None:
        assign_w = class_weights[assign_c]
    else:
        assign_w = seed_score_f[best]

    is_fg = max_iou >= fg_thresh
    is_bg = (max_iou >= bg_thresh_lo) & (max_iou < bg_thresh_hi)

    # fg/bg caps: the reference visits RoIs in random order and stops
    # labeling past the cap; the default here keeps the highest-IoU ones
    # (deterministic, XLA-friendly — deviation documented in PARITY.md),
    # and ``cap_rng`` switches to the reference's random visit order.
    # The reference's `num_pos <= num_pos_` pre-increment check admits
    # cap+1 rois (roi_label_op.cc:105,112), reproduced with limit+1.
    if cap_rng is not None:
        visit_rank = jax.random.permutation(cap_rng, r)

    def cap(mask, limit):
        if limit >= r:
            return mask
        if cap_rng is not None:
            order = jnp.argsort(visit_rank)
            m_s = mask[order]
            before = jnp.cumsum(m_s) - m_s
            admitted = m_s & (before < limit)
            return jnp.zeros_like(mask).at[order].set(admitted)
        order_key = jnp.where(mask, max_iou, -jnp.inf)
        kth = jax.lax.top_k(order_key, limit)[0][-1]
        return mask & (order_key >= kth)

    is_fg = cap(is_fg, num_pos + 1)
    is_bg = cap(is_bg & ~is_fg, num_neg + 1)

    labels = jnp.where(is_fg, assign_c + 1,
                       jnp.where(is_bg, 0, assign_c + 1)).astype(jnp.int32)
    weights = jnp.where(is_fg | is_bg, assign_w, 0.0)
    labels = jnp.where(valid, labels, 0)
    weights = jnp.where(valid, weights, 0.0)
    no_seeds = jnp.sum(seed_valid_f) == 0
    weights = jnp.where(no_seeds, 0.0, weights)
    return labels, weights


# --------------------------------------------------------------------------- #
# RoIMerge (C-MIL)
# --------------------------------------------------------------------------- #


def cmil_lambda(cur_iter, size_epoch, max_epoch):
    """Continuation schedule lambda(t) (roi_merge_op.cc:9-15)."""
    low = 0.01
    it = cur_iter / size_epoch
    return (jnp.log(it + low) - jnp.log(low)) / (np.log(max_epoch + low) -
                                                 np.log(low))


def _merge_assign(obn, iou, lam, valid, top_k=200, window=40):
    """Greedy clique ids (roi_merge_op.cc:67-135). Returns (clique_id (R,),
    counts (R,)) with counts indexed by clique id.

    The reference grows each clique with a doubly nested scalar loop over
    sorted positions (every candidate re-checks every current member).
    That greedy closure is a lexicographically-first-maximal-set problem —
    inherently sequential in the worst case — but each clique's membership
    is the UNIQUE fixpoint of

        m_k = free_k  AND  all_{t <= j < k} (not m_j  OR  IoU(k, j) >= lam)

    over the 40-wide sorted window (unique by induction on k, so reaching
    any fixpoint certifies the sequential answer). We pre-gather the
    (top_k, top_k) sorted-order IoU once and resolve each clique with an
    early-exit Jacobi iteration of that recurrence: whole-window vector
    ops instead of per-candidate x per-member scalar steps, converging in
    dependency-depth (typically 2-4, <= window) passes. Numerics are
    pinned against a direct transcription of the C++ loop in
    tests/test_refine.py."""
    r = obn.shape[0]
    p = min(top_k, r)
    order = jnp.argsort(jnp.where(valid, -obn, jnp.inf), stable=True)
    top = order[:p]
    vtop = valid[top]                       # padded rois can reach the top
    # block when the valid count is < p; they must never join or seed a
    # clique (at lam == 0 EVERY pair satisfies iou >= lam, so an unmasked
    # padded roi would pollute real cliques with zero-canvas logits)
    c_ok = iou[top][:, top] >= lam          # (P, P), sorted space
    pos = jnp.arange(p)
    earlier = pos[None, :] < pos[:, None]   # j < k  (row k, col j)

    def clique_members(t, free):
        cand = (free & vtop & (pos >= t) &
                (pos < jnp.minimum(t + window, p)))

        def step(state):
            m, _, it = state
            conflict = jnp.any(m[None, :] & earlier & ~c_ok, axis=1)
            m2 = cand & ~conflict
            return m2, jnp.any(m2 != m), it + 1

        m, _, _ = jax.lax.while_loop(
            lambda s: s[1] & (s[2] < window), step,
            (cand, jnp.bool_(True), jnp.int32(0)))
        return m

    def outer(t, carry):
        assigned, clique_s, cur_id = carry

        def start(carry):
            assigned, clique_s, cur_id = carry
            m = clique_members(t, ~assigned)
            return (assigned | m,
                    jnp.where(m, cur_id, clique_s), cur_id + 1)

        return jax.lax.cond(assigned[t], lambda c: c, start,
                            (assigned, clique_s, cur_id))

    assigned, clique_s, cur_id = jax.lax.fori_loop(
        0, p, outer,
        # invalid positions start pre-assigned: they cannot seed cliques
        (~vtop, jnp.full((p,), -1, jnp.int32),
         jnp.int32(0)))

    clique = jnp.full((r,), -1, jnp.int32).at[top].set(clique_s)
    # remaining rois become singleton cliques in index order
    rest = clique == -1
    rest_ids = cur_id + jnp.cumsum(rest) - 1
    clique = jnp.where(rest, rest_ids.astype(jnp.int32), clique)
    counts = jnp.zeros((r,), jnp.int32).at[clique].add(1)
    return clique, counts


def roi_merge(obn_score, iou, fc8c, fc8d, lam, valid_mask=None,
              top_k=200, window=40):
    """C-MIL RoIMerge: returns (mc, md, clique_id, clique_counts) with mc/md
    shaped (R, C) — clique rows 0..num_cliques-1 hold the averaged logits,
    remaining rows are zero. Because the average is expressed with gather /
    segment-sum, autodiff yields the reference's scatter-divide gradient
    (roi_merge_op.cc:200-235)."""
    r = obn_score.shape[0]
    obn = obn_score.reshape(-1)
    if valid_mask is None:
        valid = jnp.ones((r,), bool)
    else:
        valid = valid_mask.astype(bool)
    clique, counts = _merge_assign(
        jax.lax.stop_gradient(obn), jax.lax.stop_gradient(iou), lam, valid,
        top_k, window)
    denom = jnp.maximum(counts[clique], 1).astype(fc8c.dtype)[:, None]
    mc = jnp.zeros_like(fc8c).at[clique].add(fc8c / denom)
    md = jnp.zeros_like(fc8d).at[clique].add(fc8d / denom)
    # a merged row is real iff at least one VALID roi maps to it (padded rois
    # end up in their own singleton cliques, masked out here)
    merged_valid = jnp.zeros((r,), bool).at[clique].max(valid)
    return mc, md, clique, counts, merged_valid


# --------------------------------------------------------------------------- #
# PCL (host-side targets + device loss)
# --------------------------------------------------------------------------- #

PCL_NUM_KMEANS_CLUSTER = 3
PCL_RNG_SEED = 3
PCL_GRAPH_IOU_THRESHOLD = 0.4
PCL_MAX_PC_NUM = 5
PCL_FG_THRESH = 0.5
PCL_BG_THRESH = 0.1


def _top_ranking_proposals(probs):
    """KMeans(3) over scores; keep members of the highest-center cluster
    (pcl.py:_get_top_ranking_propoals). Tiny fixed-iteration numpy KMeans —
    no sklearn dependency."""
    x = probs.reshape(-1)
    rng = np.random.RandomState(PCL_RNG_SEED)
    k = min(PCL_NUM_KMEANS_CLUSTER, len(x))
    centers = x[rng.choice(len(x), k, replace=False)].astype(np.float64)
    for _ in range(25):
        d = np.abs(x[:, None] - centers[None, :])
        assign = d.argmin(1)
        for j in range(k):
            if (assign == j).any():
                centers[j] = x[assign == j].mean()
    high = centers.argmax()
    index = np.where(assign == high)[0]
    if len(index) == 0:
        index = np.array([np.argmax(x)])
    return index


def pcl_targets(boxes, cls_prob, im_labels, cls_prob_new):
    """Host numpy port of pcl.py:PCL. boxes: (R, 4); cls_prob: (R, C) or
    (R, C+1); im_labels: (1, C); cls_prob_new: (R, C+1) current refinement
    softmax. Returns dict of fixed-semantics arrays (dynamic R_gt)."""
    if cls_prob.shape[1] != im_labels.shape[1]:
        cls_prob = cls_prob[:, 1:]
    eps = 1e-9
    cls_prob = np.clip(cls_prob.copy(), eps, 1 - eps)
    cls_prob_new = np.clip(cls_prob_new.copy(), eps, 1 - eps)

    gt_boxes, gt_classes, gt_scores = _pcl_graph_centers(
        boxes.copy(), cls_prob.copy(), im_labels.copy())

    return _pcl_proposal_clusters(
        boxes.copy(), gt_boxes, gt_classes, gt_scores, im_labels.copy(),
        cls_prob_new.copy())


def _pcl_graph_centers(boxes, cls_prob, im_labels):
    num_classes = im_labels.shape[1]
    gt_boxes = np.zeros((0, 4), np.float32)
    gt_classes = np.zeros((0, 1), np.int32)
    gt_scores = np.zeros((0, 1), np.float32)
    for i in range(num_classes):
        if im_labels[0, i] != 1:
            continue
        cls_prob_tmp = cls_prob[:, i].copy()
        idxs = np.arange(len(cls_prob_tmp))
        idxs_tmp = _top_ranking_proposals(cls_prob_tmp[idxs].reshape(-1, 1))
        idxs = idxs[idxs_tmp]
        boxes_tmp = boxes[idxs, :].copy()
        cls_boxes = boxes_tmp
        scores_tmp = cls_prob_tmp[idxs]

        overlaps = box_ops.bbox_overlaps(cls_boxes, cls_boxes)
        graph = (overlaps > PCL_GRAPH_IOU_THRESHOLD).astype(np.float32)

        keep_idxs = []
        gt_scores_tmp = []
        count = scores_tmp.size
        while True:
            order = np.sum(graph, axis=1).argsort()[::-1]
            tmp = order[0]
            keep_idxs.append(tmp)
            inds = np.where(graph[tmp, :] > 0)[0]
            gt_scores_tmp.append(np.max(scores_tmp[inds]))
            graph[:, inds] = 0
            graph[inds, :] = 0
            count = count - len(inds)
            if count <= 5:
                break

        keep_new = np.argsort(np.array(gt_scores_tmp))[
            -1:(-1 - min(len(gt_scores_tmp), PCL_MAX_PC_NUM)):-1]
        gt_boxes = np.vstack((gt_boxes, boxes_tmp[keep_idxs][keep_new]))
        gt_scores = np.vstack(
            (gt_scores, np.array(gt_scores_tmp)[keep_new].reshape(-1, 1)))
        gt_classes = np.vstack(
            (gt_classes, (i + 1) * np.ones((len(keep_new), 1), np.int32)))
        # remove chosen centers from the pool (pcl.py comment)
        drop = idxs[np.array(keep_idxs)][keep_new]
        cls_prob = np.delete(cls_prob, drop, axis=0)
        boxes = np.delete(boxes, drop, axis=0)
    return gt_boxes, gt_classes, gt_scores


def _pcl_proposal_clusters(all_rois, gt_boxes, gt_labels, gt_scores,
                           im_labels, cls_prob):
    overlaps = box_ops.bbox_overlaps(
        all_rois.astype(np.float32), gt_boxes.astype(np.float32))
    gt_assignment = overlaps.argmax(axis=1)
    max_overlaps = overlaps.max(axis=1)
    labels = gt_labels[gt_assignment, 0].astype(np.float32)
    cls_loss_weights = gt_scores[gt_assignment, 0].astype(np.float32)

    bg_inds = np.where(max_overlaps < PCL_FG_THRESH)[0]
    ig_inds = np.where(max_overlaps < PCL_BG_THRESH)[0]
    cls_loss_weights[ig_inds] = 0.0
    labels[bg_inds] = 0
    gt_assignment = gt_assignment.astype(np.float32)
    gt_assignment[bg_inds] = -1

    n_gt = gt_boxes.shape[0]
    img_cls_loss_weights = np.zeros(n_gt, np.float32)
    pc_probs = np.zeros(n_gt, np.float32)
    pc_labels = np.zeros(n_gt, np.int32)
    pc_count = np.zeros(n_gt, np.int32)
    for i in range(n_gt):
        po_index = np.where(gt_assignment == i)[0]
        img_cls_loss_weights[i] = np.sum(cls_loss_weights[po_index])
        pc_labels[i] = gt_labels[i, 0]
        pc_count[i] = len(po_index)
        pc_probs[i] = (np.average(cls_prob[po_index, pc_labels[i]])
                       if len(po_index) else 0.0)
    return {
        'labels': labels,
        'cls_loss_weights': cls_loss_weights,
        'gt_assignment': gt_assignment,
        'pc_labels': pc_labels.astype(np.float32),
        'pc_probs': pc_probs,
        'pc_count': pc_count.astype(np.float32),
        'img_cls_loss_weights': img_cls_loss_weights,
        'im_labels_real': np.hstack(
            (np.array([[1]], np.float32), im_labels)).astype(np.float32),
    }


def pcl_targets_padded(boxes, cls_prob, im_labels, cls_prob_new, max_pc):
    """Fixed-shape wrapper for use under jax.pure_callback: pc_* arrays are
    padded/truncated to ``max_pc`` rows (= PCL_MAX_PC_NUM * num gt classes
    upper bound chosen by the caller)."""
    boxes = np.asarray(boxes)
    r = boxes.shape[0]
    if not np.any(np.asarray(im_labels) == 1) or r == 0:
        # no gt classes (can happen with all-padded mixup edge cases):
        # everything ignored
        zr = np.zeros((r,), np.float32)
        zp = np.zeros((max_pc,), np.float32)
        im_real = np.hstack((np.array([[1]], np.float32),
                             np.asarray(im_labels, np.float32)))[0]
        return (zr, zr, np.full((r,), -1.0, np.float32), zp, zp, zp, zp,
                im_real)
    out = pcl_targets(boxes, np.asarray(cls_prob),
                      np.asarray(im_labels), np.asarray(cls_prob_new))
    n = out['pc_labels'].shape[0]
    m = min(n, max_pc)

    def pad1(x):
        y = np.zeros((max_pc,), np.float32)
        y[:m] = x[:m]
        return y

    # clip assignments beyond the padded set to ignore (-1, weight 0)
    gt_assignment = out['gt_assignment'].copy()
    drop = gt_assignment >= max_pc
    gt_assignment[drop] = -1
    clw = out['cls_loss_weights'].copy()
    clw[drop] = 0.0
    return (out['labels'].astype(np.float32), clw.astype(np.float32),
            gt_assignment.astype(np.float32), pad1(out['pc_labels']),
            pad1(out['pc_probs']), pad1(out['pc_count']),
            pad1(out['img_cls_loss_weights']),
            out['im_labels_real'][0].astype(np.float32))


# full-input variant carrying gt_assignment for the exact backward
@partial(jax.custom_vjp, nondiff_argnums=())
def pcl_loss_full(pcl_probs, labels, cls_loss_weights, gt_assignment,
                  pc_labels, pc_probs, pc_count, img_cls_loss_weights,
                  im_labels_real, n_valid=None):
    # PCLLoss normalizes by the image's ACTUAL proposal count
    # (pcl_loss_op.cc: 1 / pcl_probs.dim32(0)); with the rois padded to a
    # static capacity the caller passes sum(valid_mask) — dividing by the
    # padded shape would rescale the loss by the padding ratio
    r = pcl_probs.shape[0] if n_valid is None else jnp.maximum(n_valid, 1)
    eps = 1e-6
    bg_mask = (labels == 0) & (im_labels_real[0] != 0)
    bg = -jnp.sum(jnp.where(bg_mask, cls_loss_weights *
                            jnp.log(jnp.maximum(pcl_probs[:, 0], eps)), 0.0))
    pc_valid = (pc_labels > 0)
    pc_gt = jnp.where(
        pc_valid,
        im_labels_real[jnp.clip(pc_labels.astype(jnp.int32), 0, None)] != 0,
        False)
    fg = -jnp.sum(jnp.where(pc_valid & pc_gt, img_cls_loss_weights *
                            jnp.log(jnp.maximum(pc_probs, eps)), 0.0))
    return (bg + fg) / r


def _pclf_fwd(pcl_probs, labels, cls_loss_weights, gt_assignment, pc_labels,
              pc_probs, pc_count, img_cls_loss_weights, im_labels_real,
              n_valid=None):
    val = pcl_loss_full(pcl_probs, labels, cls_loss_weights, gt_assignment,
                        pc_labels, pc_probs, pc_count, img_cls_loss_weights,
                        im_labels_real, n_valid)
    return val, (pcl_probs, labels, cls_loss_weights, gt_assignment,
                 pc_labels, pc_probs, pc_count, img_cls_loss_weights,
                 im_labels_real, n_valid)


def _pclf_bwd(res, g):
    """Exact analytic gradient (pcl_loss_op.cc:93-160): for bg rois
    d/dp_i0 = -w_i / max(p_i0, eps); for fg rois assigned to cluster t with
    label c: d/dp_ic = -img_w_t / (count_t * max(pc_prob_t, eps)); /batch."""
    (pcl_probs, labels, cls_loss_weights, gt_assignment, pc_labels, pc_probs,
     pc_count, img_cls_loss_weights, im_labels_real, n_valid) = res
    r, c = pcl_probs.shape
    denom = r if n_valid is None else jnp.maximum(n_valid, 1)
    eps = 1e-5
    grad = jnp.zeros_like(pcl_probs)

    gt_ok = im_labels_real[0] != 0
    bg_mask = (labels == 0) & gt_ok
    grad = grad.at[:, 0].set(jnp.where(
        bg_mask, -cls_loss_weights / jnp.maximum(pcl_probs[:, 0], eps), 0.0))

    a = gt_assignment.astype(jnp.int32)
    assigned = a >= 0
    a_safe = jnp.clip(a, 0, pc_labels.shape[0] - 1)
    cls = jnp.clip(pc_labels[a_safe].astype(jnp.int32), 0, c - 1)
    cls_gt = jnp.where(
        assigned, im_labels_real[cls] != 0, False)
    per_roi = -img_cls_loss_weights[a_safe] / (
        jnp.maximum(pc_count[a_safe], 1.0) *
        jnp.maximum(pc_probs[a_safe], eps))
    fg_mask = assigned & (labels > 0) & cls_gt
    grad = grad.at[jnp.arange(r), cls].add(
        jnp.where(fg_mask, per_roi, 0.0))
    grad = grad * (g / denom)
    return (grad, None, None, None, None, None, None, None, None, None)


pcl_loss_full.defvjp(_pclf_fwd, _pclf_bwd)


# --------------------------------------------------------------------------- #
# Device-side PCL targets (no host callback)
# --------------------------------------------------------------------------- #

_BIG = jnp.float32(3.0e38)


def _kmeans_top_mask_device(x, cand, iters=25):
    """Top-scoring-cluster membership via fixed-iteration 1-D KMeans(3)
    (pcl.py:_get_top_ranking_propoals semantics).

    DEVIATION (documented in PARITY.md): centers initialize at the masked
    (min, median, max) of the candidate scores instead of the host port's
    MT19937 3-subset draw — data-dependent index draws do not exist on
    device. For the separable score distributions PCL operates on, both
    inits converge to the same top cluster (pinned by
    tests/test_pcl_device.py); exact membership can differ on pathological
    uniform score sets.
    """
    r = x.shape[0]
    vmin = jnp.min(jnp.where(cand, x, _BIG))
    vmax = jnp.max(jnp.where(cand, x, -_BIG))
    n = jnp.sum(cand)
    xs = jnp.sort(jnp.where(cand, x, _BIG))          # valid first, ascending
    med = xs[jnp.maximum((n - 1) // 2, 0)]
    centers0 = jnp.stack([vmin, med, vmax])

    def body(c, _):
        d = jnp.abs(x[:, None] - c[None, :])          # (R, 3)
        a = jnp.argmin(d, axis=1)
        onehot = (a[:, None] == jnp.arange(3)[None, :]) & cand[:, None]
        cnt = jnp.sum(onehot, axis=0)
        s = jnp.sum(jnp.where(onehot, x[:, None], 0.0), axis=0)
        c_new = jnp.where(cnt > 0, s / jnp.maximum(cnt, 1), c)
        return c_new, None

    centers, _ = jax.lax.scan(body, centers0, None, length=iters)
    high = jnp.argmax(centers)
    a = jnp.argmin(jnp.abs(x[:, None] - centers[None, :]), axis=1)
    top = (a == high) & cand
    best = jnp.argmax(jnp.where(cand, x, -_BIG))
    fallback = cand & (jnp.arange(r) == best)
    return jnp.where(jnp.any(top), top, fallback)


def _clique_centers_device(adj, top, scores, max_centers):
    """Greedy clique extraction (pcl.py:_get_graph_centers inner loop):
    repeatedly take the max-degree candidate (ties -> larger index, matching
    np.argsort[::-1]), record the max score among its neighbors, remove the
    clique; stop when <= 5 candidates remain after a removal (do-while:
    always runs once). Returns (center_idx (max_centers,), center_score,
    n_centers)."""
    r = top.shape[0]
    idx = jnp.arange(r)

    def cond(carry):
        act, k, _, _, first = carry
        return jnp.any(act) & (k < max_centers) & (first | (jnp.sum(act) > 5))

    def body(carry):
        act, k, cidx, cscore, _ = carry
        deg = jnp.sum(adj & act[None, :], axis=1)
        key = deg * (r + 1) + idx                     # larger index wins ties
        t = jnp.argmax(jnp.where(act, key, -1))
        neigh = adj[t] & act
        sc = jnp.max(jnp.where(neigh, scores, -_BIG))
        cidx = cidx.at[k].set(t)
        cscore = cscore.at[k].set(sc)
        return act & ~neigh, k + 1, cidx, cscore, False

    init = (top, jnp.int32(0), jnp.full((max_centers,), -1, jnp.int32),
            jnp.full((max_centers,), -_BIG), jnp.bool_(True))
    _, k, cidx, cscore, _ = jax.lax.while_loop(cond, body, init)
    return cidx, cscore, k


def pcl_targets_device(boxes, cls_prob, im_labels, cls_prob_new, valid,
                       max_centers=64):
    """Pure-device PCL pseudo-labeling (pcl.py:PCLOp.forward) — replaces
    the per-stage host callback with lax.while_loop / masked jnp, the
    compiler-friendly formulation of the reference's numpy graph algorithm.

    boxes (R, 4); cls_prob (R, C) or (R, C+1); im_labels (1, C);
    cls_prob_new (R, C+1); valid (R,) bool. Returns the same 8-tuple as the
    padded host callback with max_pc = 5 * C gt slots laid out as
    (class, rank) — slot indices differ from the host path's compacted
    layout, but per-roi labels/weights and the PCLLoss value match.

    Documented deviations vs the host port (PARITY.md): KMeans center init
    (see _kmeans_top_mask_device) and first-index (not reversed-argsort)
    tie-breaking in the top-5 center selection.
    """
    c = im_labels.shape[1]
    r = boxes.shape[0]
    if cls_prob.shape[1] != c:
        cls_prob = cls_prob[:, 1:]
    eps = 1e-9
    cls_prob = jnp.clip(cls_prob, eps, 1 - eps)
    cls_prob_new = jnp.clip(cls_prob_new, eps, 1 - eps)
    valid = valid.astype(bool)

    ov_all = box_ops_iou_device(boxes, boxes)
    adj = ov_all > PCL_GRAPH_IOU_THRESHOLD

    npc = PCL_MAX_PC_NUM
    gt_box = jnp.zeros((c, npc, 4), jnp.float32)
    gt_score = jnp.zeros((c, npc), jnp.float32)
    gt_ok = jnp.zeros((c, npc), bool)
    pool = valid

    for i in range(c):                                # static class loop
        gate = im_labels[0, i] == 1
        cand = pool & gate
        top = _kmeans_top_mask_device(cls_prob[:, i], cand)
        cidx, cscore, k = _clique_centers_device(adj, top, cls_prob[:, i],
                                                 max_centers)
        # top-5 by score desc (host: reversed stable argsort)
        sel_score, sel = jax.lax.top_k(cscore, npc)
        sel_ok = (sel < k) & (sel_score > -_BIG / 2) & gate
        chosen = jnp.where(sel_ok, cidx[sel], 0)
        gt_box = gt_box.at[i].set(boxes[chosen])
        gt_score = gt_score.at[i].set(jnp.where(sel_ok, sel_score, 0.0))
        gt_ok = gt_ok.at[i].set(sel_ok)
        # chosen centers leave the pool for subsequent classes
        # (pcl.py: np.delete on boxes/cls_prob). scatter-add, not set:
        # invalid slots alias index 0 and must not clear a real mark
        taken = jnp.zeros((r,), jnp.int32).at[chosen].add(
            sel_ok.astype(jnp.int32)) > 0
        pool = pool & ~taken

    g = c * npc
    gt_box = gt_box.reshape(g, 4)
    gt_score = gt_score.reshape(g)
    gt_ok = gt_ok.reshape(g)
    gt_cls = jnp.repeat(jnp.arange(1, c + 1), npc) * gt_ok

    ov = box_ops_iou_device(boxes, gt_box)            # (R, G)
    ov = jnp.where(gt_ok[None, :], ov, -1.0)
    any_gt = jnp.any(gt_ok)
    ga = jnp.argmax(ov, axis=1)
    mo = jnp.max(ov, axis=1)
    bg = (mo < PCL_FG_THRESH) | ~valid | ~any_gt
    ig = (mo < PCL_BG_THRESH) | ~valid | ~any_gt
    labels = jnp.where(bg, 0, gt_cls[ga]).astype(jnp.float32)
    clw = jnp.where(ig, 0.0, gt_score[ga])
    ga_f = jnp.where(bg, -1.0, ga.astype(jnp.float32))

    fg = ~bg
    onehot = (ga[:, None] == jnp.arange(g)[None, :]) & fg[:, None]
    img_w = jnp.sum(jnp.where(onehot, clw[:, None], 0.0), axis=0)
    pc_count = jnp.sum(onehot, axis=0).astype(jnp.float32)
    probs_at = cls_prob_new[:, jnp.clip(gt_cls, 0, c)]  # (R, G)
    pc_probs = jnp.where(
        pc_count > 0,
        jnp.sum(jnp.where(onehot, probs_at, 0.0), axis=0) /
        jnp.maximum(pc_count, 1.0),
        0.0)
    pc_labels = gt_cls.astype(jnp.float32)            # 0 for empty slots
    im_real = jnp.concatenate(
        [jnp.ones((1,), jnp.float32), im_labels[0].astype(jnp.float32)])
    return (labels, clw, ga_f, pc_labels, pc_probs, pc_count, img_w,
            im_real)


def box_ops_iou_device(a, b):
    """Detectron +1 IoU on device (utils/cython_bbox.bbox_overlaps
    semantics, same formula as native/box_ops.cpp)."""
    from nafwebsod_tpu.ops.jbox import iou_matrix
    return iou_matrix(a.astype(jnp.float32), b.astype(jnp.float32))
