"""Per-image inference: detection forward, test-time augmentation, NMS+limit.

Capability parity with ``detectron/core/test_wsl.py``:
  * ``im_detect_bbox``   — ref :102-178: image blob at TEST.SCALE/MAX_SIZE,
    rois scaled, obn_scores + 1.0, DEDUP_BOXES hashing on the scaled rois
    (quantized at 0.125), unique-subset forward, scores mapped back through
    inv_index, boxes tiled per class (no bbox regression in WSL).
  * ``im_detect_bbox_aug`` (+ hflip / scale / aspect-ratio transforms) —
    ref :181-345 with ID/AVG/UNION score and coord heuristics.
  * ``box_results_with_nms_and_limit`` — ref :803-870: per-class score
    threshold -> (soft-)NMS -> optional box voting -> DETECTIONS_PER_IM cap
    over all classes.

The device forward runs with rois padded to a multiple of
cfg.TPU.ROI_PAD_MULTIPLE and images optionally padded to a size bucket so XLA
compiles a bounded set of programs (zero padding equals mean-pixels, the same
padding im_list_to_blob applies when batching).
"""

import logging
import os
from collections import defaultdict
from functools import partial

import numpy as np
import jax
import jax.numpy as jnp

from nafwebsod_tpu.core.config import cfg
from nafwebsod_tpu.data.minibatch import prep_im_for_blob, pad_image_to_bucket
from nafwebsod_tpu.models import detector
from nafwebsod_tpu.ops import image as image_ops
from nafwebsod_tpu.ops import boxes as box_utils
from nafwebsod_tpu.utils.timer import Timer

logger = logging.getLogger(__name__)


def _pad_rois(rois, obn, multiple):
    n = rois.shape[0]
    cap = max(multiple, int(np.ceil(n / multiple) * multiple)) if multiple > 1 else n
    valid = np.zeros((cap,), dtype=bool)
    valid[:n] = True
    out_r = np.zeros((cap, 5), np.float32)
    out_r[:n] = rois
    out_o = np.zeros((cap, 1), np.float32)
    out_o[:n] = obn.reshape(n, 1)
    return out_r, out_o, valid


def im_detect_bbox(spec, params, im, target_scale, target_max_size,
                   boxes=None, obn_scores=None):
    """Detect on one image with given proposals. Returns (scores, pred_boxes,
    im_scale): scores (R, num_classes) incl. bg column; pred_boxes
    (R, 4*num_classes) tiled proposals.

    With ``boxes=None`` (TEST.PRECOMPUTED_PROPOSALS=False / FASTER_RCNN) the
    model's in-graph RPN generates the proposals (upstream test.py
    im_detect_bbox RPN branch)."""
    if boxes is None:
        assert spec.faster_rcnn, 'proposal-less inference needs FASTER_RCNN'
        return _im_detect_bbox_rpn(spec, params, im, target_scale,
                                   target_max_size)
    boxes_o = boxes
    im_blob, im_scale = prep_im_for_blob(
        im, cfg.PIXEL_MEANS, target_scale, target_max_size, cfg.PIXEL_STDS)

    # dedup aliased feature rois (ref :125-133)
    rois5, obn, _, inv_index = _dedup_scaled_rois(
        boxes, obn_scores, im_scale)

    pad_mult = cfg.TPU.ROI_PAD_MULTIPLE
    rois_p, obn_p, valid = _pad_rois(rois5, obn, pad_mult)
    im_in = pad_image_to_bucket(im_blob, cfg.TPU.SIZE_BUCKET_MULTIPLE)

    out = detector.forward_test(
        spec, params, jnp.asarray(im_in[None]), jnp.asarray(rois_p),
        jnp.asarray(obn_p), jnp.asarray(valid),
        # true blob extent inside the bucket-padded canvas: the context
        # head clips its outer rings here, not at the padded edge
        im_hw=jnp.asarray(
            np.array(im_blob.shape[:2], np.float32)))
    scores = np.asarray(out['scores'])[:rois5.shape[0]]
    scores = scores.reshape(-1, scores.shape[-1])

    if inv_index is not None:
        scores = scores[inv_index, :]

    if cfg.TEST.BBOX_REG and 'bbox_pred' in out:
        # supervised path: decode class-wise box deltas (test.py upstream)
        deltas = np.asarray(out['bbox_pred'])[:rois5.shape[0]]
        if inv_index is not None:
            deltas = deltas[inv_index, :]
        pred_boxes = box_utils.bbox_transform(
            boxes_o, deltas, cfg.MODEL.BBOX_REG_WEIGHTS)
        pred_boxes = box_utils.clip_tiled_boxes(pred_boxes, im.shape)
        if pred_boxes.shape[1] == 8:  # class-agnostic: tile to num_classes
            pred_boxes = np.tile(pred_boxes[:, 4:], (1, scores.shape[1]))
    else:
        # WSL: no bbox regression — tile original boxes per class (ref :171)
        pred_boxes = np.tile(boxes_o, (1, scores.shape[1]))
    return scores, pred_boxes, im_scale


def _im_detect_bbox_rpn(spec, params, im, target_scale, target_max_size):
    """Faster R-CNN inference: the RPN proposes, the box head classifies and
    regresses; deltas decode in original-image coordinates (upstream
    test.py:im_detect_bbox)."""
    im_blob, im_scale = prep_im_for_blob(
        im, cfg.PIXEL_MEANS, target_scale, target_max_size, cfg.PIXEL_STDS)
    h, w = im_blob.shape[:2]
    im_in = pad_image_to_bucket(im_blob, cfg.TPU.SIZE_BUCKET_MULTIPLE)
    im_info = np.array([h, w, im_scale], np.float32)
    out = detector.forward_test(
        spec, params, jnp.asarray(im_in[None]), None, None, None,
        im_info=jnp.asarray(im_info))
    pvalid = np.asarray(out['proposal_valid'])
    scores = np.asarray(out['scores'])[pvalid]
    boxes_o = np.asarray(out['rois'])[pvalid][:, 1:5] / im_scale
    if cfg.TEST.BBOX_REG:
        deltas = np.asarray(out['bbox_pred'])[pvalid]
        pred_boxes = box_utils.bbox_transform(
            boxes_o, deltas, cfg.MODEL.BBOX_REG_WEIGHTS)
        pred_boxes = box_utils.clip_tiled_boxes(pred_boxes, im.shape)
        if pred_boxes.shape[1] == 8:
            pred_boxes = np.tile(pred_boxes[:, 4:], (1, scores.shape[1]))
    else:
        pred_boxes = np.tile(boxes_o, (1, scores.shape[1]))
    return scores, pred_boxes, im_scale


def im_detect_bbox_hflip(spec, params, im, target_scale, target_max_size,
                         box_proposals=None, obn_scores=None):
    im_hf = im[:, ::-1, :]
    im_width = im.shape[1]
    box_proposals_hf = box_utils.flip_boxes(box_proposals, im_width)
    scores_hf, boxes_hf, im_scale = im_detect_bbox(
        spec, params, im_hf, target_scale, target_max_size,
        boxes=box_proposals_hf, obn_scores=obn_scores)
    boxes_inv = box_utils.flip_boxes(boxes_hf, im_width)
    return scores_hf, boxes_inv, im_scale


def im_detect_bbox_scale(spec, params, im, target_scale, target_max_size,
                         box_proposals=None, obn_scores=None, hflip=False):
    if hflip:
        scores, boxes, _ = im_detect_bbox_hflip(
            spec, params, im, target_scale, target_max_size,
            box_proposals=box_proposals, obn_scores=obn_scores)
    else:
        scores, boxes, _ = im_detect_bbox(
            spec, params, im, target_scale, target_max_size,
            boxes=box_proposals, obn_scores=obn_scores)
    return scores, boxes


def im_detect_bbox_aspect_ratio(spec, params, im, aspect_ratio,
                                box_proposals=None, obn_scores=None,
                                hflip=False):
    import cv2
    im_ar = cv2.resize(im, None, fx=aspect_ratio, fy=1.0)
    box_proposals_ar = box_utils.aspect_ratio(box_proposals, aspect_ratio)
    if hflip:
        scores_ar, boxes_ar, _ = im_detect_bbox_hflip(
            spec, params, im_ar, cfg.TEST.SCALE, cfg.TEST.MAX_SIZE,
            box_proposals=box_proposals_ar, obn_scores=obn_scores)
    else:
        scores_ar, boxes_ar, _ = im_detect_bbox(
            spec, params, im_ar, cfg.TEST.SCALE, cfg.TEST.MAX_SIZE,
            boxes=box_proposals_ar, obn_scores=obn_scores)
    boxes_inv = box_utils.aspect_ratio(boxes_ar, 1.0 / aspect_ratio)
    return scores_ar, boxes_inv


def _bbox_aug_variants(aug):
    """Enumerate the configured test-time-augmentation sweep as
    (kind, argument, hflip) tuples, identity last (matching the reference
    sweep order, test_wsl.py:181-245)."""
    plan = []
    if aug.H_FLIP:
        plan.append(('scale', (cfg.TEST.SCALE, cfg.TEST.MAX_SIZE), True))
    for s in aug.SCALES:
        plan.append(('scale', (s, aug.MAX_SIZE), False))
        if aug.SCALE_H_FLIP:
            plan.append(('scale', (s, aug.MAX_SIZE), True))
    for ar in aug.ASPECT_RATIOS:
        plan.append(('aspect', ar, False))
        if aug.ASPECT_RATIO_H_FLIP:
            plan.append(('aspect', ar, True))
    plan.append(('scale', (cfg.TEST.SCALE, cfg.TEST.MAX_SIZE), False))
    return plan


def im_detect_bbox_aug(spec, params, im, box_proposals=None, obn_scores=None):
    """Multi-transform detection sweep with score/coord combination
    heuristics (protocol of test_wsl.py:181-283)."""
    aug = cfg.TEST.BBOX_AUG
    assert not aug.SCALE_SIZE_DEP, 'size-dependent scale sweep unsupported'
    assert (aug.SCORE_HEUR == 'UNION') == (aug.COORD_HEUR == 'UNION'), \
        'UNION must be used for both score and coord heuristics'

    preds = []
    im_scale = None
    for kind, arg, hflip in _bbox_aug_variants(aug):
        if kind == 'scale' and not hflip and arg == (cfg.TEST.SCALE,
                                                     cfg.TEST.MAX_SIZE):
            s, b, im_scale = im_detect_bbox(
                spec, params, im, arg[0], arg[1],
                boxes=box_proposals, obn_scores=obn_scores)
            preds.append((s, b))
        elif kind == 'scale':
            preds.append(im_detect_bbox_scale(
                spec, params, im, arg[0], arg[1], box_proposals, obn_scores,
                hflip=hflip))
        else:
            preds.append(im_detect_bbox_aspect_ratio(
                spec, params, im, arg, box_proposals, obn_scores,
                hflip=hflip))
    identity_scores, identity_boxes = preds[-1]

    combine = {
        'ID': lambda stack, ident: ident,
        'AVG': lambda stack, ident: np.mean(stack, axis=0),
        'UNION': lambda stack, ident: np.vstack(stack),
    }
    try:
        scores_c = combine[aug.SCORE_HEUR]([p[0] for p in preds],
                                           identity_scores)
        boxes_c = combine[aug.COORD_HEUR]([p[1] for p in preds],
                                          identity_boxes)
    except KeyError as heur:
        raise NotImplementedError('BBOX_AUG heuristic {}'.format(heur))
    return scores_c, boxes_c, im_scale


def _gate_class(all_scores, all_boxes, j):
    """(R,5) candidate dets of class j above TEST.SCORE_THRESH."""
    sel = all_scores[:, j] > cfg.TEST.SCORE_THRESH
    return np.concatenate(
        [all_boxes[sel, 4 * j:4 * j + 4],
         all_scores[sel, j:j + 1]], axis=1).astype(np.float32)


def _suppress_on_device(all_scores, all_boxes):
    """Run the class-batched greedy-NMS kernel over every foreground class
    at once (ops/jbox.multiclass_nms_limit) and unpack to per-class det
    arrays. The RoI axis is padded to TPU.ROI_PAD_MULTIPLE so XLA compiles
    a bounded program set; thresholds are traced, so grid-search sweeps
    reuse one program."""
    from nafwebsod_tpu.ops import jbox

    num_classes = all_scores.shape[1]
    r = all_scores.shape[0]
    mult = max(int(cfg.TPU.ROI_PAD_MULTIPLE), 1)
    cap = max(mult, int(np.ceil(r / mult) * mult))

    sc = np.full((cap, num_classes), -np.inf, np.float32)
    sc[:r] = all_scores
    bx = np.zeros((cap, num_classes, 4), np.float32)
    bx[:r] = all_boxes.reshape(r, num_classes, 4)

    limit = int(cfg.TEST.DETECTIONS_PER_IM)
    per_class_cap = min(cap, limit if limit > 0 else cap)
    if cfg.TEST.BBOX_VOTE.ENABLED:
        # voting re-scores the NMS survivors BEFORE any cap applies
        # (test_wsl.py:843-858): keep every survivor, not just the top
        # `limit` per class, or a survivor whose voted score would have
        # made the final cut could be dropped early
        per_class_cap = cap
    idx, vals, keep = jbox.multiclass_nms_limit(
        jnp.asarray(bx.transpose(1, 0, 2)[1:]),      # (C-1, cap, 4)
        jnp.asarray(sc.T[1:]),                       # (C-1, cap)
        jnp.float32(cfg.TEST.NMS),
        jnp.float32(cfg.TEST.SCORE_THRESH),
        max_keep=per_class_cap,
        # voting re-scores survivors, so the cross-class cap must wait for
        # the host voting pass in that configuration
        limit=0 if cfg.TEST.BBOX_VOTE.ENABLED else limit)
    idx, vals, keep = np.asarray(idx), np.asarray(vals), np.asarray(keep)

    dets = {}
    for j in range(1, num_classes):
        rows = idx[j - 1][keep[j - 1]]
        dets[j] = np.concatenate(
            [bx[rows, j], vals[j - 1][keep[j - 1]][:, None]],
            axis=1).astype(np.float32)
    return dets


def _cap_total_detections(dets, limit):
    """Apply the cross-class DETECTIONS_PER_IM cap: threshold at the
    limit-th best score, keeping ties (the reference cap's semantics)."""
    pool = np.concatenate([d[:, 4] for d in dets.values()])
    if limit <= 0 or pool.size <= limit:
        return dets
    cut = np.partition(pool, -limit)[-limit]
    return {j: d[d[:, 4] >= cut] for j, d in dets.items()}


def box_results_with_nms_and_limit(scores, boxes):
    """Collapse per-proposal class scores into the final per-image
    detections: per-class score gate -> (soft-)NMS -> optional box voting
    -> cross-class DETECTIONS_PER_IM cap.

    Reproduces the eval protocol of ``detectron/core/test_wsl.py:803-870``
    with a device-first formulation: the default hard-NMS route runs all
    classes through one jitted class-batched kernel; soft-NMS (a
    sequentially re-scoring variant) stays on host via the native C++
    kernel. Returns (scores_flat, boxes_flat, cls_boxes) where cls_boxes
    is the legacy per-class list (index 0 = background, empty).

    scores: (R, num_classes); boxes: (R, 4 * num_classes).
    """
    num_classes = cfg.MODEL.NUM_CLASSES
    soft = cfg.TEST.SOFT_NMS.ENABLED
    host = bool(os.environ.get('NAFWEBSOD_HOST_NMS'))  # A/B escape hatch
    # no cross-class cap -> the device loop would need R iterations per
    # class; the uncapped configuration stays on the host native kernel
    host = host or int(cfg.TEST.DETECTIONS_PER_IM) <= 0

    if soft or host or scores.shape[0] == 0:
        dets = {}
        for j in range(1, num_classes):
            cand = _gate_class(scores, boxes, j)
            if soft:
                dets[j], _ = box_utils.soft_nms(
                    cand, sigma=cfg.TEST.SOFT_NMS.SIGMA,
                    overlap_thresh=cfg.TEST.NMS, score_thresh=0.0001,
                    method=cfg.TEST.SOFT_NMS.METHOD)
            else:
                dets[j] = cand[box_utils.nms(cand, cfg.TEST.NMS)]
    else:
        dets = _suppress_on_device(scores, boxes)

    if cfg.TEST.BBOX_VOTE.ENABLED:
        dets = {j: box_utils.box_voting(
                    d, _gate_class(scores, boxes, j),
                    cfg.TEST.BBOX_VOTE.VOTE_TH,
                    scoring_method=cfg.TEST.BBOX_VOTE.SCORING_METHOD,
                    beta=cfg.TEST.BBOX_VOTE.SCORING_METHOD_BETA)
                for j, d in dets.items()}

    dets = _cap_total_detections(dets, int(cfg.TEST.DETECTIONS_PER_IM))

    merged = np.concatenate([dets[j] for j in range(1, num_classes)], axis=0)
    cls_boxes = [[]] + [dets[j] for j in range(1, num_classes)]
    return merged[:, 4], merged[:, :4], cls_boxes


def _fused_detect_core(spec, params, im_in, rois_p, obn_p, valid,
                       orig_boxes_p, nms_t, score_t, max_keep, limit,
                       im_hw=None):
    """forward_test + the class-batched NMS-and-limit kernel, traced as
    one program (shared by the single-image jit and the scan-of-B batch
    driver). ``im_hw`` (2,) f32 is the true blob extent inside the
    bucket-padded canvas — the context head clips its outer rings there
    (wsl_heads.py RoIContext), not at the padded edge."""
    from nafwebsod_tpu.ops import jbox

    out = detector.forward_test(spec, params, im_in, rois_p, obn_p, valid,
                                im_hw=im_hw)
    scores = out['scores'].reshape(rois_p.shape[0], -1)
    gated = jnp.where(valid[:, None], scores.astype(jnp.float32), -jnp.inf)
    c = gated.shape[1]
    boxes_c = jnp.broadcast_to(orig_boxes_p[None],
                               (c - 1,) + orig_boxes_p.shape)
    return jbox.multiclass_nms_limit(
        boxes_c, gated.T[1:], nms_t, score_t, max_keep=max_keep,
        limit=limit)


@partial(jax.jit, static_argnames=('spec', 'max_keep', 'limit'))
def _fused_detect_call(spec, params, im_in, rois_p, obn_p, valid,
                       orig_boxes_p, max_keep, limit, im_hw=None):
    """ONE device program: forward_test + the class-batched NMS-and-limit
    kernel. On remote-attached TPUs each device call costs a full host
    round-trip (~170 ms through this rig's tunnel), so fusing the two
    halves of per-image inference halves the dispatch bill; on local hosts
    it simply removes a host sync between forward and NMS."""
    return _fused_detect_core(
        spec, params, im_in, rois_p, obn_p, valid, orig_boxes_p,
        jnp.float32(cfg.TEST.NMS), jnp.float32(cfg.TEST.SCORE_THRESH),
        max_keep, limit, im_hw)


def _detect_scan_impl(spec, params, ims, rois, obns, valids, origs,
                      nms_t, score_t, max_keep, limit, im_hws=None):
    def one(carry, xs):
        im, r, o, v, ob, hw = xs
        return carry, _fused_detect_core(
            spec, params, im[None], r, o, v, ob, nms_t, score_t,
            max_keep, limit, hw)

    _, outs = jax.lax.scan(one, jnp.int32(0),
                           (ims, rois, obns, valids, origs, im_hws))
    return outs


@partial(jax.jit, static_argnames=('spec', 'max_keep', 'limit'))
def _fused_detect_scan(spec, params, ims, rois, obns, valids, origs,
                       nms_t, score_t, max_keep, limit, im_hws=None):
    """B images per device call: lax.scan of the fused core over the
    stacked chunk. One dispatch amortizes the per-call round-trip Bx
    (scan, not vmap: per-image programs keep the Pallas pool's VMEM
    residency pattern unchanged)."""
    return _detect_scan_impl(spec, params, ims, rois, obns, valids, origs,
                             nms_t, score_t, max_keep, limit, im_hws)


from functools import lru_cache as _lru_cache


@_lru_cache(maxsize=None)
def _infer_mesh(n_dev):
    from jax.sharding import Mesh
    devices = jax.devices()
    if len(devices) < n_dev:
        raise ValueError('TPU.INFER_MESH={} but only {} devices'.format(
            n_dev, len(devices)))
    return Mesh(np.asarray(devices[:n_dev]), ('data',))


def _shard_map(f, **kw):
    from nafwebsod_tpu.parallel.mesh import shard_map_compat
    return shard_map_compat(f, **kw)


def _infer_mesh_size(b):
    """Mesh width for eval chunks: TPU.INFER_MESH devices when enabled and
    the chunk divides evenly, else 1 (single-device path)."""
    n = int(getattr(cfg.TPU, 'INFER_MESH', 0) or 0)
    if n > 1 and b % n == 0 and len(jax.devices()) >= n:
        return n
    return 1


@partial(jax.jit, static_argnames=('spec', 'max_keep', 'limit', 'n_dev'))
def _fused_detect_scan_mesh(spec, params, ims, rois, obns, valids, origs,
                            nms_t, score_t, max_keep, limit, n_dev,
                            im_hws=None):
    """Mesh-sharded eval chunk (TPU.INFER_MESH): the B images split over
    ``n_dev`` devices, each scanning its B/n share of the SAME program —
    the single-process, ICI-native counterpart of the multi-process range
    sharding in engine/test_engine.py (one weight replica per chip, no
    pickle merge)."""
    from jax.sharding import PartitionSpec as P

    fn = _shard_map(
        lambda p, hw, *xs: _detect_scan_impl(
            spec, p, *xs, max_keep=max_keep, limit=limit, im_hws=hw),
        mesh=_infer_mesh(n_dev),
        in_specs=(P(), P('data'), P('data'), P('data'), P('data'),
                  P('data'), P('data'), P(), P()),
        out_specs=P('data'))
    return fn(params, im_hws, ims, rois, obns, valids, origs, nms_t,
              score_t)


def _dedup_scaled_rois(boxes, obn_scores, im_scale):
    """Scale + DEDUP_BOXES quantized hashing (test_wsl.py:125-133) — the
    ONE implementation shared by the per-image and fused paths. The
    duplicates must leave the forward too: they would inflate the
    RoI-softmax denominator the reference computes on unique rois.
    Returns (rois5, obn, unique_boxes, inv_index); ``inv_index`` (None
    when dedup is off) maps original rows back onto the unique set for
    score scatter-back."""
    rois5 = np.hstack([np.zeros((boxes.shape[0], 1), np.float32),
                       (boxes * im_scale).astype(np.float32)])
    obn = np.add(obn_scores, 1.0).astype(np.float32).reshape(-1, 1)
    inv_index = None
    if cfg.DEDUP_BOXES > 0:
        v = np.array([1, 1e3, 1e6, 1e9, 1e12])
        hashes = np.round(rois5 * cfg.DEDUP_BOXES).dot(v)
        _, index, inv_index = np.unique(hashes, return_index=True,
                                        return_inverse=True)
        rois5, obn, boxes = rois5[index], obn[index], boxes[index]
    return rois5, obn, boxes, inv_index


def _fused_host_prep(im, boxes, obn_scores):
    """Blob prep (resize + normalize on host) + roi dedup. Returns
    (im_blob, rois5, obn, unique_boxes)."""
    im_blob, im_scale = prep_im_for_blob(
        im, cfg.PIXEL_MEANS, cfg.TEST.SCALE, cfg.TEST.MAX_SIZE,
        cfg.PIXEL_STDS)
    rois5, obn, boxes, _ = _dedup_scaled_rois(boxes, obn_scores, im_scale)
    return im_blob, rois5, obn, boxes


def _device_prep_enabled():
    """Device-side image prep (ops/image.py): raw uint8 crosses the link,
    resize + normalize run inside the jitted program. Auto on TPU
    backends (the f32 blob transfer and cv2.resize dominate per-image
    eval cost there); NAFWEBSOD_HOST_PREP=1 forces the host path for
    A/B."""
    if os.environ.get('NAFWEBSOD_HOST_PREP'):
        return False
    v = int(cfg.TPU.DEVICE_IMAGE_PREP)
    if v < 0:
        return detector._default_backend_is_tpu()
    return bool(v)


def _snap(v, multiple):
    if multiple <= 1:
        return int(v)
    return int(np.ceil(v / multiple) * multiple)


def _raw_host_prep(im, boxes, obn_scores):
    """Host half of the device-prep path: scale arithmetic + roi dedup
    only; pixels stay uint8. Returns (im, im_scale, (vh, vw), rois5,
    obn, unique_boxes) with (vh, vw) the resized valid extent."""
    h, w = im.shape[:2]
    im_scale = image_ops.compute_im_scale(
        h, w, cfg.TEST.SCALE, cfg.TEST.MAX_SIZE)
    rois5, obn, boxes, _ = _dedup_scaled_rois(boxes, obn_scores, im_scale)
    return (im, im_scale, image_ops.scaled_size(h, w, im_scale),
            rois5, obn, boxes)


def _fused_detect_core_raw(spec, params, raw, scale, vh, vw, means, stds,
                           rois_p, obn_p, valid, orig_p, nms_t, score_t,
                           out_hw, max_keep, limit):
    """Device image prep (resize + normalize, ops/image.py) fused in
    front of forward_test + NMS: the whole per-image pipeline past the
    uint8 pixels is ONE device program."""
    im = image_ops.device_prep(raw, scale, vh, vw, out_hw, means, stds)
    # (vh, vw) IS the true resized extent — thread it as im_hw so the
    # context head's ring clipping sees the real image edge, not the
    # out_hw canvas pad
    im_hw = jnp.stack([vh, vw]).astype(jnp.float32)
    return _fused_detect_core(spec, params, im[None], rois_p, obn_p,
                              valid, orig_p, nms_t, score_t, max_keep,
                              limit, im_hw)


@partial(jax.jit, static_argnames=('spec', 'out_hw', 'max_keep', 'limit'))
def _fused_detect_call_raw(spec, params, raw, scale, vh, vw, means, stds,
                           rois_p, obn_p, valid, orig_p, out_hw, max_keep,
                           limit):
    return _fused_detect_core_raw(
        spec, params, raw, scale, vh, vw, means, stds, rois_p, obn_p,
        valid, orig_p, jnp.float32(cfg.TEST.NMS),
        jnp.float32(cfg.TEST.SCORE_THRESH), out_hw, max_keep, limit)


def _detect_scan_raw_impl(spec, params, raws, scales, vhs, vws, means,
                          stds, rois, obns, valids, origs, nms_t, score_t,
                          out_hw, max_keep, limit):
    def one(carry, xs):
        raw, s, vh, vw, r, o, v, ob = xs
        return carry, _fused_detect_core_raw(
            spec, params, raw, s, vh, vw, means, stds, r, o, v, ob,
            nms_t, score_t, out_hw, max_keep, limit)

    _, outs = jax.lax.scan(one, jnp.int32(0),
                           (raws, scales, vhs, vws, rois, obns, valids,
                            origs))
    return outs


@partial(jax.jit, static_argnames=('spec', 'out_hw', 'max_keep', 'limit'))
def _fused_detect_scan_raw(spec, params, raws, scales, vhs, vws, means,
                           stds, rois, obns, valids, origs, nms_t, score_t,
                           out_hw, max_keep, limit):
    """Scan-of-B with in-graph image prep: per-image dynamic scale under
    one static raw/out canvas pair (scale_and_translate takes the scale
    as a traced operand, so one compile covers the whole dataset when
    the caller caps the canvases from the roidb)."""
    return _detect_scan_raw_impl(spec, params, raws, scales, vhs, vws,
                                 means, stds, rois, obns, valids, origs,
                                 nms_t, score_t, out_hw, max_keep, limit)


@partial(jax.jit, static_argnames=('spec', 'out_hw', 'max_keep', 'limit',
                                   'n_dev'))
def _fused_detect_scan_raw_mesh(spec, params, raws, scales, vhs, vws,
                                means, stds, rois, obns, valids, origs,
                                nms_t, score_t, out_hw, max_keep, limit,
                                n_dev):
    """Mesh-sharded raw-prep eval chunk (TPU.INFER_MESH): see
    _fused_detect_scan_mesh."""
    from jax.sharding import PartitionSpec as P

    fn = _shard_map(
        lambda p, m, sd, *xs: _detect_scan_raw_impl(
            spec, p, xs[0], xs[1], xs[2], xs[3], m, sd, xs[4], xs[5],
            xs[6], xs[7], xs[8], xs[9], out_hw, max_keep, limit),
        mesh=_infer_mesh(n_dev),
        in_specs=(P(), P(), P(), P('data'), P('data'), P('data'),
                  P('data'), P('data'), P('data'), P('data'), P('data'),
                  P(), P()),
        out_specs=P('data'))
    return fn(params, means, stds, raws, scales, vhs, vws, rois, obns,
              valids, origs, nms_t, score_t)


def _assemble_cls_boxes(orig_p, idx, vals, keep):
    """(C-1, K) NMS-kernel outputs -> the legacy per-class det list."""
    cls_boxes = [[]]
    for j in range(1, cfg.MODEL.NUM_CLASSES):
        rows = idx[j - 1][keep[j - 1]]
        cls_boxes.append(np.concatenate(
            [orig_p[rows], vals[j - 1][keep[j - 1]][:, None]],
            axis=1).astype(np.float32))
    return cls_boxes


def im_detect_fused(spec, params, im, boxes, obn_scores):
    """Single-call per-image detection for the plain eval protocol (no
    TTA, no soft-NMS, no box voting): blob prep + DEDUP_BOXES hashing on
    host, then one jitted forward+NMS program, then detection assembly.
    The inv_index expansion of im_detect_bbox is unnecessary here:
    duplicates carry identical boxes and scores, so greedy NMS on the
    unique set yields the same detections as NMS on the expanded set."""
    if _device_prep_enabled():
        return _im_detect_fused_raw(spec, params, im, boxes, obn_scores)
    im_blob, rois5, obn, boxes = _fused_host_prep(im, boxes, obn_scores)
    rois_p, obn_p, valid = _pad_rois(rois5, obn, cfg.TPU.ROI_PAD_MULTIPLE)
    im_in = pad_image_to_bucket(im_blob, cfg.TPU.SIZE_BUCKET_MULTIPLE)

    orig_p = np.zeros((rois_p.shape[0], 4), np.float32)
    orig_p[:len(boxes)] = boxes

    limit = int(cfg.TEST.DETECTIONS_PER_IM)
    idx, vals, keep = _fused_detect_call(
        spec, params, jnp.asarray(im_in[None]), jnp.asarray(rois_p),
        jnp.asarray(obn_p), jnp.asarray(valid), jnp.asarray(orig_p),
        max_keep=min(limit, rois_p.shape[0]), limit=limit,
        im_hw=jnp.asarray(np.array(im_blob.shape[:2], np.float32)))
    return _assemble_cls_boxes(orig_p, np.asarray(idx), np.asarray(vals),
                               np.asarray(keep))


def _im_detect_fused_raw(spec, params, im, boxes, obn_scores):
    """im_detect_fused with device-side image prep: only the raw uint8
    canvas and the (tiny) roi arrays cross the host->device link."""
    im, im_scale, (vh, vw), rois5, obn, boxes_u = _raw_host_prep(
        im, boxes, obn_scores)
    bucket = cfg.TPU.SIZE_BUCKET_MULTIPLE
    raw = image_ops.raw_canvas(
        im, _snap(im.shape[0] + image_ops.EDGE_PAD, bucket),
        _snap(im.shape[1] + image_ops.EDGE_PAD, bucket))
    out_hw = (_snap(vh, bucket), _snap(vw, bucket))
    rois_p, obn_p, valid = _pad_rois(rois5, obn, cfg.TPU.ROI_PAD_MULTIPLE)
    orig_p = np.zeros((rois_p.shape[0], 4), np.float32)
    orig_p[:len(boxes_u)] = boxes_u

    limit = int(cfg.TEST.DETECTIONS_PER_IM)
    idx, vals, keep = _fused_detect_call_raw(
        spec, params, jnp.asarray(raw), jnp.float32(im_scale),
        jnp.int32(vh), jnp.int32(vw),
        jnp.asarray(cfg.PIXEL_MEANS.reshape(-1), jnp.float32),
        jnp.asarray(cfg.PIXEL_STDS.reshape(-1), jnp.float32),
        jnp.asarray(rois_p), jnp.asarray(obn_p), jnp.asarray(valid),
        jnp.asarray(orig_p), out_hw=out_hw,
        max_keep=min(limit, rois_p.shape[0]), limit=limit)
    return _assemble_cls_boxes(orig_p, np.asarray(idx), np.asarray(vals),
                               np.asarray(keep))


def _im_detect_fused_batch_raw_dispatch(spec, params, ims, boxes_list,
                                        obn_list, raw_cap=None,
                                        out_cap=None):
    """Chunk-of-B fused detection with device-side image prep. raw_cap /
    out_cap pin the uint8 and resized canvases to dataset-wide maxima so
    ONE compile covers every chunk (test_engine derives them from the
    roidb); when None they fall back to per-chunk maxima. Returns a
    handle for im_detect_fused_batch_harvest WITHOUT blocking on the
    device (async dispatch)."""
    preps = [_raw_host_prep(im, b, o)
             for im, b, o in zip(ims, boxes_list, obn_list)]
    bucket = cfg.TPU.SIZE_BUCKET_MULTIPLE
    if raw_cap is None:
        raw_cap = (
            _snap(max(p[0].shape[0] for p in preps) + image_ops.EDGE_PAD,
                  bucket),
            _snap(max(p[0].shape[1] for p in preps) + image_ops.EDGE_PAD,
                  bucket))
    if out_cap is None:
        out_cap = (_snap(max(p[2][0] for p in preps), bucket),
                   _snap(max(p[2][1] for p in preps), bucket))
    mult = max(int(cfg.TPU.ROI_PAD_MULTIPLE), 1)
    rmax = max(p[3].shape[0] for p in preps)
    rcap = max(mult, int(np.ceil(rmax / mult) * mult))

    b = len(preps)
    raws = np.zeros((b,) + raw_cap + (3,), np.uint8)
    scales = np.zeros((b,), np.float32)
    vhs = np.zeros((b,), np.int32)
    vws = np.zeros((b,), np.int32)
    rois_p = np.zeros((b, rcap, 5), np.float32)
    obn_p = np.zeros((b, rcap, 1), np.float32)
    valid = np.zeros((b, rcap), bool)
    orig_p = np.zeros((b, rcap, 4), np.float32)
    for i, (im, s, (vh, vw), rois5, obn, boxes_u) in enumerate(preps):
        raws[i] = image_ops.raw_canvas(im, *raw_cap)
        scales[i], vhs[i], vws[i] = s, vh, vw
        n = rois5.shape[0]
        rois_p[i, :n] = rois5
        obn_p[i, :n] = obn
        valid[i, :n] = True
        orig_p[i, :n] = boxes_u

    limit = int(cfg.TEST.DETECTIONS_PER_IM)
    n_mesh = _infer_mesh_size(b)
    scan_fn = (_fused_detect_scan_raw if n_mesh == 1 else
               partial(_fused_detect_scan_raw_mesh, n_dev=n_mesh))
    idx, vals, keep = scan_fn(
        spec, params, jnp.asarray(raws), jnp.asarray(scales),
        jnp.asarray(vhs), jnp.asarray(vws),
        jnp.asarray(cfg.PIXEL_MEANS.reshape(-1), jnp.float32),
        jnp.asarray(cfg.PIXEL_STDS.reshape(-1), jnp.float32),
        jnp.asarray(rois_p), jnp.asarray(obn_p), jnp.asarray(valid),
        jnp.asarray(orig_p), jnp.float32(cfg.TEST.NMS),
        jnp.float32(cfg.TEST.SCORE_THRESH), out_hw=out_cap,
        max_keep=min(limit, rcap), limit=limit)
    return (idx, vals, keep), orig_p, b


def im_detect_fused_batch_dispatch(spec, params, ims, boxes_list,
                                   obn_list, raw_cap=None, out_cap=None):
    """Host-prep the chunk and ENQUEUE its device program without
    blocking (JAX async dispatch): the returned handle resolves in
    im_detect_fused_batch_harvest. Lets the eval loop overlap the next
    chunk's host prep + input transfer with this chunk's device compute
    (double-buffering; the reference's loader-thread analogue for the
    eval direction)."""
    if _device_prep_enabled():
        return _im_detect_fused_batch_raw_dispatch(
            spec, params, ims, boxes_list, obn_list, raw_cap, out_cap)
    return _im_detect_fused_batch_host_dispatch(spec, params, ims,
                                                boxes_list, obn_list)


def im_detect_fused_batch_harvest(handle):
    """Block on a dispatched chunk's device outputs and assemble the
    per-image cls_boxes lists."""
    (idx, vals, keep), orig_p, b = handle
    idx, vals, keep = np.asarray(idx), np.asarray(vals), np.asarray(keep)
    return [_assemble_cls_boxes(orig_p[i], idx[i], vals[i], keep[i])
            for i in range(b)]


def im_detect_fused_batch(spec, params, ims, boxes_list, obn_list,
                          raw_cap=None, out_cap=None):
    """Chunk-of-B fused detection: per-image host prep, the chunk padded
    to one image bucket and one roi cap, then ONE scan-of-B device call.
    Amortizes the per-call dispatch round-trip Bx (TPU.INFER_BATCH).
    Returns a list of per-image cls_boxes."""
    return im_detect_fused_batch_harvest(im_detect_fused_batch_dispatch(
        spec, params, ims, boxes_list, obn_list, raw_cap, out_cap))


def _im_detect_fused_batch_host_dispatch(spec, params, ims, boxes_list,
                                         obn_list):
    preps = [_fused_host_prep(im, b, o)
             for im, b, o in zip(ims, boxes_list, obn_list)]
    bucket = cfg.TPU.SIZE_BUCKET_MULTIPLE
    hmax = max(p[0].shape[0] for p in preps)
    wmax = max(p[0].shape[1] for p in preps)
    if bucket > 1:
        hmax = int(np.ceil(hmax / bucket) * bucket)
        wmax = int(np.ceil(wmax / bucket) * bucket)
    mult = max(int(cfg.TPU.ROI_PAD_MULTIPLE), 1)
    rmax = max(p[1].shape[0] for p in preps)
    rcap = max(mult, int(np.ceil(rmax / mult) * mult))

    b = len(preps)
    ims_p = np.zeros((b, hmax, wmax, 3), np.float32)
    rois_p = np.zeros((b, rcap, 5), np.float32)
    obn_p = np.zeros((b, rcap, 1), np.float32)
    valid = np.zeros((b, rcap), bool)
    orig_p = np.zeros((b, rcap, 4), np.float32)
    im_hws = np.zeros((b, 2), np.float32)
    for i, (blob, rois5, obn, boxes_u) in enumerate(preps):
        ims_p[i, :blob.shape[0], :blob.shape[1]] = blob
        im_hws[i] = blob.shape[:2]
        n = rois5.shape[0]
        rois_p[i, :n] = rois5
        obn_p[i, :n] = obn
        valid[i, :n] = True
        orig_p[i, :n] = boxes_u

    limit = int(cfg.TEST.DETECTIONS_PER_IM)
    n_mesh = _infer_mesh_size(b)
    scan_fn = (_fused_detect_scan if n_mesh == 1 else
               partial(_fused_detect_scan_mesh, n_dev=n_mesh))
    idx, vals, keep = scan_fn(
        spec, params, jnp.asarray(ims_p), jnp.asarray(rois_p),
        jnp.asarray(obn_p), jnp.asarray(valid), jnp.asarray(orig_p),
        jnp.float32(cfg.TEST.NMS), jnp.float32(cfg.TEST.SCORE_THRESH),
        max_keep=min(limit, rcap), limit=limit,
        im_hws=jnp.asarray(im_hws))
    return (idx, vals, keep), orig_p, b


def _can_fuse_detect(spec):
    return (not cfg.TEST.BBOX_AUG.ENABLED and not cfg.TEST.SOFT_NMS.ENABLED
            and not cfg.TEST.BBOX_VOTE.ENABLED
            and int(cfg.TEST.DETECTIONS_PER_IM) > 0
            # supervised heads decode bbox_pred deltas on host (TEST.
            # BBOX_REG defaults True but WSL specs emit no bbox_pred)
            and not getattr(spec, 'supervised', False)
            and not os.environ.get('NAFWEBSOD_HOST_NMS')
            and not os.environ.get('NAFWEBSOD_NO_FUSED_DETECT')
            and not getattr(spec, 'faster_rcnn', False))


def im_detect_retinanet(spec, params, im, timers=None):
    """RetinaNet per-image inference (ref core/test_retinanet.py:67-231):
    per level threshold + top-k candidate anchors, decode (supervised) or
    bare cell anchors (WSL, whose box preds the reference zeroes,
    test_retinanet.py:96-99), then class-wise NMS + DETECTIONS_PER_IM."""
    from nafwebsod_tpu.models.retinanet import cell_anchors

    if timers is None:
        timers = defaultdict(Timer)
    timers['im_detect_bbox'].tic()
    num_classes = cfg.MODEL.NUM_CLASSES
    im_blob, im_scale = prep_im_for_blob(
        im, cfg.PIXEL_MEANS, cfg.TEST.SCALE, cfg.TEST.MAX_SIZE,
        cfg.PIXEL_STDS)
    im_in = pad_image_to_bucket(im_blob, cfg.TPU.SIZE_BUCKET_MULTIPLE)
    out = detector.forward_test(spec, params, jnp.asarray(im_in[None]),
                                None, None, None)
    cls_probs = {l: np.asarray(v) for l, v in out['retnet_cls_prob'].items()}
    bbox_preds = {l: np.asarray(v)
                  for l, v in out.get('retnet_bbox_pred', {}).items()}

    k_min, k_max = spec.fpn_rpn_min_level, spec.fpn_rpn_max_level
    a = (spec.retinanet_scales_per_octave *
         len(spec.retinanet_aspect_ratios)) if spec.retinanet else 1
    c = num_classes - 1
    boxes_all = {cls: [] for cls in range(1, num_classes)}
    for lvl in range(k_min, k_max + 1):
        stride = 2.0 ** lvl
        prob = cls_probs[lvl][0]                       # (h, w, A*(C-1))
        h, w = prob.shape[:2]
        prob = prob.reshape(h, w, a, c)
        th = spec.retinanet_inference_th if lvl < k_max else 0.0
        cand = np.where(prob.ravel() > th)[0]
        if len(cand) == 0:
            continue
        top = min(spec.retinanet_pre_nms_top_n, len(cand))
        inds = cand[np.argpartition(prob.ravel()[cand], -top)[-top:]]
        y, x, aid, cls_i = np.unravel_index(inds, prob.shape)
        scores = prob[y, x, aid, cls_i]

        if spec.retinanet:
            cell = cell_anchors(lvl, spec.retinanet_anchor_scale,
                                spec.retinanet_scales_per_octave,
                                spec.retinanet_aspect_ratios)
        else:
            cell = cell_anchors(lvl, spec.retinanet_anchor_scale, 1, (1.0,))
        boxes = np.column_stack((x, y, x, y)).astype(np.float32) * stride
        boxes += cell[aid if spec.retinanet else np.zeros_like(aid)]

        if spec.retinanet and cfg.TEST.BBOX_REG and lvl in bbox_preds:
            bp = bbox_preds[lvl][0]                    # (h, w, 4A[*C-1])
            if spec.retinanet_class_specific_bbox:
                bp = bp.reshape(h, w, a, c, 4)
                deltas = bp[y, x, aid, cls_i]
            else:
                bp = bp.reshape(h, w, a, 4)
                deltas = bp[y, x, aid]
            pred = box_utils.bbox_transform(boxes, deltas)
        else:
            pred = boxes
        pred = pred / im_scale
        pred = box_utils.clip_tiled_boxes(pred, im.shape)
        dets = np.hstack([pred, scores[:, None]]).astype(np.float32)
        for cls in range(1, num_classes):
            sel = np.where(cls_i == cls - 1)[0]
            if len(sel):
                boxes_all[cls].append(dets[sel])
    timers['im_detect_bbox'].toc()

    timers['misc_bbox'].tic()
    cls_boxes = [[] for _ in range(num_classes)]
    for cls in range(1, num_classes):
        if not boxes_all[cls]:
            cls_boxes[cls] = np.zeros((0, 5), np.float32)
            continue
        dets = np.vstack(boxes_all[cls])
        if cfg.TEST.SOFT_NMS.ENABLED:
            dets, _ = box_utils.soft_nms(
                dets, sigma=cfg.TEST.SOFT_NMS.SIGMA,
                overlap_thresh=cfg.TEST.NMS, score_thresh=0.0001,
                method=cfg.TEST.SOFT_NMS.METHOD)
        else:
            keep = box_utils.nms(dets, cfg.TEST.NMS)
            dets = dets[keep, :]
        cls_boxes[cls] = dets
    if cfg.TEST.DETECTIONS_PER_IM > 0:
        image_scores = np.hstack(
            [cls_boxes[j][:, -1] for j in range(1, num_classes)])
        if len(image_scores) > cfg.TEST.DETECTIONS_PER_IM:
            image_thresh = np.sort(image_scores)[-cfg.TEST.DETECTIONS_PER_IM]
            for j in range(1, num_classes):
                keep = np.where(cls_boxes[j][:, -1] >= image_thresh)[0]
                cls_boxes[j] = cls_boxes[j][keep, :]
    timers['misc_bbox'].toc()
    return cls_boxes, None, None


def im_detect_all(spec, params, im, box_proposals, obn_scores, timers=None,
                  kp_flip_map=None):
    """Full per-image detection pipeline (ref :29-89). ``kp_flip_map`` is
    the dataset's left/right keypoint-twin index array, used by the
    KPS_AUG hflip sweep."""
    if timers is None:
        timers = defaultdict(Timer)
    if spec.retinanet or spec.retinanet_wsl:
        return im_detect_retinanet(spec, params, im, timers)
    if box_proposals is not None and _can_fuse_detect(spec):
        # plain protocol: forward + device NMS in ONE program
        timers['im_detect_bbox'].tic()
        cls_boxes = im_detect_fused(spec, params, im, box_proposals,
                                    obn_scores)
        timers['im_detect_bbox'].toc()
        cls_segms = None
        if getattr(spec, 'mask_on', False):
            timers['im_detect_mask'].tic()
            cls_segms = im_detect_mask(spec, params, im, cls_boxes)
            timers['im_detect_mask'].toc()
        cls_keyps = None
        if getattr(spec, 'keypoints_on', False):
            timers['im_detect_keypoints'].tic()
            cls_keyps = im_detect_keypoints(spec, params, im, cls_boxes,
                                            kp_flip_map)
            timers['im_detect_keypoints'].toc()
        return cls_boxes, cls_segms, cls_keyps
    timers['im_detect_bbox'].tic()
    if cfg.TEST.BBOX_AUG.ENABLED:
        scores, boxes, im_scale = im_detect_bbox_aug(
            spec, params, im, box_proposals, obn_scores)
    else:
        scores, boxes, im_scale = im_detect_bbox(
            spec, params, im, cfg.TEST.SCALE, cfg.TEST.MAX_SIZE,
            boxes=box_proposals, obn_scores=obn_scores)
    timers['im_detect_bbox'].toc()

    timers['misc_bbox'].tic()
    scores, boxes, cls_boxes = box_results_with_nms_and_limit(scores, boxes)
    timers['misc_bbox'].toc()

    cls_segms = None
    if getattr(spec, 'mask_on', False):
        timers['im_detect_mask'].tic()
        cls_segms = im_detect_mask(spec, params, im, cls_boxes)
        timers['im_detect_mask'].toc()

    cls_keyps = None
    if getattr(spec, 'keypoints_on', False):
        timers['im_detect_keypoints'].tic()
        cls_keyps = im_detect_keypoints(spec, params, im, cls_boxes,
                                        kp_flip_map)
        timers['im_detect_keypoints'].toc()
    return cls_boxes, cls_segms, cls_keyps


def _final_boxes(cls_boxes):
    """Flatten per-class NMS survivors back to (R, 4) + per-class counts."""
    num_classes = cfg.MODEL.NUM_CLASSES
    per_cls = [np.asarray(cls_boxes[j]).reshape(-1, 5)
               for j in range(1, num_classes)]
    boxes = (np.vstack([d[:, :4] for d in per_cls])
             if per_cls else np.zeros((0, 4), np.float32))
    return boxes, [len(d) for d in per_cls]


def segm_results_deeplab(cls_boxes, masks, ref_boxes, im_h, im_w):
    """Deeplab image-level masks -> per-detection RLEs
    (test_wsl.py:segm_results_deeplab:866-916): the SOFT class grid is
    resized to the image, binarized at MRCNN.THRESH_BINARIZE, and each
    detection keeps only the pixels inside its box. ``masks`` is the
    (1, h, w, C) bg/fg grid from forward_deeplab_masks — channel j is fg
    class j (channel 0 = bg), the reference's masks[0, j] indexing."""
    import cv2

    from nafwebsod_tpu.utils.segms import mask_to_rle

    num_classes = cfg.MODEL.NUM_CLASSES
    cls_segms = [[] for _ in range(num_classes)]
    mask_ind = 0
    for j in range(1, num_classes):
        cls_ch = j if cfg.MRCNN.CLS_SPECIFIC_MASK else 0
        soft = cv2.resize(np.ascontiguousarray(masks[0, :, :, cls_ch]),
                          (im_w, im_h))
        binarized = (soft > cfg.MRCNN.THRESH_BINARIZE).astype(np.uint8)
        segms = []
        for _ in range(len(np.asarray(cls_boxes[j]).reshape(-1, 5))):
            box = ref_boxes[mask_ind]
            im_mask = np.zeros((im_h, im_w), np.uint8)
            x0, x1 = int(max(box[0], 0)), int(min(box[2] + 1, im_w))
            y0, y1 = int(max(box[1], 0)), int(min(box[3] + 1, im_h))
            if x1 > x0 and y1 > y0:
                im_mask[y0:y1, x0:x1] = binarized[y0:y1, x0:x1]
            segms.append(mask_to_rle(im_mask))
            mask_ind += 1
        cls_segms[j] = segms
    return cls_segms


def segm_results(cls_boxes, masks, ref_boxes, im_h, im_w):
    """Paste per-RoI soft masks into the image and RLE-encode
    (test_wsl.py:segm_results — padded-by-1 resize to kill border
    artifacts, THRESH_BINARIZE, COCO-compressed RLE from utils/segms).
    Dispatches to ``segm_results_deeplab`` for the image-level deeplab
    grid (test_wsl.py:920-921's 'deeplab' in ROI_MASK_HEAD gate)."""
    import cv2

    from nafwebsod_tpu.utils.segms import mask_to_rle

    if 'deeplab' in cfg.MRCNN.ROI_MASK_HEAD:
        return segm_results_deeplab(cls_boxes, masks, ref_boxes, im_h, im_w)
    num_classes = cfg.MODEL.NUM_CLASSES
    cls_segms = [[] for _ in range(num_classes)]
    mask_ind = 0
    m = masks.shape[1]
    scale = (m + 2.0) / m
    ref_boxes = box_utils.expand_boxes(ref_boxes, scale).astype(np.int32)
    padded = np.zeros((m + 2, m + 2), np.float32)
    for j in range(1, num_classes):
        segms = []
        for _ in range(len(np.asarray(cls_boxes[j]).reshape(-1, 5))):
            cls_ch = j if cfg.MRCNN.CLS_SPECIFIC_MASK else 0
            padded[1:-1, 1:-1] = masks[mask_ind, :, :, cls_ch]
            box = ref_boxes[mask_ind]
            w = max(box[2] - box[0] + 1, 1)
            h = max(box[3] - box[1] + 1, 1)
            mask = cv2.resize(padded, (w, h))
            mask = (mask > cfg.MRCNN.THRESH_BINARIZE).astype(np.uint8)
            im_mask = np.zeros((im_h, im_w), np.uint8)
            x0, x1 = max(box[0], 0), min(box[2] + 1, im_w)
            y0, y1 = max(box[1], 0), min(box[3] + 1, im_h)
            if x1 > x0 and y1 > y0:
                im_mask[y0:y1, x0:x1] = mask[(y0 - box[1]):(y1 - box[1]),
                                             (x0 - box[0]):(x1 - box[0])]
            segms.append(mask_to_rle(im_mask))
            mask_ind += 1
        cls_segms[j] = segms
    return cls_segms


def _mask_forward(spec, params, im, boxes, target_scale, target_max_size):
    """Soft masks (R, M, M, C) for the given original-image boxes at one
    image scale (ref test.py:im_detect_mask:373-413, NHWC here).

    The deeplab head is image-level, not per-RoI: ONE (1, h, w, C) bg/fg
    grid per image (test_wsl.py:im_detect_mask_deeplab:366-405), cropped
    to the true image extent so a padded canvas never leaks into the
    per-detection resize (the reference feeds unpadded blobs)."""
    im_blob, im_scale = prep_im_for_blob(
        im, cfg.PIXEL_MEANS, target_scale, target_max_size, cfg.PIXEL_STDS)
    im_in = pad_image_to_bucket(im_blob, cfg.TPU.SIZE_BUCKET_MULTIPLE)
    if spec.mask_head == 'deeplab':
        grid = np.asarray(detector.forward_deeplab_masks(
            spec, params, jnp.asarray(im_in[None])))
        s = detector.body_spatial_scale(spec)
        gh = max(int(np.ceil(im_blob.shape[0] * s)), 1)
        gw = max(int(np.ceil(im_blob.shape[1] * s)), 1)
        return grid[:, :gh, :gw, :]
    rois5 = np.hstack([np.zeros((len(boxes), 1), np.float32),
                       boxes * im_scale]).astype(np.float32)
    rois_p, _, valid = _pad_rois(rois5, np.ones((len(boxes), 1)),
                                 cfg.TPU.ROI_PAD_MULTIPLE)
    return np.asarray(detector.forward_masks(
        spec, params, jnp.asarray(im_in[None]),
        jnp.asarray(rois_p)))[:len(boxes)]


def im_detect_mask_hflip(spec, params, im, target_scale, target_max_size,
                         boxes):
    """Masks on the horizontally flipped image, inverted back
    (ref test.py:489-504; width is axis 2 in our NHWC masks)."""
    im_hf = im[:, ::-1, :]
    boxes_hf = box_utils.flip_boxes(boxes, im.shape[1])
    masks_hf = _mask_forward(spec, params, im_hf, boxes_hf,
                             target_scale, target_max_size)
    return masks_hf[:, :, ::-1, :]


def im_detect_mask_scale(spec, params, im, target_scale, target_max_size,
                         boxes, hflip=False):
    """Masks at the given scale (ref test.py:506-517)."""
    if hflip:
        return im_detect_mask_hflip(
            spec, params, im, target_scale, target_max_size, boxes)
    return _mask_forward(spec, params, im, boxes,
                         target_scale, target_max_size)


def im_detect_mask_aspect_ratio(spec, params, im, aspect_ratio, boxes,
                                hflip=False):
    """Masks at a width-relative aspect ratio (ref test.py:520-537).
    Masks are box-relative, so no inverse coordinate transform is needed."""
    import cv2
    im_ar = cv2.resize(im, None, fx=aspect_ratio, fy=1.0)
    boxes_ar = box_utils.aspect_ratio(boxes, aspect_ratio)
    if hflip:
        return im_detect_mask_hflip(
            spec, params, im_ar, cfg.TEST.SCALE, cfg.TEST.MAX_SIZE, boxes_ar)
    return _mask_forward(spec, params, im_ar, boxes_ar,
                         cfg.TEST.SCALE, cfg.TEST.MAX_SIZE)


def im_detect_mask_aug(spec, params, im, boxes):
    """Mask detection with test-time augmentations (ref test.py:416-486):
    identity first, then hflip / scales(+flip) / aspect ratios(+flip);
    soft masks combined by TEST.MASK_AUG.HEUR."""
    assert not cfg.TEST.MASK_AUG.SCALE_SIZE_DEP, \
        'Size dependent scaling not implemented'
    masks_ts = [_mask_forward(spec, params, im, boxes,
                              cfg.TEST.SCALE, cfg.TEST.MAX_SIZE)]

    if cfg.TEST.MASK_AUG.H_FLIP:
        masks_ts.append(im_detect_mask_hflip(
            spec, params, im, cfg.TEST.SCALE, cfg.TEST.MAX_SIZE, boxes))

    for scale in cfg.TEST.MASK_AUG.SCALES:
        max_size = cfg.TEST.MASK_AUG.MAX_SIZE
        masks_ts.append(im_detect_mask_scale(
            spec, params, im, scale, max_size, boxes))
        if cfg.TEST.MASK_AUG.SCALE_H_FLIP:
            masks_ts.append(im_detect_mask_scale(
                spec, params, im, scale, max_size, boxes, hflip=True))

    for aspect_ratio in cfg.TEST.MASK_AUG.ASPECT_RATIOS:
        masks_ts.append(im_detect_mask_aspect_ratio(
            spec, params, im, aspect_ratio, boxes))
        if cfg.TEST.MASK_AUG.ASPECT_RATIO_H_FLIP:
            masks_ts.append(im_detect_mask_aspect_ratio(
                spec, params, im, aspect_ratio, boxes, hflip=True))

    if spec.mask_head == 'deeplab':
        # image-level grids: scale/aspect transforms change the grid
        # extent — resize every grid (per class channel) to the identity
        # transform's before combining (test_wsl.py:509-521)
        import cv2
        h0, w0 = masks_ts[0].shape[1:3]
        masks_ts = [
            m if m.shape[1:3] == (h0, w0) else
            np.stack([cv2.resize(m[0, :, :, c], (w0, h0))
                      for c in range(m.shape[-1])], axis=-1)[None]
            for m in masks_ts]

    heur = cfg.TEST.MASK_AUG.HEUR
    if heur == 'SOFT_AVG':
        return np.mean(masks_ts, axis=0)
    if heur == 'SOFT_MAX':
        return np.amax(masks_ts, axis=0)
    if heur == 'LOGIT_AVG':
        def logit(y):
            return -1.0 * np.log((1.0 - y) / np.maximum(y, 1e-20))
        logit_masks = np.mean([logit(y) for y in masks_ts], axis=0)
        return 1.0 / (1.0 + np.exp(-logit_masks))
    raise NotImplementedError('Heuristic {} not supported'.format(heur))


def im_detect_mask(spec, params, im, cls_boxes):
    """Run the mask head on the final detections; returns cls_segms (RLE
    per detection, per class)."""
    boxes, _ = _final_boxes(cls_boxes)
    if len(boxes) == 0:
        return [[] for _ in range(cfg.MODEL.NUM_CLASSES)]
    if cfg.TEST.MASK_AUG.ENABLED:
        masks = im_detect_mask_aug(spec, params, im, boxes)
    else:
        masks = _mask_forward(spec, params, im, boxes,
                              cfg.TEST.SCALE, cfg.TEST.MAX_SIZE)
    return segm_results(cls_boxes, masks, boxes, im.shape[0], im.shape[1])


def heatmaps_to_keypoints(maps, rois):
    """Extract (x, y, logit, prob) per keypoint from per-RoI heatmaps,
    matching ``utils/keypoints.py:heatmaps_to_keypoints:103-160``: each
    heatmap is cubic-resized to the roi extent — floored at
    ``KRCNN.INFERENCE_MIN_SIZE`` when set — the per-keypoint argmax cell is
    mapped back to image coordinates through the width/height correction
    factors (roi extent / resized-map extent; the Heckbert +0.5 center
    convention), and the probability is the spatial softmax at that cell.
    maps: (R, Hh, Wh, K) NHWC; rois: (R, 4) original-image coords.
    Returns (R, 4, K)."""
    import cv2
    r, hh, wh, k = maps.shape
    min_size = cfg.KRCNN.INFERENCE_MIN_SIZE
    out = np.zeros((r, 4, k), np.float32)
    for i in range(r):
        x1, y1, x2, y2 = rois[i]
        roi_w = np.maximum(x2 - x1, 1)
        roi_h = np.maximum(y2 - y1, 1)
        w = int(np.ceil(roi_w))
        h = int(np.ceil(roi_h))
        if min_size > 0:
            w = max(w, int(min_size))
            h = max(h, int(min_size))
        # corrections map resized-map cells back to true roi extent
        # (identity unless the min-size floor engaged / ceil rounded)
        corr_x = roi_w / w
        corr_y = roi_h / h
        m = cv2.resize(maps[i], (w, h), interpolation=cv2.INTER_CUBIC)
        m = m.reshape(h * w, k) if m.ndim == 3 else m.reshape(h * w, 1)
        pos = np.argmax(m, axis=0)
        ys, xs = pos // w, pos % w
        logits = m[pos, np.arange(k)]
        # spatial softmax per keypoint channel (keypoints.py:scores_to_probs)
        stable = m - m.max(axis=0, keepdims=True)
        probs = np.exp(stable[pos, np.arange(k)]) / np.sum(np.exp(stable),
                                                           axis=0)
        out[i, 0] = x1 + (xs + 0.5) * corr_x
        out[i, 1] = y1 + (ys + 0.5) * corr_y
        out[i, 2] = logits
        out[i, 3] = probs
    return out


def _keypoint_forward(spec, params, im, boxes, target_scale,
                      target_max_size):
    """Keypoint heatmap logits (R, Hh, Wh, K) for the given original-image
    boxes at one image scale (ref test.py:im_detect_keypoints:540-578)."""
    im_blob, im_scale = prep_im_for_blob(
        im, cfg.PIXEL_MEANS, target_scale, target_max_size, cfg.PIXEL_STDS)
    im_in = pad_image_to_bucket(im_blob, cfg.TPU.SIZE_BUCKET_MULTIPLE)
    rois5 = np.hstack([np.zeros((len(boxes), 1), np.float32),
                       boxes * im_scale]).astype(np.float32)
    rois_p, _, valid = _pad_rois(rois5, np.ones((len(boxes), 1)),
                                 cfg.TPU.ROI_PAD_MULTIPLE)
    return np.asarray(detector.forward_keypoints(
        spec, params, jnp.asarray(im_in[None]),
        jnp.asarray(rois_p)))[:len(boxes)]


def flip_heatmaps(heatmaps, kp_flip_map=None):
    """Invert heatmaps predicted on a horizontally flipped image: mirror
    the width axis and swap left/right keypoint channels
    (utils/keypoints.py:flip_heatmaps; ours are NHWC with K last)."""
    hm = heatmaps[:, :, ::-1, :]
    if kp_flip_map is not None:
        hm = hm[..., np.asarray(kp_flip_map)]
    return hm


def im_detect_keypoints_hflip(spec, params, im, target_scale,
                              target_max_size, boxes, kp_flip_map=None):
    """Keypoints on the horizontally flipped image, inverted back
    (ref test.py:668-682)."""
    im_hf = im[:, ::-1, :]
    boxes_hf = box_utils.flip_boxes(boxes, im.shape[1])
    heatmaps_hf = _keypoint_forward(spec, params, im_hf, boxes_hf,
                                    target_scale, target_max_size)
    return flip_heatmaps(heatmaps_hf, kp_flip_map)


def im_detect_keypoints_scale(spec, params, im, target_scale,
                              target_max_size, boxes, hflip=False,
                              kp_flip_map=None):
    """Keypoints at the given scale (ref test.py:685-696)."""
    if hflip:
        return im_detect_keypoints_hflip(
            spec, params, im, target_scale, target_max_size, boxes,
            kp_flip_map)
    return _keypoint_forward(spec, params, im, boxes,
                             target_scale, target_max_size)


def im_detect_keypoints_aspect_ratio(spec, params, im, aspect_ratio, boxes,
                                     hflip=False, kp_flip_map=None):
    """Keypoints at a width-relative aspect ratio (ref test.py:699-718).
    Heatmaps are box-relative, so no inverse transform is needed."""
    import cv2
    im_ar = cv2.resize(im, None, fx=aspect_ratio, fy=1.0)
    boxes_ar = box_utils.aspect_ratio(boxes, aspect_ratio)
    if hflip:
        return im_detect_keypoints_hflip(
            spec, params, im_ar, cfg.TEST.SCALE, cfg.TEST.MAX_SIZE,
            boxes_ar, kp_flip_map)
    return _keypoint_forward(spec, params, im_ar, boxes_ar,
                             cfg.TEST.SCALE, cfg.TEST.MAX_SIZE)


def combine_heatmaps_size_dep(hms_ts, ds_ts, us_ts, boxes, heur_f):
    """Size-dependent heatmap combination (ref test.py:721-746): small
    objects ignore downscaled predictions, large objects ignore upscaled
    ones."""
    assert len(hms_ts) == len(ds_ts) == len(us_ts)
    areas = box_utils.boxes_area(boxes)
    sm_objs = areas < cfg.TEST.KPS_AUG.AREA_TH
    l_objs = areas >= cfg.TEST.KPS_AUG.AREA_TH
    hms_c = np.zeros_like(hms_ts[0])
    for i in range(hms_c.shape[0]):
        hms_to_combine = [
            hms_t[i] for hms_t, ds_t, us_t in zip(hms_ts, ds_ts, us_ts)
            if not (sm_objs[i] and ds_t) and not (l_objs[i] and us_t)]
        hms_c[i] = heur_f(hms_to_combine)
    return hms_c


def im_detect_keypoints_aug(spec, params, im, boxes, kp_flip_map=None):
    """Keypoint detection with test-time augmentations (ref
    test.py:581-665): identity, hflip, scales(+flip, tagged up/down),
    aspect ratios(+flip); logit heatmaps combined by TEST.KPS_AUG.HEUR,
    optionally size-dependently."""
    heatmaps_ts, ds_ts, us_ts = [], [], []

    def add_heatmaps_t(heatmaps_t, ds_t=False, us_t=False):
        heatmaps_ts.append(heatmaps_t)
        ds_ts.append(ds_t)
        us_ts.append(us_t)

    add_heatmaps_t(_keypoint_forward(
        spec, params, im, boxes, cfg.TEST.SCALE, cfg.TEST.MAX_SIZE))

    if cfg.TEST.KPS_AUG.H_FLIP:
        add_heatmaps_t(im_detect_keypoints_hflip(
            spec, params, im, cfg.TEST.SCALE, cfg.TEST.MAX_SIZE, boxes,
            kp_flip_map))

    for scale in cfg.TEST.KPS_AUG.SCALES:
        ds_scl = scale < cfg.TEST.SCALE
        us_scl = scale > cfg.TEST.SCALE
        add_heatmaps_t(im_detect_keypoints_scale(
            spec, params, im, scale, cfg.TEST.KPS_AUG.MAX_SIZE, boxes),
            ds_scl, us_scl)
        if cfg.TEST.KPS_AUG.SCALE_H_FLIP:
            add_heatmaps_t(im_detect_keypoints_scale(
                spec, params, im, scale, cfg.TEST.KPS_AUG.MAX_SIZE, boxes,
                hflip=True, kp_flip_map=kp_flip_map), ds_scl, us_scl)

    for aspect_ratio in cfg.TEST.KPS_AUG.ASPECT_RATIOS:
        add_heatmaps_t(im_detect_keypoints_aspect_ratio(
            spec, params, im, aspect_ratio, boxes))
        if cfg.TEST.KPS_AUG.ASPECT_RATIO_H_FLIP:
            add_heatmaps_t(im_detect_keypoints_aspect_ratio(
                spec, params, im, aspect_ratio, boxes, hflip=True,
                kp_flip_map=kp_flip_map))

    heur = cfg.TEST.KPS_AUG.HEUR
    if heur == 'HM_AVG':
        np_f = np.mean
    elif heur == 'HM_MAX':
        np_f = np.amax
    else:
        raise NotImplementedError(
            'Heuristic {} not supported'.format(heur))

    def heur_f(hms_ts):
        return np_f(hms_ts, axis=0)

    if cfg.TEST.KPS_AUG.SCALE_SIZE_DEP:
        return combine_heatmaps_size_dep(
            heatmaps_ts, ds_ts, us_ts, boxes, heur_f)
    return heur_f(heatmaps_ts)


def im_detect_keypoints(spec, params, im, cls_boxes, kp_flip_map=None):
    """Run the keypoint head on the final detections of the person class
    (class 1, upstream convention). Returns cls_keyps: per-class list of
    (R, 4, K) arrays."""
    num_classes = cfg.MODEL.NUM_CLASSES
    cls_keyps = [[] for _ in range(num_classes)]
    dets = cls_boxes[1]
    if len(dets) == 0:
        cls_keyps[1] = np.zeros((0, 4, spec.num_keypoints), np.float32)
        return cls_keyps
    boxes = np.asarray(dets)[:, :4]
    if cfg.TEST.KPS_AUG.ENABLED:
        maps = im_detect_keypoints_aug(spec, params, im, boxes, kp_flip_map)
    else:
        maps = _keypoint_forward(spec, params, im, boxes,
                                 cfg.TEST.SCALE, cfg.TEST.MAX_SIZE)
    cls_keyps[1] = heatmaps_to_keypoints(maps, boxes)
    return cls_keyps
