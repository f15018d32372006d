"""Per-image minibatch construction (host side, numpy/cv2).

Capability parity with ``detectron/roi_data/minibatch_wsl.py`` and
``detectron/roi_data/wsl.py``:

  * image blob: cv2 imread (BGR), horizontal flip, HSV saturation/exposure
    distortion (WSL.USE_DISTORTION/SATURATION/EXPOSURE, ref
    minibatch_wsl.py:130-140), random crop to WSL.CROP of each side
    (ref :142-158), scale-jitter resize (random TRAIN.SCALES choice) with
    MAX_SIZE cap and BGR pixel-mean subtraction (blob.py:100-131).
  * rois: top TRAIN.BATCH_SIZE_PER_IM proposals by objectness,
    ``obn_scores + 1.0`` boost (ref wsl.py:99-103), crop+scale projection,
    one-hot image labels (ref wsl.py:144-157).

TPU additions: rois are padded to a fixed capacity with a validity mask, and
image sizes are optionally snapped up to a bucket multiple so XLA compiles a
bounded set of programs. The crop/scale roi projection clips x against the
image's x-extent and y against y (the reference's _project_im_rois at
roi_data/wsl.py:212-225 transposes the crop offsets; we implement the
geometrically correct projection).
"""

import cv2
import numpy as np

from nafwebsod_tpu.core.config import cfg


def get_minibatch_blob_names(is_training=True):
    """Blob names in the order produced (ref minibatch_wsl.py:25-50)."""
    return ['data', 'rois', 'obn_scores', 'labels_int32', 'labels_oh',
            'valid_mask', 'data_ids']


def prep_im_for_blob(im, pixel_means, target_size, max_size,
                     pixel_stds=None):
    """Mean-subtract and resize so the short side == target_size with the
    long side capped at max_size (ref blob.py:100-131)."""
    im = im.astype(np.float32, copy=False)
    im -= pixel_means
    if pixel_stds is not None:
        im /= pixel_stds
    im_shape = im.shape
    im_size_min = np.min(im_shape[0:2])
    im_size_max = np.max(im_shape[0:2])
    im_scale = float(target_size) / float(im_size_min)
    if np.round(im_scale * im_size_max) > max_size:
        im_scale = float(max_size) / float(im_size_max)
    im = cv2.resize(im, None, None, fx=im_scale, fy=im_scale,
                    interpolation=cv2.INTER_LINEAR)
    return im, im_scale


def distort_image_hsv(im, saturation, exposure, rng):
    """HSV saturation/exposure jitter (ref minibatch_wsl.py:130-140)."""
    hsv = cv2.cvtColor(im, cv2.COLOR_BGR2HSV)
    s0 = rng.random_sample() * (saturation - 1) + 1
    s1 = rng.random_sample() * (exposure - 1) + 1
    s0 = s0 if rng.random_sample() > 0.5 else 1.0 / s0
    s1 = s1 if rng.random_sample() > 0.5 else 1.0 / s1
    hsv = hsv.astype(np.float32)
    hsv[:, :, 1] = np.minimum(s0 * hsv[:, :, 1], 255)
    hsv[:, :, 2] = np.minimum(s1 * hsv[:, :, 2], 255)
    return cv2.cvtColor(hsv.astype(np.uint8), cv2.COLOR_HSV2BGR)


def random_crop(im, crop_frac, rng):
    """Random crop to crop_frac of each side; returns (im, crop_box) with
    crop_box = [y0, x0, y1, x1] inclusive (ref minibatch_wsl.py:142-158)."""
    im_shape = np.array(im.shape)
    crop_dims = im_shape[:2] * crop_frac
    r0 = rng.random_sample()
    r1 = rng.random_sample()
    s = im_shape[:2] - crop_dims
    s[0] *= r0
    s[1] *= r1
    crop_box = np.array(
        [s[0], s[1], s[0] + crop_dims[0] - 1, s[1] + crop_dims[1] - 1],
        dtype=np.int32)
    im = im[crop_box[0]:crop_box[2] + 1, crop_box[1]:crop_box[3] + 1, :]
    return im, crop_box


def project_im_rois(im_rois, im_scale, im_crop):
    """Clip rois to the crop window, shift to crop coords, and scale.
    im_crop is [y0, x0, y1, x1]."""
    rois = im_rois.astype(np.float32, copy=True)
    y0, x0, y1, x1 = [float(v) for v in im_crop]
    rois[:, 0] = np.clip(rois[:, 0], x0, x1)
    rois[:, 2] = np.clip(rois[:, 2], x0, x1)
    rois[:, 1] = np.clip(rois[:, 1], y0, y1)
    rois[:, 3] = np.clip(rois[:, 3], y0, y1)
    rois -= np.array([x0, y0, x0, y0], dtype=np.float32)
    return rois * im_scale


def get_image_blob(entry, target_size, rng=None, train=True):
    """Load + augment one image. Returns (im_nhwc float32, im_scale, im_crop)."""
    im = cv2.imread(entry['image'])
    assert im is not None, 'Failed to read image {}'.format(entry['image'])
    if entry.get('flipped', False):
        im = im[:, ::-1, :]
    if train and cfg.WSL.USE_DISTORTION:
        rng = rng or np.random
        im = distort_image_hsv(im, cfg.WSL.SATURATION, cfg.WSL.EXPOSURE, rng)
    if train and cfg.WSL.USE_CROP:
        rng = rng or np.random
        im, im_crop = random_crop(im, cfg.WSL.CROP, rng)
    else:
        im_crop = np.array([0, 0, im.shape[0] - 1, im.shape[1] - 1],
                           dtype=np.int32)
    max_size = cfg.TRAIN.MAX_SIZE if train else cfg.TEST.MAX_SIZE
    im, im_scale = prep_im_for_blob(
        im, cfg.PIXEL_MEANS, target_size, max_size, cfg.PIXEL_STDS)
    return im, im_scale, im_crop


def sample_rois(entry, im_scale, im_crop, num_classes, batch_size_per_im,
                pad_to=None):
    """Top-k proposals + obn boost + projection + one-hot labels
    (ref wsl.py:87-181) with fixed-shape padding for XLA."""
    n = min(int(batch_size_per_im), entry['boxes'].shape[0])
    boxes = entry['boxes'][:n].copy()
    obn = entry['obn_scores'][:n].copy() + 1.0
    rois = project_im_rois(boxes, im_scale, im_crop)
    rois = np.hstack([np.zeros((rois.shape[0], 1), np.float32), rois])

    labels_oh = np.zeros((1, num_classes - 1), dtype=np.float32)
    labels_int = np.zeros((1,), dtype=np.int32)
    gt_inds = np.where(entry['gt_classes'] > 0)[0]
    assert len(gt_inds) > 0, 'image without gt labels in training roidb'
    for cls in entry['gt_classes'][gt_inds]:
        labels_oh[0, cls - 1] = 1
        labels_int[0] = cls - 1

    valid = np.ones((rois.shape[0],), dtype=bool)
    if pad_to is not None and rois.shape[0] < pad_to:
        pad = pad_to - rois.shape[0]
        rois = np.vstack([rois, np.zeros((pad, 5), np.float32)])
        obn = np.vstack([obn, np.zeros((pad, 1), np.float32)])
        valid = np.concatenate([valid, np.zeros((pad,), bool)])
    return {
        'rois': rois.astype(np.float32),
        'obn_scores': obn.astype(np.float32),
        'labels_oh': labels_oh,
        'labels_int32': labels_int,
        'valid_mask': valid,
    }


def pad_image_to_bucket(im, multiple):
    """Zero-pad H/W up to a multiple so XLA compiles few programs. Mean-
    subtracted zeros act like mean-valued border pixels; rois never cover
    the padding."""
    if multiple <= 1:
        return im
    h, w = im.shape[:2]
    ph = int(np.ceil(h / multiple) * multiple)
    pw = int(np.ceil(w / multiple) * multiple)
    if ph == h and pw == w:
        return im
    out = np.zeros((ph, pw, im.shape[2]), dtype=im.dtype)
    out[:h, :w] = im
    return out


def gt_blobs(entry, im_scale, true_h, true_w, max_gt):
    """Padded ground-truth blobs for the in-graph Faster R-CNN machinery
    (the reference feeds roidb entries to its host python ops; the TPU
    rebuild ships fixed-capacity gt arrays to the device instead)."""
    gt_inds = np.where((entry['gt_classes'] > 0) &
                       (entry.get('is_crowd',
                                  np.zeros(len(entry['gt_classes']))) == 0))[0]
    boxes = entry['boxes'][gt_inds].astype(np.float32) * im_scale
    classes = entry['gt_classes'][gt_inds].astype(np.int32)
    n = min(len(gt_inds), max_gt)
    gt_boxes = np.zeros((max_gt, 4), np.float32)
    gt_classes = np.zeros((max_gt,), np.int32)
    gt_valid = np.zeros((max_gt,), bool)
    gt_boxes[:n] = boxes[:n]
    gt_classes[:n] = classes[:n]
    gt_valid[:n] = True
    out = {
        'gt_boxes': gt_boxes,
        'gt_classes': gt_classes,
        'gt_valid': gt_valid,
        'im_info': np.array([true_h, true_w, im_scale], np.float32),
    }
    if cfg.MODEL.MASK_ON and cfg.MODEL.FASTER_RCNN:
        # fixed-grid gt mask rasterization for end-to-end Mask R-CNN: each
        # gt's polygons rasterized ONCE wrt its own box; sampled rois
        # resample on device (ops/seg.crop_and_resize_masks)
        from nafwebsod_tpu.utils.segms import polys_to_mask_wrt_box
        mg = cfg.MRCNN.RESOLUTION * 2
        masks = np.zeros((max_gt, mg, mg), np.float32)
        segs = entry.get('segms', [])
        for j, ix in enumerate(gt_inds[:n]):
            poly = segs[ix] if ix < len(segs) else []
            if poly:
                masks[j] = polys_to_mask_wrt_box(poly, entry['boxes'][ix],
                                                 mg)
            else:
                masks[j] = 1.0  # box-shaped fallback
        out['gt_masks'] = masks
    if cfg.MODEL.KEYPOINTS_ON:
        k = max(cfg.KRCNN.NUM_KEYPOINTS, 1)
        kps = np.zeros((max_gt, k, 3), np.float32)
        raw = entry.get('gt_keypoints')
        if raw is not None and len(raw):
            raw = raw[gt_inds][:n].astype(np.float32).copy()
            if entry.get('flipped', False):
                # roidb flip copies boxes only; mirror keypoint x AND swap
                # left/right identities (keypoint_utils.flip_keypoints)
                vis = raw[:, :, 2] > 0
                raw[:, :, 0] = np.where(
                    vis, entry['width'] - raw[:, :, 0] - 1, 0)
                fm = entry.get('kp_flip_map')
                if fm is not None and len(fm) == raw.shape[1]:
                    raw = raw[:, np.asarray(fm)]
            raw[:, :, :2] *= im_scale
            kps[:n, :raw.shape[1]] = raw
        out['gt_keypoints'] = kps
    return out


def get_minibatch(entry, rng=None, pad_rois_to=None, size_bucket=None,
                  target_size=None):
    """Build all blobs for one training image."""
    rng = rng or np.random
    if target_size is None:
        target_size = cfg.TRAIN.SCALES[rng.randint(0, len(cfg.TRAIN.SCALES))]
    im, im_scale, im_crop = get_image_blob(entry, target_size, rng, train=True)
    true_h, true_w = im.shape[:2]
    if size_bucket:
        im = pad_image_to_bucket(im, size_bucket)
    supervised_type = cfg.MODEL.TYPE in ('generalized_rcnn', 'rfcn')
    rpn_only = cfg.MODEL.RPN_ONLY or cfg.MODEL.TYPE == 'rpn'
    if ((supervised_type and cfg.MODEL.FASTER_RCNN) or rpn_only or
            cfg.MODEL.TYPE == 'retinanet'):
        # end-to-end paths (RPN-in-graph / RetinaNet): only image + gt
        # blobs. Dummy roi blobs keep the batch schema uniform.
        blobs = gt_blobs(entry, im_scale, true_h, true_w,
                         cfg.TPU.MAX_GT_BOXES)
        blobs['rois'] = np.zeros((1, 5), np.float32)
        blobs['obn_scores'] = np.ones((1, 1), np.float32)
        blobs['valid_mask'] = np.zeros((1,), bool)
        blobs['labels_oh'] = np.zeros((1, cfg.MODEL.NUM_CLASSES - 1),
                                      np.float32)
    elif supervised_type:
        # supervised Fast R-CNN path: fg/bg sampled rois + bbox-reg targets
        # (roi_data/fast_rcnn.py; no crop/distortion projection — the
        # supervised path uses plain flip/scale augmentation)
        from nafwebsod_tpu.data.fast_rcnn import sample_rois as frcnn_sample
        blobs = frcnn_sample(entry, im_scale, rng=rng, pad_to=pad_rois_to)
        blobs['obn_scores'] = np.ones(
            (blobs['rois'].shape[0], 1), np.float32)
        blobs['labels_oh'] = np.zeros((1, cfg.MODEL.NUM_CLASSES - 1),
                                      np.float32)
        if cfg.MODEL.MASK_ON:
            # supervised Mask R-CNN targets on the sampled fg rois
            # (roi_data/mask_rcnn.py:37-110), padded to a fixed fg budget
            from nafwebsod_tpu.data.mask_rcnn import add_mask_rcnn_blobs
            m = cfg.MRCNN.RESOLUTION
            max_fg = max(int(round(cfg.TRAIN.FG_FRACTION *
                                   cfg.TRAIN.BATCH_SIZE_PER_IM)), 1)
            valid = blobs['valid_mask']
            boxes_orig = blobs['rois'][valid][:, 1:5] / im_scale
            mask_rois, masks, _ = add_mask_rcnn_blobs(
                boxes_orig, blobs['labels_int32'][valid],
                entry.get('segms', []), entry['gt_classes'],
                entry['is_crowd'].astype(bool), im_scale, M=m,
                cls_specific=cfg.MRCNN.CLS_SPECIFIC_MASK,
                num_classes=cfg.MODEL.NUM_CLASSES)
            n = min(len(mask_rois), max_fg)
            pad_rois = np.zeros((max_fg, 5), np.float32)
            pad_masks = -np.ones((max_fg,) + masks.shape[1:], np.int32)
            pad_rois[:n] = mask_rois[:n]
            pad_masks[:n] = masks[:n]
            blobs['mask_rois'] = pad_rois
            blobs['masks_int32'] = pad_masks
    else:
        blobs = sample_rois(entry, im_scale, im_crop, cfg.MODEL.NUM_CLASSES,
                            cfg.TRAIN.BATCH_SIZE_PER_IM, pad_to=pad_rois_to)
    blobs['data'] = im[None, :, :, :]  # (1, H, W, 3) NHWC
    blobs['im_scale'] = im_scale
    # true (h, w) of this image — stack_minibatches pads to the batch
    # canvas; the context head clips its rings at THIS edge, not the
    # canvas edge (detector._run_body_and_head im_hw)
    blobs['im_hw'] = np.array(im.shape[:2], np.float32)
    blobs['data_ids'] = np.array([entry.get('id', 0)], dtype=np.int32)
    return blobs


def mixup_blobs(blobs_a, blobs_b, lam, max_rois=None):
    """Bagging-mixup (ref loader_wsl.py:136-169): blend the two images and
    their one-hot labels with lambda; the union of both images' rois is kept
    (the reference forces batch_idx 0 on all of them). When `max_rois` is set
    (static TPU shapes) the union is truncated to the top boxes by objectness
    — a bounded-capacity deviation from the reference's dynamic roi count."""
    a, b = blobs_a['data'], blobs_b['data']
    h = max(a.shape[1], b.shape[1])
    w = max(a.shape[2], b.shape[2])
    canvas = np.zeros((1, h, w, 3), dtype=np.float32)
    canvas[:, :a.shape[1], :a.shape[2]] += lam * a
    canvas[:, :b.shape[1], :b.shape[2]] += (1.0 - lam) * b
    out = dict(blobs_a)
    out['data'] = canvas
    out['im_hw'] = np.array([h, w], np.float32)  # blended canvas extent
    out['labels_oh'] = (lam * blobs_a['labels_oh'] +
                        (1.0 - lam) * blobs_b['labels_oh'])

    va = blobs_a['valid_mask']
    vb = blobs_b['valid_mask']
    rois = np.vstack([blobs_a['rois'][va], blobs_b['rois'][vb]])
    obn = np.vstack([blobs_a['obn_scores'][va], blobs_b['obn_scores'][vb]])
    rois[:, 0] = 0
    if max_rois is not None and rois.shape[0] > max_rois:
        order = np.argsort(-obn[:, 0], kind='stable')[:max_rois]
        order.sort()
        rois, obn = rois[order], obn[order]
    n = rois.shape[0]
    valid = np.ones((n,), dtype=bool)
    if max_rois is not None and n < max_rois:
        pad = max_rois - n
        rois = np.vstack([rois, np.zeros((pad, 5), np.float32)])
        obn = np.vstack([obn, np.zeros((pad, 1), np.float32)])
        valid = np.concatenate([valid, np.zeros((pad,), bool)])
    out['rois'], out['obn_scores'], out['valid_mask'] = rois, obn, valid
    return out
