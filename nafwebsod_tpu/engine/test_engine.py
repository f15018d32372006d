"""Inference orchestration (ref ``detectron/core/test_engine_wsl.py``):
roidb + proposal loading, per-image detection loop with gt-roi skipping,
detections.pkl output, range sharding for parallel workers, result merging,
and evaluation dispatch."""

import logging
import os
from collections import defaultdict

import cv2
import jax
import numpy as np

from nafwebsod_tpu.core.config import cfg, get_output_dir
from nafwebsod_tpu.data import task_evaluation
from nafwebsod_tpu.data.json_dataset import JsonDataset
from nafwebsod_tpu.engine.test import im_detect_all
from nafwebsod_tpu.models import detector
from nafwebsod_tpu.utils import checkpoint as ckpt
from nafwebsod_tpu.utils.io import load_object, save_object
from nafwebsod_tpu.utils.timer import Timer

logger = logging.getLogger(__name__)


def get_roidb_and_dataset(dataset_name, proposal_file, ind_range=None):
    """Test roidb with proposals (ref test_engine_wsl.py:349-383)."""
    dataset = JsonDataset(dataset_name)
    if cfg.TEST.PRECOMPUTED_PROPOSALS:
        assert proposal_file, 'No proposals exist for "{}"'.format(dataset_name)
        roidb = dataset.get_roidb(
            gt=True,
            proposal_file=proposal_file,
            proposal_limit=cfg.TEST.PROPOSAL_LIMIT)
    else:
        roidb = dataset.get_roidb(gt=True)
    if ind_range is not None:
        total_num_images = len(roidb)
        start, end = ind_range
        roidb = roidb[start:end]
    else:
        start = 0
        end = len(roidb)
        total_num_images = end
    return roidb, dataset, start, end, total_num_images


def empty_results(num_classes, num_images):
    all_boxes = [[[] for _ in range(num_images)] for _ in range(num_classes)]
    all_segms = None
    if cfg.MODEL.MASK_ON:
        all_segms = [[[] for _ in range(num_images)]
                     for _ in range(num_classes)]
    all_keyps = None
    if cfg.MODEL.KEYPOINTS_ON:
        all_keyps = [[[] for _ in range(num_images)]
                     for _ in range(num_classes)]
    return all_boxes, all_segms, all_keyps


def extend_results(index, all_res, im_res):
    for cls_idx in range(1, len(im_res)):
        all_res[cls_idx][index] = im_res[cls_idx]


def initialize_model_from_cfg(weights_file):
    """Create the model spec + load pkl weights (ref :322-346)."""
    spec = detector.spec_from_cfg(cfg)
    import jax
    params = detector.init_params(spec, jax.random.PRNGKey(cfg.RNG_SEED))
    if weights_file:
        params, _, _ = ckpt.initialize_params_from_weights_file(
            params, weights_file, strict_shapes=False)
    return spec, params


def generate_rpn_proposals(weights_file, dataset_name, output_dir,
                           ind_range=None):
    """RPN-only proposal generation (ref core/rpn_generator.py): run the
    RPN over the dataset and write a proposal pkl consumable by
    TRAIN/TEST.PROPOSAL_FILES ({'boxes', 'scores', 'ids'})."""
    import jax.numpy as jnp

    from nafwebsod_tpu.data.minibatch import (pad_image_to_bucket,
                                              prep_im_for_blob)

    roidb, dataset, start_ind, end_ind, total = get_roidb_and_dataset(
        dataset_name, None, ind_range)
    spec, params = initialize_model_from_cfg(weights_file)
    boxes_all, scores_all, ids = [], [], []
    for i, entry in enumerate(roidb):
        im = cv2.imread(entry['image'])
        im_blob, im_scale = prep_im_for_blob(
            im, cfg.PIXEL_MEANS, cfg.TEST.SCALE, cfg.TEST.MAX_SIZE,
            cfg.PIXEL_STDS)
        h, w = im_blob.shape[:2]
        im_in = pad_image_to_bucket(im_blob, cfg.TPU.SIZE_BUCKET_MULTIPLE)
        out = detector.forward_test(
            spec, params, jnp.asarray(im_in[None]), None, None, None,
            im_info=jnp.asarray(np.array([h, w, im_scale], np.float32)))
        valid = np.asarray(out['proposal_valid'])
        boxes = np.asarray(out['rois'])[valid][:, 1:5] / im_scale
        boxes = np.clip(boxes, 0,
                        [im.shape[1] - 1, im.shape[0] - 1,
                         im.shape[1] - 1, im.shape[0] - 1])
        boxes_all.append(boxes.astype(np.float32))
        scores_all.append(
            np.asarray(out['proposal_scores'])[valid].astype(np.float32))
        ids.append(entry['id'])
        if i % 10 == 0:
            logger.info('rpn_generate: %d/%d', i + 1, len(roidb))
    name = ('rpn_proposals.pkl' if ind_range is None else
            'rpn_proposals_range_{}_{}.pkl'.format(*ind_range))
    out_file = os.path.join(output_dir, name)
    save_object(dict(boxes=boxes_all, scores=scores_all, ids=ids,
                     cfg=_dump_cfg_str()), out_file)
    logger.info('Wrote RPN proposals to: %s', os.path.abspath(out_file))
    evaluate_proposal_recall(roidb, boxes_all)
    return boxes_all, scores_all, ids


def evaluate_proposal_recall(roidb, boxes_all):
    """Average recall of proposals vs gt with greedy one-to-one matching at
    IoU .5:.05:.95 (json_dataset_evaluator.evaluate_box_proposals)."""
    from nafwebsod_tpu.ops import boxes as box_utils

    thresholds = np.arange(0.5, 0.95 + 1e-5, 0.05)
    matched = np.zeros(len(thresholds))
    total_gt = 0
    for boxes, entry in zip(boxes_all, roidb):
        gt_inds = np.where((entry['gt_classes'] > 0) &
                           ~entry['is_crowd'].astype(bool))[0]
        gt = entry['boxes'][gt_inds]
        if not len(gt):
            continue
        total_gt += len(gt)
        if not len(boxes):
            continue
        ov = box_utils.bbox_overlaps(gt.astype(np.float32),
                                     np.asarray(boxes, np.float32))
        # greedy: repeatedly take the best remaining (gt, proposal) pair
        gt_best = np.zeros(len(gt))
        o = ov.copy()
        for _ in range(min(len(gt), o.shape[1])):
            gi, pi = np.unravel_index(np.argmax(o), o.shape)
            if o[gi, pi] <= 0:
                break
            gt_best[gi] = o[gi, pi]
            o[gi, :] = -1
            o[:, pi] = -1
        for ti, t in enumerate(thresholds):
            matched[ti] += (gt_best >= t).sum()
    recalls = matched / max(total_gt, 1)
    ar = float(recalls.mean())
    logger.info('proposal AR@[.5:.95] = %.4f | recall@0.5 = %.4f | '
                'recall@0.75 = %.4f (%d gts)', ar, recalls[0], recalls[5],
                total_gt)
    return {'AR': ar, 'recall@0.5': float(recalls[0]),
            'recall@0.75': float(recalls[5])}


def test_net(weights_file, dataset_name, proposal_file, output_dir,
             ind_range=None, gpu_id=0):
    """Per-image detection loop over (a range of) the dataset
    (ref test_engine_wsl.py:203-319)."""
    roidb, dataset, start_ind, end_ind, total_num_images = \
        get_roidb_and_dataset(dataset_name, proposal_file, ind_range)
    spec, params = initialize_model_from_cfg(weights_file)
    num_images = len(roidb)
    num_classes = cfg.MODEL.NUM_CLASSES
    all_boxes, all_segms, all_keyps = empty_results(num_classes, num_images)
    timers = defaultdict(Timer)

    from nafwebsod_tpu.engine.test import _can_fuse_detect
    infer_batch = int(cfg.TPU.INFER_BATCH)
    if infer_batch < 0:  # auto: measured sweet spot on TPU (BASELINE.md)
        infer_batch = 16 if jax.default_backend() != 'cpu' else 1
    infer_batch = max(infer_batch, 1)
    if (infer_batch > 1 and cfg.TEST.PRECOMPUTED_PROPOSALS
            and _can_fuse_detect(spec) and not spec.mask_on
            and not spec.keypoints_on and not spec.retinanet
            and not spec.retinanet_wsl and not cfg.VIS):
        # chunk-of-B fused path: one scan-of-B device call per chunk.
        # With device image prep the raw/resized canvases are pinned to
        # dataset-wide maxima (from the roidb dims) so the whole eval
        # runs on ONE compiled program.
        from nafwebsod_tpu.engine.test import _device_prep_enabled, _snap
        raw_cap = out_cap = None
        if _device_prep_enabled():
            from nafwebsod_tpu.ops import image as image_ops
            bucket = cfg.TPU.SIZE_BUCKET_MULTIPLE
            raw_cap = (
                _snap(max(e['height'] for e in roidb) + image_ops.EDGE_PAD,
                      bucket),
                _snap(max(e['width'] for e in roidb) + image_ops.EDGE_PAD,
                      bucket))
            vdims = [image_ops.scaled_size(
                e['height'], e['width'],
                image_ops.compute_im_scale(e['height'], e['width'],
                                           cfg.TEST.SCALE,
                                           cfg.TEST.MAX_SIZE))
                     for e in roidb]
            out_cap = (_snap(max(v[0] for v in vdims), bucket),
                       _snap(max(v[1] for v in vdims), bucket))
        from nafwebsod_tpu.engine.test import (
            im_detect_fused_batch_dispatch, im_detect_fused_batch_harvest)
        pend_idx, pend_ims, pend_boxes, pend_obn = [], [], [], []
        # pipelined dispatch: harvest chunk k only once DEPTH newer chunks
        # are dispatched, so host prep + input transfer (and, at depth>=2,
        # the harvest/assemble host work itself) overlap device compute
        # (async dispatch; TPU.INFER_PIPELINE_DEPTH)
        depth = max(int(cfg.TPU.INFER_PIPELINE_DEPTH), 1)
        inflight = []

        def harvest(handle, idx_list):
            results = im_detect_fused_batch_harvest(handle)
            for i2, cls_boxes_i in zip(idx_list, results):
                extend_results(i2, all_boxes, cls_boxes_i)

        def flush(final=False):
            if pend_idx:
                timers['im_detect_bbox'].tic()
                handle = im_detect_fused_batch_dispatch(
                    spec, params, pend_ims, pend_boxes, pend_obn,
                    raw_cap=raw_cap, out_cap=out_cap)
                inflight.append((handle, list(pend_idx)))
                timers['im_detect_bbox'].toc()
                del pend_idx[:], pend_ims[:], pend_boxes[:], pend_obn[:]
            while len(inflight) > (0 if final else depth):
                timers['im_detect_bbox'].tic()
                handle, idx_list = inflight.pop(0)
                harvest(handle, idx_list)
                timers['im_detect_bbox'].toc()

        for i, entry in enumerate(roidb):
            box_proposals = entry['boxes'][entry['gt_classes'] == 0]
            obn_scores = entry['obn_scores'][entry['gt_classes'] == 0]
            if len(box_proposals) == 0:
                continue
            pend_idx.append(i)
            pend_ims.append(cv2.imread(entry['image']))
            pend_boxes.append(box_proposals)
            pend_obn.append(obn_scores)
            if len(pend_idx) == infer_batch:
                flush()
                if (i // infer_batch) % 4 == 0:
                    logger.info(
                        'im_detect[batch %d]: range [%d, %d] of %d: %d/%d '
                        '(det %.3fs/chunk)', infer_batch, start_ind + 1,
                        end_ind, total_num_images, start_ind + i + 1,
                        start_ind + num_images,
                        timers['im_detect_bbox'].average_time)
        flush(final=True)
        cfg_yaml = _dump_cfg_str()
        det_name = ('detection_range_{}_{}.pkl'.format(*ind_range)
                    if ind_range is not None else 'detections.pkl')
        det_file = os.path.join(output_dir, det_name)
        save_object(
            dict(all_boxes=all_boxes, all_segms=all_segms,
                 all_keyps=all_keyps, cfg=cfg_yaml,
                 image_ids=[e['id'] for e in roidb]), det_file)
        logger.info('Wrote detections to: %s', os.path.abspath(det_file))
        return all_boxes, all_segms, all_keyps

    for i, entry in enumerate(roidb):
        if cfg.TEST.PRECOMPUTED_PROPOSALS:
            # skip gt rois: use only proposal boxes (ref :226-234)
            box_proposals = entry['boxes'][entry['gt_classes'] == 0]
            obn_scores = entry['obn_scores'][entry['gt_classes'] == 0]
            if len(box_proposals) == 0:
                continue
        else:
            box_proposals, obn_scores = None, None

        im = cv2.imread(entry['image'])
        cls_boxes_i, cls_segms_i, cls_keyps_i = im_detect_all(
            spec, params, im, box_proposals, obn_scores, timers,
            kp_flip_map=entry.get('kp_flip_map'))
        extend_results(i, all_boxes, cls_boxes_i)
        if all_segms is not None and cls_segms_i is not None:
            extend_results(i, all_segms, cls_segms_i)
        if all_keyps is not None and cls_keyps_i is not None:
            extend_results(i, all_keyps, cls_keyps_i)
        if cfg.VIS:
            # detection rendering during eval (ref test_engine_wsl.py:281-302)
            from nafwebsod_tpu.utils.vis import feat_map_vis, vis_one_image
            stem = os.path.splitext(os.path.basename(entry['image']))[0]
            vis_one_image(
                im, cls_boxes_i, segms=cls_segms_i, keypoints=cls_keyps_i,
                thresh=cfg.VIS_TH, class_names=dataset.classes,
                output_name=os.path.join(output_dir, 'vis',
                                         stem + '.png'))
            try:
                # conv5 channel-max feature rendering
                # (ref test_engine_wsl_vis.py:315 feat_vis)
                import jax.numpy as jnp
                from nafwebsod_tpu.data.minibatch import prep_im_for_blob
                im_blob, _ = prep_im_for_blob(
                    im, cfg.PIXEL_MEANS, cfg.TEST.SCALE, cfg.TEST.MAX_SIZE,
                    cfg.PIXEL_STDS)
                feat = detector.forward_body_feat(
                    spec, params, jnp.asarray(im_blob[None]))
                feat_map_vis(
                    os.path.join(output_dir, 'vis', stem + '_feat.png'),
                    im_blob, feat, pixel_means=cfg.PIXEL_MEANS)
            except Exception:
                logger.exception('feat_map_vis failed (non-fatal)')
        if i % 10 == 0:
            ave_total_time = np.sum(
                [t.average_time for t in timers.values()])
            eta_seconds = ave_total_time * (num_images - i - 1)
            logger.info(
                'im_detect: range [%d, %d] of %d: %d/%d (det %.3fs + misc %.3fs | eta %ds)',
                start_ind + 1, end_ind, total_num_images,
                start_ind + i + 1, start_ind + num_images,
                timers['im_detect_bbox'].average_time,
                timers['misc_bbox'].average_time, int(eta_seconds))

    cfg_yaml = _dump_cfg_str()
    if ind_range is not None:
        det_name = 'detection_range_{}_{}.pkl'.format(*ind_range)
    else:
        det_name = 'detections.pkl'
    det_file = os.path.join(output_dir, det_name)
    save_object(
        dict(all_boxes=all_boxes, all_segms=all_segms, all_keyps=all_keyps,
             cfg=cfg_yaml, image_ids=[e['id'] for e in roidb]),
        det_file)
    logger.info('Wrote detections to: %s', os.path.abspath(det_file))
    return all_boxes, all_segms, all_keyps


def _dump_cfg_str():
    from nafwebsod_tpu.core import config as config_mod
    return config_mod.dump_cfg()


def merge_detection_ranges(output_dir, num_classes, total_num_images, ranges):
    """Merge detection_range_*.pkl files from sharded workers
    (ref :154-200)."""
    all_boxes = [[] for _ in range(num_classes)]
    image_ids = []
    for (start, end) in ranges:
        det_file = os.path.join(
            output_dir, 'detection_range_{}_{}.pkl'.format(start, end))
        data = load_object(det_file)
        for cls_idx in range(num_classes):
            all_boxes[cls_idx] += list(data['all_boxes'][cls_idx])
        image_ids += list(data.get('image_ids', []))
    for cls_idx in range(num_classes):
        assert len(all_boxes[cls_idx]) == total_num_images
    det_file = os.path.join(output_dir, 'detections.pkl')
    save_object(dict(all_boxes=all_boxes, all_segms=None, all_keyps=None,
                     cfg=_dump_cfg_str(), image_ids=image_ids or None),
                det_file)
    return all_boxes, image_ids or None


def test_net_on_dataset(weights_file, dataset_name, proposal_file,
                        output_dir, multi_gpu=False):
    dataset = JsonDataset(dataset_name)
    if cfg.MODEL.RPN_ONLY or cfg.MODEL.TYPE == 'rpn':
        generate_rpn_proposals(weights_file, dataset_name, output_dir)
        return {dataset_name: {'task': 'rpn_proposal_generation'}}
    test_timer = Timer()
    test_timer.tic()
    if multi_gpu:
        all_boxes, image_ids = multi_process_test_net_on_dataset(
            weights_file, dataset_name, proposal_file, output_dir)
        all_segms = all_keyps = None
    else:
        all_boxes, all_segms, all_keyps = test_net(
            weights_file, dataset_name, proposal_file, output_dir)
        # the pkl save inside test_net recorded the enumeration order;
        # reload the ids rather than rebuilding the roidb a second time
        dets = load_object(os.path.join(output_dir, 'detections.pkl'))
        image_ids = dets.get('image_ids')
    test_timer.toc()
    logger.info('Total inference time: %.3fs', test_timer.average_time)
    results = task_evaluation.evaluate_all(
        dataset, all_boxes, all_segms, all_keyps, output_dir,
        image_ids=image_ids)
    return results


def multi_process_test_net_on_dataset(weights_file, dataset_name,
                                      proposal_file, output_dir):
    """Sharded inference across subprocesses
    (test_engine_wsl.py:154-200 + subprocess.py). Each worker runs
    ``tools/test_net.py --range start end`` against a dumped copy of the
    current cfg; detection_range pkls are merged afterwards."""
    import sys

    from nafwebsod_tpu.utils import subprocess_utils

    roidb, dataset, _, _, total = get_roidb_and_dataset(
        dataset_name, proposal_file)
    num_workers = max(cfg.NUM_GPUS, 1)

    # Device oversubscription guard: the reference pins one worker per GPU
    # (CUDA_VISIBLE_DEVICES, subprocess.py:63-66). When more workers than
    # accelerator devices would be spawned (e.g. a single remote-attached
    # chip), pin the workers to CPU instead of letting them contend for
    # the one device (env JAX_PLATFORMS alone does not override a pinned
    # platform plugin — workers honor NAFWEBSOD_PLATFORM at startup).
    from nafwebsod_tpu.utils import env as env_utils
    worker_env = None
    n_acc = env_utils.accelerator_device_count()
    if num_workers > max(n_acc, 1) or (num_workers > 1 and n_acc == 1):
        worker_env = {env_utils.PLATFORM_ENV_VAR: 'cpu'}
        logger.warning(
            '%d inference workers > %d accelerator device(s): pinning '
            'workers to CPU via %s', num_workers, n_acc,
            env_utils.PLATFORM_ENV_VAR)

    cfg_path = os.path.join(output_dir, 'multi_proc_test_cfg.yaml')
    with open(cfg_path, 'w') as f:
        f.write(_dump_cfg_str())
    repo_root = os.path.dirname(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
    tool = os.path.join(repo_root, 'tools', 'test_net.py')
    binary = [sys.executable, tool, '--cfg', cfg_path]
    # pin the worker to THIS dataset: the dumped cfg still lists every
    # TEST.DATASETS entry and the child resolves index 0, so without the
    # override dataset 2+'s workers would re-detect dataset 1 (the
    # reference passes the same two keys, test_engine_wsl.py:164-167)
    extra_opts = ['TEST.WEIGHTS', weights_file,
                  'TEST.DATASETS', str((dataset_name,))]
    if proposal_file:
        extra_opts += ['TEST.PROPOSAL_FILES', str((proposal_file,))]
    ranges = subprocess_utils.process_in_parallel(
        'detection', total, binary, output_dir, num_workers,
        worker_env=worker_env, extra_opts=extra_opts)
    return merge_detection_ranges(
        output_dir, cfg.MODEL.NUM_CLASSES, total, ranges)


def run_inference(weights_file, ind_range=None, multi_gpu_testing=False,
                  check_expected_results=False):
    """Top-level entry (ref :70-122)."""
    is_parent = ind_range is None

    def result_getter():
        if is_parent:
            results = {}
            for i in range(len(cfg.TEST.DATASETS)):
                dataset_name = cfg.TEST.DATASETS[i]
                proposal_file = (cfg.TEST.PROPOSAL_FILES[i]
                                 if cfg.TEST.PROPOSAL_FILES else None)
                output_dir = get_output_dir((dataset_name,), training=False)
                r = test_net_on_dataset(
                    weights_file, dataset_name, proposal_file, output_dir,
                    multi_gpu=multi_gpu_testing)
                results.update(r)
            return results
        else:
            dataset_name = cfg.TEST.DATASETS[0]
            proposal_file = (cfg.TEST.PROPOSAL_FILES[0]
                             if cfg.TEST.PROPOSAL_FILES else None)
            output_dir = get_output_dir((dataset_name,), training=False)
            return test_net(weights_file, dataset_name, proposal_file,
                            output_dir, ind_range=ind_range)

    results = result_getter()
    if check_expected_results and is_parent:
        # flatten either evaluator's shape to {dataset: {metric: value}}:
        # VOC gives {'ap': per-class, 'mAP', 'corloc', 'mean_corloc'},
        # COCO gives {'AP', 'AP50', ...} (+ 'segm_*'/'keypoints_*' prefixes)
        flat = {}
        for ds, r in results.items():
            if not isinstance(r, dict):
                flat[ds] = r
                continue
            f = {k: v for k, v in r.items()
                 if isinstance(v, (int, float, np.floating))}
            flat[ds] = f
        task_evaluation.check_expected_results(
            flat, atol=cfg.EXPECTED_RESULTS_ATOL,
            rtol=cfg.EXPECTED_RESULTS_RTOL)
    return results
