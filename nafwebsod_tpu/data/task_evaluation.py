"""Evaluation dispatch + EXPECTED_RESULTS regression gate.

Capability parity with ``detectron/datasets/task_evaluation.py``: route box
results to the VOC evaluator (AP + CorLoc, for datasets with a devkit) or the
COCO-protocol evaluator; check results against ``cfg.EXPECTED_RESULTS`` with
atol/rtol tolerances (ref :54-121 and config.py:1077-1088)."""

import logging

from nafwebsod_tpu.core.config import cfg
from nafwebsod_tpu.data import catalog, coco_evaluator, voc_dataset_evaluator

logger = logging.getLogger(__name__)


def _use_voc_evaluator(dataset_name):
    if cfg.TEST.FORCE_JSON_DATASET_EVAL:
        return False
    try:
        devkit = catalog.get_devkit_dir(dataset_name)
    except KeyError:
        return False
    import os
    return bool(devkit) and os.path.exists(devkit)


def evaluate_boxes(json_dataset, all_boxes, output_dir, use_matlab=False,
                   image_ids=None):
    logger.info('Evaluating detections')
    if use_matlab:
        # The reference shells out to VOCdevkit-matlab-wrapper/
        # (voc_dataset_evaluator.py:98-140); no MATLAB runtime exists in
        # this framework's environments, so fail loudly instead of
        # silently evaluating with the python protocol.
        raise NotImplementedError(
            'use_matlab=True requested but the MATLAB VOCdevkit wrapper is '
            'not supported in the TPU rebuild; use the python evaluator '
            '(voc_eval 11-point AP parity-tested in tests/test_eval_tasks.py)')
    if _use_voc_evaluator(json_dataset.name):
        # the VOC path enumerates the devkit image-set txt and hard-asserts
        # its length against all_boxes — misalignment fails fast there
        return voc_dataset_evaluator.evaluate_boxes(
            json_dataset, all_boxes, output_dir)
    return coco_evaluator.evaluate_boxes(json_dataset, all_boxes, output_dir,
                                         image_ids=image_ids)


def _use_cityscapes_evaluator(dataset_name):
    """Route segm eval to the cityscapes instance protocol
    (ref task_evaluation.py:278-280)."""
    return 'cityscapes_' in dataset_name


def evaluate_all(dataset, all_boxes, all_segms, all_keyps, output_dir,
                 image_ids=None):
    """``image_ids``: the DETECTION-time per-image ids aligned with the
    positional index of all_boxes[cls][i] (engine/test_engine.py saves them
    in detections.pkl). Without them the positional evaluators rebuild a
    gt roidb and assume its order/length matches — which the train-set
    no-class filter can silently break (the CorLoc re-test case)."""
    res = evaluate_boxes(dataset, all_boxes, output_dir,
                         image_ids=image_ids)
    if all_segms is not None:
        logger.info('Evaluating segmentations')
        if _use_cityscapes_evaluator(dataset.name):
            from nafwebsod_tpu.data import cityscapes_evaluator
            seg = cityscapes_evaluator.evaluate_masks(
                dataset, all_boxes, all_segms, output_dir,
                image_ids=image_ids)
        else:
            seg = coco_evaluator.evaluate_masks(
                dataset, all_boxes, all_segms, output_dir,
                image_ids=image_ids)
        res.update({'segm_' + k: v for k, v in seg.items()})
    if all_keyps is not None:
        logger.info('Evaluating keypoints')
        kps = coco_evaluator.evaluate_keypoints(
            dataset, all_boxes, all_keyps, output_dir, image_ids=image_ids)
        res.update({'keypoints_' + k: v for k, v in kps.items()})
    return {dataset.name: res}


def check_expected_results(results, atol=0.005, rtol=0.1):
    """Compare against cfg.EXPECTED_RESULTS [(dataset, task, metric, value)]."""
    expected = cfg.EXPECTED_RESULTS
    if not expected:
        return True
    ok = True
    for dataset, task, metric, expected_val in expected:
        if dataset not in results:
            logger.warning('EXPECTED_RESULTS: dataset %s not evaluated',
                           dataset)
            ok = False
            continue
        actual = results[dataset].get(metric)
        if actual is None:
            logger.warning('EXPECTED_RESULTS: metric %s missing', metric)
            ok = False
            continue
        err = abs(actual - expected_val)
        tol = atol + rtol * abs(expected_val)
        if err > tol:
            logger.error(
                'FAIL: %s/%s/%s actual %.4f != expected %.4f (tol %.4f)',
                dataset, task, metric, actual, expected_val, tol)
            ok = False
        else:
            logger.info(
                'PASS: %s/%s/%s actual %.4f ~= expected %.4f',
                dataset, task, metric, actual, expected_val)
    if not ok and cfg.EXPECTED_RESULTS_EMAIL:
        from nafwebsod_tpu.utils.logging_utils import send_email
        send_email('EXPECTED_RESULTS check failed', str(results),
                   cfg.EXPECTED_RESULTS_EMAIL)
    return ok
