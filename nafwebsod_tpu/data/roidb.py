"""Training roidb assembly (ref ``detectron/datasets/roidb_wsl.py``):
multi-dataset concat, horizontal-flip augmentation, validity filtering and
class-histogram logging."""

import logging

import numpy as np

from nafwebsod_tpu.core.config import cfg
from nafwebsod_tpu.data.json_dataset import JsonDataset

logger = logging.getLogger(__name__)


def combined_roidb_for_training(dataset_names, proposal_files):
    """Load and concatenate roidbs for one or more datasets, with optional
    proposals, flipped copies, and filtering (ref roidb_wsl.py:21-58)."""

    def get_roidb(dataset_name, proposal_file):
        ds = JsonDataset(dataset_name)
        roidb = ds.get_roidb(
            gt=True,
            proposal_file=proposal_file,
            crowd_filter_thresh=cfg.TRAIN.CROWD_FILTER_THRESH,
        )
        if cfg.TRAIN.USE_FLIPPED:
            logger.info('Appending horizontally-flipped training examples...')
            extend_with_flipped_entries(roidb, ds)
        logger.info('Loaded dataset: %s (%d entries)', ds.name, len(roidb))
        return roidb

    if isinstance(dataset_names, str):
        dataset_names = (dataset_names,)
    if isinstance(proposal_files, str):
        proposal_files = (proposal_files,)
    if len(proposal_files) == 0:
        proposal_files = (None,) * len(dataset_names)
    assert len(dataset_names) == len(proposal_files)
    roidbs = [get_roidb(*args) for args in zip(dataset_names, proposal_files)]
    roidb = roidbs[0]
    for r in roidbs[1:]:
        roidb.extend(r)
    roidb = filter_for_training(roidb)
    _compute_and_log_stats(roidb)
    return roidb


def extend_with_flipped_entries(roidb, dataset):
    """Flip each entry's boxes; images are flipped at load time
    (ref roidb_wsl.py:61-93)."""
    flipped_roidb = []
    for entry in roidb:
        width = entry['width']
        boxes = entry['boxes'].copy()
        oldx1 = boxes[:, 0].copy()
        oldx2 = boxes[:, 2].copy()
        boxes[:, 0] = width - oldx2 - 1
        boxes[:, 2] = width - oldx1 - 1
        assert (boxes[:, 2] >= boxes[:, 0]).all()
        flipped_entry = {}
        dont_copy = ('boxes', 'flipped')
        for k, v in entry.items():
            if k not in dont_copy:
                flipped_entry[k] = v
        flipped_entry['boxes'] = boxes
        if entry.get('segms'):
            from nafwebsod_tpu.utils.segms import flip_segms
            flipped_entry['segms'] = flip_segms(
                entry['segms'], entry['height'], width)
        flipped_entry['flipped'] = True
        flipped_roidb.append(flipped_entry)
    roidb.extend(flipped_roidb)


def filter_for_training(roidb):
    """Remove entries with no usable RoIs (ref roidb_wsl.py:96-121: an entry
    is valid if it has at least one box; WSL needs image labels + proposals)."""

    def is_valid(entry):
        return entry['boxes'].shape[0] > 0 and np.any(entry['gt_classes'] > 0)

    num = len(roidb)
    filtered_roidb = [entry for entry in roidb if is_valid(entry)]
    num_after = len(filtered_roidb)
    logger.info('Filtered %d roidb entries: %d -> %d',
                num - num_after, num, num_after)
    return filtered_roidb


def _compute_and_log_stats(roidb):
    if not roidb:
        return
    classes = None
    gt_hist = None
    for entry in roidb:
        gt_inds = np.where((entry['gt_classes'] > 0) &
                           (entry['is_crowd'] == 0))[0]
        gt_classes = entry['gt_classes'][gt_inds]
        if gt_hist is None:
            num_classes = entry['gt_overlaps'].shape[1]
            gt_hist = np.zeros((num_classes,), dtype=np.int64)
        gt_hist += np.histogram(gt_classes, bins=np.arange(
            gt_hist.shape[0] + 1))[0]
    logger.debug('Ground-truth class histogram: %s', gt_hist)
    logger.debug('Total: %d', gt_hist.sum())
