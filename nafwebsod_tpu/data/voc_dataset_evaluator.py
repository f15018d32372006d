"""VOC-style evaluation over detection results.

Capability parity with ``detectron/datasets/voc_dataset_evaluator.py``:
writes VOCdevkit-format per-class result files (1-based coords, salted
comp4 filenames), runs the python AP eval (VOC07 metric for year < 2010) and
the CorLoc eval, and saves per-class PR / corloc pkls into the output dir.
"""

import logging
import os
import shutil
import uuid

import numpy as np

from nafwebsod_tpu.data import catalog
from nafwebsod_tpu.data.voc_eval import voc_eval, voc_eval_corloc
from nafwebsod_tpu.utils.io import save_object

logger = logging.getLogger(__name__)


def voc_info(json_dataset):
    name = json_dataset.name
    # voc_<year>_<set> or webly sets evaluated against a VOC devkit
    parts = name.split('_')
    if parts[0] == 'voc':
        year, image_set = parts[1], '_'.join(parts[2:])
    else:
        year, image_set = '2007', 'test'
    devkit_path = catalog.get_devkit_dir(name)
    assert devkit_path and os.path.exists(devkit_path), \
        'Devkit directory {} not found'.format(devkit_path)
    anno_path = os.path.join(devkit_path, 'VOC' + year, 'Annotations',
                             '{:s}.xml')
    image_set_path = os.path.join(devkit_path, 'VOC' + year, 'ImageSets',
                                  'Main', image_set + '.txt')
    return dict(year=year, image_set=image_set, devkit_path=devkit_path,
                anno_path=anno_path, image_set_path=image_set_path)


def _get_voc_results_file_template(json_dataset, salt):
    info = voc_info(json_dataset)
    filename = 'comp4' + salt + '_det_' + info['image_set'] + '_{:s}.txt'
    dirname = os.path.join(info['devkit_path'], 'results',
                           'VOC' + info['year'], 'Main')
    os.makedirs(dirname, exist_ok=True)
    return os.path.join(dirname, filename)


def _write_voc_results_files(json_dataset, all_boxes, salt):
    filenames = []
    image_set_path = voc_info(json_dataset)['image_set_path']
    with open(image_set_path, 'r') as f:
        image_index = [x.strip() for x in f.readlines()]
    for cls_ind, cls in enumerate(json_dataset.classes):
        if cls == '__background__':
            continue
        filename = _get_voc_results_file_template(json_dataset,
                                                  salt).format(cls)
        filenames.append(filename)
        assert len(all_boxes[cls_ind]) == len(image_index)
        with open(filename, 'wt') as f:
            for im_ind, index in enumerate(image_index):
                dets = all_boxes[cls_ind][im_ind]
                if isinstance(dets, list):
                    assert len(dets) == 0
                    continue
                for k in range(dets.shape[0]):
                    # the VOCdevkit expects 1-based indices
                    f.write('{:s} {:.9f} {:.1f} {:.1f} {:.1f} {:.1f}\n'.format(
                        index, dets[k, -1], dets[k, 0] + 1, dets[k, 1] + 1,
                        dets[k, 2] + 1, dets[k, 3] + 1))
    return filenames


def _do_python_eval(json_dataset, salt, output_dir):
    info = voc_info(json_dataset)
    cachedir = os.path.join(info['devkit_path'], 'annotations_cache')
    use_07_metric = int(info['year']) < 2010
    os.makedirs(output_dir, exist_ok=True)
    aps = {}
    for cls in json_dataset.classes:
        if cls == '__background__':
            continue
        filename = _get_voc_results_file_template(json_dataset,
                                                  salt).format(cls)
        rec, prec, ap = voc_eval(filename, info['anno_path'],
                                 info['image_set_path'], cls, cachedir,
                                 ovthresh=0.5, use_07_metric=use_07_metric)
        aps[cls] = ap
        logger.info('AP for %s = %.4f', cls, ap)
        save_object({'rec': rec, 'prec': prec, 'ap': ap},
                    os.path.join(output_dir, cls + '_pr.pkl'))
    mAP = np.mean(list(aps.values())) if aps else 0.0
    logger.info('Mean AP = %.4f', mAP)
    return aps, mAP


def _do_python_eval_corloc(json_dataset, salt, output_dir):
    info = voc_info(json_dataset)
    cachedir = os.path.join(info['devkit_path'], 'annotations_cache')
    os.makedirs(output_dir, exist_ok=True)
    corlocs = {}
    for cls in json_dataset.classes:
        if cls == '__background__':
            continue
        filename = _get_voc_results_file_template(json_dataset,
                                                  salt).format(cls)
        corloc, too_min_rate = voc_eval_corloc(
            filename, info['anno_path'], info['image_set_path'], cls,
            cachedir, ovthresh=0.5)
        corlocs[cls] = corloc
        logger.info('CorLoc for %s = %.4f', cls, corloc)
        save_object({'corloc': corloc},
                    os.path.join(output_dir, cls + '_corloc.pkl'))
    mean_corloc = np.mean(list(corlocs.values())) if corlocs else 0.0
    logger.info('Mean CorLoc = %.4f', mean_corloc)
    return corlocs, mean_corloc


def evaluate_boxes(json_dataset, all_boxes, output_dir, use_salt=True,
                   cleanup=True):
    """Returns {'ap': per-class, 'mAP': float, 'corloc': per-class,
    'mean_corloc': float}."""
    salt = '_{}'.format(uuid.uuid4()) if use_salt else ''
    filenames = _write_voc_results_files(json_dataset, all_boxes, salt)
    aps, mAP = _do_python_eval(json_dataset, salt, output_dir)
    corlocs, mean_corloc = _do_python_eval_corloc(json_dataset, salt,
                                                  output_dir)
    if cleanup:
        for filename in filenames:
            shutil.copy(filename, output_dir)
            os.remove(filename)
    return {'ap': aps, 'mAP': mAP, 'corloc': corlocs,
            'mean_corloc': mean_corloc}
