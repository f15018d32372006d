"""Synthetic dataset fixtures for data-layer tests (the reference tests use
fake roidbs similarly — detectron/tests/test_loader.py:38-41)."""

import json
import os
import pickle

import numpy as np

try:
    import cv2
except ImportError:
    cv2 = None

CLASSES = ['aeroplane', 'bicycle', 'bird']


def make_coco_dataset(root, n_images=4, width=120, height=90, seed=0,
                      n_props=32):
    """Write images + COCO json + proposal pkl; returns (name, paths dict)."""
    rng = np.random.RandomState(seed)
    img_dir = os.path.join(root, 'images')
    os.makedirs(img_dir, exist_ok=True)

    images, annotations = [], []
    prop_boxes, prop_scores, prop_ids = [], [], []
    ann_id = 1
    for i in range(n_images):
        w = width + 8 * (i % 2)
        h = height + 8 * (i % 3)
        fname = 'im_{:04d}.png'.format(i)
        im = (rng.rand(h, w, 3) * 255).astype(np.uint8)
        cv2.imwrite(os.path.join(img_dir, fname), im)
        images.append({'id': i + 1, 'file_name': fname,
                       'width': w, 'height': h})
        # one gt box per image, class cycles
        cls = (i % len(CLASSES)) + 1
        bw, bh = w // 3, h // 3
        x, y = w // 4, h // 4
        annotations.append({
            'id': ann_id, 'image_id': i + 1, 'category_id': cls,
            'bbox': [x, y, bw, bh], 'area': bw * bh, 'iscrowd': 0,
            # box-shaped polygon so mask paths have real targets
            'segmentation': [[x, y, x + bw - 1, y, x + bw - 1, y + bh - 1,
                              x, y + bh - 1]],
        })
        ann_id += 1
        # proposals: gt-ish box + randoms (coords must stay inside the image)
        boxes = np.zeros((n_props, 4), np.float32)
        boxes[0] = [x, y, x + bw - 1, y + bh - 1]
        x1 = rng.uniform(0, w - 22, n_props - 1)
        y1 = rng.uniform(0, h - 22, n_props - 1)
        x2 = np.minimum(x1 + rng.uniform(21, 60, n_props - 1), w - 1)
        y2 = np.minimum(y1 + rng.uniform(21, 60, n_props - 1), h - 1)
        boxes[1:] = np.stack([x1, y1, x2, y2], 1)
        scores = rng.uniform(0, 1, (n_props, 1)).astype(np.float32)
        scores[0] = 0.9
        prop_boxes.append(boxes)
        prop_scores.append(scores)
        prop_ids.append(i + 1)

    ann_file = os.path.join(root, 'annotations.json')
    with open(ann_file, 'w') as f:
        json.dump({
            'images': images,
            'annotations': annotations,
            'categories': [{'id': i + 1, 'name': n}
                           for i, n in enumerate(CLASSES)],
        }, f)

    prop_file = os.path.join(root, 'proposals.pkl')
    with open(prop_file, 'wb') as f:
        pickle.dump({'boxes': prop_boxes, 'scores': prop_scores,
                     'ids': prop_ids}, f, 2)
    return {'image_dir': img_dir, 'ann_file': ann_file,
            'prop_file': prop_file, 'n_images': n_images}


def make_voc_annotations(root, image_specs):
    """Write VOC xml annotations + an imageset file.

    image_specs: list of (image_id, [(classname, x1, y1, x2, y2, difficult)]).
    Returns (annopath_template, imagesetfile).
    """
    ann_dir = os.path.join(root, 'Annotations')
    os.makedirs(ann_dir, exist_ok=True)
    names = []
    for image_id, objs in image_specs:
        names.append(image_id)
        parts = ['<annotation>']
        for (cls, x1, y1, x2, y2, diff) in objs:
            parts.append(
                '<object><name>{}</name><pose>Left</pose>'
                '<truncated>0</truncated><difficult>{}</difficult>'
                '<bndbox><xmin>{}</xmin><ymin>{}</ymin>'
                '<xmax>{}</xmax><ymax>{}</ymax></bndbox></object>'.format(
                    cls, diff, x1, y1, x2, y2))
        parts.append('</annotation>')
        with open(os.path.join(ann_dir, image_id + '.xml'), 'w') as f:
            f.write(''.join(parts))
    setfile = os.path.join(root, 'test.txt')
    with open(setfile, 'w') as f:
        f.write('\n'.join(names) + '\n')
    return os.path.join(ann_dir, '{}.xml'), setfile


def make_identical_coco_dataset(root, n_images=2, width=64, height=48,
                                seed=0, n_props=16):
    """Dataset where every entry is byte-identical (same image content,
    same annotations, same proposals). Used by the multi-process training
    equality tests: any assignment of entries to devices/hosts yields the
    same global batch, so cross-run comparisons isolate the collective
    path itself."""
    rng = np.random.RandomState(seed)
    img_dir = os.path.join(root, 'images')
    os.makedirs(img_dir, exist_ok=True)

    im = (rng.rand(height, width, 3) * 255).astype(np.uint8)
    x, y, bw, bh = width // 4, height // 4, width // 3, height // 3
    boxes = np.zeros((n_props, 4), np.float32)
    boxes[0] = [x, y, x + bw - 1, y + bh - 1]
    x1 = rng.uniform(0, width - 22, n_props - 1)
    y1 = rng.uniform(0, height - 22, n_props - 1)
    boxes[1:, 0] = x1
    boxes[1:, 1] = y1
    boxes[1:, 2] = np.minimum(x1 + rng.uniform(12, 40, n_props - 1),
                              width - 1)
    boxes[1:, 3] = np.minimum(y1 + rng.uniform(12, 40, n_props - 1),
                              height - 1)
    scores = rng.uniform(0, 1, (n_props, 1)).astype(np.float32)
    scores[0] = 0.9

    images, annotations = [], []
    prop_boxes, prop_scores, prop_ids = [], [], []
    for i in range(n_images):
        fname = 'im_{:04d}.png'.format(i)
        cv2.imwrite(os.path.join(img_dir, fname), im)
        images.append({'id': i + 1, 'file_name': fname,
                       'width': width, 'height': height})
        annotations.append({
            'id': i + 1, 'image_id': i + 1, 'category_id': 1,
            'bbox': [x, y, bw, bh], 'area': bw * bh, 'iscrowd': 0,
            'segmentation': [[x, y, x + bw - 1, y, x + bw - 1, y + bh - 1,
                              x, y + bh - 1]],
        })
        prop_boxes.append(boxes.copy())
        prop_scores.append(scores.copy())
        prop_ids.append(i + 1)

    ann_file = os.path.join(root, 'annotations.json')
    with open(ann_file, 'w') as f:
        json.dump({
            'images': images,
            'annotations': annotations,
            'categories': [{'id': i + 1, 'name': n}
                           for i, n in enumerate(CLASSES)],
        }, f)
    prop_file = os.path.join(root, 'proposals.pkl')
    with open(prop_file, 'wb') as f:
        pickle.dump({'boxes': prop_boxes, 'scores': prop_scores,
                     'ids': prop_ids}, f, 2)
    return {'image_dir': img_dir, 'ann_file': ann_file,
            'prop_file': prop_file, 'n_images': n_images}


def apply_tiny_webly_train_cfg(cfg, info, output_dir, dataset='synth_train'):
    """Minimal flagship-shaped webly TRAIN config over the synthetic
    fixture (shared by the engine-level knob tests; the canonical copy of
    the block that test_train.py pioneered). Mutates ``cfg`` in place —
    callers reset_cfg() around it and register ``dataset`` themselves or
    via this helper's return value."""
    from nafwebsod_tpu.data import catalog
    catalog.register_dataset(dataset, info['image_dir'], info['ann_file'])
    cfg.MODEL.NUM_CLASSES = len(CLASSES) + 1
    cfg.MODEL.TYPE = 'generalized_wsl'
    cfg.MODEL.CONV_BODY = 'VGG16.add_VGG16_conv5_body_origin'
    cfg.FAST_RCNN.ROI_BOX_HEAD = 'webly_heads.add_VGG16_roi_2fc_noise_head'
    cfg.FAST_RCNN.ROI_XFORM_RESOLUTION = 7
    cfg.TRAIN.DATASETS = (dataset,)
    cfg.TRAIN.PROPOSAL_FILES = (info['prop_file'],)
    cfg.TRAIN.SCALES = (64,)
    cfg.TRAIN.MAX_SIZE = 120
    cfg.TRAIN.BATCH_SIZE_PER_IM = 16
    cfg.TRAIN.USE_FLIPPED = False
    cfg.TRAIN.CROWD_FILTER_THRESH = 0.0
    cfg.TRAIN.FREEZE_CONV_BODY = True
    cfg.TRAIN.SNAPSHOT_ITERS = 2
    cfg.WSL.WSL_ON = True
    cfg.WSL.DILATION = 2
    cfg.WSL.USE_DISTORTION = False
    cfg.WSL.USE_CROP = False
    cfg.WEBLY.WEBLY_ON = True
    cfg.WEBLY.ENTROPY = True
    cfg.SOLVER.BASE_LR = 1e-5
    cfg.SOLVER.LR_POLICY = 'steps_with_decay'
    cfg.SOLVER.STEPS = [0]
    cfg.SOLVER.MAX_ITER = 4
    cfg.SOLVER.WARM_UP_ITERS = 0
    cfg.NUM_GPUS = 1
    cfg.DATA_LOADER.NUM_THREADS = 1
    cfg.TPU.HEAD_HIDDEN_DIM = 32
    cfg.TPU.ROI_PAD_MULTIPLE = 16
    cfg.TPU.SIZE_BUCKET_MULTIPLE = 32
    cfg.OUTPUT_DIR = output_dir
