"""Stand-in datasets exposing only class-name tables, for demos that must
label detections without a dataset on disk.

Capability parity with ``detectron/datasets/dummy_datasets.py:28-54`` (the
COCO table feeding ``tools/infer_simple.py``), extended with the VOC table so
the 21-class WSL configs label correctly too. The name lists are the standard
published dataset category orderings.
"""

from nafwebsod_tpu.utils.collections import AttrDict

COCO_CLASSES = (
    '__background__', 'person', 'bicycle', 'car', 'motorcycle', 'airplane',
    'bus', 'train', 'truck', 'boat', 'traffic light', 'fire hydrant',
    'stop sign', 'parking meter', 'bench', 'bird', 'cat', 'dog', 'horse',
    'sheep', 'cow', 'elephant', 'bear', 'zebra', 'giraffe', 'backpack',
    'umbrella', 'handbag', 'tie', 'suitcase', 'frisbee', 'skis', 'snowboard',
    'sports ball', 'kite', 'baseball bat', 'baseball glove', 'skateboard',
    'surfboard', 'tennis racket', 'bottle', 'wine glass', 'cup', 'fork',
    'knife', 'spoon', 'bowl', 'banana', 'apple', 'sandwich', 'orange',
    'broccoli', 'carrot', 'hot dog', 'pizza', 'donut', 'cake', 'chair',
    'couch', 'potted plant', 'bed', 'dining table', 'toilet', 'tv', 'laptop',
    'mouse', 'remote', 'keyboard', 'cell phone', 'microwave', 'oven',
    'toaster', 'sink', 'refrigerator', 'book', 'clock', 'vase', 'scissors',
    'teddy bear', 'hair drier', 'toothbrush')

VOC_CLASSES = (
    '__background__', 'aeroplane', 'bicycle', 'bird', 'boat', 'bottle',
    'bus', 'car', 'cat', 'chair', 'cow', 'diningtable', 'dog', 'horse',
    'motorbike', 'person', 'pottedplant', 'sheep', 'sofa', 'train',
    'tvmonitor')


def get_coco_dataset():
    """Dummy COCO dataset carrying only ``classes`` (id -> name)."""
    ds = AttrDict()
    ds.classes = dict(enumerate(COCO_CLASSES))
    return ds


def get_voc_dataset():
    """Dummy PASCAL VOC dataset carrying only ``classes`` (id -> name)."""
    ds = AttrDict()
    ds.classes = dict(enumerate(VOC_CLASSES))
    return ds


def classes_for_num(num_classes):
    """Best-effort class-name list for a NUM_CLASSES value: 81 -> COCO,
    21 -> VOC, anything else -> numeric labels."""
    if num_classes == len(COCO_CLASSES):
        return list(COCO_CLASSES)
    if num_classes == len(VOC_CLASSES):
        return list(VOC_CLASSES)
    return [str(i) for i in range(num_classes)]
