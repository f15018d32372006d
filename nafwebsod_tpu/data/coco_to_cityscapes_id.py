"""Class-id remapping between COCO and the COCO-converted cityscapes jsons.

Capability parity with ``detectron/datasets/coco_to_cityscapes_id.py:38-95``:
each function maps a cityscapes category id (1-8 in the converted json
ordering bicycle/car/person/train/truck/motorcycle/bus/rider, 0=background)
to the COCO category id whose classifier weights should seed it, or -1 for
random init.
"""

# cityscapes id -> coco id (-1 = random init)
_BASE = {0: 0, 1: 2, 2: 3, 3: 1, 4: 7, 5: 8, 6: 4, 7: 6}


def cityscapes_to_coco(cityscapes_id):
    """rider has no COCO twin -> random init."""
    return {**_BASE, 8: -1}[cityscapes_id]


def cityscapes_to_coco_with_rider(cityscapes_id):
    """rider seeds from COCO 'person'."""
    return {**_BASE, 8: 1}[cityscapes_id]


def cityscapes_to_coco_without_person_rider(cityscapes_id):
    """person AND rider both random-init."""
    return {**_BASE, 3: -1, 8: -1}[cityscapes_id]


def cityscapes_to_coco_all_random(cityscapes_id):
    """every class random-init (ablation)."""
    return -1
