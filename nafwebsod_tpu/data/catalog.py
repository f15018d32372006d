"""Dataset catalog: name -> {image dir, annotation json, devkit dir}.

Capability parity with ``detectron/datasets/dataset_catalog.py`` including the
webly datasets (flickr_voc / flickr_clean / flickr_coco, ref :237-260) and the
VOC/COCO entries. The data root defaults to ``<repo>/datasets/data`` and can
be overridden with the WEBSOD_DATA_DIR environment variable.
"""

import os

_IM_DIR = 'image_directory'
_ANN_FN = 'annotation_file'
_DEVKIT_DIR = 'devkit_directory'


def get_data_dir():
    return os.environ.get(
        'WEBSOD_DATA_DIR',
        os.path.join(os.path.dirname(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__)))), 'datasets', 'data'))


def _catalog():
    d = get_data_dir()
    cat = {}
    for year in ('2007', '2012'):
        for split in ('train', 'val', 'trainval', 'test'):
            cat['voc_{}_{}'.format(year, split)] = {
                _IM_DIR: os.path.join(d, 'VOC' + year, 'JPEGImages'),
                _ANN_FN: os.path.join(
                    d, 'VOC' + year, 'annotations',
                    'voc_{}_{}.json'.format(year, split)),
                _DEVKIT_DIR: os.path.join(d, 'VOC' + year, 'VOCdevkit' + year),
            }
    # webly (Flickr) training sets with VOC / COCO label spaces
    for name, img_dir in (
        ('flickr_voc', 'flickr_voc'),
        ('flickr_clean', 'flickr_clean'),
        ('flickr_coco', 'flickr_coco'),
    ):
        cat[name] = {
            _IM_DIR: os.path.join(d, img_dir, 'images'),
            _ANN_FN: os.path.join(d, img_dir, 'annotations.json'),
            _DEVKIT_DIR: os.path.join(d, img_dir, 'devkit'),
        }
    # cityscapes (COCO-converted jsons, ref dataset_catalog.py cityscapes
    # entries; produced by tools/convert_cityscapes_to_coco.py upstream)
    for split in ('train', 'val', 'test'):
        cat['cityscapes_fine_instanceonly_seg_' + split] = {
            _IM_DIR: os.path.join(d, 'cityscapes', 'images'),
            _ANN_FN: os.path.join(
                d, 'cityscapes', 'annotations',
                'instancesonly_filtered_gtFine_{}.json'.format(split)),
        }
    for split in ('train2014', 'val2014', 'minival2014', 'valminusminival2014'):
        cat['coco_2014_' + split.replace('2014', '')] = {
            _IM_DIR: os.path.join(d, 'coco', split.replace('minival', 'val')
                                  .replace('valminusval', 'val')),
            _ANN_FN: os.path.join(d, 'coco', 'annotations',
                                  'instances_{}.json'.format(split)),
        }
    return cat


# Registry for tests / user datasets registered at runtime
_EXTRA = {}


def register_dataset(name, image_directory, annotation_file,
                     devkit_directory=None):
    _EXTRA[name] = {
        _IM_DIR: image_directory,
        _ANN_FN: annotation_file,
        _DEVKIT_DIR: devkit_directory,
    }


def _lookup(name):
    if name in _EXTRA:
        return _EXTRA[name]
    cat = _catalog()
    if name not in cat:
        raise KeyError('Unknown dataset name: {}'.format(name))
    return cat[name]


def get_im_dir(name):
    return _lookup(name)[_IM_DIR]


def get_ann_fn(name):
    return _lookup(name)[_ANN_FN]


def get_devkit_dir(name):
    return _lookup(name)[_DEVKIT_DIR]
