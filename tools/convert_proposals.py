#!/usr/bin/env python
"""Convert MCG / selective-search proposals into the framework's proposal
pkl format ({boxes, scores, indexes/ids}).

Capability parity with ``tools/convert_mcg.py`` and
``tools/convert_selective_search.py``: MCG .mat files hold 1-indexed
(y1, x1, y2, x2) 'bboxes' + 'bboxes_scores' per image; selective-search
holds a single 'boxes' cell array. Usage:

    python tools/convert_proposals.py mcg <dataset> <mat_dir> <out.pkl>
    python tools/convert_proposals.py selective_search <dataset> <in.mat> <out.pkl>
"""

import os
import pickle
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def convert_mcg(dataset_name, dir_in, file_out):
    import scipy.io as sio
    from nafwebsod_tpu.data.json_dataset import JsonDataset

    roidb = JsonDataset(dataset_name).get_roidb()
    boxes, scores, ids = [], [], []
    for i, entry in enumerate(roidb):
        if i % 1000 == 0:
            print('{}/{}'.format(i + 1, len(roidb)))
        index = os.path.splitext(os.path.basename(entry['image']))[0]
        mat = sio.loadmat(os.path.join(dir_in, '{}.mat'.format(index)))
        # MCG website boxes are 1-indexed (y1, x1, y2, x2)
        b = mat['bboxes'].astype(np.uint16) - 1
        boxes.append(b[:, (1, 0, 3, 2)].astype(np.uint16))
        scores.append(mat['bboxes_scores'].astype(np.float32))
        ids.append(entry['id'])
    with open(file_out, 'wb') as f:
        pickle.dump(dict(boxes=boxes, scores=scores, indexes=ids), f,
                    pickle.HIGHEST_PROTOCOL)


def convert_selective_search(dataset_name, file_in, file_out):
    import scipy.io as sio
    from nafwebsod_tpu.data.json_dataset import JsonDataset

    roidb = JsonDataset(dataset_name).get_roidb()
    raw = sio.loadmat(file_in)['boxes'].ravel()
    boxes, scores, ids = [], [], []
    for i, entry in enumerate(roidb):
        if i % 1000 == 0:
            print('{}/{}'.format(i + 1, len(roidb)))
        # selective search boxes are 1-indexed (y1, x1, y2, x2)
        b = raw[i][:, (1, 0, 3, 2)] - 1
        boxes.append(b.astype(np.uint16))
        # the reference writes ZERO scores for selective search
        # (convert_selective_search.py:54) — with the WSL obn+1
        # offset that means weight 1.0 per proposal, not 2.0
        scores.append(np.zeros((b.shape[0], 1), np.float32))
        ids.append(entry['id'])
    with open(file_out, 'wb') as f:
        pickle.dump(dict(boxes=boxes, scores=scores, indexes=ids), f,
                    pickle.HIGHEST_PROTOCOL)


if __name__ == '__main__':
    kind = sys.argv[1]
    if kind == 'mcg':
        convert_mcg(sys.argv[2], sys.argv[3], sys.argv[4])
    elif kind == 'selective_search':
        convert_selective_search(sys.argv[2], sys.argv[3], sys.argv[4])
    else:
        raise SystemExit('unknown proposal kind: ' + kind)
