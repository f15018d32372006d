#!/usr/bin/env python
"""Compare two weights pkls blob by blob.

Capability parity with ``tools/diff_net.py`` (reference :21-66): for every
shared non-momentum weight tensor print magnitude and difference statistics
(Frobenius norm, mean |diff|, mean relative diff, Pearson correlation).
Biases and BN params are skipped like the reference.

Usage: python tools/diff_net.py <a.pkl> <b.pkl>
"""

import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from nafwebsod_tpu.utils.io import load_object


def _blobs(path):
    data = load_object(path)
    return data['blobs'] if 'blobs' in data else data


def compare(blobs_a, blobs_b):
    """Yield (name, stats dict) over the comparable shared blobs."""
    for name in sorted(blobs_a):
        if ('momentum' in name or name.endswith('_b') or '_bn_' in name
                or name not in blobs_b):
            continue
        a = np.asarray(blobs_a[name], np.float64)
        b = np.asarray(blobs_b[name], np.float64)
        if a.shape != b.shape:
            yield name, {'shape_mismatch': (a.shape, b.shape)}
            continue
        d = a - b
        corr = (np.corrcoef(a.ravel(), b.ravel())[0, 1]
                if a.size > 1 else float('nan'))
        yield name, {
            'mean_abs_a': float(np.mean(np.abs(a))),
            'mean_abs_b': float(np.mean(np.abs(b))),
            'normF': float(np.linalg.norm(d)),
            'mean_abs_diff': float(np.mean(np.abs(d))),
            'mean_rel_diff': float(np.mean(np.abs(d) /
                                           np.maximum(np.abs(a), 1e-20))),
            'corr': float(corr),
        }


def main():
    if len(sys.argv) != 3:
        print('usage: diff_net.py <a.pkl> <b.pkl>')
        sys.exit(1)
    a, b = _blobs(sys.argv[1]), _blobs(sys.argv[2])
    print('a: {} blobs, b: {} blobs, shared: {}'.format(
        len(a), len(b), len(set(a) & set(b))))
    for name, stats in compare(a, b):
        print(name, ' '.join('{}={:.6g}'.format(k, v)
                             if not isinstance(v, tuple) else
                             '{}={}'.format(k, v)
                             for k, v in stats.items()))


if __name__ == '__main__':
    main()
