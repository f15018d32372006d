#!/usr/bin/env python
"""Plot learning curves from training logs.

Capability parity with ``tools/visualize_learn_voc.py`` /
``visualize_learn_coco.py``: parse the ``json_stats: {...}`` lines emitted by
the training loop (and any 'mAP'/'AP' eval lines) from one or more log files
and write loss/metric curves as a PNG.

Usage: python tools/visualize_learn.py log1.txt [log2.txt ...] [--out out.png]
"""

import argparse
import json
import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

JSON_RE = re.compile(r'json_stats: (\{.*\})')
MAP_RE = re.compile(r'(?:mAP|"mAP":)\s*[:=]?\s*([0-9.]+)')


def parse_log(path):
    stats = []
    maps = []
    with open(path) as f:
        for line in f:
            m = JSON_RE.search(line)
            if m:
                try:
                    stats.append(json.loads(m.group(1)))
                except ValueError:
                    pass
                continue
            m = MAP_RE.search(line)
            if m:
                maps.append(float(m.group(1)))
    return stats, maps


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument('logs', nargs='+')
    parser.add_argument('--out', default='learning_curves.png')
    parser.add_argument('--keys', default='loss,lr',
                        help='comma-separated json_stats keys to plot')
    args = parser.parse_args()

    import matplotlib
    matplotlib.use('Agg')
    import matplotlib.pyplot as plt

    keys = args.keys.split(',')
    fig, axes = plt.subplots(1, len(keys) + 1,
                             figsize=(5 * (len(keys) + 1), 4))
    for path in args.logs:
        stats, maps = parse_log(path)
        label = os.path.basename(path)
        iters = [s.get('iter', i) for i, s in enumerate(stats)]
        for ax, key in zip(axes, keys):
            vals = [s.get(key) for s in stats]
            ax.plot(iters, vals, label=label)
            ax.set_xlabel('iter')
            ax.set_title(key)
        if maps:
            axes[-1].plot(range(len(maps)), maps, marker='o', label=label)
            axes[-1].set_title('mAP')
    for ax in axes:
        ax.legend(fontsize=7)
        ax.grid(True, alpha=0.3)
    fig.tight_layout()
    fig.savefig(args.out, dpi=120)
    print('Wrote', args.out)


if __name__ == '__main__':
    main()
