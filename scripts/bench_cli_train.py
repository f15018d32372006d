#!/usr/bin/env python
"""Before/after CLI train wall-time for TPU.HOST_PREFETCH (VERDICT r4 #4).

Drives the REAL `tools/train_net.py` at the flagship operating point
(688-short-side, 2048 RoIs/image, 4096-d dual towers, bf16, HSV distort +
crop + bagging-mixup, TPU.STEPS_PER_CALL=8) on a synthetic 8-image fixture
dataset, once with inline window assembly (HOST_PREFETCH=0) and once with
the background assembly/upload thread (HOST_PREFETCH=1), and reports the
steady-state json_stats `time` per iteration for each.

Round-4 baseline (BASELINE.md): 0.58 s/iter WALL, host-bound (cv2 work
~0.5 s/window + tunnel dispatch; device ~26 ms/step). The overlap target
is wall/iter ~= max(host, device) rather than their sum.

Run SERIALLY on the tunnel chip (no concurrent CPU-heavy jobs).
Usage: python scripts/bench_cli_train.py [--iters 64] [--prefetch 0 1]
"""

import argparse
import json
import os
import shutil
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.join(REPO, 'tests'))

WORK = '/tmp/bench_cli_train'

CFG_TMPL = """\
MODEL:
  TYPE: generalized_wsl
  CONV_BODY: VGG16.add_VGG16_conv5_body_origin
  NUM_CLASSES: 4
WSL:
  WSL_ON: True
  DILATION: 2
  USE_DISTORTION: True
  USE_CROP: True
WEBLY:
  WEBLY_ON: True
  ENTROPY: True
FAST_RCNN:
  ROI_BOX_HEAD: webly_heads.add_VGG16_roi_2fc_noise_head
  ROI_XFORM_RESOLUTION: 7
TRAIN:
  DATASETS: ('flickr_voc',)
  PROPOSAL_FILES: ('{data}/flickr_voc/proposals.pkl',)
  SCALES: (688,)
  MAX_SIZE: 1200
  BATCH_SIZE_PER_IM: 2048
  USE_FLIPPED: True
  FREEZE_CONV_BODY: True
  SNAPSHOT_ITERS: 100000
SOLVER:
  BASE_LR: 0.00001
  LR_POLICY: steps_with_decay
  STEPS: [0]
  MAX_ITER: {iters}
  WARM_UP_ITERS: 0
NUM_GPUS: 1
DATA_LOADER:
  NUM_THREADS: 4
TPU:
  COMPUTE_DTYPE: bfloat16
  STEPS_PER_CALL: 8
OUTPUT_DIR: {out}
"""


def make_dataset():
    import fixtures
    data = os.path.join(WORK, 'data')
    d = os.path.join(data, 'flickr_voc')
    if os.path.isdir(os.path.join(d, 'images')):
        return data
    os.makedirs(d, exist_ok=True)
    # the fixture already writes the catalog layout (<d>/images +
    # <d>/annotations.json + <d>/proposals.pkl)
    fixtures.make_coco_dataset(d, n_images=8, width=640, height=480,
                               n_props=2048)
    return data


def run_one(data, iters, prefetch):
    """One train_net run; returns the final json_stats cumulative
    time-per-iter (span-adjusted, includes the first/compile window)."""
    out = os.path.join(WORK, 'out_p%d' % prefetch)
    shutil.rmtree(out, ignore_errors=True)
    cfg_path = os.path.join(WORK, 'cfg_p%d.yaml' % prefetch)
    with open(cfg_path, 'w') as f:
        f.write(CFG_TMPL.format(data=data, iters=iters, out=out))
    env = dict(os.environ, WEBSOD_DATA_DIR=data)
    proc = subprocess.run(
        [sys.executable, os.path.join(REPO, 'tools', 'train_net.py'),
         '--cfg', cfg_path, '--skip-test',
         'TPU.HOST_PREFETCH', str(prefetch)],
        capture_output=True, text=True, env=env, cwd=REPO, timeout=3600)
    if proc.returncode != 0:
        sys.stderr.write(proc.stdout[-4000:] + proc.stderr[-4000:])
        raise SystemExit('train_net failed (prefetch=%d)' % prefetch)
    pts = [json.loads(ln[len('json_stats: '):])
           for ln in proc.stdout.splitlines()
           if ln.startswith('json_stats: ')]
    if not pts:
        raise SystemExit('no json_stats lines (prefetch=%d)' % prefetch)
    return pts[-1]['time'], pts[-1]['iter'] + 1


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('--iters', type=int, nargs=2, default=[16, 64],
                    help='short and long run; the marginal rate between '
                         'them cancels compile/setup time. NOTE: both '
                         'runs must hit a WARM compile cache for the '
                         'cancellation to hold — on a fresh machine run '
                         'the script once to prime the cache and use the '
                         'second invocation\'s numbers')
    ap.add_argument('--prefetch', type=int, nargs='+', default=[0, 1])
    args = ap.parse_args()
    if args.iters[1] <= args.iters[0]:
        ap.error('--iters needs long > short')
    os.makedirs(WORK, exist_ok=True)
    data = make_dataset()
    results = {}
    for p in args.prefetch:
        t_short, n_short = run_one(data, args.iters[0], p)
        t_long, n_long = run_one(data, args.iters[1], p)
        # both runs pay the same (cached) compile + warmup inside their
        # cumulative averages; the marginal rate is the steady state
        steady = (t_long * n_long - t_short * n_short) / (n_long - n_short)
        results[p] = steady
        print('HOST_PREFETCH=%d: cumulative %.3f s/iter @%d, %.3f s/iter '
              '@%d -> steady %.3f s/iter'
              % (p, t_short, n_short, t_long, n_long, steady), flush=True)
    print(json.dumps({'steady_s_per_iter': results}))


if __name__ == '__main__':
    main()
