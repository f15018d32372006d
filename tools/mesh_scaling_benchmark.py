#!/usr/bin/env python
"""Measure the data-parallel train step across virtual-mesh sizes.

Multi-chip hardware is not reachable from this rig, so this validates the
SHAPE of the scaling on a forced-CPU virtual mesh: all devices share the
host cores, so wall-clock cannot improve with N — what the curve shows is
whether per-image cost stays ~flat as devices are added (the psum-coupled
step parallelizes) or grows superlinearly (collectives serializing the
step). Run it as:

  XLA_FLAGS=--xla_force_host_platform_device_count=8 JAX_PLATFORMS=cpu \
      python tools/mesh_scaling_benchmark.py

Prints one JSON line per mesh size.
"""

import json
import os
import sys
import time

# force the virtual CPU mesh before jax initializes (conftest recipe)
import re as _re
flags = os.environ.get('XLA_FLAGS', '')
# REPLACE any existing count (__graft_entry__.py pattern): a pre-existing
# smaller count would crash the 4- and 8-device legs mid-run
flags = _re.sub(r'--xla_force_host_platform_device_count=\d+', '', flags)
os.environ['XLA_FLAGS'] = (
    flags + ' --xla_force_host_platform_device_count=8').strip()
os.environ['JAX_PLATFORMS'] = 'cpu'

import numpy as np  # noqa: E402
import jax  # noqa: E402

jax.config.update('jax_platforms', 'cpu')

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from __graft_entry__ import _example_inputs  # noqa: E402
from nafwebsod_tpu.models import detector  # noqa: E402
from nafwebsod_tpu.parallel import mesh as mesh_lib  # noqa: E402
from nafwebsod_tpu.parallel import train_step as ts  # noqa: E402
from nafwebsod_tpu.solver import sgd  # noqa: E402


def bench_mesh(n_dev, iters=4, warmup=2, H=96, W=96, R=64, hidden=64):
    spec = detector.ModelSpec(num_classes=21, hidden_dim=hidden)
    params = detector.init_params(spec, jax.random.PRNGKey(0))
    hp = sgd.SGDHyperParams(momentum=0.9, weight_decay=0.0005, iter_size=1)
    mults = sgd.freeze_mults(sgd.param_multipliers(
        params, detector.trainable_param_names(spec, params)))
    opt_state = sgd.init_state(params, hp)
    mesh = mesh_lib.make_mesh(n_dev)
    step = ts.make_train_step(spec, hp, mults, mesh, donate=False)
    blobs = []
    for i in range(n_dev):
        image, rois, obn, valid, labels = _example_inputs(
            H=H, W=W, R=R, seed=i)
        blobs.append({'data': image, 'rois': rois, 'obn_scores': obn,
                      'valid_mask': valid, 'labels_oh': labels})
    batch = ts.stack_minibatches(blobs, size_bucket=32)
    rngs = ts.device_rngs(jax.random.PRNGKey(1), n_dev)
    lr = np.float32(1e-4)
    for _ in range(warmup):
        params, opt_state, loss, _ = step(params, opt_state, batch, lr, rngs)
    float(loss)
    t0 = time.perf_counter()
    for _ in range(iters):
        params, opt_state, loss, _ = step(params, opt_state, batch, lr, rngs)
    float(loss)
    dt = (time.perf_counter() - t0) / iters
    return dt


def main():
    sizes = [1, 2, 4, 8]
    base = None
    for n in sizes:
        dt = bench_mesh(n)
        per_im = dt / n
        if base is None:
            base = per_im
        print(json.dumps({
            'devices': n,
            'sec_per_step': round(dt, 4),
            'sec_per_image': round(per_im, 4),
            'per_image_vs_1dev': round(per_im / base, 3),
        }))


if __name__ == '__main__':
    main()
