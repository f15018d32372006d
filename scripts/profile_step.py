"""Capture a jax.profiler trace of the flagship train step and print the
top device ops by total time (no TensorBoard needed: parses the Chrome
trace JSON that XLA's profiler plugin writes).

Usage: python scripts/profile_step.py [outdir]
"""

import glob
import gzip
import json
import os
import sys
from collections import defaultdict

import jax
import jax.numpy as jnp

try:
    jax.config.update('jax_compilation_cache_dir',
                      os.path.expanduser('~/.cache/jax_comp_cache'))
    jax.config.update('jax_persistent_cache_min_compile_time_secs', 10)
except Exception:
    pass

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from nafwebsod_tpu.utils.env import apply_platform_override  # noqa: E402

apply_platform_override()

from __graft_entry__ import _example_inputs  # noqa: E402
from nafwebsod_tpu.models import detector  # noqa: E402
from nafwebsod_tpu.parallel import train_step as ts  # noqa: E402
from nafwebsod_tpu.solver import sgd  # noqa: E402

K = 20


def build():
    on_tpu = any(d.platform == 'tpu' for d in jax.devices())
    H = W = 704 if on_tpu else 128
    R, hidden = (2048, 4096) if on_tpu else (64, 64)
    spec = detector.ModelSpec(num_classes=21, compute_dtype='bfloat16',
                              hidden_dim=hidden)
    params = detector.init_params(spec, jax.random.PRNGKey(0))
    hp = sgd.SGDHyperParams(momentum=0.9, weight_decay=0.0005, iter_size=1)
    trainable = detector.trainable_param_names(spec, params)
    mults = sgd.freeze_mults(sgd.param_multipliers(params, trainable))
    opt_state = sgd.init_state(params, hp)
    image, rois, obn, valid, labels = _example_inputs(H=H, W=W, R=R, seed=0)
    stacked = ts.stack_minibatches(
        [{'data': image, 'rois': rois, 'obn_scores': obn,
          'valid_mask': valid, 'labels_oh': labels}], size_bucket=64)
    batch = {k: jnp.asarray(v[0]) for k, v in stacked.items()}

    @jax.jit
    def multi_step(params, opt_state, batch, rng):
        def one(carry, k):
            p, s = carry

            def loss_fn(pp):
                return detector.forward_train(
                    spec, pp, batch, jax.random.fold_in(rng, k))

            (loss, _), grads = jax.value_and_grad(loss_fn, has_aux=True)(p)
            p, s = sgd.update(p, grads, s, jnp.float32(1e-4), hp, mults)
            return (p, s), loss

        (p, s), losses = jax.lax.scan(one, (params, opt_state),
                                      jnp.arange(K))
        return p, s, losses

    return multi_step, params, opt_state, batch


def summarize(outdir):
    files = glob.glob(os.path.join(
        outdir, 'plugins', 'profile', '*', '*.trace.json.gz'))
    if not files:
        print('no trace files under', outdir)
        return
    path = max(files, key=os.path.getmtime)
    with gzip.open(path, 'rt') as f:
        trace = json.load(f)
    # device-side complete events: pid names containing 'TPU'/XLA op lanes
    pids_device = set()
    for ev in trace.get('traceEvents', []):
        if ev.get('ph') == 'M' and ev.get('name') == 'process_name':
            name = ev.get('args', {}).get('name', '')
            if 'TPU' in name or 'Device' in name or 'XLA Op' in name:
                pids_device.add(ev['pid'])
    by_op = defaultdict(float)
    total = 0.0
    for ev in trace.get('traceEvents', []):
        if ev.get('ph') != 'X' or ev.get('pid') not in pids_device:
            continue
        name = ev.get('name', '')
        dur = float(ev.get('dur', 0.0))  # microseconds
        by_op[name] += dur
        total += dur
    print('total device op-lane time: {:.1f} ms (all lanes summed)'
          .format(total / 1e3))
    for name, dur in sorted(by_op.items(), key=lambda kv: -kv[1])[:40]:
        print('{:9.2f} ms  {:5.1f}%  {}'.format(
            dur / 1e3, 100.0 * dur / max(total, 1e-9), name[:110]))


def main():
    outdir = sys.argv[1] if len(sys.argv) > 1 else '/tmp/step_profile'
    multi_step, params, opt_state, batch = build()
    rng = jax.random.key(2, impl='rbg')
    p, s, losses = multi_step(params, opt_state, batch, rng)
    float(losses[-1])  # compile + warm
    jax.profiler.start_trace(outdir)
    p, s, losses = multi_step(p, s, batch, rng)
    float(losses[-1])
    jax.profiler.stop_trace()
    summarize(outdir)


if __name__ == '__main__':
    main()
