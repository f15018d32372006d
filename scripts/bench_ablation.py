"""Ablation bench: where do the flagship train-step milliseconds go?

Runs the same device-side scan-of-K step as bench.py, with one component
stubbed per variant:
  * baseline      — full step (same program as bench.py)
  * no_dropout    — heads._dropout -> identity (mask gen + select cost)
  * rbg_rng       — dropout keys use the 'rbg' PRNG impl (threefry cost)
  * no_transpose  — roi_transform flattens NHWC directly, skipping the
                    Caffe-order (R,7,7,512)->(R,512,7,7) shuffle
  * no_sgd        — solver update skipped (optimizer HBM traffic cost)
  * no_entropy    — spatial-entropy weights replaced by ones

Numbers are device step times; numerics of the stubs differ, timing only.
Usage: python scripts/bench_ablation.py [variant ...] (default: all)
"""

import os
import sys
import time

import numpy as np

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
from nafwebsod_tpu.models import heads  # noqa: E402
from nafwebsod_tpu.solver import sgd  # noqa: E402

K = 20


def time_step(spec, params, opt_state, hp, mults, batch, rng, *,
              skip_sgd=False):
    from nafwebsod_tpu.models import detector as det_mod
    from nafwebsod_tpu.solver import sgd as sgd_mod

    @jax.jit
    def multi_step(params, opt_state, batch, rng):
        def one(carry, k):
            p, s = carry

            def loss_fn(pp):
                return det_mod.forward_train(
                    spec, pp, batch, jax.random.fold_in(rng, k))

            (loss, _), grads = jax.value_and_grad(loss_fn, has_aux=True)(p)
            if skip_sgd:
                # keep grads live (consume into the carry cheaply)
                p = jax.tree.map(
                    lambda a, g: a + 0.0 * jnp.mean(g).astype(a.dtype),
                    p, grads)
            else:
                p, s = sgd_mod.update(p, grads, s, jnp.float32(1e-4), hp,
                                      mults)
            return (p, s), loss

        (p, s), losses = jax.lax.scan(one, (params, opt_state),
                                      jnp.arange(K))
        return p, s, losses

    p, s, losses = multi_step(params, opt_state, batch, rng)
    float(losses[-1])
    t0 = time.perf_counter()
    p, s, losses = multi_step(p, s, batch, rng)
    float(losses[-1])
    dt = time.perf_counter() - t0
    return dt / K


def main():
    want = sys.argv[1:] or ['baseline', 'no_dropout', 'rbg_rng',
                            'no_transpose', 'no_sgd', 'no_entropy']
    on_tpu = any(d.platform == 'tpu' for d in jax.devices())
    if on_tpu:
        H = W = 704
        R, hidden = 2048, 4096
    else:
        H = W = 128
        R, hidden = 64, 64

    spec = detector.ModelSpec(num_classes=21, compute_dtype='bfloat16',
                              hidden_dim=hidden)
    params = detector.init_params(spec, jax.random.PRNGKey(0))
    hp = sgd.SGDHyperParams(momentum=0.9, weight_decay=0.0005, iter_size=1)
    trainable = detector.trainable_param_names(spec, params)
    mults = sgd.freeze_mults(sgd.param_multipliers(params, trainable))
    opt_state = sgd.init_state(params, hp)

    from nafwebsod_tpu.parallel import train_step as ts
    image, rois, obn, valid, labels = _example_inputs(H=H, W=W, R=R, seed=0)
    stacked = ts.stack_minibatches(
        [{'data': image, 'rois': rois, 'obn_scores': obn,
          'valid_mask': valid, 'labels_oh': labels}], size_bucket=64)
    batch = {k: jnp.asarray(v[0]) for k, v in stacked.items()}

    orig_dropout = heads._dropout
    orig_roi_transform = heads.roi_transform

    results = {}
    for variant in want:
        heads._dropout = orig_dropout
        heads.roi_transform = orig_roi_transform
        # forward_train is itself jitted: clear its trace cache so
        # monkeypatched variants with identical avals actually retrace
        # (otherwise same-key-dtype variants silently reuse the previous
        # variant's trace and measure the wrong program)
        jax.clear_caches()
        rng = jax.random.PRNGKey(2)
        skip_sgd = False
        vspec = spec

        if variant == 'no_dropout':
            heads._dropout = lambda x, rate, rng, train: x
        elif variant == 'rbg_rng':
            rng = jax.random.key(2, impl='rbg')
        elif variant == 'rbg_no_dropout':
            heads._dropout = lambda x, rate, rng, train: x
            rng = jax.random.key(2, impl='rbg')
        elif variant == 'const_mask':
            def _cm(x, rate, rng, train):
                if not train or rate <= 0 or rng is None:
                    return x
                idx = jax.lax.broadcasted_iota(jnp.int32, x.shape,
                                               x.ndim - 1)
                return jnp.where((idx % 2) == 0, x / (1.0 - rate), 0.0)
            heads._dropout = _cm
        elif variant == 'no_transpose':
            def _rt(feat, rois, obn_scores, spatial_scale, *args, **kw):
                flatten = kw.pop('flatten', args[4] if len(args) > 4
                                 else True)
                names = ('method', 'resolution', 'sampling_ratio',
                         'freeze_body')
                for n, v in zip(names, args[:4]):
                    kw[n] = v
                pooled = orig_roi_transform(feat, rois, obn_scores,
                                            spatial_scale, flatten=False,
                                            **kw)
                if flatten:
                    return pooled.reshape(pooled.shape[0], -1)
                return pooled
            heads.roi_transform = _rt
        elif variant == 'no_sgd':
            skip_sgd = True
        elif variant == 'no_entropy':
            from dataclasses import replace
            vspec = replace(spec, webly_entropy=False)

        dt = time_step(vspec, params, opt_state, hp, mults, batch, rng,
                       skip_sgd=skip_sgd)
        results[variant] = dt * 1e3
        print('{:>14s}: {:7.2f} ms/step'.format(variant, dt * 1e3),
              flush=True)

    heads._dropout = orig_dropout
    heads.roi_transform = orig_roi_transform
    if 'baseline' in results:
        base = results['baseline']
        for k, v in results.items():
            if k != 'baseline':
                print('{:>14s}: {:+6.2f} ms vs baseline'.format(k, v - base))


if __name__ == '__main__':
    main()
