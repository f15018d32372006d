"""Capture a jax.profiler trace of ONE WSOD family's train step (the
variants of scripts/bench_wsod_families.py) and print the top device ops.

Unlike scripts/profile_step.py (flagship, constant batch), this feeds a
DIFFERENT batch per scan step so loop-invariant hoisting of the frozen
conv body / pools cannot hide them (round-4 finding, BASELINE.md).

Usage: python scripts/profile_family.py <variant> [outdir]
  e.g.: python scripts/profile_family.py context /tmp/ctx_profile
"""

import os
import sys

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
from nafwebsod_tpu.parallel import train_step as ts  # noqa: E402
from nafwebsod_tpu.solver import sgd  # noqa: E402
from profile_step import summarize  # noqa: E402  (same trace parser)

K = 10

VARIANTS = {
    'webly': {},
    'wsl': dict(webly_on=False, webly_entropy=False, box_head='vgg16_2fc'),
    'context': dict(webly_on=False, webly_entropy=False,
                    box_head='vgg16_context_2fc'),
    'oicr': dict(webly_on=False, webly_entropy=False, box_head='vgg16_2fc',
                 oicr=True),
    'cmil': dict(webly_on=False, webly_entropy=False, box_head='vgg16_2fc',
                 cmil=True),
    'csc2': dict(webly_on=False, webly_entropy=False, box_head='vgg16_2fc',
                 csc=True, cpg_tau=0.0),
    'seg': dict(webly_on=False, webly_entropy=False, box_head='vgg16_2fc',
                mask_on=True, mask_head='fcn', mask_resolution=7,
                mask_dim_reduced=256),
    # ASPP head + CPG saliency + the in-graph permutohedral DenseCRF
    'deeplab': dict(webly_on=False, webly_entropy=False,
                    box_head='vgg16_2fc', mask_on=True,
                    mask_head='deeplab'),
}


def main():
    variant = sys.argv[1] if len(sys.argv) > 1 else 'context'
    outdir = sys.argv[2] if len(sys.argv) > 2 else '/tmp/family_profile'
    on_tpu = any(d.platform == 'tpu' for d in jax.devices())
    H = W = 704 if on_tpu else 128
    R, hidden = (2048, 4096) if on_tpu else (64, 64)
    spec = detector.ModelSpec(num_classes=21, compute_dtype='bfloat16',
                              hidden_dim=hidden, **VARIANTS[variant])
    params = detector.init_params(spec, jax.random.PRNGKey(0))
    hp = sgd.SGDHyperParams(momentum=0.9, weight_decay=0.0005, iter_size=1)
    trainable = detector.trainable_param_names(spec, params)
    mults = sgd.freeze_mults(sgd.param_multipliers(params, trainable))
    opt_state = sgd.init_state(params, hp)

    def blob(seed):
        image, rois, obn, valid, labels = _example_inputs(
            H=H, W=W, R=R, num_classes=21, seed=seed)
        if variant == 'csc2':
            labels = np.zeros_like(labels)
            labels[0, 3] = 1.0
            labels[0, 11] = 1.0
        return {'data': image, 'rois': rois, 'obn_scores': obn,
                'valid_mask': valid, 'labels_oh': labels}

    per_step = [ts.stack_minibatches([blob(seed)], size_bucket=64)
                for seed in range(K)]
    batches = {k: jnp.asarray(np.stack([b[k][0] for b in per_step]))
               for k in per_step[0]}

    @jax.jit
    def multi_step(params, opt_state, batches, rng):
        def one(carry, xs):
            p, s = carry
            b, k = xs

            def loss_fn(pp):
                return detector.forward_train(
                    spec, pp, b, jax.random.fold_in(rng, k))

            (loss, _), grads = jax.value_and_grad(loss_fn, has_aux=True)(p)
            p, s = sgd.update(p, grads, s, jnp.float32(1e-4), hp, mults)
            return (p, s), loss

        (p, s), losses = jax.lax.scan(one, (params, opt_state),
                                      (batches, jnp.arange(K)))
        return p, s, losses

    rng = jax.random.key(2, impl='rbg')
    p, s, losses = multi_step(params, opt_state, batches, rng)
    print('warm loss', float(losses[-1]))
    import time
    t0 = time.time()
    p2, s2, losses = multi_step(p, s, batches, rng)
    float(losses[-1])
    print('window: {:.1f} ms/step'.format((time.time() - t0) * 1e3 / K))
    jax.profiler.start_trace(outdir)
    p2, s2, losses = multi_step(p2, s2, batches, rng)
    float(losses[-1])
    jax.profiler.stop_trace()
    summarize(outdir)


if __name__ == '__main__':
    main()
