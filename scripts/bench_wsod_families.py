"""Device-side train-step times for every WSOD family at flagship shapes.

Variants: webly (the flagship noise-aware dual tower), wsl (plain WSDDN),
oicr / cmil (RoILabel/RoIMerge refinement ladders), pcl_device (on-device
pseudo-labeling), pcl_host (reference-faithful callback — UNIMPLEMENTED on
remote-attached TPU runtimes like axon PJRT, kept to document that), and
infer (the forward_test inference step).

Usage: python scripts/bench_wsod_families.py [variant ...]
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
from nafwebsod_tpu.parallel import train_step as ts  # noqa: E402
from nafwebsod_tpu.solver import sgd  # noqa: E402

K = 10


def main():
    want = sys.argv[1:] or ['webly', 'wsl', 'oicr', 'cmil',
                             'pcl_device', 'infer']
    on_tpu = any(d.platform == 'tpu' for d in jax.devices())
    H = W = 704 if on_tpu else 96
    R, hidden = (2048, 4096) if on_tpu else (32, 32)

    def blob(seed):
        image, rois, obn, valid, labels = _example_inputs(
            H=H, W=W, R=R, num_classes=21, seed=seed)
        return {'data': image, 'rois': rois, 'obn_scores': obn,
                'valid_mask': valid, 'labels_oh': labels}

    # ONE batch PER SCAN STEP (K distinct): a constant scan batch lets XLA
    # hoist the frozen conv body + pool out of the loop and overstate
    # frozen-body variants by ~3.5 ms/step (round-4 finding, BASELINE.md)
    per_step = [ts.stack_minibatches([blob(seed)], size_bucket=64)
                for seed in range(K)]
    batches = {k: jnp.asarray(np.stack([b[k][0] for b in per_step]))
               for k in per_step[0]}
    batch = {k: v[0] for k, v in batches.items()}  # eval variant: 1 image

    base = dict(num_classes=21, compute_dtype='bfloat16',
                hidden_dim=hidden)
    single = dict(webly_on=False, webly_entropy=False,
                  box_head='vgg16_2fc')
    variants = {
        'webly': {},
        'wsl': dict(single),
        'oicr': dict(single, oicr=True),
        'cmil': dict(single, cmil=True),
        'pcl_device': dict(single, pcl=True, pcl_device=True),
        'pcl_host': dict(single, pcl=True),
        'context': dict(single, box_head='vgg16_context_2fc'),
        'center': dict(single, center_loss=True),
        'min_entropy': dict(single, min_entropy_loss=True),
        # cpg_tau=0 keeps every gt-class CPG seed active (random-init preds
        # never pass the real 0.7 gate after the cpg_op.cu:149-166 parity
        # seed-gating) — 'csc' forces 4 gt classes = the all-4-seeds
        # worst case (the default _example_inputs labels carry at most 2,
        # so pre-round-5 'csc' numbers were really the 2-seed regime);
        # 'csc2' the typical 2-gt-class regime (seed cond-gating active)
        'csc': dict(single, csc=True, cpg_tau=0.0),
        'csc2': dict(single, csc=True, cpg_tau=0.0),
        'seg': dict(single, mask_on=True, mask_head='fcn',
                    mask_resolution=7, mask_dim_reduced=256),
        # the deeplab branch runs CPG saliency + the permutohedral
        # DenseCRF consistency pass in-graph (ops/seg.dense_crf)
        'deeplab': dict(single, mask_on=True, mask_head='deeplab'),
        'infer': {},
    }
    full_batches = batches
    for variant in want:
        spec = detector.ModelSpec(**base, **variants[variant])
        batches = full_batches
        if variant in ('csc', 'csc2'):
            n_gt = 4 if variant == 'csc' else 2
            lab = np.zeros((K, 1, 20), np.float32)
            lab[:, 0, [3, 11, 7, 15][:n_gt]] = 1.0
            batches = dict(full_batches, labels_oh=jnp.asarray(lab))
        params = detector.init_params(spec, jax.random.PRNGKey(0))
        hp = sgd.SGDHyperParams(momentum=0.9, weight_decay=0.0005,
                                iter_size=1)
        mults = sgd.freeze_mults(sgd.param_multipliers(
            params, detector.trainable_param_names(spec, params)))
        opt_state = sgd.init_state(params, hp)

        # device variant is jit-pure: measure device-side throughput with
        # the same scan-of-K formulation as bench.py. The host variant
        # keeps per-call steps (a callback serializes a scan window anyway
        # — and remote-attached runtimes like axon_pjrt do not implement
        # host callbacks AT ALL, so it may simply fail there).
        @jax.jit
        def multi_step(params, opt_state, batches, rng):
            def one(carry, xs):
                p, s = carry
                b, k = xs

                def loss_fn(pp):
                    return detector.forward_train(
                        spec, pp, b, jax.random.fold_in(rng, k))

                (loss, _), grads = jax.value_and_grad(
                    loss_fn, has_aux=True)(p)
                p, s = sgd.update(p, grads, s, jnp.float32(1e-4), hp, mults)
                return (p, s), loss

            (p, s), losses = jax.lax.scan(one, (params, opt_state),
                                          (batches, jnp.arange(K)))
            return p, s, losses

        if variant == 'infer':
            @jax.jit
            def multi_infer(params, batch):
                def one(carry, k):
                    # batch['image'] is already rank 4 (1, H, W, 3)
                    out = detector.forward_test(
                        spec, params, batch['image'] * 0 + carry,
                        batch['rois'], batch['obn_scores'],
                        batch['valid_mask'])
                    return jnp.mean(out['scores']), out['scores'][0, 0]
                return jax.lax.scan(one, jnp.float32(0), jnp.arange(K))[1]

            r0 = multi_infer(params, batch)
            float(r0[-1])
            t0 = time.perf_counter()
            r0 = multi_infer(params, batch)
            float(r0[-1])
            dt = (time.perf_counter() - t0) / K
            print('wsod[{:10s}]: {:7.2f} ms/step'.format(variant, dt * 1e3),
                  flush=True)
            continue

        rng = jax.random.key(2, impl='rbg')
        try:
            p, s, losses = multi_step(params, opt_state, batches, rng)
            float(losses[-1])
        except Exception as e:
            print('wsod[{:10s}]: FAILED ({})'.format(
                variant, str(e).splitlines()[0][:100]), flush=True)
            continue
        t0 = time.perf_counter()
        p, s, losses = multi_step(p, s, batches, rng)
        float(losses[-1])
        dt = (time.perf_counter() - t0) / K
        print('wsod[{:10s}]: {:7.2f} ms/step'.format(variant, dt * 1e3),
              flush=True)


if __name__ == '__main__':
    main()
