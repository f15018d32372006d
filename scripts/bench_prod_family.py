"""Family train-step times through the PRODUCTION scan driver.

Unlike scripts/bench_wsod_families.py (which calls forward_train directly
in its own scan), this drives ``ts.make_multi_train_step`` — the exact
lax.scan window the train loop executes (fused pytree-psum all-reduce,
stacked (K, n_dev, ...) batches, per-step rng rows). It exists to pin the
production/benchmark gap found when vmap over the B==1 device axis turned
forward_train's data-dependent lax.cond skips into both-branch select_n
(the CPG per-seed gating in particular): the family bench measured the
gated fast path while production silently paid every seed. With the B==1
direct-call specialization (parallel/train_step._vmap_forward_train) the
two drivers should agree to within tunnel variance.

Usage: python scripts/bench_prod_family.py [variant ...]
Variants: webly (flagship), wsl, oicr, cmil, context, csc (4-gt worst
case), csc2 (2-gt regime), seg, pcl_device.
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
from nafwebsod_tpu.parallel import mesh as mesh_lib  # noqa: E402
from nafwebsod_tpu.parallel import train_step as ts  # noqa: E402
from nafwebsod_tpu.solver import sgd  # noqa: E402

K = 10
WINDOWS = 3  # best-of-3 chained windows (tunnel variance, BASELINE.md)


def main():
    want = sys.argv[1:] or ['webly', 'csc2', 'csc']
    on_tpu = any(d.platform == 'tpu' for d in jax.devices())
    H = W = 704 if on_tpu else 96
    R, hidden = (2048, 4096) if on_tpu else (32, 32)

    def blob(seed):
        image, rois, obn, valid, labels = _example_inputs(
            H=H, W=W, R=R, num_classes=21, seed=seed)
        return {'data': image, 'rois': rois, 'obn_scores': obn,
                'valid_mask': valid, 'labels_oh': labels}

    # one DISTINCT batch per scan step (constant batches let XLA hoist the
    # frozen body out of the loop — round-4 finding, BASELINE.md)
    per_step = [ts.stack_minibatches([blob(seed)], size_bucket=64)
                for seed in range(K)]
    batches_full = {k: jnp.asarray(np.stack([b[k] for b in per_step]))
                    for k in per_step[0]}

    base = dict(num_classes=21, compute_dtype='bfloat16', hidden_dim=hidden)
    single = dict(webly_on=False, webly_entropy=False, box_head='vgg16_2fc')
    variants = {
        'webly': {},
        'wsl': dict(single),
        'oicr': dict(single, oicr=True),
        'cmil': dict(single, cmil=True),
        'context': dict(single, box_head='vgg16_context_2fc'),
        'csc': dict(single, csc=True, cpg_tau=0.0),
        'csc2': dict(single, csc=True, cpg_tau=0.0),
        'seg': dict(single, mask_on=True, mask_head='fcn',
                    mask_resolution=7, mask_dim_reduced=256),
        'pcl_device': dict(single, pcl=True, pcl_device=True),
    }

    mesh = mesh_lib.make_mesh(1)
    for variant in want:
        spec = detector.ModelSpec(**base, **variants[variant])
        batches = batches_full
        if variant in ('csc', 'csc2'):
            n_gt = 4 if variant == 'csc' else 2
            # leaf layout (K, n_dev=1, per-image (1, 20))
            lab = np.zeros((K, 1, 1, 20), np.float32)
            lab[:, :, 0, [3, 11, 7, 15][:n_gt]] = 1.0
            batches = dict(batches_full, labels_oh=jnp.asarray(lab))
        params = detector.init_params(spec, jax.random.PRNGKey(0))
        hp = sgd.SGDHyperParams(momentum=0.9, weight_decay=0.0005,
                                iter_size=1)
        mults = sgd.freeze_mults(sgd.param_multipliers(
            params, detector.trainable_param_names(spec, params)))
        opt_state = sgd.init_state(params, hp)
        multi = ts.make_multi_train_step(spec, hp, mults, mesh,
                                         donate=False, apply_factors=False)
        lrs = jnp.full((K,), 1e-4, jnp.float32)
        factors = jnp.ones((K,), jnp.float32)
        rngsK = jax.random.split(jax.random.key(2, impl='rbg'), K)[:, None]
        try:
            p, s, losses, _ = multi(params, opt_state, batches, lrs,
                                    factors, rngsK)
            float(losses[-1])  # compile + sync
        except Exception as e:
            if os.environ.get('BENCH_DEBUG'):
                raise
            print('prod[{:10s}]: FAILED ({})'.format(
                variant, str(e).splitlines()[0][:100]), flush=True)
            continue
        dt = float('inf')
        for wi in range(WINDOWS):
            rngsW = jax.random.split(
                jax.random.key(3 + wi, impl='rbg'), K)[:, None]
            t0 = time.perf_counter()
            p, s, losses, _ = multi(p, s, batches, lrs, factors, rngsW)
            float(losses[-1])
            dt = min(dt, time.perf_counter() - t0)
        print('prod[{:10s}]: {:7.2f} ms/step'.format(variant, dt / K * 1e3),
              flush=True)


if __name__ == '__main__':
    main()
