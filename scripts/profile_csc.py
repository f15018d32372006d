"""Capture a jax.profiler trace of the CSC train step (the slowest WSOD
family) and print the top device ops — the measurement behind the CSC
optimization work (BASELINE.md family table).

Usage: python scripts/profile_csc.py [outdir] [K]
"""

import os
import sys
import time

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
from profile_step import summarize  # noqa: E402

K = int(sys.argv[2]) if len(sys.argv) > 2 else 3


def main():
    outdir = sys.argv[1] if len(sys.argv) > 1 else '/tmp/csc_profile'
    on_tpu = any(d.platform == 'tpu' for d in jax.devices())
    H = W = 704 if on_tpu else 128
    R, hidden = (2048, 4096) if on_tpu else (64, 64)
    # cpg_tau=0: keep every gt-class seed ACTIVE — random-init preds never
    # reach the real 0.7 gate, and the seed-gating (cpg_op.cu:149-166
    # parity) would otherwise zero all cotangents and measure nothing
    spec = detector.ModelSpec(num_classes=21, compute_dtype='bfloat16',
                              hidden_dim=hidden, webly_on=False,
                              webly_entropy=False, box_head='vgg16_2fc',
                              csc=True, cpg_tau=0.0)
    params = detector.init_params(spec, jax.random.PRNGKey(0))
    hp = sgd.SGDHyperParams(momentum=0.9, weight_decay=0.0005, iter_size=1)
    mults = sgd.freeze_mults(sgd.param_multipliers(
        params, detector.trainable_param_names(spec, params)))
    opt_state = sgd.init_state(params, hp)
    image, rois, obn, valid, labels = _example_inputs(H=H, W=W, R=R,
                                                      num_classes=21, seed=0)
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

    rng = jax.random.key(2, impl='rbg')
    p, s, losses = multi_step(params, opt_state, batch, rng)
    float(losses[-1])
    t0 = time.perf_counter()
    p, s, losses = multi_step(p, s, batch, rng)
    float(losses[-1])
    print('csc step: {:.1f} ms'.format(
        (time.perf_counter() - t0) / K * 1e3), flush=True)
    jax.profiler.start_trace(outdir)
    p, s, losses = multi_step(p, s, batch, rng)
    float(losses[-1])
    jax.profiler.stop_trace()
    summarize(outdir)


if __name__ == '__main__':
    main()
