"""Profile the PRODUCTION scan driver (ts.make_multi_train_step) and print
the top device ops — comparison harness for the round-4 driver-gap
investigation (inline bench loop 18.4 ms/step vs prod driver ~22 ms).

Usage: python scripts/profile_prod_step.py [outdir]
"""

import os
import sys

import jax
import jax.numpy as jnp
import numpy as np

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
from profile_step import summarize  # noqa: E402

K = 20


def main():
    outdir = sys.argv[1] if len(sys.argv) > 1 else '/tmp/prod_step_profile'
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
    batch = ts.stack_minibatches(
        [{'data': image, 'rois': rois, 'obn_scores': obn,
          'valid_mask': valid, 'labels_oh': labels}], size_bucket=64)

    mesh = mesh_lib.make_mesh(1)
    multi = ts.make_multi_train_step(
        spec, hp, mults, mesh, donate=False,
        fused_grads=os.environ.get('BENCH_FUSED_GRADS', '1') == '1',
        apply_factors=os.environ.get('BENCH_FACTORS', '1') == '1')
    batches = {k: jnp.asarray(np.stack([batch[k]] * K)) for k in batch}
    lrs = jnp.full((K,), 1e-4, jnp.float32)
    factors = jnp.ones((K,), jnp.float32)
    rngsK = jax.random.split(jax.random.key(2, impl='rbg'), K)[:, None]

    p, s, losses, _ = multi(params, opt_state, batches, lrs, factors, rngsK)
    float(losses[-1])
    jax.profiler.start_trace(outdir)
    p, s, losses, _ = multi(p, s, batches, lrs, factors, rngsK)
    float(losses[-1])
    jax.profiler.stop_trace()
    summarize(outdir)


if __name__ == '__main__':
    main()
