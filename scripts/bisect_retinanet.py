"""Bisect the RetinaNet TPU step anomaly (BASELINE.md: fwd+bwd ~24 ms but
gradient-materializing steps ran 0.6-4.6 s with a FAILED_PRECONDITION
probe on this rig).

Variants isolate which program feature triggers it:
  loss        forward + loss only (no grad)
  gradsum     value_and_grad, gradients reduced to ONE scalar in-graph
  gradout     value_and_grad, full gradient pytree as program outputs
  step        full SGD update (the training step), non-donated
  step_donate full SGD update with donated params/opt_state
  step_frozen SGD step with the conv body frozen (head grads only)
  step_512    full step at 512px instead of 704px

Usage: python scripts/bisect_retinanet.py [variant ...]
Run variants SERIALLY on this rig; each prints ms/step over a scan of K.
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

from nafwebsod_tpu.models import detector  # noqa: E402
from nafwebsod_tpu.solver import sgd  # noqa: E402

K = 10


def build(side, frozen):
    spec = detector.ModelSpec(
        num_classes=21, hidden_dim=32, supervised=True, retinanet=True,
        conv_body='fpn_resnet50', webly_on=False, webly_entropy=False,
        freeze_conv_body=frozen, compute_dtype='bfloat16')
    params = detector.init_params(spec, jax.random.PRNGKey(0))
    rng = np.random.RandomState(0)
    image = jnp.asarray((rng.randn(1, side, side, 3) * 10).astype(
        np.float32))
    gmax = 16
    x1 = rng.uniform(0, side - 120, gmax)
    y1 = rng.uniform(0, side - 120, gmax)
    gt_boxes = jnp.asarray(np.stack(
        [x1, y1, x1 + rng.uniform(40, 110, gmax),
         y1 + rng.uniform(40, 110, gmax)], 1).astype(np.float32))
    batch = {
        'image': image,
        'rois': jnp.zeros((1, 5), jnp.float32),
        'obn_scores': jnp.ones((1, 1), jnp.float32),
        'valid_mask': jnp.zeros((1,), bool),
        'labels_oh': jnp.zeros((1, 20), jnp.float32),
        'gt_boxes': gt_boxes,
        'gt_classes': jnp.asarray(rng.randint(1, 21, gmax).astype(np.int32)),
        'gt_valid': jnp.asarray(np.arange(gmax) < 8),
        'im_info': jnp.asarray(np.array([side, side, 1.0], np.float32)),
    }
    return spec, params, batch


def run(name, side=704, frozen=False, mode='step', donate=False):
    spec, params, batch = build(side, frozen)
    hp = sgd.SGDHyperParams(momentum=0.9, weight_decay=0.0001, iter_size=1)
    mults = sgd.freeze_mults(sgd.param_multipliers(
        params, detector.trainable_param_names(spec, params)))
    opt_state = sgd.init_state(params, hp)
    rng_k = jax.random.key(2, impl='rbg')

    def loss_fn(p, k):
        return detector.forward_train(spec, p, batch,
                                      jax.random.fold_in(rng_k, k))

    if mode == 'loss':
        @jax.jit
        def prog(p, s):
            def one(c, k):
                loss, _ = loss_fn(p, k)
                return c + loss, loss
            return jax.lax.scan(one, jnp.float32(0), jnp.arange(K))
        fetch = lambda out: float(out[1][-1])
    elif mode == 'gradsum':
        @jax.jit
        def prog(p, s):
            def one(c, k):
                (loss, _), g = jax.value_and_grad(
                    loss_fn, has_aux=True)(p, k)
                gs = sum(jnp.sum(jnp.abs(x).astype(jnp.float32))
                         for x in jax.tree_util.tree_leaves(g))
                return c + gs, loss
            return jax.lax.scan(one, jnp.float32(0), jnp.arange(K))
        fetch = lambda out: float(out[1][-1])
    elif mode == 'gradout':
        @jax.jit
        def prog(p, s):
            def one(g_prev, k):
                (loss, _), g = jax.value_and_grad(
                    loss_fn, has_aux=True)(p, k)
                # chain grads so the scan carries the full pytree
                g = jax.tree.map(lambda a, b: a + 0.0 * b, g, g_prev)
                return g, loss
            g0 = jax.tree.map(jnp.zeros_like, p)
            return jax.lax.scan(one, g0, jnp.arange(K))
        fetch = lambda out: float(out[1][-1])
    else:  # step
        def step_fn(p, s):
            def one(carry, k):
                pp, ss = carry
                (loss, _), g = jax.value_and_grad(
                    loss_fn, has_aux=True)(pp, k)
                pp, ss = sgd.update(pp, g, ss, jnp.float32(1e-6), hp, mults)
                return (pp, ss), loss
            (p, s), losses = jax.lax.scan(one, (p, s), jnp.arange(K))
            return p, s, losses
        prog = jax.jit(step_fn, donate_argnums=(0, 1) if donate else ())
        fetch = lambda out: float(out[2][-1])

    try:
        out = prog(params, opt_state)
        fetch(out)
    except Exception as e:
        print('retnet[{:12s}]: FAILED ({})'.format(
            name, str(e).splitlines()[0][:140]), flush=True)
        return
    times = []
    for _ in range(3):
        if donate:
            spec, params, batch2 = build(side, frozen)
            opt_state = sgd.init_state(params, hp)
        t0 = time.perf_counter()
        out = prog(params, opt_state)
        fetch(out)
        times.append((time.perf_counter() - t0) / K * 1e3)
        if donate:
            params, opt_state = out[0], out[1]
    print('retnet[{:12s}]: {} ms/step'.format(
        name, ' '.join('{:.1f}'.format(t) for t in times)), flush=True)


VARIANTS = {
    'loss': dict(mode='loss'),
    'gradsum': dict(mode='gradsum'),
    'gradout': dict(mode='gradout'),
    'step': dict(mode='step'),
    'step_donate': dict(mode='step', donate=True),
    'step_frozen': dict(mode='step', frozen=True),
    'step_512': dict(mode='step', side=512),
}


def main():
    want = sys.argv[1:] or ['loss', 'gradsum', 'step']
    for name in want:
        run(name, **VARIANTS[name])


if __name__ == '__main__':
    main()
