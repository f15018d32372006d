"""Device-side train-step times for the supervised family at flagship-ish
shapes — also the TPU compile check for the in-graph RPN machinery
(anchor targets, fixed-capacity proposal NMS, fg/bg sampling) and the
RetinaNet pyramid losses, which tests only exercise on CPU.

Usage: python scripts/bench_supervised.py [frcnn|retinanet ...]
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


def main():
    want = sys.argv[1:] or ['frcnn', 'retinanet']
    on_tpu = any(d.platform == 'tpu' for d in jax.devices())
    H = W = 704 if on_tpu else 96
    hidden = 4096 if on_tpu else 32

    rng = np.random.RandomState(0)
    image = jnp.asarray((rng.randn(1, H, W, 3) * 10).astype(np.float32))
    gmax = 16
    x1 = rng.uniform(0, W - 120, gmax)
    y1 = rng.uniform(0, H - 120, gmax)
    gt_boxes = jnp.asarray(np.stack(
        [x1, y1, x1 + rng.uniform(40, 110, gmax),
         y1 + rng.uniform(40, 110, gmax)], 1).astype(np.float32))
    gt_classes = jnp.asarray(rng.randint(1, 21, gmax).astype(np.int32))
    gt_valid = jnp.asarray(np.arange(gmax) < 8)

    variants = {
        'frcnn': dict(
            num_classes=21, hidden_dim=hidden, supervised=True,
            faster_rcnn=True, conv_body='vgg16_c5', box_head='vgg16_2fc',
            webly_on=False, webly_entropy=False, dilation=1,
            freeze_conv_body=False, freeze_at=2,
            rpn_stride=16, rpn_sizes=(32, 64, 128, 256, 512),
            rpn_pre_nms_top_n=2000, rpn_post_nms_top_n=512,
            rpn_test_pre_nms_top_n=2000, rpn_test_post_nms_top_n=512,
            frcnn_batch_size=256, compute_dtype='bfloat16'),
        # hidden_dim stays small: RetinaNet has no fc towers, but
        # init_params would still allocate the 25088x4096 WSL towers
        # (~1.6 GB params + momentum) and drown the step in HBM traffic
        'retinanet': dict(
            num_classes=21, hidden_dim=32, supervised=True,
            retinanet=True, conv_body='fpn_resnet50',
            webly_on=False, webly_entropy=False,
            compute_dtype='bfloat16'),
    }

    for variant in want:
        spec = detector.ModelSpec(**variants[variant])
        params = detector.init_params(spec, jax.random.PRNGKey(0))
        hp = sgd.SGDHyperParams(momentum=0.9, weight_decay=0.0001,
                                iter_size=1)
        mults = sgd.freeze_mults(sgd.param_multipliers(
            params, detector.trainable_param_names(spec, params)))
        opt_state = sgd.init_state(params, hp)

        batch = {
            'image': image,
            'rois': jnp.zeros((1, 5), jnp.float32),
            'obn_scores': jnp.ones((1, 1), jnp.float32),
            'valid_mask': jnp.zeros((1,), bool),
            'labels_oh': jnp.zeros((1, 20), jnp.float32),
            'gt_boxes': gt_boxes, 'gt_classes': gt_classes,
            'gt_valid': gt_valid,
            'im_info': jnp.asarray(np.array([H, W, 1.0], np.float32)),
        }

        @jax.jit
        def multi_step(params, opt_state, batch, rng):
            def one(carry, k):
                p, s = carry

                def loss_fn(pp):
                    return detector.forward_train(
                        spec, pp, batch, jax.random.fold_in(rng, k))

                (loss, _), grads = jax.value_and_grad(
                    loss_fn, has_aux=True)(p)
                p, s = sgd.update(p, grads, s, jnp.float32(1e-6), hp,
                                  mults)
                return (p, s), loss

            (p, s), losses = jax.lax.scan(one, (params, opt_state),
                                          jnp.arange(K))
            return p, s, losses

        rng_k = jax.random.key(2, impl='rbg')
        try:
            p, s, losses = multi_step(params, opt_state, batch, rng_k)
            float(losses[-1])
        except Exception as e:
            print('sup[{:10s}]: FAILED ({})'.format(
                variant, str(e).splitlines()[0][:120]), flush=True)
            continue
        t0 = time.perf_counter()
        p, s, losses = multi_step(p, s, batch, rng_k)
        float(losses[-1])
        dt = (time.perf_counter() - t0) / K
        print('sup[{:10s}]: {:7.2f} ms/step (loss {:.3f})'.format(
            variant, dt * 1e3, float(losses[-1])), flush=True)


if __name__ == '__main__':
    main()
