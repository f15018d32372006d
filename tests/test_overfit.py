"""End-to-end learning signal on a tiny synthetic dataset of colored
squares with image-level labels only (the reference's 'overfit a few
images' strategy, SURVEY.md §4): the full body+head+losses+solver system
must drive the MIL image-classification loss to ~0 with 100% accuracy and
a concentrated detection softmax.

Localization (CorLoc) itself is NOT asserted: at CPU-feasible image sizes
(64px) the VGG conv5 receptive field (~200px) covers the whole image, so
every RoI 'sees' the object and the MIL localization signal that emerges at
the flagship 480-1200px scales does not exist here.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from nafwebsod_tpu.models import detector
from nafwebsod_tpu.ops.boxes import bbox_overlaps
from nafwebsod_tpu.parallel import mesh as mesh_lib
from nafwebsod_tpu.parallel import train_step as ts
from nafwebsod_tpu.solver import sgd

N_CLASSES = 4  # bg + 3 colors
COLORS = np.array([[200, 30, 30], [30, 200, 30], [30, 30, 200]], np.float32)


def _make_image(rng, cls):
    im = rng.randn(64, 64, 3).astype(np.float32) * 5
    x = rng.randint(4, 28)
    y = rng.randint(4, 28)
    w = rng.randint(20, 30)
    h = rng.randint(20, 30)
    box = [x, y, x + w - 1, y + h - 1]
    im[y:y + h, x:x + w] = COLORS[cls - 1] + rng.randn(h, w, 3) * 2
    return im, np.array(box, np.float32)


def _proposals(rng, box, n_extra=11):
    x1 = rng.uniform(0, 34, n_extra)
    y1 = rng.uniform(0, 34, n_extra)
    w = rng.uniform(12, 28, n_extra)
    h = rng.uniform(12, 28, n_extra)
    extra = np.stack([x1, y1, np.minimum(x1 + w, 63),
                      np.minimum(y1 + h, 63)], 1)
    return np.vstack([box[None], extra]).astype(np.float32)


@pytest.mark.slow
def test_wsddn_learns_to_localize():
    rng = np.random.RandomState(0)
    spec = detector.ModelSpec(
        num_classes=N_CLASSES, box_head='vgg16_2fc', webly_on=False,
        webly_entropy=False, hidden_dim=32, freeze_conv_body=False,
        freeze_at=0, mean_loss=True)
    params = detector.init_params(spec, jax.random.PRNGKey(0))

    data = []
    for i in range(6):
        cls = (i % 3) + 1
        im, box = _make_image(rng, cls)
        props = _proposals(rng, box)
        labels = np.zeros((1, N_CLASSES - 1), np.float32)
        labels[0, cls - 1] = 1
        rois = np.hstack([np.zeros((len(props), 1), np.float32), props])
        data.append({
            'data': (im / 25.0)[None],  # keep activations bounded
            'rois': rois,
            'obn_scores': np.ones((len(props), 1), np.float32),
            'labels_oh': labels,
            'valid_mask': np.ones(len(props), bool),
            'gt_box': box, 'gt_cls': cls,
        })

    hp = sgd.SGDHyperParams(momentum=0.9, weight_decay=1e-4, iter_size=1)
    trainable = detector.trainable_param_names(spec, params)
    mults = sgd.freeze_mults(sgd.param_multipliers(params, trainable))
    state = sgd.init_state(params, hp)
    step = ts.make_train_step(spec, hp, mults, mesh_lib.make_mesh(1),
                              donate=False)
    losses = []
    for it in range(300):
        d = data[it % len(data)]
        batch = ts.stack_minibatches([d], size_bucket=32)
        rngs = ts.device_rngs(jax.random.fold_in(jax.random.PRNGKey(7), it),
                              1)
        params, state, loss, _ = step(params, state, batch,
                                      np.float32(2e-4), rngs)
        losses.append(float(loss))
    assert np.isfinite(losses).all()
    # the MIL objective must improve through the dropout noise
    assert np.mean(losses[-20:]) < np.mean(losses[:20]), (
        np.mean(losses[:20]), np.mean(losses[-20:]))

    correct = 0
    concentration = []
    for d in data:
        out = detector.forward_test(
            spec, params, jnp.asarray(d['data']), jnp.asarray(d['rois']),
            jnp.asarray(d['obn_scores']), jnp.asarray(d['valid_mask']))
        rp = np.asarray(out['rois_pred'])
        img_scores = rp.sum(axis=0)
        correct += int(np.argmax(img_scores)) == d['gt_cls'] - 1
        # detection softmax concentrates well above uniform (1/12)
        concentration.append(rp[:, d['gt_cls'] - 1].max() /
                             max(rp[:, d['gt_cls'] - 1].sum(), 1e-9))
    assert correct >= len(data) - 1, (correct, len(data))
    assert np.mean(concentration) > 1.3 / len(data[0]["rois"])
