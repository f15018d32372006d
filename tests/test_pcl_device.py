"""Device-side PCL pseudo-labeling (ops/refine.py:pcl_targets_device) vs
the reference-faithful host port: on separable score distributions the
KMeans-init deviation is immaterial and the per-roi outputs and PCLLoss
must agree."""

import numpy as np
import jax
import jax.numpy as jnp

from nafwebsod_tpu.ops import refine as refine_ops


def _data(seed=0, r=48, c=4):
    """Scores with a well-separated high cluster per gt class."""
    rng = np.random.RandomState(seed)
    x1 = rng.uniform(0, 60, r)
    y1 = rng.uniform(0, 60, r)
    boxes = np.stack([x1, y1, x1 + rng.uniform(10, 30, r),
                      y1 + rng.uniform(10, 30, r)], 1).astype(np.float32)
    im_labels = np.zeros((1, c), np.float32)
    im_labels[0, [0, 2]] = 1
    cls_prob = rng.uniform(0.001, 0.05, (r, c)).astype(np.float32)
    # a clearly separated top group for each gt class
    cls_prob[rng.choice(r, 6, replace=False), 0] = rng.uniform(0.8, 0.95, 6)
    cls_prob[rng.choice(r, 5, replace=False), 2] = rng.uniform(0.7, 0.9, 5)
    cls_prob_new = rng.uniform(0.01, 0.99, (r, c + 1)).astype(np.float32)
    cls_prob_new /= cls_prob_new.sum(1, keepdims=True)
    return boxes, cls_prob, im_labels, cls_prob_new


def test_device_matches_host_on_separable_scores():
    boxes, cls_prob, im_labels, cls_prob_new = _data()
    r, c = cls_prob.shape
    max_pc = refine_ops.PCL_MAX_PC_NUM * c

    host = refine_ops.pcl_targets_padded(boxes, cls_prob, im_labels,
                                         cls_prob_new, max_pc)
    dev = refine_ops.pcl_targets_device(
        jnp.asarray(boxes), jnp.asarray(cls_prob), jnp.asarray(im_labels),
        jnp.asarray(cls_prob_new), jnp.ones((r,), bool))
    dev = [np.asarray(t) for t in dev]

    # per-roi outputs are slot-layout independent
    np.testing.assert_array_equal(dev[0], host[0])          # labels
    np.testing.assert_allclose(dev[1], host[1], rtol=1e-6)  # cls_loss_w
    # assignment VALUES differ (device uses fixed (class, rank) slots; the
    # host compacts) but the bg/ignored pattern must match
    np.testing.assert_array_equal(dev[2] < 0, host[2] < 0)

    # the loss sees through the slot layout
    probs = jnp.asarray(cls_prob_new)
    l_host = float(refine_ops.pcl_loss_full(
        probs, *[jnp.asarray(t) for t in host]))
    l_dev = float(refine_ops.pcl_loss_full(
        probs, *[jnp.asarray(t) for t in dev]))
    np.testing.assert_allclose(l_dev, l_host, rtol=1e-5)


def test_device_handles_padding_and_empty_gt():
    boxes, cls_prob, im_labels, cls_prob_new = _data(seed=1)
    r = boxes.shape[0]
    valid = np.ones((r,), bool)
    valid[-8:] = False
    dev = refine_ops.pcl_targets_device(
        jnp.asarray(boxes), jnp.asarray(cls_prob), jnp.asarray(im_labels),
        jnp.asarray(cls_prob_new), jnp.asarray(valid))
    labels, clw, ga = [np.asarray(t) for t in dev[:3]]
    assert (labels[~valid] == 0).all()
    assert (clw[~valid] == 0).all()
    assert (ga[~valid] == -1).all()

    # no gt classes at all -> everything ignored
    none = refine_ops.pcl_targets_device(
        jnp.asarray(boxes), jnp.asarray(cls_prob),
        jnp.zeros_like(jnp.asarray(im_labels)), jnp.asarray(cls_prob_new),
        jnp.ones((r,), bool))
    assert (np.asarray(none[0]) == 0).all()
    assert (np.asarray(none[1]) == 0).all()
    assert float(np.asarray(none[5]).sum()) == 0.0          # pc_count


def test_device_pcl_trains_without_callback(monkeypatch):
    """forward_train with WSL.PCL_DEVICE never crosses to the host."""
    from nafwebsod_tpu.models import detector

    def boom(*a, **k):
        raise AssertionError('host callback used despite pcl_device')

    monkeypatch.setattr(refine_ops, 'pcl_targets_padded', boom)

    spec = detector.ModelSpec(
        num_classes=5, hidden_dim=16, webly_on=False, webly_entropy=False,
        box_head='vgg16_2fc', pcl=True, pcl_device=True,
        compute_dtype='float32')
    params = detector.init_params(spec, jax.random.PRNGKey(0))
    rng = np.random.RandomState(0)
    r = 16
    x1 = rng.uniform(0, 20, r)
    y1 = rng.uniform(0, 20, r)
    labels = np.zeros((1, 4), np.float32)
    labels[0, [1, 3]] = 1
    batch = {
        'image': jnp.asarray(rng.randn(1, 48, 48, 3).astype(np.float32)),
        'rois': jnp.asarray(np.stack(
            [np.zeros(r), x1, y1, x1 + 14, y1 + 14], 1).astype(np.float32)),
        'obn_scores': jnp.asarray(rng.rand(r, 1).astype(np.float32) + 1),
        'labels_oh': jnp.asarray(labels),
        'valid_mask': jnp.ones((r,), bool),
    }
    (total, aux), grads = jax.value_and_grad(
        lambda p: detector.forward_train(spec, p, batch, None),
        has_aux=True)(params)
    assert np.isfinite(float(total))
    assert any(k.startswith('loss_cls1') for k in aux)
    gnorm = sum(float(jnp.sum(jnp.abs(g))) for g in jax.tree.leaves(grads))
    assert np.isfinite(gnorm) and gnorm > 0
