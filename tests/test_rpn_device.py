"""Device-side RPN machinery (ops/rpn_device.py) vs the host golden
implementations (ops/rpn.py, ops/boxes.py), plus the end-to-end Faster R-CNN
composition through detector.forward_train / forward_test."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from nafwebsod_tpu.ops import boxes as box_host
from nafwebsod_tpu.ops import rpn as rpn_host
from nafwebsod_tpu.ops import rpn_device as rpn_dev


def test_shifted_anchors_matches_host():
    base = rpn_host.generate_anchors(16, (32, 64), (0.5, 1, 2))
    host = rpn_host.shifted_anchors(5, 7, 16.0, base)
    dev = np.asarray(rpn_dev.shifted_anchors(5, 7, 16.0, base))
    np.testing.assert_allclose(dev, host, rtol=0, atol=1e-5)


def test_bbox_transform_matches_host():
    rng = np.random.RandomState(0)
    boxes = np.abs(rng.randn(40, 4)).astype(np.float32) * 30
    boxes[:, 2:] += boxes[:, :2] + 5
    deltas = (rng.randn(40, 4) * 0.3).astype(np.float32)
    host = box_host.bbox_transform(boxes, deltas)
    dev = np.asarray(rpn_dev.bbox_transform(jnp.asarray(boxes),
                                            jnp.asarray(deltas)))
    np.testing.assert_allclose(dev, host, rtol=1e-5, atol=1e-3)

    enc_host = box_host.bbox_transform_inv(boxes, boxes[::-1].copy())
    enc_dev = np.asarray(rpn_dev.bbox_transform_inv(
        jnp.asarray(boxes), jnp.asarray(boxes[::-1].copy())))
    np.testing.assert_allclose(enc_dev, enc_host, rtol=1e-4, atol=1e-4)


def test_generate_proposals_matches_host():
    rng = np.random.RandomState(1)
    a, h, w = 3, 6, 8
    base = rpn_host.generate_anchors(16, (32, 64, 128), (1.0,))[:a]
    scores_hwa = rng.rand(h, w, a).astype(np.float32)
    deltas_hwa = (rng.randn(h, w, 4 * a) * 0.2).astype(np.float32)
    im_info = np.array([90.0, 120.0, 1.5], np.float32)

    host_props, host_scores = rpn_host.generate_proposals(
        scores_hwa.transpose(2, 0, 1), deltas_hwa.transpose(2, 0, 1),
        im_info, base, 1.0 / 16.0, pre_nms_top_n=80, post_nms_top_n=20,
        nms_thresh=0.7, min_size=4)

    anchors = rpn_dev.shifted_anchors(h, w, 16.0, base)
    props, scores, valid = jax.jit(
        lambda s, d: rpn_dev.generate_proposals(
            s, d, anchors, im_info[0], im_info[1], im_info[2],
            pre_nms_top_n=80, post_nms_top_n=20, nms_thresh=0.7,
            min_size=4.0))(
        jnp.asarray(scores_hwa.reshape(-1)),
        jnp.asarray(deltas_hwa.reshape(-1, 4)))
    props = np.asarray(props)[np.asarray(valid)]
    scores = np.asarray(scores)[np.asarray(valid)]
    assert len(props) == len(host_props)
    np.testing.assert_allclose(scores, host_scores[:, 0], rtol=1e-5,
                               atol=1e-6)
    np.testing.assert_allclose(props, host_props, rtol=1e-4, atol=1e-3)


def test_rpn_targets_matches_host_without_subsampling():
    rng = np.random.RandomState(2)
    base = rpn_host.generate_anchors(16, (32, 64), (0.5, 1, 2))
    anchors = rpn_host.shifted_anchors(4, 5, 16.0, base)
    gt = np.array([[8, 8, 40, 48], [20, 10, 70, 60]], np.float32)

    # batch_size large enough that neither fg nor bg subsampling triggers
    h_lab, h_tgt, h_iw, h_ow = rpn_host.rpn_targets(
        64, 80, anchors, gt, rng=rng, batch_size=10**6, fg_fraction=0.5)

    g = np.zeros((8, 4), np.float32)
    g[:2] = gt
    gv = np.zeros((8,), bool)
    gv[:2] = True
    d_lab, d_tgt, d_iw, d_ow = jax.jit(
        lambda r: rpn_dev.rpn_targets(
            jnp.asarray(anchors), jnp.asarray(g), jnp.asarray(gv),
            64.0, 80.0, r, batch_size=10**6, fg_fraction=0.5))(
        jax.random.PRNGKey(0))
    np.testing.assert_array_equal(np.asarray(d_lab), h_lab)
    np.testing.assert_allclose(np.asarray(d_tgt), h_tgt, rtol=1e-4,
                               atol=1e-4)
    np.testing.assert_allclose(np.asarray(d_iw), h_iw)
    np.testing.assert_allclose(np.asarray(d_ow), h_ow, rtol=1e-6, atol=1e-8)


def test_rpn_targets_respects_quota():
    base = rpn_host.generate_anchors(8, (16, 32), (0.5, 1, 2))
    anchors = np.asarray(rpn_dev.shifted_anchors(8, 8, 8.0, base))
    gt = np.zeros((4, 4), np.float32)
    gt[0] = [4, 4, 30, 30]
    gv = np.zeros((4,), bool)
    gv[0] = True
    lab, _, _, ow = rpn_dev.rpn_targets(
        jnp.asarray(anchors), jnp.asarray(gt), jnp.asarray(gv),
        64.0, 64.0, jax.random.PRNGKey(3), batch_size=32, fg_fraction=0.5)
    lab = np.asarray(lab)
    assert (lab == 1).sum() <= 16
    assert (lab >= 0).sum() <= 32
    assert (lab >= 0).sum() > 0
    # outside weights sum to 4 (1/num_examples per coord, fg+bg rows)
    np.testing.assert_allclose(np.asarray(ow).sum(), 4.0, rtol=1e-5)


def test_proposal_labels_semantics():
    gt = np.zeros((6, 4), np.float32)
    gt[0] = [10, 10, 50, 50]
    gt[1] = [60, 60, 100, 100]
    gcls = np.zeros((6,), np.int32)
    gcls[:2] = [3, 7]
    gv = np.zeros((6,), bool)
    gv[:2] = True

    rng = np.random.RandomState(4)
    props = rng.rand(40, 4).astype(np.float32) * 60
    props[:, 2:] += props[:, :2] + 8
    pvalid = np.ones((40,), bool)
    pvalid[-5:] = False

    out = jax.jit(lambda r: rpn_dev.proposal_labels(
        r, jnp.asarray(props), jnp.asarray(pvalid), jnp.asarray(gt),
        jnp.asarray(gcls), jnp.asarray(gv), rois_per_image=32,
        fg_fraction=0.25, num_classes=21))(jax.random.PRNGKey(5))
    labels = np.asarray(out['labels_int32'])
    valid = np.asarray(out['valid_mask']).astype(bool)
    rois = np.asarray(out['rois'])
    assert rois.shape == (32, 5)
    assert valid.sum() > 0
    # gt boxes joined the pool: at least the two gts are fg with their class
    fg = labels[valid]
    assert set(fg[fg > 0]).issubset({3, 7})
    assert (fg > 0).sum() >= 2
    assert (fg > 0).sum() <= 8  # fg quota = 0.25 * 32

    # fg bbox targets decode back onto the assigned gt box
    t = np.asarray(out['bbox_targets'])
    iw = np.asarray(out['bbox_inside_weights'])
    for i in range(32):
        if labels[i] > 0:
            c = labels[i]
            assert iw[i, 4 * c:4 * c + 4].all()
            dec = box_host.bbox_transform(
                rois[i:i + 1, 1:5], t[i:i + 1, 4 * c:4 * c + 4],
                (10., 10., 5., 5.))
            gt_box = gt[0] if c == 3 else gt[1]
            np.testing.assert_allclose(dec[0], gt_box, atol=0.3)


@pytest.fixture(scope='module')
def frcnn_spec():
    from nafwebsod_tpu.models import detector
    return detector.ModelSpec(
        num_classes=9, hidden_dim=32, supervised=True, faster_rcnn=True,
        webly_on=False, webly_entropy=False, box_head='vgg16_2fc',
        dilation=1, freeze_conv_body=False,
        rpn_sizes=(32, 64), rpn_aspect_ratios=(0.5, 1.0, 2.0),
        rpn_stride=16,
        rpn_pre_nms_top_n=60, rpn_post_nms_top_n=24,
        rpn_test_pre_nms_top_n=60, rpn_test_post_nms_top_n=16,
        frcnn_batch_size=32, compute_dtype='float32')


def _frcnn_batch(h=64, w=80):
    rng = np.random.RandomState(6)
    image = rng.randn(1, h, w, 3).astype(np.float32)
    gt = np.zeros((8, 4), np.float32)
    gt[0] = [8, 8, 40, 40]
    gt[1] = [30, 20, 70, 60]
    gcls = np.zeros((8,), np.int32)
    gcls[:2] = [2, 5]
    gv = np.zeros((8,), bool)
    gv[:2] = True
    return {
        'image': image,
        'rois': np.zeros((1, 5), np.float32),
        'obn_scores': np.ones((1, 1), np.float32),
        'valid_mask': np.zeros((1,), bool),
        'labels_oh': np.zeros((1, 8), np.float32),
        'gt_boxes': gt, 'gt_classes': gcls, 'gt_valid': gv,
        'im_info': np.array([h, w, 1.0], np.float32),
    }


def test_faster_rcnn_forward_train(frcnn_spec):
    from nafwebsod_tpu.models import detector
    params = detector.init_params(frcnn_spec, jax.random.PRNGKey(0))
    assert 'conv_rpn_w' in params and 'cls_score_w' in params
    batch = {k: jnp.asarray(v) for k, v in _frcnn_batch().items()}
    loss, aux = detector.forward_train(
        frcnn_spec, params, batch, jax.random.PRNGKey(1))
    assert np.isfinite(float(loss))
    for k in ('loss_rpn_cls', 'loss_rpn_bbox', 'loss_cls', 'loss_bbox'):
        assert np.isfinite(float(aux[k])), k

    # gradients reach both the RPN and the box head
    def loss_fn(p):
        return detector.forward_train(frcnn_spec, p, batch,
                                      jax.random.PRNGKey(1))[0]
    grads = jax.grad(loss_fn)(params)
    assert float(jnp.abs(grads['conv_rpn_w']).sum()) > 0
    assert float(jnp.abs(grads['cls_score_w']).sum()) > 0
    assert float(jnp.abs(grads['rpn_bbox_pred_w']).sum()) > 0


def test_faster_rcnn_forward_test(frcnn_spec):
    from nafwebsod_tpu.models import detector
    params = detector.init_params(frcnn_spec, jax.random.PRNGKey(0))
    b = _frcnn_batch()
    out = detector.forward_test(
        frcnn_spec, params, jnp.asarray(b['image']), None, None, None,
        im_info=jnp.asarray(b['im_info']))
    scores = np.asarray(out['scores'])
    rois = np.asarray(out['rois'])
    valid = np.asarray(out['proposal_valid'])
    assert scores.shape == (16, 9)
    assert rois.shape == (16, 5)
    assert valid.any()
    # proposals lie inside the image
    assert (rois[valid][:, 1:] >= 0).all()
    assert (rois[valid][:, 3] <= 80 - 1).all()
    assert (rois[valid][:, 4] <= 64 - 1).all()
