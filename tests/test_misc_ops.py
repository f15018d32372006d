"""Tests for the long-tail operator inventory (ops/misc.py, ops/seg.py) and
the mask branch integration."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from nafwebsod_tpu.models import detector
from nafwebsod_tpu.ops import misc, seg


class TestRoIEntropy:
    def test_uniform_scores_give_zero(self):
        # n equal scores: H = log n -> E = 1 - 1 = 0
        scores = jnp.asarray([0.2, 0.2, 0.2, 0.2])
        classes = jnp.asarray([1, 1, 1, 1])
        e = np.asarray(misc.roi_entropy(scores, classes, 3))
        assert e[0, 1] == pytest.approx(0.0, abs=1e-6)
        # classes with no rois give 1.0 (init value)
        assert e[0, 0] == 1.0 and e[0, 2] == 1.0

    def test_single_roi_gives_one(self):
        e = np.asarray(misc.roi_entropy(jnp.asarray([0.9]), jnp.asarray([0]),
                                        2))
        assert e[0, 0] == 1.0

    def test_concentrated_close_to_one(self):
        scores = jnp.asarray([0.999, 1e-6, 1e-6])
        classes = jnp.asarray([0, 0, 0])
        e = np.asarray(misc.roi_entropy(scores, classes, 1))
        assert e[0, 0] > 0.99


class TestScoreReshapePool:
    def test_roundtrip(self):
        s = jnp.asarray(np.random.RandomState(0).rand(5, 3).astype(np.float32))
        s3 = misc.roi_score_reshape(s, num_rois=8)
        assert s3.shape == (1, 8, 3)
        np.testing.assert_allclose(np.asarray(misc.roi_score_pool(s3, 'sum')),
                                   np.asarray(s).sum(0, keepdims=True),
                                   rtol=1e-6)
        np.testing.assert_allclose(np.asarray(misc.roi_score_pool(s3, 'max')),
                                   np.asarray(s).max(0, keepdims=True),
                                   rtol=1e-6)


class TestLabelCE:
    def test_classwise_semantics(self):
        rng = np.random.RandomState(0)
        probs = rng.rand(1, 3, 4, 4).astype(np.float32)
        labels = rng.randint(0, 3, (1, 4, 4)).astype(np.int32)
        loss, counts = misc.label_cross_entropy_wsl(jnp.asarray(probs),
                                                    jnp.asarray(labels))
        pos = int((labels > 0).sum())
        neg = int((labels == 0).sum())
        assert counts[0, 0] == pos and counts[0, 1] == neg
        expect = np.zeros(3)
        for y in range(4):
            for x in range(4):
                c = labels[0, y, x]
                d = pos if c > 0 else neg
                expect[c] += -np.log(max(probs[0, c, y, x], 1e-20)) / d
        np.testing.assert_allclose(np.asarray(loss)[0], expect, rtol=1e-5)

    def test_sigmoid_variant(self):
        rng = np.random.RandomState(1)
        logits = rng.randn(1, 2, 3, 3).astype(np.float32)
        targets = rng.choice([0.0, 0.5, 1.0], (1, 2, 3, 3)).astype(np.float32)
        xent, counts = misc.sigmoid_cross_entropy_with_logits_wsl(
            jnp.asarray(logits), jnp.asarray(targets))
        assert xent.shape == (1, 2) and counts.shape == (1, 2, 2)
        assert np.isfinite(np.asarray(xent)).all()


class TestSelfWeight:
    def test_formula(self):
        pred = jnp.asarray([[0.9, 0.2, 0.6]])
        labels = jnp.asarray([[1.0, 0.0, 0.0]])
        w = np.asarray(misc.self_weight_ce_weights(pred, labels))
        np.testing.assert_allclose(w, [[0.9, 0.8, 0.4]], rtol=1e-6)


class TestStatAndZeroEven:
    def test_stat(self):
        st = misc.stat_init(3)
        x = jnp.asarray([[1.0, 2.0, 3.0], [3.0, 4.0, 5.0]])
        m = jnp.asarray([[1.0, 0.0, 1.0], [1.0, 1.0, 0.0]])
        st = misc.stat_update(st, x, m)
        np.testing.assert_allclose(np.asarray(misc.stat_means(st)),
                                   [2.0, 4.0, 3.0])

    def test_zero_even(self):
        x = jnp.asarray([1.0, 2.0, 3.0, 4.0, 5.0])
        np.testing.assert_array_equal(np.asarray(misc.zero_even(x)),
                                      [0, 2, 0, 4, 0])


class TestKL:
    def test_kl_zero_when_equal(self):
        p = jnp.asarray([[0.3, 0.7], [0.5, 0.5]])
        assert float(misc.kl_loss(p, p)) == pytest.approx(0.0, abs=1e-6)
        q = jnp.asarray([[0.5, 0.5], [0.5, 0.5]])
        assert float(misc.kl_loss(q, p)) > 0


class TestSegOps:
    def test_upsample_shapes(self):
        x = jnp.ones((1, 2, 4, 4))
        y = seg.upsample_bilinear_wsl(x, 8, 12)
        assert y.shape == (1, 2, 8, 12)

    def test_deeplab_utility_sigmoid(self):
        cpg = jnp.asarray(np.array([[[[0.9, 0.05], [0.5, 0.8]]]],
                                   np.float32))  # (1,1,2,2)
        labels = jnp.asarray([[1.0]])
        pred = jnp.asarray([[0.9]])
        t = np.asarray(seg.deeplab_utility_sigmoid(cpg, labels, pred,
                                                   tau=0.7, fg_threshold=0.7,
                                                   bg_threshold=0.1))
        np.testing.assert_allclose(t[0, 0], [[1.0, 0.0], [0.5, 1.0]])
        # pred below tau -> everything ignored (0.5)
        t2 = np.asarray(seg.deeplab_utility_sigmoid(cpg, labels,
                                                    jnp.asarray([[0.3]])))
        assert (t2 == 0.5).all()

    def test_deeplab_utility_softmax(self):
        cpg = np.zeros((1, 2, 2, 2), np.float32)
        cpg[0, 1] = [[0.9, 0.0], [0.5, 0.05]]
        labels = jnp.asarray([[0.0, 1.0]])
        pred = jnp.asarray([[0.1, 0.9]])
        out = np.asarray(seg.deeplab_utility_softmax(
            jnp.asarray(cpg), labels, pred, tau=0.7, fg_threshold=0.7,
            bg_threshold=0.1))
        assert out[0, 0, 0] == 2   # fg of class idx 1 -> label 2
        assert out[0, 0, 1] == 0   # below bg threshold
        assert out[0, 1, 0] == -1  # between thresholds -> ignore
        assert out[0, 1, 1] == 0

    def test_kl_balanced_matches_cu_kernel(self):
        """kl_balanced == a literal numpy transcription of kl_op.cu's
        KLKernel/BalanceWSLKernel (pos/neg balancing, ignore at 0.5,
        input 0 consumed as a sigmoid logit)."""
        rng = np.random.RandomState(11)
        b, n = 2, 64
        p = rng.rand(b, n).astype(np.float32)          # "logit" slot
        q = rng.rand(b, n).astype(np.float32)          # targets
        q[0, 5] = 0.5                                  # exact ignore hits
        q[1, 7] = 0.5
        out = np.asarray(misc.kl_balanced(jnp.asarray(p), jnp.asarray(q)))

        def xent_fwd(lgt, tgt):
            return tgt * np.log(1.0 / tgt / (1.0 + np.exp(-lgt)))

        for i in range(b):
            pos = sum(1 for j in range(n)
                      if q[i, j] != 0.5 and q[i, j] > 0.5)
            neg = sum(1 for j in range(n)
                      if q[i, j] != 0.5 and q[i, j] <= 0.5)
            val = 0.0
            for j in range(n):
                if q[i, j] == 0.5:
                    continue
                d = pos if q[i, j] > 0.5 else neg
                val += xent_fwd(p[i, j], q[i, j]) / d
            assert out[i] == pytest.approx(-val, rel=1e-5)

    def test_kl_balanced_gradient_side(self):
        """Gradient flows into the p slot only (the CRF target is
        NO_GRADIENT upstream) and matches tgt*(1-sigmoid(p))/denom signs
        (kl_op.cu sigmoid_xent_backward)."""
        rng = np.random.RandomState(12)
        p = jnp.asarray(rng.rand(1, 16).astype(np.float32))
        q = jnp.asarray(rng.rand(1, 16).astype(np.float32))
        g = jax.grad(lambda x: jnp.sum(misc.kl_balanced(x, q)))(p)
        # d(-q*log(sigmoid-part))/dp = -q*(1-sigmoid(p))/denom <= 0
        assert np.all(np.asarray(g) <= 0)

    def test_dense_crf_sharpens(self):
        rng = np.random.RandomState(0)
        c, h, w = 3, 24, 24
        probs = np.full((c, h, w), 1.0 / c, np.float32)
        probs[1, 8:16, 8:16] = 0.8
        probs /= probs.sum(0, keepdims=True)
        unary = -np.log(probs)
        image = np.zeros((h, w, 3), np.float32)
        image[8:16, 8:16] = 200.0
        q = np.asarray(seg.dense_crf(jnp.asarray(unary), jnp.asarray(image),
                                     num_iters=3))
        assert q.shape == (c, h, w)
        np.testing.assert_allclose(q.sum(0), np.ones((h, w)), rtol=1e-4)
        assert q[1, 12, 12] > probs[1, 12, 12] * 0.9  # stays confident


class TestMaskBranch:
    def test_mask_on_train_and_grads(self):
        spec = detector.ModelSpec(
            num_classes=5, hidden_dim=16, webly_on=False,
            webly_entropy=False, box_head='vgg16_2fc', mask_on=True,
            mask_dim_reduced=8, mask_resolution=7)
        params = detector.init_params(spec, jax.random.PRNGKey(0))
        assert 'mask_fcn_logits_w' in params

        rng = np.random.RandomState(0)
        R = 6
        x1 = rng.uniform(0, 20, R)
        y1 = rng.uniform(0, 20, R)
        labels = np.zeros((1, 4), np.float32)
        labels[0, 1] = 1
        batch = {
            'image': jnp.asarray(rng.randn(1, 48, 48, 3).astype(np.float32)),
            'rois': jnp.asarray(np.stack(
                [np.zeros(R), x1, y1, x1 + 16, y1 + 16], 1).astype(
                    np.float32)),
            'obn_scores': jnp.asarray(rng.rand(R, 1).astype(np.float32)),
            'labels_oh': jnp.asarray(labels),
            'valid_mask': jnp.ones((R,), bool),
        }
        total, aux = detector.forward_train(spec, params, batch,
                                            jax.random.PRNGKey(1))
        assert 'mask_loss_cls' in aux and np.isfinite(float(total))

        grads = jax.grad(lambda p: detector.forward_train(
            spec, p, batch, jax.random.PRNGKey(1))[0])(params)
        assert float(jnp.abs(grads['mask_fcn_logits_w']).max()) > 0


class TestGroupNorm:
    def test_normalizes_groups(self):
        from nafwebsod_tpu.ops.norm import group_norm, get_group_gn
        rng = np.random.RandomState(0)
        x = jnp.asarray(rng.randn(2, 4, 4, 8).astype(np.float32) * 5 + 3)
        y = np.asarray(group_norm(x, jnp.ones(8), jnp.zeros(8), num_groups=2))
        # per (sample, group) mean ~ 0, var ~ 1
        yg = y.reshape(2, 4, 4, 2, 4)
        np.testing.assert_allclose(yg.mean(axis=(1, 2, 4)), 0, atol=1e-5)
        np.testing.assert_allclose(yg.var(axis=(1, 2, 4)), 1, atol=1e-3)
        assert get_group_gn(64) == 32
        assert get_group_gn(64, dim_per_gp=16, num_groups=-1) == 4


class TestDeeplabHead:
    def test_aspp_forward_outputs_losses(self):
        from nafwebsod_tpu.models import seg_head
        rng = np.random.RandomState(0)
        params = seg_head.init_deeplab_head_params(
            jax.random.PRNGKey(0), num_classes=4, dim_in=8, hidden=8)
        feat = jnp.asarray(rng.randn(1, 10, 12, 8).astype(np.float32))
        logits = seg_head.deeplab_head_forward(params, feat)
        assert logits.shape == (1, 10, 12, 3)

        sig, probs, unary = seg_head.deeplab_outputs(logits)
        assert probs.shape == (1, 10, 12, 4)
        np.testing.assert_allclose(np.asarray(probs).sum(-1), 1.0, rtol=1e-4)

        cpg = jnp.asarray(rng.rand(1, 3, 40, 48).astype(np.float32))
        labels = jnp.asarray(np.array([[1, 0, 1]], np.float32))
        cls_prob = jnp.asarray(np.array([[0.9, 0.1, 0.8]], np.float32))
        image = jnp.asarray(rng.rand(1, 40, 48, 3).astype(np.float32) * 255)
        losses = seg_head.deeplab_losses(logits, cpg, labels, cls_prob, image)
        assert np.isfinite(float(losses['mask_seed_loss']))
        assert np.isfinite(float(losses['mask_constraint_loss']))

        # gradients flow into the ASPP branches through the seed loss
        g = jax.grad(lambda p: seg_head.deeplab_losses(
            seg_head.deeplab_head_forward(p, feat), cpg, labels, cls_prob,
            image, run_crf=False)['mask_seed_loss'])(params)
        assert float(jnp.abs(g['fc6_1_w']).max()) > 0


class TestSegms:
    def test_polys_to_mask_and_box_crop(self):
        from nafwebsod_tpu.utils import segms
        poly = [[2, 2, 10, 2, 10, 10, 2, 10]]  # square
        m = segms.polys_to_mask(poly, 16, 16)
        assert m.shape == (16, 16)
        assert m[5, 5] == 1 and m[14, 14] == 0
        mb = segms.polys_to_mask_wrt_box(poly, [2, 2, 10, 10], 8)
        assert mb.shape == (8, 8) and mb.mean() > 0.8
        boxes = segms.polys_to_boxes([poly])
        np.testing.assert_allclose(boxes[0], [2, 2, 10, 10])
        flipped = segms.flip_segms([poly], 16, 16)
        assert flipped[0][0][0] == 16 - 2 - 1


class TestDeeplabBranchIntegration:
    def test_forward_train_deeplab_mask(self):
        spec = detector.ModelSpec(
            num_classes=5, hidden_dim=16, webly_on=False,
            webly_entropy=False, box_head='vgg16_2fc', mask_on=True,
            mask_head='deeplab', cpg_tau=0.0)
        params = detector.init_params(spec, jax.random.PRNGKey(0))
        assert 'fc6_1_w' in params  # ASPP branch params

        rng = np.random.RandomState(0)
        R = 6
        x1 = rng.uniform(0, 20, R)
        y1 = rng.uniform(0, 20, R)
        labels = np.zeros((1, 4), np.float32)
        labels[0, [0, 2]] = 1
        batch = {
            'image': jnp.asarray(rng.randn(1, 48, 48, 3).astype(np.float32)),
            'rois': jnp.asarray(np.stack(
                [np.zeros(R), x1, y1, x1 + 16, y1 + 16], 1).astype(
                    np.float32)),
            'obn_scores': jnp.asarray(rng.rand(R, 1).astype(np.float32)),
            'labels_oh': jnp.asarray(labels),
            'valid_mask': jnp.ones((R,), bool),
        }
        total, aux = detector.forward_train(spec, params, batch,
                                            jax.random.PRNGKey(1))
        assert 'mask_seed_loss' in aux and 'mask_constraint_loss' in aux
        assert np.isfinite(float(total))
        g = jax.grad(lambda p: detector.forward_train(
            spec, p, batch, jax.random.PRNGKey(1))[0])(params)
        assert float(jnp.abs(g['fc6_1_w']).max()) > 0


class TestCPGSW:
    def test_confident_classes_switch_to_mask(self):
        from nafwebsod_tpu.ops.seg import cpg_sw
        rng = np.random.RandomState(0)
        cpg = jnp.asarray(rng.rand(1, 3, 4, 4).astype(np.float32))
        logits = jnp.asarray(rng.randn(1, 3, 4, 4).astype(np.float32))
        labels = jnp.asarray([[1.0, 1.0, 0.0]])
        pred = jnp.asarray([[0.9, 0.9, 0.9]])
        loss = jnp.asarray([[0.05, 0.5, 0.01]])  # only class 0 below min_loss
        out = np.asarray(cpg_sw(cpg, logits, loss, labels, pred,
                                tau=0.7, min_loss=0.1))
        sig = 1.0 / (1.0 + np.exp(-np.asarray(logits)))
        np.testing.assert_allclose(out[0, 0], sig[0, 0], rtol=1e-5)   # switched
        np.testing.assert_allclose(out[0, 1], np.asarray(cpg)[0, 1])  # high loss
        np.testing.assert_allclose(out[0, 2], np.asarray(cpg)[0, 2])  # not gt
