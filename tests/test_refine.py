"""Refinement-ladder tests: RoILabel / RoIMerge / SoftmaxWithLossN / PCL
golden semantics vs direct numpy ports of the reference C++, plus model-level
integration of the OICR / C-MIL / PCL ladders."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from nafwebsod_tpu.models import detector
from nafwebsod_tpu.ops import losses as loss_ops
from nafwebsod_tpu.ops import refine
from nafwebsod_tpu.ops.jbox import roi_iou


def _rand_rois(rng, R, H=100, W=100):
    x1 = rng.uniform(0, W - 30, R)
    y1 = rng.uniform(0, H - 30, R)
    x2 = np.minimum(x1 + rng.uniform(10, 50, R), W - 1)
    y2 = np.minimum(y1 + rng.uniform(10, 50, R), H - 1)
    return np.stack([np.zeros(R), x1, y1, x2, y2], 1).astype(np.float32)


class TestRoILabel:
    def test_matches_numpy_reference(self):
        rng = np.random.RandomState(0)
        R, C = 12, 4
        scores = rng.rand(R, C).astype(np.float32)
        rois = _rand_rois(rng, R)
        iou = np.asarray(roi_iou(jnp.asarray(rois)))
        labels_oh = np.zeros((1, C), np.float32)
        labels_oh[0, [1, 3]] = 1

        lbl, w = refine.roi_label(jnp.asarray(scores), jnp.asarray(iou),
                                  jnp.asarray(labels_oh))
        lbl, w = np.asarray(lbl), np.asarray(w)

        # numpy port of roi_label_op.cc:50-126 (top_k=1, uncapped)
        seeds = []
        for c in range(C):
            if labels_oh[0, c] != 1:
                continue
            n = int(np.argmax(scores[:, c]))
            seeds.append((n, c, scores[n, c]))
        for n in range(R):
            ious = [iou[n, g] for g, _, _ in seeds]
            i = int(np.argmax(ious))
            g, c, p = seeds[i]
            max_iou = ious[i]
            if max_iou >= 0.5:
                assert lbl[n] == c + 1 and w[n] == pytest.approx(p, rel=1e-5)
            elif max_iou >= -1.0 and max_iou < 0.5:
                assert lbl[n] == 0 and w[n] == pytest.approx(p, rel=1e-5)

    def test_random_order_caps_match_cc_loop(self):
        """cap_rng mode == a literal numpy transcription of the
        roi_label_op.cc:76-126 capped loop fed the SAME visit order
        (C-MIL's 32/96-style caps scaled down so they bind)."""
        rng = np.random.RandomState(4)
        R, C = 24, 4
        fg_th, bg_hi, bg_lo = 0.6, 0.4, 0.1
        n_pos, n_neg = 3, 5
        scores = rng.rand(R, C).astype(np.float32)
        rois = _rand_rois(rng, R)
        iou = np.asarray(roi_iou(jnp.asarray(rois)))
        labels_oh = np.zeros((1, C), np.float32)
        labels_oh[0, [0, 2]] = 1

        key = jax.random.PRNGKey(7)
        lbl, w = refine.roi_label(
            jnp.asarray(scores), jnp.asarray(iou), jnp.asarray(labels_oh),
            fg_thresh=fg_th, bg_thresh_hi=bg_hi, bg_thresh_lo=bg_lo,
            num_pos=n_pos, num_neg=n_neg, cap_rng=key)
        lbl, w = np.asarray(lbl), np.asarray(w)

        # the device op's visit order (rank per roi -> visit sequence)
        visit_rank = np.asarray(jax.random.permutation(key, R))
        visit_seq = np.argsort(visit_rank)

        # literal transcription of the capped C++ loop
        seeds = []
        for c in range(C):
            if labels_oh[0, c] != 1:
                continue
            n = int(np.argmax(scores[:, c]))
            seeds.append((n, c, scores[n, c]))
        exp_lbl = np.zeros(R, np.int64)
        exp_w = np.zeros(R, np.float64)
        num_pos = num_neg = 0
        for n in visit_seq:
            ious = [iou[n, g] for g, _, _ in seeds]
            i = int(np.argmax(ious))
            _, c, p = seeds[i]
            max_iou = ious[i]
            if max_iou >= fg_th and num_pos <= n_pos:
                exp_lbl[n] = c + 1
                exp_w[n] = p
                num_pos += 1
            elif bg_lo <= max_iou < bg_hi and num_neg <= n_neg:
                exp_lbl[n] = 0
                exp_w[n] = p
                num_neg += 1
            else:
                exp_lbl[n] = c + 1
                exp_w[n] = 0.0
        np.testing.assert_array_equal(lbl, exp_lbl)
        np.testing.assert_allclose(w, exp_w, rtol=1e-5)
        # the caps bound (otherwise this test is vacuous)
        assert num_pos > n_pos or num_neg > n_neg

    def test_padding_and_offset(self):
        rng = np.random.RandomState(1)
        R, C = 8, 3
        scores = rng.rand(R, C + 1).astype(np.float32)  # with bg col
        rois = _rand_rois(rng, R)
        iou = np.asarray(roi_iou(jnp.asarray(rois)))
        labels_oh = np.zeros((1, C), np.float32)
        labels_oh[0, 0] = 1
        valid = np.ones(R, bool)
        valid[6:] = False
        lbl, w = refine.roi_label(jnp.asarray(scores), jnp.asarray(iou),
                                  jnp.asarray(labels_oh),
                                  valid_mask=jnp.asarray(valid))
        assert np.all(np.asarray(w)[6:] == 0)
        assert np.all(np.asarray(lbl)[6:] == 0)
        assert np.asarray(lbl).max() <= C


class TestRoIMerge:
    def test_cliques_and_average(self):
        rng = np.random.RandomState(2)
        R, C = 10, 5
        # two tight clusters of boxes -> two cliques at high lambda
        base = _rand_rois(rng, 2)
        rois = np.repeat(base, 5, axis=0)
        rois[:, 1:] += rng.uniform(-1, 1, (R, 4)).astype(np.float32)
        obn = rng.rand(R, 1).astype(np.float32)
        fc8c = rng.randn(R, C).astype(np.float32)
        fc8d = rng.randn(R, C).astype(np.float32)
        iou = roi_iou(jnp.asarray(rois))

        mc, md, clique, counts, mvalid = refine.roi_merge(
            jnp.asarray(obn), iou, jnp.asarray(fc8c), jnp.asarray(fc8d),
            jnp.float32(0.5))
        clique = np.asarray(clique)
        counts = np.asarray(counts)
        # every roi assigned; counts consistent
        assert (clique >= 0).all()
        total = counts[counts > 0].sum()
        assert total == R
        # clique members average their logits
        mc = np.asarray(mc)
        for cid in np.unique(clique):
            members = np.where(clique == cid)[0]
            np.testing.assert_allclose(mc[cid], fc8c[members].mean(0),
                                       rtol=1e-5, atol=1e-6)

    def test_gradient_scatter_divide(self):
        """d mc / d fc8c must equal the reference's scatter of grad/|clique|
        (roi_merge_op.cc:200-235)."""
        rng = np.random.RandomState(3)
        R, C = 6, 3
        rois = _rand_rois(rng, R)
        obn = rng.rand(R, 1).astype(np.float32)
        fc8c = rng.randn(R, C).astype(np.float32)
        fc8d = rng.randn(R, C).astype(np.float32)
        iou = roi_iou(jnp.asarray(rois))
        g_up = rng.randn(R, C).astype(np.float32)

        def f(x):
            mc, md, clique, counts, _ = refine.roi_merge(
                jnp.asarray(obn), iou, x, jnp.asarray(fc8d), jnp.float32(0.3))
            return jnp.sum(mc * g_up), (clique, counts)

        (val, (clique, counts)), grad = jax.value_and_grad(f, has_aux=True)(
            jnp.asarray(fc8c))
        clique, counts = np.asarray(clique), np.asarray(counts)
        expect = g_up[clique] / counts[clique][:, None]
        np.testing.assert_allclose(np.asarray(grad), expect, rtol=1e-5,
                                   atol=1e-6)

    def test_lambda_schedule(self):
        # lambda(0) == 0, lambda(max_epoch*size_epoch) == 1
        assert float(refine.cmil_lambda(0.0, 5000, 8)) == pytest.approx(0.0)
        assert float(refine.cmil_lambda(8 * 5000, 5000, 8)) == pytest.approx(
            1.0, abs=1e-6)


class TestSoftmaxWithLossN:
    def test_forward_and_grad_normalization(self):
        rng = np.random.RandomState(4)
        R, C = 6, 4
        logits = rng.randn(R, C).astype(np.float32)
        labels = rng.randint(0, C, R).astype(np.int32)
        w = np.array([0.5, 0.0, 2.0, 0.0, 1.0, 0.25], np.float32)

        loss = float(loss_ops.softmax_with_loss_n(
            jnp.asarray(logits), jnp.asarray(labels), jnp.asarray(w)))
        p = np.exp(logits - logits.max(1, keepdims=True))
        p /= p.sum(1, keepdims=True)
        nll = -np.log(p[np.arange(R), labels])
        assert loss == pytest.approx(float((w * nll).sum() / w.sum()),
                                     rel=1e-5)

        grad = jax.grad(lambda x: loss_ops.softmax_with_loss_n(
            x, jnp.asarray(labels), jnp.asarray(w)))(jnp.asarray(logits))
        onehot = np.eye(C, dtype=np.float32)[labels]
        count = (w != 0).sum()  # grad normalizes by COUNT, not weight sum
        expect = w[:, None] * (p - onehot) / count
        np.testing.assert_allclose(np.asarray(grad), expect, rtol=1e-4,
                                   atol=1e-6)


class TestPCL:
    def test_targets_shapes_and_semantics(self):
        rng = np.random.RandomState(5)
        R, C = 20, 3  # C fg classes
        boxes = _rand_rois(rng, R)[:, 1:]
        cls_prob = rng.rand(R, C).astype(np.float32)
        im_labels = np.zeros((1, C), np.float32)
        im_labels[0, [0, 2]] = 1
        cls_prob_new = rng.rand(R, C + 1).astype(np.float32)
        cls_prob_new /= cls_prob_new.sum(1, keepdims=True)

        out = refine.pcl_targets(boxes, cls_prob, im_labels, cls_prob_new)
        assert out['labels'].shape == (R,)
        assert set(np.unique(out['labels'])).issubset({0.0, 1.0, 3.0})
        assert out['im_labels_real'].shape == (1, C + 1)
        assert out['im_labels_real'][0, 0] == 1
        n_gt = out['pc_labels'].shape[0]
        assert 1 <= n_gt <= 2 * refine.PCL_MAX_PC_NUM
        # cluster stats consistent
        for i in range(n_gt):
            members = np.where(out['gt_assignment'] == i)[0]
            assert out['pc_count'][i] == len(members)

    def test_loss_and_exact_grad(self):
        rng = np.random.RandomState(6)
        R, C1 = 10, 4  # C1 = C + 1 incl bg
        probs = rng.rand(R, C1).astype(np.float32)
        probs /= probs.sum(1, keepdims=True)
        labels = np.array([0, 0, 1, 1, 0, 3, 3, 0, 0, 1], np.float32)
        clw = rng.rand(R).astype(np.float32)
        ga = np.array([-1, -1, 0, 0, -1, 1, 1, -1, -1, 0], np.float32)
        pc_labels = np.array([1, 3, 0], np.float32)  # padded 3rd row
        pc_probs = np.array([0.4, 0.6, 0.0], np.float32)
        pc_count = np.array([3, 2, 0], np.float32)
        img_w = np.array([0.7, 0.9, 0.0], np.float32)
        im_real = np.array([1, 1, 0, 1], np.float32)

        args = [jnp.asarray(x) for x in
                (probs, labels, clw, ga, pc_labels, pc_probs, pc_count,
                 img_w, im_real)]
        loss = float(refine.pcl_loss_full(*args))
        # manual forward (pcl_loss_op.cc:43-77, eps 1e-6)
        bg = -sum(clw[i] * np.log(max(probs[i, 0], 1e-6))
                  for i in range(R) if labels[i] == 0)
        fg = -(img_w[0] * np.log(max(pc_probs[0], 1e-6)) +
               img_w[1] * np.log(max(pc_probs[1], 1e-6)))
        assert loss == pytest.approx((bg + fg) / R, rel=1e-5)

        grad = np.asarray(jax.grad(
            lambda p: refine.pcl_loss_full(p, *args[1:]))(args[0]))
        # bg rois: -w/p0 / R; fg rois: -img_w/(count*pc_prob) / R at label col
        for i in range(R):
            if labels[i] == 0:
                assert grad[i, 0] == pytest.approx(
                    -clw[i] / max(probs[i, 0], 1e-5) / R, rel=1e-4)
            else:
                t = int(ga[i])
                c = int(pc_labels[t])
                assert grad[i, c] == pytest.approx(
                    -img_w[t] / (pc_count[t] * max(pc_probs[t], 1e-5)) / R,
                    rel=1e-4)


SPEC_KW = dict(num_classes=5, hidden_dim=16, webly_on=False,
               webly_entropy=False, box_head='vgg16_2fc')


def _ladder_batch(rng_seed=0, R=12, H=48, W=48):
    rng = np.random.RandomState(rng_seed)
    rois = _rand_rois(rng, R, H, W)
    labels = np.zeros((1, 4), np.float32)
    labels[0, [0, 2]] = 1
    return {
        'image': jnp.asarray(rng.randn(1, H, W, 3).astype(np.float32)),
        'rois': jnp.asarray(rois),
        'obn_scores': jnp.asarray(rng.rand(R, 1).astype(np.float32)),
        'labels_oh': jnp.asarray(labels),
        'valid_mask': jnp.ones((R,), bool),
        'cur_iter': jnp.asarray(100.0),
    }


class TestLadderIntegration:
    @pytest.mark.parametrize('flag', ['oicr', 'cmil', 'pcl'])
    def test_forward_train_and_test(self, flag):
        spec = detector.ModelSpec(**SPEC_KW, **{flag: True})
        params = detector.init_params(spec, jax.random.PRNGKey(0))
        k = spec.refine_k
        assert 'cls_score1_w' in params

        total, aux = detector.forward_train(spec, params, _ladder_batch(),
                                            jax.random.PRNGKey(1))
        assert np.isfinite(float(total))
        for i in range(1, k + 1):
            assert 'loss_cls{}'.format(i) in aux
            assert np.isfinite(float(aux['loss_cls{}'.format(i)]))

        b = _ladder_batch()
        out = detector.forward_test(spec, params, b['image'], b['rois'],
                                    b['obn_scores'], b['valid_mask'])
        scores = np.asarray(out['scores'])
        assert scores.shape == (12, 5)
        assert np.isfinite(scores).all()

    def test_refine_grads_flow(self):
        spec = detector.ModelSpec(**SPEC_KW, oicr=True)
        params = detector.init_params(spec, jax.random.PRNGKey(0))
        batch = _ladder_batch()

        grads = jax.grad(lambda p: detector.forward_train(
            spec, p, batch, jax.random.PRNGKey(1))[0])(params)
        assert float(jnp.abs(grads['cls_score1_w']).max()) > 0
        assert float(jnp.abs(grads['cls_score3_w']).max()) > 0


class TestMergeAssignSequentialParity:
    def _sequential_merge(self, obn, iou, lam, top_k=200, window=40):
        """Direct numpy transcription of the reference greedy clique loop
        (roi_merge_op.cc:67-135) for pinning the vectorized fixpoint
        formulation in refine._merge_assign."""
        r = len(obn)
        order = np.argsort(-obn, kind='stable')
        ids = np.full(r, -1, np.int64)
        cur = 0
        p = min(top_k, r)
        for t in range(p):
            n = order[t]
            if ids[n] != -1:
                continue
            ids[n] = cur
            end = min(t + window, p)
            for tt in range(t, end):
                i = order[tt]
                if ids[i] != -1:
                    continue
                ok = True
                for ttt in range(t, end):
                    j = order[ttt]
                    if ids[j] != cur:
                        continue
                    if iou[i, j] < lam:
                        ok = False
                        break
                if ok:
                    ids[i] = cur
            cur += 1
        for n in range(r):
            if ids[n] == -1:
                ids[n] = cur
                cur += 1
        return ids

    @pytest.mark.parametrize('seed,r,lam', [
        (0, 30, 0.3), (1, 64, 0.5), (2, 120, 0.2), (3, 50, 0.7),
        (4, 256, 0.4),
    ])
    def test_matches_reference_loop(self, seed, r, lam):
        rng = np.random.RandomState(seed)
        rois = _rand_rois(rng, r)
        obn = rng.rand(r).astype(np.float32)
        iou = np.asarray(roi_iou(jnp.asarray(rois)))
        want = self._sequential_merge(obn, iou, lam, top_k=40, window=8)
        got, counts = refine._merge_assign(
            jnp.asarray(obn), jnp.asarray(iou), jnp.float32(lam),
            jnp.ones((r,), bool), top_k=40, window=8)
        np.testing.assert_array_equal(np.asarray(got), want)
        want_counts = np.bincount(want, minlength=r)
        np.testing.assert_array_equal(np.asarray(counts), want_counts)

    def test_matches_reference_loop_default_window(self):
        rng = np.random.RandomState(9)
        r = 300
        rois = _rand_rois(rng, r)
        obn = rng.rand(r).astype(np.float32)
        iou = np.asarray(roi_iou(jnp.asarray(rois)))
        want = self._sequential_merge(obn, iou, 0.4)
        got, _ = refine._merge_assign(
            jnp.asarray(obn), jnp.asarray(iou), jnp.float32(0.4),
            jnp.ones((r,), bool))
        np.testing.assert_array_equal(np.asarray(got), want)


class TestMergePaddedRois:
    def test_padded_rois_never_join_real_cliques(self):
        """At lam == 0 every pair passes the IoU test, so an unmasked
        padded roi inside the sorted top block would join the first real
        clique and pollute the averaged logits with zero-canvas values
        (round-4 review finding). Merged outputs on a padded input must
        equal the unpadded computation."""
        rng = np.random.RandomState(0)
        n, pad, c = 10, 6, 4
        r = n + pad
        x1 = rng.uniform(0, 50, n).astype(np.float32)
        y1 = rng.uniform(0, 50, n).astype(np.float32)
        boxes = np.stack([x1, y1, x1 + 20, y1 + 20], 1)
        obn = rng.uniform(0.2, 1.0, n).astype(np.float32)
        fc8c = rng.randn(n, c).astype(np.float32)
        fc8d = rng.randn(n, c).astype(np.float32)

        def iou_of(b):
            from nafwebsod_tpu.ops.jbox import roi_iou
            r5 = np.hstack([np.zeros((len(b), 1), np.float32), b])
            return roi_iou(jnp.asarray(r5))

        # unpadded reference result
        mc0, md0, cl0, cnt0, mv0 = refine.roi_merge(
            jnp.asarray(obn), iou_of(boxes), jnp.asarray(fc8c),
            jnp.asarray(fc8d), jnp.float32(0.0),
            valid_mask=jnp.ones((n,), bool))

        # padded: garbage logits + zero boxes in the padding rows
        boxes_p = np.vstack([boxes, np.zeros((pad, 4), np.float32)])
        obn_p = np.concatenate([obn, np.full(pad, 0.15, np.float32)])
        fc8c_p = np.vstack([fc8c, np.full((pad, c), 7.0, np.float32)])
        fc8d_p = np.vstack([fc8d, np.full((pad, c), -7.0, np.float32)])
        valid = np.concatenate([np.ones(n, bool), np.zeros(pad, bool)])
        mc1, md1, cl1, cnt1, mv1 = refine.roi_merge(
            jnp.asarray(obn_p), iou_of(boxes_p), jnp.asarray(fc8c_p),
            jnp.asarray(fc8d_p), jnp.float32(0.0),
            valid_mask=jnp.asarray(valid))

        n_cliques = int(np.asarray(cl0).max()) + 1
        np.testing.assert_allclose(np.asarray(mc1)[:n_cliques],
                                   np.asarray(mc0)[:n_cliques], rtol=1e-6)
        np.testing.assert_allclose(np.asarray(md1)[:n_cliques],
                                   np.asarray(md0)[:n_cliques], rtol=1e-6)
        # valid rois keep identical clique structure
        np.testing.assert_array_equal(np.asarray(cl1)[:n],
                                      np.asarray(cl0)[:n])
        # padded rois land in masked-out singletons
        assert not np.asarray(mv1)[np.asarray(cl1)[n:]].any()
