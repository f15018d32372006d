"""Center loss over top-scoring RoI features.

TPU-native re-implementation of ``detectron/ops/center_loss_op.{cc,cu}``
(used by ``wsl_heads.add_center_loss:230-271``):

  * forward (``center_loss_op.cu:118-244``): for each ground-truth class c
    take the ``top_k`` highest-scoring RoIs; among the class's M candidate
    centers pick m* minimizing sum_k ||F_rk - CF[c,m]||^2; the loss is
    sum_c min_m (...) / (num_gt * K * D * 2). With CF and the top-k
    selection stop-gradient'd, plain autodiff reproduces the hand-written
    feature gradient dF_rk = dL * D_ck / (num_gt * K * D)
    (``center_loss_op.cu:515-527``).
  * center updates (``center_loss_op.cu:540-565``): gradient accumulators
    dCF[c,m*] -= sum_k D_ck and hit counts ndCF[c,m*] += 1 accumulate every
    iteration; every ``update`` iterations the centers move
    CF[c,m] -= lr / (ndCF[c,m] * K + 1) * dCF[c,m] and the accumulators
    reset — a functional ``center_update`` here, with the accumulators held
    in the solver state. Cross-device center-gradient summation replaces the
    reference's explicit NCCL allreduce (``cpg_utils.Center_loss_surgery``).

The centers CF live in the param dict as ``center_feature`` — the reference
stores them as a COMPUTED_PARAM so they ride along in pkl checkpoints
(wsl_heads.py:231-238) — but are excluded from the SGD update.
"""

import jax
import jax.numpy as jnp


def init_center_state(num_classes, num_center, feature_dim, rng,
                      dtype=jnp.float32):
    """(CF params entry, accumulator state dict). CF is GaussianFill-init
    (wsl_heads.py:231-238)."""
    cf = jax.random.normal(rng, (num_classes - 1, num_center, feature_dim),
                           dtype)
    accum = {
        'center_dcf': jnp.zeros((num_classes - 1, num_center, feature_dim),
                                dtype),
        'center_ndcf': jnp.zeros((num_classes - 1, num_center), dtype),
    }
    return cf, accum


def center_loss(labels_oh, rois_pred, features, cf, top_k, valid_mask=None):
    """Returns (loss, deltas dict) — deltas are the per-iteration dCF/ndCF
    contributions (dense (C-1, M, D) / (C-1, M)) for ``center_update``.

    labels_oh: (1, C-1); rois_pred: (R, C-1); features: (R, D); cf:
    (C-1, M, D).
    """
    gt = labels_oh[0] >= 0.5                       # (C-1,)
    scores = rois_pred
    if valid_mask is not None:
        scores = jnp.where(valid_mask[:, None], scores, -jnp.inf)
    _, idx = jax.lax.top_k(scores.T, top_k)        # (C-1, K)
    idx = jax.lax.stop_gradient(idx)
    f_sel = features[idx]                          # (C-1, K, D)
    return center_loss_from_selected(gt, f_sel, cf, top_k)


def center_loss_from_selected(gt, f_sel, cf, top_k):
    """The center-loss tail on already-selected top-k features: nearest
    center per gt class, loss, dCF/ndCF deltas (center_loss_op.cu:118-244).
    Split out so the RoI-sharded step can re-select the global top-k from
    gathered per-device candidates (parallel/roi_shard.center_loss_sharded)
    and share this exact tail. gt: (C-1,) bool; f_sel: (C-1, K, D)."""
    cm1, m, dfeat = cf.shape
    cf_sg = jax.lax.stop_gradient(cf)
    diffs = f_sel[:, None, :, :] - cf_sg[:, :, None, :]   # (C-1, M, K, D)
    dist = jnp.sum(jnp.square(diffs), axis=(2, 3))        # (C-1, M)
    m_star = jnp.argmin(dist, axis=1)                     # (C-1,)
    c_dot = jnp.min(dist, axis=1)

    num_gt = jnp.sum(gt)
    loss = jnp.sum(jnp.where(gt, c_dot, 0.0)) / (
        jnp.maximum(num_gt, 1) * top_k * dfeat * 2.0)

    # D_ck for the selected center; zero for non-gt classes
    d_sel = jnp.take_along_axis(
        diffs, m_star[:, None, None, None], axis=1)[:, 0]  # (C-1, K, D)
    d_sel = jax.lax.stop_gradient(
        jnp.where(gt[:, None, None], d_sel, 0.0))

    sel_oh = jax.nn.one_hot(m_star, m, dtype=cf.dtype) * gt[:, None]
    dcf_delta = -sel_oh[:, :, None] * jnp.sum(d_sel, axis=1)[:, None, :]
    ndcf_delta = sel_oh
    return loss, {'center_dcf': dcf_delta, 'center_ndcf': ndcf_delta}


def center_update(cf, accum, deltas, it, top_k, update=128, lr=0.5):
    """Accumulate this iteration's deltas and apply the periodic center move
    (center_loss_op.cu:540-565). ``it`` is the 1-based iteration counter
    AFTER this step; returns (new_cf, new_accum)."""
    dcf = accum['center_dcf'] + deltas['center_dcf']
    ndcf = accum['center_ndcf'] + deltas['center_ndcf']

    def fire(args):
        cf, dcf, ndcf = args
        denom = ndcf * top_k + 1.0
        cf = cf - lr * dcf / denom[:, :, None]
        return cf, jnp.zeros_like(dcf), jnp.zeros_like(ndcf)

    cf, dcf, ndcf = jax.lax.cond(
        (it % update) == 0, fire, lambda a: a, (cf, dcf, ndcf))
    return cf, {'center_dcf': dcf, 'center_ndcf': ndcf}
