"""Data-parallel training step (pjit over the 1-D mesh).

Replaces the reference's per-GPU graph replication + AddGradientOperators +
NCCLAllreduce + per-GPU ACM SGD ops (``optimizer_wsl.py:18-137``) with one
jitted function: ``vmap`` the per-image forward/loss over the leading device
axis, mean the loss (== the reference's sum-allreduce followed by the op's
1/gpu_num normalization), ``jax.grad``, then the Caffe-style SGD update from
``nafwebsod_tpu/solver/sgd.py``. XLA lowers the gradient reduction to a
``psum`` over ICI because the batch is sharded and the params are replicated.

Gradient accumulation (``WSL.ITER_SIZE``) stays at the call level: each call
is one micro-iteration and the solver state decides when the parameter update
fires, exactly like the in-op counter of the reference's ACM op.
"""

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import NamedSharding, PartitionSpec as P

from nafwebsod_tpu.models import detector
from nafwebsod_tpu.ops import center as center_ops
from nafwebsod_tpu.solver import sgd

# Keys consumed by the jitted step, stacked over the device axis.
BATCH_KEYS = ('image', 'rois', 'obn_scores', 'labels_oh', 'valid_mask')


def stack_minibatches(blob_list, size_bucket=None):
    """Host-side: list of per-image loader blob dicts -> one batch dict with a
    leading device axis. Images are zero-padded to the per-iteration max H/W
    (rounded up to ``size_bucket`` to bound XLA recompiles).

    Zero padding is transparent at the FIRST conv (it matches the conv's own
    zero padding) but not exactly thereafter: deeper layers see relu(bias)
    activations in the dead zone where the unpadded conv would re-pad with
    zeros, so features within ~a receptive field of the right/bottom image
    edge can differ slightly from an exact-size blob (standard
    batched-detector behavior; RoI pooling itself never reads the dead zone
    — the context head additionally clips its rings at the true image
    extent via the 'im_hw' blob)."""
    ims = [b['data'][0] for b in blob_list]
    h = max(im.shape[0] for im in ims)
    w = max(im.shape[1] for im in ims)
    if size_bucket:
        h = ((h + size_bucket - 1) // size_bucket) * size_bucket
        w = ((w + size_bucket - 1) // size_bucket) * size_bucket
    canvas = np.zeros((len(ims), h, w, 3), dtype=np.float32)
    for i, im in enumerate(ims):
        canvas[i, :im.shape[0], :im.shape[1]] = im
    batch = {
        'image': canvas,
        'rois': np.stack([b['rois'] for b in blob_list]).astype(np.float32),
        'obn_scores': np.stack(
            [b['obn_scores'] for b in blob_list]).astype(np.float32),
        'labels_oh': np.stack(
            [b['labels_oh'] for b in blob_list]).astype(np.float32),
        'valid_mask': np.stack([b['valid_mask'] for b in blob_list]),
    }
    # extra per-image blobs (supervised path: labels_int32, bbox_targets,
    # bbox_inside/outside_weights, ...) stack straight through
    skip = set(batch) | {'data', 'im_scale', 'data_ids'}
    for k in blob_list[0]:
        if k not in skip and isinstance(blob_list[0][k], np.ndarray):
            batch[k] = np.stack([b[k] for b in blob_list])
    # the per-image forward expects image rank 4: (1, H, W, 3)
    batch['image'] = batch['image'][:, None]
    return batch


def round_up(n, multiple):
    return ((n + multiple - 1) // multiple) * multiple


def init_shadow(spec, params):
    """Pre-cast bf16 copies of the big compute-path weights (TPU.SHADOW_BF16).

    Stored in ``opt_state['shadow']`` and substituted into the params seen by
    the forward, making the in-graph ``w.astype(x.dtype)`` an identity: the
    per-step fp32->bf16 weight convert moves out of the forward and fuses
    into the SGD update (trainable leaves) or disappears entirely (frozen
    leaves, cast once here). Returns None when the spec has no eligible
    leaves (see ``detector.shadow_weight_names``).

    MEASURED SLOWER on v5e (52.2 vs 54.8 img/s, flagship shapes): XLA
    already folds the weight convert into the GEMM/conv operand load, so
    the shadow's only real effect was adding the post-update re-cast of
    the trainable fc towers as unfused HBM traffic. Kept (off by default,
    TPU.SHADOW_BF16) with exact-parity tests for re-evaluation on future
    toolchains."""
    names = detector.shadow_weight_names(spec, params)
    if not names:
        return None
    return {k: jnp.asarray(params[k], jnp.bfloat16) for k in sorted(names)}


def _shadow_grads_and_loss(loss_grad_fn, params, shadow):
    """Run ``loss_grad_fn`` on shadow-substituted params and return fp32
    grads keyed like the master params.

    Numerically identical to the plain path: the gradient of a shadowed leaf
    arrives in bf16 (the dtype the GEMM actually produced) and today's cast
    VJP does exactly this bf16->fp32 convert."""
    pc = dict(params)
    pc.update(shadow)
    out, grads = loss_grad_fn(pc)
    grads = {k: (v.astype(jnp.float32) if k in shadow else v)
             for k, v in grads.items()}
    return out, grads


def _refresh_shadow(new_state, new_params, shadow, mults):
    """Recompute shadows of trainable leaves from the updated master params;
    frozen leaves (lr_mult == decay_mult == 0) carry through untouched."""
    md = dict(mults)
    new_state['shadow'] = {
        k: (v if md.get(k, (1.0, 1.0)) == (0.0, 0.0)
            else new_params[k].astype(jnp.bfloat16))
        for k, v in shadow.items()}
    return new_state


def _vmap_forward_train(spec, params, batch, rngs):
    """``forward_train`` over the device's images, as ``(totals, auxs)``
    with a leading image axis.

    The B == 1 case (EVERY WSL config: the reference trains 1 image/GPU,
    na_wsddn_V-16-C5_1x.yaml:31) is specialized to a DIRECT call +
    expand_dims — semantically identical to a size-1 vmap, but it keeps
    data-dependent ``lax.cond`` skips inside the forward REAL
    conditionals: under vmap a batched-predicate cond lowers to
    ``select_n`` and executes BOTH branches, which silently turned the
    CPG per-seed gating (ops/cpg.py cpg_maps) into max_gt unconditional
    sequential backward passes in the production step while the family
    benchmark (un-vmapped) measured the gated fast path."""
    b_dim = jax.tree_util.tree_leaves(batch)[0].shape[0]
    if b_dim == 1:
        total, aux = detector.forward_train(
            spec, params, jax.tree.map(lambda x: x[0], batch), rngs[0])
        return (jnp.expand_dims(total, 0),
                jax.tree.map(lambda v: jnp.expand_dims(v, 0), aux))
    return jax.vmap(
        lambda b, r: detector.forward_train(spec, params, b, r)
    )(batch, rngs)


def _step_body(spec, hp, mults, center_update_period, params, opt_state,
               batch, lr, rngs, mesh=None):
    """One data-parallel step (shared by the single-step and scan drivers).

    With ``mesh`` given, the gradient all-reduce is FUSED: per-device
    gradients are computed under ``shard_map``, raveled into one flat f32
    vector, and reduced with a single ``psum`` — one collective instead of
    one per parameter leaf (~550 for the flagship model). The reference's
    NCCL path reduces per-blob (optimizer_wsl.py:52-72); one fused
    all-reduce is the ICI-native layout. Without ``mesh`` the reduction is
    left to XLA's sharding propagation (original formulation)."""
    if mesh is not None:
        return _step_body_fused(spec, hp, mults, center_update_period,
                                params, opt_state, batch, lr, rngs, mesh)

    def loss_fn(p):
        totals, auxs = _vmap_forward_train(spec, p, batch, rngs)
        # '__'-prefixed aux entries are cross-device SUM deltas (e.g. the
        # center-loss accumulators, reference allreduce in
        # cpg_utils.Center_loss_surgery); plain metrics are averaged.
        deltas = {k: jnp.sum(v, axis=0)
                  for k, v in auxs.items() if k.startswith('__')}
        metrics = {k: jnp.mean(v)
                   for k, v in auxs.items() if not k.startswith('__')}
        return jnp.mean(totals), (metrics, deltas)

    grad_fn = jax.value_and_grad(loss_fn, has_aux=True)
    shadow = opt_state.get('shadow')
    if shadow is not None:
        (loss, (aux, deltas)), grads = _shadow_grads_and_loss(
            grad_fn, params, shadow)
    else:
        (loss, (aux, deltas)), grads = grad_fn(params)
    new_params, new_state = sgd.update(
        params, grads, opt_state, lr, hp, mults)
    if shadow is not None:
        new_state = _refresh_shadow(new_state, new_params, shadow, mults)
    if spec.center_loss:
        accum = {'center_dcf': opt_state['center_dcf'],
                 'center_ndcf': opt_state['center_ndcf']}
        cf, accum = center_ops.center_update(
            new_params['center_feature'],
            accum,
            {'center_dcf': deltas['__center_dcf'],
             'center_ndcf': deltas['__center_ndcf']},
            new_state['it'], spec.center_loss_top_k,
            update=center_update_period)
        new_params['center_feature'] = cf
        new_state['center_dcf'] = accum['center_dcf']
        new_state['center_ndcf'] = accum['center_ndcf']
    return new_params, new_state, loss, aux


def _step_body_fused(spec, hp, mults, center_update_period, params,
                     opt_state, batch, lr, rngs, mesh):
    """Fused-allreduce variant: local grads under shard_map, ONE psum over
    the raveled gradient vector, then the (replicated) solver update."""
    from nafwebsod_tpu.parallel.mesh import (
        shard_map_compat as shard_map)

    n_total = jax.tree_util.tree_leaves(batch)[0].shape[0]
    shadow = opt_state.get('shadow')

    @partial(shard_map, mesh=mesh,
             in_specs=(P(), P(), P('data'), P('data')), out_specs=P())
    def local_grads(p, sh, b, r):
        def loss_fn(pp):
            totals, auxs = _vmap_forward_train(spec, pp, b, r)
            deltas = {k: jnp.sum(v, axis=0)
                      for k, v in auxs.items() if k.startswith('__')}
            metrics = {k: jnp.sum(v) / n_total
                       for k, v in auxs.items() if not k.startswith('__')}
            # local sum / global count == this shard's share of the mean
            return jnp.sum(totals) / n_total, (metrics, deltas)

        grad_fn = jax.value_and_grad(loss_fn, has_aux=True)
        if sh:
            (loss, (aux, deltas)), grads = _shadow_grads_and_loss(
                grad_fn, p, sh)
        else:
            (loss, (aux, deltas)), grads = grad_fn(p)
        # ONE lax.psum over the whole gradient pytree: XLA's all-reduce
        # combiner fuses the per-leaf collectives into one launch WITHOUT
        # the ravel/unravel round trip — the raveled formulation cost
        # ~24 ms/step at flagship shapes (copies + the liveness spike of
        # holding every gradient at once; measured round 4, BASELINE.md)
        grads = jax.lax.psum(grads, 'data')        # THE all-reduce
        loss = jax.lax.psum(loss, 'data')
        aux = jax.tree.map(lambda v: jax.lax.psum(v, 'data'), aux)
        deltas = jax.tree.map(lambda v: jax.lax.psum(v, 'data'), deltas)
        return grads, loss, aux, deltas

    grads, loss, aux, deltas = local_grads(params, shadow or {}, batch,
                                           rngs)
    new_params, new_state = sgd.update(
        params, grads, opt_state, lr, hp, mults)
    if shadow is not None:
        new_state = _refresh_shadow(new_state, new_params, shadow, mults)
    if spec.center_loss:
        accum = {'center_dcf': opt_state['center_dcf'],
                 'center_ndcf': opt_state['center_ndcf']}
        cf, accum = center_ops.center_update(
            new_params['center_feature'],
            accum,
            {'center_dcf': deltas['__center_dcf'],
             'center_ndcf': deltas['__center_ndcf']},
            new_state['it'], spec.center_loss_top_k,
            update=center_update_period)
        new_params['center_feature'] = cf
        new_state['center_dcf'] = accum['center_dcf']
        new_state['center_ndcf'] = accum['center_ndcf']
    return new_params, new_state, loss, aux


def make_train_step(spec, hp, mults, mesh, donate=True,
                    center_update_period=128, fused_grads=True):
    """Build the jitted data-parallel train step.

    Returns ``step(params, opt_state, batch, lr, rngs) ->
    (params, opt_state, loss, aux)`` with params/opt_state replicated over
    ``mesh`` and ``batch``/``rngs`` sharded on the leading axis.
    ``fused_grads`` reduces the whole gradient pytree with one psum
    (see _step_body_fused); False leaves per-leaf reduction to XLA.
    """
    mults = sgd.freeze_mults(mults) if isinstance(mults, dict) else mults
    repl = NamedSharding(mesh, P())
    shard = NamedSharding(mesh, P('data'))

    def step(params, opt_state, batch, lr, rngs):
        return _step_body(spec, hp, mults, center_update_period, params,
                          opt_state, batch, lr, rngs,
                          mesh=mesh if fused_grads else None)

    # a single sharding for the batch arg applies to every leaf (including
    # optional extras like 'cur_iter' for the C-MIL schedule)
    return jax.jit(
        step,
        in_shardings=(repl, repl, shard, repl, shard),
        out_shardings=(repl, repl, repl, repl),
        donate_argnums=(0, 1) if donate else (),
    )


def make_multi_train_step(spec, hp, mults, mesh, donate=True,
                          center_update_period=128, fused_grads=True,
                          apply_factors=True):
    """K chained steps per device call via ``lax.scan`` (TPU.STEPS_PER_CALL).

    Per-call host dispatch dominates on remote-attached TPUs (~170 ms/call
    for the 550-leaf param pytree through this rig's tunnel vs ~26 ms of
    device compute) and costs real time even on local hosts; scanning K
    steps inside one program amortizes it Kx. The momentum-correction
    factors are applied IN-GRAPH before each step so LR boundaries inside
    the window behave exactly like the host-driven single-step path.

    Returns ``multi(params, opt_state, batches, lrs, factors, rngs) ->
    (params, opt_state, losses (K,), aux {name: (K,)})`` where every batch
    leaf is stacked (K, n_dev, ...), ``lrs``/``factors`` are (K,), and
    ``rngs`` is (K, n_dev, 2).

    ``apply_factors=False`` compiles WITHOUT the in-graph momentum
    rescaling — the unconditional scale_momentum rewrites the full
    momentum every scan step (~1.3 ms at flagship shapes) even at factor
    1.0; the train loop uses this variant for the (overwhelmingly common)
    windows that contain no LR boundary.
    """
    mults = sgd.freeze_mults(mults) if isinstance(mults, dict) else mults
    repl = NamedSharding(mesh, P())
    shard2 = NamedSharding(mesh, P(None, 'data'))

    def multi(params, opt_state, batches, lrs, factors, rngs):
        def one(carry, xs):
            p, s = carry
            batch, lr, factor, rng = xs
            if apply_factors:
                s = sgd.scale_momentum(s, factor)
            p, s, loss, aux = _step_body(
                spec, hp, mults, center_update_period, p, s, batch, lr, rng,
                mesh=mesh if fused_grads else None)
            return (p, s), (loss, aux)

        (p, s), (losses, auxs) = jax.lax.scan(
            one, (params, opt_state), (batches, lrs, factors, rngs))
        return p, s, losses, auxs

    return jax.jit(
        multi,
        in_shardings=(repl, repl, shard2, repl, repl, shard2),
        out_shardings=(repl, repl, repl, repl),
        donate_argnums=(0, 1) if donate else (),
    )




def device_rngs(key, num_devices):
    """Split a host PRNG key into per-device keys (leading device axis)."""
    return jax.random.split(key, num_devices)


@partial(jax.jit, static_argnames=('spec',))
def eval_step(spec, params, batch, rngs):
    """Loss-only forward over a stacked batch (used by tests/benchmarks)."""
    totals, auxs = _vmap_forward_train(spec, params, batch, rngs)
    return jnp.mean(totals), jax.tree.map(jnp.mean, auxs)
