"""ZeRO-1: data-parallel training with the optimizer state sharded.

The reference replicates the full momentum buffer on every GPU
(``ACMWeightDecayMomentumSGDUpdate`` per device, optimizer_wsl.py:18-137).
This step keeps the data-parallel forward/backward but shards the SGD
momentum over the mesh: the fused gradient all-reduce becomes a
``psum_scatter`` (each device receives only its 1/n slice of the reduced
gradient, halving the collective bytes vs psum), the Caffe-momentum update
runs on that slice, and one tiled ``all_gather`` rebuilds the full updated
parameter vector. Per-chip optimizer memory drops n-fold (~550 MB -> ~70 MB
on a v5e-8 for the 134M-param flagship); the collective volume per step is
the same 2x|params| as a bandwidth-optimal all-reduce.

Per-parameter lr/decay multipliers (the Caffe ``param_multipliers``
semantics, incl. the 'gn' special weight decay) are baked into two flat
per-ELEMENT vectors at build time, so the sliced update stays elementwise.
Numerics match the replicated-solver DP step exactly (same reduction
order as the fused psum path up to scatter/gather association), pinned by
tests/test_zero.py. Enable with ``TPU.ZERO_OPT``. iter_size > 1
accumulates in a SHARDED slice (1/n extra HBM per chip); center loss
rides along with replicated ~0.4 MB accumulators (see ``_build_step``).
"""

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.flatten_util import ravel_pytree
from jax.sharding import NamedSharding, PartitionSpec as P

from nafwebsod_tpu.models import detector
from nafwebsod_tpu.solver import sgd

AXIS = 'data'

from nafwebsod_tpu.parallel.mesh import shard_map_compat as _shard_map


def _flat_multipliers(params, hp, mults):
    """Per-ELEMENT (lr_mult, weight_decay) f32 vectors in ravel order."""
    mults = dict(mults) if not isinstance(mults, dict) else mults
    lr_parts, wd_parts = [], []
    for name, v in sorted(params.items()):
        lr_mult, decay_mult = mults[name]
        wd = hp.weight_decay_gn if decay_mult == 'gn' else (
            hp.weight_decay * decay_mult)
        n = int(np.prod(v.shape)) if v.shape else 1
        lr_parts.append(np.full(n, lr_mult, np.float32))
        wd_parts.append(np.full(n, wd, np.float32))
    return np.concatenate(lr_parts), np.concatenate(wd_parts)


def _check_ravel_order(params):
    """ravel_pytree flattens dicts in sorted-key order — the same order
    _flat_multipliers uses. Guard the assumption with an ORDER-SENSITIVE
    probe: tag each leaf with its sorted index and require the raveled
    tags to be block-ascending (a size-sum check cannot detect an order
    mismatch, which would silently misalign the per-element lr/decay
    multipliers with the flattened params)."""
    probe = {k: np.full(v.shape if v.shape else (1,), i, np.int32)
             for i, (k, v) in enumerate(sorted(params.items()))}
    tags = np.asarray(ravel_pytree(probe)[0])
    assert np.all(np.diff(tags) >= 0), (
        'ravel_pytree no longer flattens dicts in sorted-key order; the '
        'ZeRO per-element multiplier vectors would misalign')


def init_state(params, hp, mesh):
    """Sharded momentum (and, with iter_size > 1, a sharded gradient
    accumulator — the accumulator slices exactly like the momentum, so
    accumulation costs 1/n extra HBM per chip, not a full replica): flat
    f32 vectors padded to the mesh size, laid out P('data') so each device
    holds one slice."""
    n = mesh.devices.size
    flat, _ = ravel_pytree(params)
    pad = (-flat.shape[0]) % n
    mom = jnp.zeros((flat.shape[0] + pad,), jnp.float32)
    mom = jax.device_put(mom, NamedSharding(mesh, P(AXIS)))
    state = {'momentum': {'flat': mom}, 'it': jnp.zeros((), jnp.int32)}
    if hp.iter_size > 1:
        state['grad_acc'] = {'flat': jax.device_put(
            jnp.zeros((flat.shape[0] + pad,), jnp.float32),
            NamedSharding(mesh, P(AXIS)))}
    if 'center_feature' in params:
        # center-loss dCF/ndCF accumulators (replicated — ~0.4 MB; the DP
        # analogue is engine/train.py's opt_state entries)
        cf = params['center_feature']
        state['center_dcf'] = jnp.zeros(cf.shape, jnp.float32)
        state['center_ndcf'] = jnp.zeros(cf.shape[:2], jnp.float32)
    return state


def momentum_to_dict(params, state):
    """Sharded flat momentum -> the reference checkpoint's per-param dict
    (net_wsl.py '<param>_momentum' schema; gathers the vector to host).

    Multi-controller: the flat vector spans non-addressable devices, so
    fetching it requires a collective replication first — EVERY process
    must call this (engine/train._save does, before its host-0-only
    write), or the co-dispatched gather deadlocks."""
    flat, unravel = ravel_pytree(params)
    mom_arr = state['momentum']['flat']
    if hasattr(mom_arr, 'is_fully_addressable') and (
            not mom_arr.is_fully_addressable):
        mesh = mom_arr.sharding.mesh
        mom_arr = jax.jit(lambda x: x,
                          out_shardings=NamedSharding(mesh, P()))(mom_arr)
    mom = np.asarray(mom_arr)[:flat.shape[0]]
    return {k: np.asarray(v) for k, v in unravel(jnp.asarray(mom)).items()}


def momentum_from_dict(params, hp, mesh, momentum_dict):
    """Per-param momentum dict (AUTO_RESUME checkpoint) -> sharded state.
    Missing leaves start at zero, like the replicated solver."""
    state = init_state(params, hp, mesh)
    full = {k: jnp.asarray(momentum_dict[k]) if k in momentum_dict
            else jnp.zeros_like(v) for k, v in params.items()}
    flat, _ = ravel_pytree(full)
    pad = state['momentum']['flat'].shape[0] - flat.shape[0]
    if pad:
        flat = jnp.concatenate([flat, jnp.zeros((pad,), flat.dtype)])
    state['momentum']['flat'] = jax.device_put(
        flat.astype(jnp.float32), NamedSharding(mesh, P(AXIS)))
    return state


def _build_step(spec, hp, mults, mesh, params, center_update_period=128):
    """Shared un-jitted ZeRO step + sharding metadata for the single-step
    and scan-of-K drivers.

    Center loss rides along: the CF centers are a COMPUTED param
    (lr_mult == wd == 0, so the flat momentum update leaves them frozen)
    and the dCF/ndCF accumulators stay REPLICATED in the opt state —
    they are (C-1, M, D) ≈ 0.4 MB, n-fold sharding would save nothing —
    with the per-step deltas psum'd across the mesh exactly like the DP
    step (the reference's explicit NCCL allreduce in
    cpg_utils.Center_loss_surgery)."""
    mults_t = sgd.freeze_mults(mults) if isinstance(mults, dict) else mults
    n = mesh.devices.size
    _check_ravel_order(params)
    flat0, unravel = ravel_pytree(params)
    total = int(flat0.shape[0])
    pad = (-total) % n
    lr_mult, wd = _flat_multipliers(params, hp, dict(mults_t))
    lr_mult = np.pad(lr_mult, (0, pad))
    wd = np.pad(wd, (0, pad))
    momentum = np.float32(hp.momentum)

    repl = NamedSharding(mesh, P())
    shard = NamedSharding(mesh, P(AXIS))
    batch_shard = NamedSharding(mesh, P(AXIS))
    # the per-element multiplier vectors are placed ONCE in the sharded
    # layout and passed as step arguments: baking them into the program as
    # jnp constants would materialize ~2x|params| of replicated f32 per
    # chip — more HBM than the sharded momentum saves
    lr_mult_dev = jax.device_put(jnp.asarray(lr_mult), shard)
    wd_dev = jax.device_put(jnp.asarray(wd), shard)

    iter_size = int(hp.iter_size)

    @partial(_shard_map, mesh=mesh,
             in_specs=(P(), P(AXIS), P(AXIS), P(AXIS), P(AXIS), P(AXIS),
                       P(), P(), P(AXIS)),
             out_specs=(P(), P(AXIS), P(AXIS), P(), P(), P()))
    def step_local(p, pslice, batch, rngs, mom_slice, acc_slice, it, lr,
                   mult_slices):
        lr_mult_s, wd_s = mult_slices

        def loss_fn(pp):
            # B==1-specialized (keeps forward_train's lax.cond skips real
            # conditionals — see train_step._vmap_forward_train)
            from nafwebsod_tpu.parallel.train_step import _vmap_forward_train
            totals, auxs = _vmap_forward_train(spec, pp, batch, rngs)
            # '__'-prefixed entries are cross-device SUM deltas (center
            # accumulators); plain metrics are means (train_step._step_body)
            deltas = {k: jnp.sum(v, axis=0)
                      for k, v in auxs.items() if k.startswith('__')}
            metrics = {k: jnp.sum(v) / n for k, v in auxs.items()
                       if not k.startswith('__')}
            return jnp.sum(totals) / n, (metrics, deltas)

        (loss, (aux, deltas)), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(p)
        gflat = ravel_pytree(grads)[0]
        if pad:
            gflat = jnp.concatenate(
                [gflat, jnp.zeros((pad,), gflat.dtype)])
        # reduce + scatter in one collective: this device ends up with the
        # fully-reduced 1/n slice it owns (half the bytes of an
        # all-reduce; the other half is the param all_gather below)
        gslice = jax.lax.psum_scatter(gflat, AXIS, scatter_dimension=0,
                                      tiled=True)
        if iter_size > 1:
            # sgd.update's accumulation semantics on the owned slice:
            # accumulate every call, fire the momentum update with the
            # MEAN of the accumulated grads every iter_size-th call
            acc_slice = acc_slice + gslice
            fire = (it % iter_size) == 0
            gslice = acc_slice / float(iter_size)
        else:
            fire = jnp.bool_(True)
        # Caffe/ACM momentum update on the owned slice
        # (acm_weightdecay_momentum_sgd_op.h:79-112 semantics). Frozen
        # elements (lr_mult == 0 AND wd == 0) are excluded entirely like
        # sgd._apply: a checkpoint carrying nonzero momentum for a frozen
        # leaf must not drift the frozen weights via v = mu * mom
        frozen = (lr_mult_s == 0.0) & (wd_s == 0.0)
        g = gslice + wd_s * pslice
        v = momentum * mom_slice + (lr * lr_mult_s) * g
        v = jnp.where(frozen, mom_slice, v)
        new_pslice = jnp.where(frozen, pslice, pslice - v)
        # held (non-boundary) micro-iterations keep params/momentum as-is
        v = jnp.where(fire, v, mom_slice)
        new_pslice = jnp.where(fire, new_pslice, pslice)
        new_acc = jnp.where(fire, jnp.zeros_like(acc_slice), acc_slice)
        # rebuild the full parameter vector for the next forward
        new_flat = jax.lax.all_gather(new_pslice, AXIS, tiled=True)
        loss = jax.lax.psum(loss, AXIS)
        aux = jax.tree.map(lambda x: jax.lax.psum(x, AXIS), aux)
        deltas = jax.tree.map(lambda x: jax.lax.psum(x, AXIS), deltas)
        return new_flat, v, new_acc, loss, aux, deltas

    def step(p, opt_state, batch, lr, rngs, mult_slices):
        flat_p, _ = ravel_pytree(p)
        if pad:
            flat_p = jnp.concatenate(
                [flat_p, jnp.zeros((pad,), flat_p.dtype)])
        it = opt_state['it'] + 1
        acc = (opt_state['grad_acc']['flat'] if iter_size > 1 else
               jnp.zeros_like(opt_state['momentum']['flat']))
        new_flat, new_mom, new_acc, loss, aux, deltas = step_local(
            p, flat_p, batch, rngs, opt_state['momentum']['flat'], acc,
            it, lr, mult_slices)
        new_params = unravel(new_flat[:total])
        new_state = {'momentum': {'flat': new_mom}, 'it': it}
        if iter_size > 1:
            new_state['grad_acc'] = {'flat': new_acc}
        if spec.center_loss:
            # periodic center move on the psum'd deltas — identical to the
            # DP step's tail (train_step._step_body); CF itself was frozen
            # through the flat update (lr_mult == wd == 0)
            from nafwebsod_tpu.ops import center as center_ops
            accum = {'center_dcf': opt_state['center_dcf'],
                     'center_ndcf': opt_state['center_ndcf']}
            cf, accum = center_ops.center_update(
                new_params['center_feature'], accum,
                {'center_dcf': deltas['__center_dcf'],
                 'center_ndcf': deltas['__center_ndcf']},
                it, spec.center_loss_top_k,
                update=center_update_period)
            new_params['center_feature'] = cf
            new_state['center_dcf'] = accum['center_dcf']
            new_state['center_ndcf'] = accum['center_ndcf']
        return new_params, new_state, loss, aux

    opt_shardings = {'momentum': {'flat': shard}, 'it': repl}
    if iter_size > 1:
        opt_shardings['grad_acc'] = {'flat': shard}
    if spec.center_loss:
        opt_shardings['center_dcf'] = repl
        opt_shardings['center_ndcf'] = repl
    return {
        'step': step,
        'opt_shardings': opt_shardings,
        'repl': repl,
        'shard': shard,
        'batch_shard': batch_shard,
        'mults_dev': (lr_mult_dev, wd_dev),
        'mesh': mesh,
    }


def make_zero_train_step(spec, hp, mults, mesh, params, donate=False,
                         center_update_period=128):
    """Jitted ZeRO-1 data-parallel train step: ``step(params, opt_state,
    batch, lr, rngs) -> (params, opt_state, loss, aux)`` with the same
    batch layout as the replicated DP step (leading axis = mesh size, one
    image per device) and ``opt_state`` from ``zero.init_state``. With
    ``hp.iter_size > 1`` gradients accumulate in a SHARDED slice and the
    momentum update fires every iter_size-th call, mirroring
    ``sgd.update``'s mean-of-accumulated semantics."""
    b = _build_step(spec, hp, mults, mesh, params,
                    center_update_period=center_update_period)
    repl, opt_shardings = b['repl'], b['opt_shardings']
    jitted = jax.jit(
        b['step'],
        in_shardings=(repl, opt_shardings, b['batch_shard'], repl,
                      b['batch_shard'], (b['shard'], b['shard'])),
        out_shardings=(repl, opt_shardings, repl, repl),
        # donate params + momentum buffers (the modes built to SAVE HBM
        # must not double-buffer a 536 MB param vector per step)
        donate_argnums=(0, 1) if donate else (),
    )
    mults_dev = b['mults_dev']

    def run(p, opt_state, batch, lr, rngs):
        return jitted(p, opt_state, batch, lr, rngs, mults_dev)

    return run


def make_zero_multi_train_step(spec, hp, mults, mesh, params, donate=False,
                               center_update_period=128):
    """K chained ZeRO steps per device call via ``lax.scan``
    (TPU.STEPS_PER_CALL; the same dispatch-amortization contract as
    ``train_step.make_multi_train_step``): ``multi(params, opt_state,
    batches, lrs, factors, rngs)`` with batch leaves stacked
    (K, n_dev, ...), ``lrs``/``factors`` (K,), ``rngs`` (K, n_dev, ...).
    Momentum-correction factors rescale the SHARDED flat momentum slice
    in-graph before each step (``sgd.scale_momentum`` semantics)."""
    b = _build_step(spec, hp, mults, mesh, params,
                    center_update_period=center_update_period)
    step = b['step']
    repl, opt_shardings = b['repl'], b['opt_shardings']
    mults_dev = b['mults_dev']

    def multi(p, opt_state, batches, lrs, factors, rngs, mult_slices):
        def one(carry, xs):
            p, s = carry
            batch, lr, factor, rng = xs
            s = dict(s)
            s['momentum'] = {'flat': s['momentum']['flat'] * factor}
            p, s, loss, aux = step(p, s, batch, lr, rng, mult_slices)
            return (p, s), (loss, aux)

        (p, s), (losses, auxs) = jax.lax.scan(
            one, (p, opt_state), (batches, lrs, factors, rngs))
        return p, s, losses, auxs

    batch_scan = NamedSharding(b['mesh'], P(None, AXIS))
    jitted = jax.jit(
        multi,
        in_shardings=(repl, opt_shardings, batch_scan, repl, repl,
                      batch_scan, (b['shard'], b['shard'])),
        out_shardings=(repl, opt_shardings, repl, repl),
        donate_argnums=(0, 1) if donate else (),
    )

    def run(p, opt_state, batches, lrs, factors, rngs):
        return jitted(p, opt_state, batches, lrs, factors, rngs, mults_dev)

    return run
