"""Tensor (hidden-dimension) parallelism for the fc towers — Megatron-style.

The flagship model's parameters are dominated by the dual 4096-d fc towers
(fc6: 25088x4096 per tower — ~82% of the 134M parameters). The reference can
only replicate them per GPU (model_builder_wsl.py builds one full copy per
device and NCCL-allreduces gradients, optimizer_wsl.py:18-137); this module
shards the HIDDEN dimension over a mesh axis instead, the standard
"two-GEMM" tensor-parallel layout:

  * ``fc6`` is COLUMN-parallel: each device holds ``hidden/m`` output
    columns of ``fc6_w`` (and the matching ``fc6_b`` slice) and computes
    its slice of the activations with no communication;
  * ``fc7`` is ROW-parallel: each device holds ``hidden/m`` input rows of
    ``fc7_w``; the partial products are summed with ONE ``psum`` per tower
    — the only forward collective;
  * everything downstream (the tiny fc8 logit layers, softmaxes, losses)
    is replicated across the model axis; the conv body (frozen in the
    flagship config) is likewise replicated.

Backward communication is the mirror image and is implemented with
``jax.custom_vjp`` so no AD-transposed collective appears: the
column-parallel GEMM all-reduces the INPUT gradient (one psum per tower),
the row-parallel GEMM needs none. Weight gradients stay shard-local.

Composes with data parallelism on a 2-D mesh ``('data', 'model')``: one
image per data row, hidden shards across the model columns, and a single
fused psum of the raveled gradient vector over 'data' (same layout as
``parallel/train_step._step_body_fused``).

Scope: the WSDDN / webly noise-aware / context heads with the OICR /
PCL(device) / C-MIL refinement ladders, min-entropy loss, and center loss
— everything downstream of the towers reuses ``detector.wsl_tail_losses``,
so the sharded step's loss assembly is literally the unsharded code — plus
the supervised precomputed-proposal Fast R-CNN 2fc head (same towers;
tail = ``detector.fast_rcnn_tail_losses``). CSC / CPG / mask / FPN /
RPN-in-graph branches use the data-parallel step; see
``wsl_losses.check_scope``. Center loss threads the replicated dCF/ndCF
accumulators through the opt state with the per-image deltas summed over
the data axis — the same contract as the DP tail. Numerics are pinned
against the unsharded step on the virtual CPU mesh by
tests/test_tensor_shard.py.
Enable with ``TPU.TENSOR_SHARDING = m`` (model-axis size).
"""

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.flatten_util import ravel_pytree
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from nafwebsod_tpu.models import detector, heads
from nafwebsod_tpu.parallel import wsl_losses
from nafwebsod_tpu.solver import sgd

DATA_AXIS = 'data'
MODEL_AXIS = 'model'

from nafwebsod_tpu.parallel.mesh import shard_map_compat as _shard_map


def make_tp_mesh(n_model, n_data=1):
    """2-D mesh: ``n_data`` data rows x ``n_model`` hidden-shard columns."""
    devices = jax.devices()[:n_data * n_model]
    if len(devices) < n_data * n_model:
        raise ValueError('need {} devices, have {}'.format(
            n_data * n_model, len(jax.devices())))
    return Mesh(np.asarray(devices).reshape(n_data, n_model),
                (DATA_AXIS, MODEL_AXIS))


# --------------------------------------------------------------------------- #
# Parameter layout
# --------------------------------------------------------------------------- #

def param_pspec(name):
    """PartitionSpec for one named parameter leaf.

    fc6 weights are column-sharded (output/hidden dim), fc7 weights are
    row-sharded (input/hidden dim); the ``_[noisy]_``-prefixed tower leaves
    follow the same rule via the suffix match. Everything else (conv body,
    fc8 logit layers, biases of the row-parallel GEMM) is replicated.
    """
    if name.endswith('fc6_w'):
        return P(None, MODEL_AXIS)
    if name.endswith('fc6_b'):
        return P(MODEL_AXIS)
    if name.endswith('fc7_w'):
        return P(MODEL_AXIS, None)
    return P()


def param_pspecs(params):
    return {name: param_pspec(name) for name in params}


def opt_state_pspecs(params, opt_state):
    """Momentum (and grad-accumulator) buffers mirror the param sharding;
    scalars and center-loss accumulators are replicated."""
    specs = {}
    for k, v in opt_state.items():
        if k in ('momentum', 'grad_acc'):
            specs[k] = {name: param_pspec(name) for name in v}
        else:
            specs[k] = P()
    return specs


def shard_params(params, mesh):
    """Host->device placement honoring the per-leaf specs (the sharded
    leaves physically split; the rest replicate)."""
    return {
        name: jax.device_put(v, NamedSharding(mesh, param_pspec(name)))
        for name, v in params.items()
    }


def check_divisibility(params, n_model):
    for name, v in params.items():
        spec = param_pspec(name)
        for dim, axis in enumerate(spec):
            if axis == MODEL_AXIS and v.shape[dim] % n_model:
                raise ValueError(
                    '{} dim {} ({}) not divisible by model axis {}'.format(
                        name, dim, v.shape[dim], n_model))


# --------------------------------------------------------------------------- #
# The two parallel GEMMs (custom VJPs so backward collectives are explicit,
# not AD transposes — shard_map runs in the legacy check_vma=False mode
# where a transposed psum would re-broadcast and over-count)
# --------------------------------------------------------------------------- #

@partial(jax.custom_vjp, nondiff_argnums=(2,))
def col_parallel_dot(x, w_local, axis):
    """x (R, D) replicated @ w_local (D, H/m) -> local activation columns.
    Forward needs no communication; backward all-reduces dx over ``axis``
    (the input is consumed by every hidden shard)."""
    return jnp.dot(x, w_local)


def _col_fwd(x, w_local, axis):
    return jnp.dot(x, w_local), (x, w_local)


def _col_bwd(axis, res, g):
    x, w_local = res
    dx = jax.lax.psum(jnp.dot(g, w_local.T), axis)
    dw = jnp.dot(x.T, g)
    return dx, dw


col_parallel_dot.defvjp(_col_fwd, _col_bwd)


@partial(jax.custom_vjp, nondiff_argnums=(2,))
def row_parallel_dot(x_local, w_local, axis):
    """x_local (R, H/m) @ w_local (H/m, D) -> psum over ``axis`` = the full
    (R, D) product. Backward needs no communication: the output cotangent is
    replicated, so dx_local = g @ w_local.T and dw_local = x_local.T @ g are
    already the correct shard-local gradients."""
    return jax.lax.psum(jnp.dot(x_local, w_local), axis)


def _row_fwd(x_local, w_local, axis):
    return row_parallel_dot(x_local, w_local, axis), (x_local, w_local)


def _row_bwd(axis, res, g):
    x_local, w_local = res
    return jnp.dot(g, w_local.T), jnp.dot(x_local.T, g)


row_parallel_dot.defvjp(_row_fwd, _row_bwd)


def _fc_tower_tp(feat_flat, params, prefix, rng, train, axis):
    """Hidden-sharded fc6 -> relu -> drop -> fc7 -> relu -> drop
    (heads._fc_tower semantics; wsl_heads.py:23-52 tower shape).

    The fc6 dropout mask covers this device's hidden slice only, so its rng
    is folded with the model-axis index (distinct columns get independent
    draws, exactly one mask per hidden unit globally). The fc7-output
    dropout acts on a REPLICATED tensor and must agree across the model
    axis, so its rng is used unfolded."""
    r1 = r2 = None
    if rng is not None:
        r1, r2 = jax.random.split(rng)
        r1 = jax.random.fold_in(r1, jax.lax.axis_index(axis))
    dt = feat_flat.dtype
    x = col_parallel_dot(feat_flat, params[prefix + 'fc6_w'].astype(dt), axis)
    x = jax.nn.relu(x + params[prefix + 'fc6_b'].astype(dt))
    x = heads._dropout(x, 0.5, r1, train)
    y = row_parallel_dot(x, params[prefix + 'fc7_w'].astype(dt), axis)
    y = jax.nn.relu(y + params[prefix + 'fc7_b'].astype(dt))
    y = heads._dropout(y, 0.5, r2, train)
    return y


# --------------------------------------------------------------------------- #
# Training forward (plain WSDDN / webly noise-aware scope)
# --------------------------------------------------------------------------- #

# center loss is admitted HERE (not in the shared gate): this step threads
# the replicated dCF/ndCF accumulators through its opt state and sums the
# per-image deltas over the data axis, exactly like the DP step's tail.
# The supervised Fast R-CNN 2fc family is admitted too: precomputed
# proposals (same towers, tail switched to detector.fast_rcnn_tail_losses
# below) AND end-to-end Faster R-CNN (RPN in-graph) — for the latter the
# whole unsharded forward runs with the hidden-sharded tower INJECTED
# (detector.forward_train(tower_fn=...)); the RPN head, device proposal
# generation/labeling, and losses are all replicated across the model
# axis, so every rank computes them identically.
def _check_scope(spec):
    # The fcn MIL mask branch is admitted (allow_seg): wsl_tail_losses
    # receives the replicated conv features, the mask tower params are
    # replicated across the model axis and its per-RoI loss is row-local,
    # so the branch is identical on every model rank — the same situation
    # as the replicated fc8 heads. The deeplab branch is NOT: its CPG
    # pseudo-labels re-run the fc towers UNSHARDED inside an inner vjp
    # (wsl_tail_losses' cls_prob_fn), which cannot consume hidden-sharded
    # weights — deeplab trains on the data-parallel or RoI-sharded steps.
    wsl_losses.check_scope(
        spec, allow_center=True, allow_supervised=True,
        allow_faster_rcnn=True, allow_seg=True,
        extra_unsupported=(spec.mask_on and spec.mask_head == 'deeplab',))


def forward_train_tp(spec, params, batch, rng, axis=MODEL_AXIS):
    """Per-device training forward with the fc towers' hidden dimension
    sharded over ``axis``. ``batch`` holds this data-shard's image/rois
    (replicated across the model axis). Returns (total_loss, aux) for THIS
    image — replicated across the model axis; the caller averages over
    'data'. Only the towers are sharded: everything downstream (two-stream
    outputs, refinement ladders, min-entropy, losses) is the SAME
    ``detector.wsl_tail_losses`` the unsharded forward uses, so the
    admitted families inherit its numerics."""
    _check_scope(spec)
    if spec.faster_rcnn:
        # end-to-end Faster R-CNN: run the UNSHARDED forward with the
        # hidden-sharded tower injected — RPN, proposal generation/labeling
        # and the losses are replicated across the model axis (identical on
        # every rank); only the fc-tower GEMMs are sharded
        def tower(x, p, prefix, r, train):
            return _fc_tower_tp(x, p, prefix, r, train, axis)

        return detector.forward_train(spec, params, batch, rng,
                                      tower_fn=tower)
    image = batch['image']
    rois = batch['rois']
    obn = batch['obn_scores']

    feat, spatial_scale = detector.body_forward(spec, params, image)
    if spec.freeze_conv_body:
        feat = jax.lax.stop_gradient(feat)
    train = rng is not None

    if spec.is_context:
        im_hw = batch.get('im_hw')
        ih = image.shape[1] if im_hw is None else im_hw[0]
        iw = image.shape[2] if im_hw is None else im_hw[1]
        flats = heads.context_pooled_feats(
            feat, rois, obn, spatial_scale, ih, iw,
            context_ratio=spec.context_ratio,
            resolution=spec.roi_resolution,
            freeze_body=spec.freeze_conv_body)
        rngs = [None] * 3
        if train:
            rngs = list(jax.random.split(rng, 3))
        fc7_clean = tuple(_fc_tower_tp(x, params, '', r, train, axis)
                          for x, r in zip(flats, rngs))
        fc7_noisy = None
    else:
        roi_feat = heads.roi_transform(
            feat[0], rois, obn, spatial_scale, spec.roi_xform_method,
            spec.roi_resolution, spec.roi_sampling_ratio,
            spec.freeze_conv_body)
        r1 = r2 = None
        if train:
            r1, r2 = jax.random.split(rng)
        fc7_clean = _fc_tower_tp(roi_feat, params, '', r1, train, axis)
        fc7_noisy = None
        if spec.is_webly:
            fc7_noisy = _fc_tower_tp(roi_feat, params, '_[noisy]_', r2,
                                     train, axis)
    if spec.supervised:
        # Fast R-CNN tail on precomputed-proposal blobs — fc7 is replicated
        # after the row-parallel psum, so the tail (cls_score/bbox_pred +
        # losses) is literally the unsharded code
        return detector.fast_rcnn_tail_losses(spec, params, batch, fc7_clean)
    return detector.wsl_tail_losses(spec, params, batch, fc7_clean,
                                    fc7_noisy, feat, rng)


# --------------------------------------------------------------------------- #
# Train step
# --------------------------------------------------------------------------- #

def _make_grads_fn(spec, mesh, pspecs, n_data, dropout):
    """The shard_map'd loss/grad computation shared by the single-step and
    scan-of-K drivers."""

    @partial(_shard_map, mesh=mesh,
             in_specs=(pspecs, P(DATA_AXIS), P()),
             out_specs=(P(), P(), P(), pspecs))
    def grads_fn(p, batch, rng):
        local = jax.tree.map(lambda x: x[0], batch)  # this row's one image
        rng = (jax.random.fold_in(rng, jax.lax.axis_index(DATA_AXIS))
               if dropout else None)

        def loss_fn(pp):
            total, aux = forward_train_tp(spec, pp, local, rng)
            # '__'-prefixed entries are cross-image SUM deltas (the center
            # accumulators — train_step._step_body contract); plain
            # metrics are means over the global image count
            deltas = {k: v for k, v in aux.items() if k.startswith('__')}
            metrics = {k: v / n_data for k, v in aux.items()
                       if not k.startswith('__')}
            return total / n_data, (metrics, deltas)

        ((loss, (aux, deltas)), grads) = jax.value_and_grad(
            loss_fn, has_aux=True)(p)
        # ONE fused all-reduce over 'data' (the custom-VJP GEMMs already
        # produced full gradients on every model rank, so no 'model'
        # collective is needed here). With n_data == 1 it is a no-op.
        flat, unravel = ravel_pytree(grads)
        grads = unravel(jax.lax.psum(flat, DATA_AXIS))
        loss = jax.lax.psum(loss, DATA_AXIS)
        aux = jax.tree.map(lambda v: jax.lax.psum(v, DATA_AXIS), aux)
        deltas = jax.tree.map(lambda v: jax.lax.psum(v, DATA_AXIS), deltas)
        return loss, aux, deltas, grads

    return grads_fn


_center_tail = wsl_losses.center_tail


def make_tp_train_step(spec, hp, mults, mesh, params, dropout=True,
                       donate=False, center_update_period=128):
    """Jitted tensor-parallel (x data-parallel) train step over a 2-D
    ``('data', 'model')`` mesh.

    ``step(params, opt_state, batch, lr, rng) -> (params, opt_state, loss,
    aux)`` where every ``batch`` leaf has leading axis ``n_data`` (one image
    per data row, sharded over 'data'); params/opt_state carry the per-leaf
    hidden-shard layout (see ``param_pspec``) and stay resident in it across
    steps. ``dropout=False`` ignores the rng (used by the parity tests).
    ``params`` is consulted for leaf names/shapes only.
    """
    _check_scope(spec)
    mults = sgd.freeze_mults(mults) if isinstance(mults, dict) else mults
    n_data, n_model = mesh.devices.shape
    check_divisibility(params, n_model)
    pspecs = param_pspecs(params)
    repl = NamedSharding(mesh, P())
    grads_fn = _make_grads_fn(spec, mesh, pspecs, n_data, dropout)

    def step(params, opt_state, batch, lr, rng):
        loss, aux, deltas, grads = grads_fn(params, batch, rng)
        params, opt_state = sgd.update(params, grads, opt_state, lr, hp,
                                       mults)
        if spec.center_loss:
            params, opt_state = _center_tail(spec, params, opt_state,
                                             deltas, center_update_period)
        return params, opt_state, loss, aux

    param_shardings = {k: NamedSharding(mesh, s) for k, s in pspecs.items()}
    # opt_state layout depends on hp (grad_acc appears when iter_size > 1);
    # probe it abstractly — momentum/grad_acc mirror the param sharding
    probe = jax.eval_shape(lambda p: sgd.init_state(p, hp), params)
    opt_in = {
        k: ({n: param_shardings[n] for n in v}
            if k in ('momentum', 'grad_acc') else repl)
        for k, v in probe.items()}
    if spec.center_loss:
        # dCF/ndCF accumulators (engine/train.py adds them to opt_state):
        # ~0.4 MB, replicated
        opt_in['center_dcf'] = repl
        opt_in['center_ndcf'] = repl

    batch_shard = NamedSharding(mesh, P(DATA_AXIS))
    return jax.jit(
        step,
        in_shardings=(param_shardings, opt_in, batch_shard, repl, repl),
        out_shardings=(param_shardings, opt_in, repl, repl),
        donate_argnums=(0, 1) if donate else (),
    )


def make_tp_multi_train_step(spec, hp, mults, mesh, params, dropout=True,
                             donate=False, center_update_period=128):
    """K chained tensor-parallel steps per device call via ``lax.scan``
    (TPU.STEPS_PER_CALL; same dispatch-amortization contract as
    ``train_step.make_multi_train_step``, with the momentum-correction
    factors applied in-graph before each step).

    ``multi(params, opt_state, batches, lrs, factors, rngs) ->
    (params, opt_state, losses (K,), aux {name: (K,)})`` with every batch
    leaf stacked (K, n_data, ...) and ``rngs`` (K,) keys (replicated; the
    step folds in the data-row index)."""
    _check_scope(spec)
    mults = sgd.freeze_mults(mults) if isinstance(mults, dict) else mults
    n_data, n_model = mesh.devices.shape
    check_divisibility(params, n_model)
    pspecs = param_pspecs(params)
    repl = NamedSharding(mesh, P())

    grads_fn = _make_grads_fn(spec, mesh, pspecs, n_data, dropout)

    def multi(params, opt_state, batches, lrs, factors, rngs):
        def one(carry, xs):
            p, s = carry
            batch, lr, factor, rng = xs
            s = sgd.scale_momentum(s, factor)
            loss, aux, deltas, grads = grads_fn(p, batch, rng)
            p, s = sgd.update(p, grads, s, lr, hp, mults)
            if spec.center_loss:
                p, s = _center_tail(spec, p, s, deltas,
                                    center_update_period)
            return (p, s), (loss, aux)

        (p, s), (losses, auxs) = jax.lax.scan(
            one, (params, opt_state), (batches, lrs, factors, rngs))
        return p, s, losses, auxs

    param_shardings = {k: NamedSharding(mesh, s) for k, s in pspecs.items()}
    probe = jax.eval_shape(lambda p: sgd.init_state(p, hp), params)
    opt_in = {
        k: ({n: param_shardings[n] for n in v}
            if k in ('momentum', 'grad_acc') else repl)
        for k, v in probe.items()}
    if spec.center_loss:
        opt_in['center_dcf'] = repl
        opt_in['center_ndcf'] = repl
    batch_shard = NamedSharding(mesh, P(None, DATA_AXIS))
    return jax.jit(
        multi,
        in_shardings=(param_shardings, opt_in, batch_shard, repl, repl,
                      repl),
        out_shardings=(param_shardings, opt_in, repl, repl),
        donate_argnums=(0, 1) if donate else (),
    )
