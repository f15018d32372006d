"""Pipeline parallelism — GPipe-style 2-stage split (conv body | fc head).

The reference can only replicate the whole network per GPU; this module
splits it across a ``('pipe',)`` mesh axis at the natural seam of the
flagship config: stage 0 runs the (frozen) VGG16 conv body + RoIPool/boost,
stage 1 runs the dual fc towers + two-stream heads + losses + backward.
Microbatches flow through a ``lax.scan`` schedule with one
``jax.lax.ppermute`` hop per tick — at steady state stage 0 computes the
features of microbatch ``t`` while stage 1 trains on microbatch ``t-1``,
so both chips stay busy (fill/drain costs 1 tick of B+1).

The flagship config freezes the conv body
(configs/flickr_voc/na_wsddn_V-16-C5_1x.yaml:35 FREEZE_CONV_BODY), which
makes the pipeline one-directional: no gradient ever flows back to stage 0,
so there is no reverse ppermute and no bubble beyond the single fill tick.
Unfrozen bodies are rejected (the data-parallel / tensor-parallel steps
cover them).

Scope: the WSDDN / webly / context 2fc heads with the OICR / PCL(device) /
C-MIL ladders, min-entropy loss, and center loss (``wsl_losses.check_scope``,
shared with ``parallel/tensor_shard.py``; the center dCF/ndCF accumulators
ride replicated in the opt state with the per-microbatch deltas summed over
ticks — ``wsl_losses.center_tail``), plus the supervised
precomputed-proposal Fast R-CNN 2fc head (stage 1 tail =
``detector.fast_rcnn_tail_losses``); stage 1 reuses
``detector.wsl_tail_losses`` for the WSL families so loss assembly is
literally the unsharded code. The context head's three pooled streams concatenate into one
cross-pipe buffer. Gradients accumulate over the microbatches as a mean —
numerically the same step as the data-parallel mean over B images, pinned
by tests/test_pipeline.py.
Enable with ``TPU.PIPELINE_PARALLEL = True`` (2 stages).
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

AXIS = 'pipe'
N_STAGES = 2

from nafwebsod_tpu.parallel.mesh import shard_map_compat as _shard_map


def make_pipe_mesh(num_devices=N_STAGES):
    """1-D 2-device mesh over the pipeline axis (stage per device)."""
    if num_devices != N_STAGES:
        raise ValueError('the body|head pipeline has exactly 2 stages')
    if len(jax.devices()) < N_STAGES:
        raise ValueError('pipeline parallelism needs {} devices, have {}'
                         .format(N_STAGES, len(jax.devices())))
    return Mesh(np.asarray(jax.devices()[:N_STAGES]), (AXIS,))


def _check_scope(spec):
    # center loss is admitted: this step threads the replicated dCF/ndCF
    # accumulators through its opt state, with the per-microbatch deltas
    # summed over ticks (and the stage-0 zeros psum'd away). The supervised
    # precomputed-proposal Fast R-CNN 2fc head is admitted too: stage 0
    # pools the same flat RoI features, stage 1 switches the tail to
    # detector.fast_rcnn_tail_losses (see _head_loss).
    wsl_losses.check_scope(spec, allow_center=True, allow_supervised=True)
    if not spec.freeze_conv_body:
        raise NotImplementedError(
            'the 2-stage pipeline requires FREEZE_CONV_BODY (the flagship '
            'setting) — a trainable body needs a reverse gradient pipe; '
            'use the data-parallel or tensor-parallel step instead')


def _body_pool(spec, params, image, rois, obn, im_hw=None):
    """Stage-0 work: conv body + RoIPool/boost -> flat (R, C*P*P) features
    (detector._run_body_and_head front half; body frozen by scope). For the
    context head the three streams (origin/frame/ring) are concatenated
    into one (R, 3*C*P*P) buffer so a single ppermute still moves the
    stage boundary."""
    feat, spatial_scale = detector.body_forward(spec, params, image)
    feat = jax.lax.stop_gradient(feat)
    if spec.is_context:
        # image is (1, H, W, 3) like detector._run_body_and_head's input
        ih = image.shape[1] if im_hw is None else im_hw[0]
        iw = image.shape[2] if im_hw is None else im_hw[1]
        flats = heads.context_pooled_feats(
            feat, rois, obn, spatial_scale, ih, iw,
            context_ratio=spec.context_ratio,
            resolution=spec.roi_resolution, freeze_body=True)
        return jnp.concatenate(flats, axis=1)
    return heads.roi_transform(
        feat[0], rois, obn, spatial_scale, spec.roi_xform_method,
        spec.roi_resolution, spec.roi_sampling_ratio, True)


def _head_loss(spec, params, roi_feat, mb, rng):
    """Stage-1 work for one microbatch ``mb``: fc towers + the SAME
    ``detector.wsl_tail_losses`` the unsharded forward uses (two-stream
    outputs, refinement ladders, min-entropy, losses)."""
    train = rng is not None
    if spec.is_context:
        rngs = [None] * 3
        if train:
            rngs = list(jax.random.split(rng, 3))
        d = roi_feat.shape[1] // 3
        fc7_clean = tuple(
            heads._fc_tower(roi_feat[:, i * d:(i + 1) * d], params, '', r,
                            train)
            for i, r in enumerate(rngs))
        fc7_noisy = None
    else:
        r1 = r2 = None
        if train:
            r1, r2 = jax.random.split(rng)
        fc7_clean = heads._fc_tower(roi_feat, params, '', r1, train)
        fc7_noisy = None
        if spec.is_webly:
            fc7_noisy = heads._fc_tower(roi_feat, params, '_[noisy]_', r2,
                                        train)
    if spec.supervised:
        # Fast R-CNN tail on precomputed-proposal blobs (stage-1 code is
        # literally the unsharded tail)
        return detector.fast_rcnn_tail_losses(spec, params, mb, fc7_clean)
    return detector.wsl_tail_losses(spec, params, mb, fc7_clean, fc7_noisy,
                                    None, rng)


def _make_grads_fn(spec, mesh, dropout):
    """The shard_map'd pipeline schedule (loss/grads over B microbatches),
    shared by the single-step and scan-of-K drivers."""

    @partial(_shard_map, mesh=mesh, in_specs=(P(), P(), P()),
             out_specs=(P(), P(), P(), P()))
    def grads_fn(params, batch, rng):
        stage = jax.lax.axis_index(AXIS)
        B = batch['image'].shape[0]
        T = B + N_STAGES - 1  # fill + steady-state ticks
        compute_dtype = jnp.dtype(spec.compute_dtype)
        R = batch['rois'].shape[1]
        feat_dim = (spec.roi_resolution * spec.roi_resolution *
                    spec.body_out_dim)
        if spec.is_context:
            feat_dim *= 3  # three concatenated streams cross the pipe

        def microbatch(i):
            return {k: v[i] for k, v in batch.items()}

        zero_buf = jnp.zeros((R, feat_dim), compute_dtype)
        zero_grads = jax.tree.map(jnp.zeros_like, params)
        # the aux structure follows detector.wsl_tail_losses (ladder /
        # min-entropy keys appear per spec) — derive it abstractly;
        # '__'-prefixed entries are cross-image SUM deltas (center
        # accumulators) and accumulate un-normalized
        aux_struct = jax.eval_shape(
            lambda p, b, m: _head_loss(spec, p, b, m, None)[1],
            params, zero_buf, microbatch(0))
        zero_aux = {k: jnp.zeros(s.shape, s.dtype)
                    for k, s in aux_struct.items()
                    if not k.startswith('__')}
        zero_deltas = {k: jnp.zeros(s.shape, s.dtype)
                       for k, s in aux_struct.items() if k.startswith('__')}

        def tick(carry, t):
            buf, gacc, loss_acc, aux_acc, delta_acc = carry

            # ---- stage 0: features for microbatch t (while valid) ----
            i0 = jnp.clip(t, 0, B - 1)
            send = jax.lax.cond(
                jnp.logical_and(stage == 0, t < B),
                lambda: _body_pool(
                    spec, params, batch['image'][i0],
                    batch['rois'][i0], batch['obn_scores'][i0],
                    im_hw=(batch['im_hw'][i0] if 'im_hw' in batch else None)
                ).astype(compute_dtype),
                lambda: zero_buf)
            # the only collective: pooled features hop stage 0 -> stage 1
            recv = jax.lax.ppermute(send, AXIS, [(0, 1)])

            # ---- stage 1: train on microbatch t-1 (in-flight buffer) ----
            i1 = jnp.clip(t - 1, 0, B - 1)

            def head_grads():
                mrng = (jax.random.fold_in(rng, i1) if dropout else None)

                def loss_fn(p):
                    total, aux = _head_loss(spec, p, buf, microbatch(i1),
                                            mrng)
                    deltas = {k: v for k, v in aux.items()
                              if k.startswith('__')}
                    metrics = {k: v / B for k, v in aux.items()
                               if not k.startswith('__')}
                    return total / B, (metrics, deltas)

                (loss, (aux, deltas)), g = jax.value_and_grad(
                    loss_fn, has_aux=True)(params)
                return g, loss, aux, deltas

            g, loss, aux, deltas = jax.lax.cond(
                jnp.logical_and(stage == N_STAGES - 1, t >= 1),
                head_grads,
                lambda: (zero_grads, jnp.zeros((), jnp.float32), zero_aux,
                         zero_deltas))

            gacc = jax.tree.map(jnp.add, gacc, g)
            loss_acc = loss_acc + loss
            aux_acc = {k: aux_acc[k] + aux[k] for k in aux_acc}
            delta_acc = {k: delta_acc[k] + deltas[k] for k in delta_acc}
            return (recv, gacc, loss_acc, aux_acc, delta_acc), None

        init = (zero_buf, zero_grads, jnp.zeros((), jnp.float32), zero_aux,
                zero_deltas)
        (_, gacc, loss, aux, deltas), _ = jax.lax.scan(
            tick, init, jnp.arange(T))

        # replicate the (stage-1-only) results: stage 0 contributes zeros
        flat, unravel = ravel_pytree(gacc)
        grads = unravel(jax.lax.psum(flat, AXIS))
        loss = jax.lax.psum(loss, AXIS)
        aux = jax.tree.map(lambda v: jax.lax.psum(v, AXIS), aux)
        deltas = jax.tree.map(lambda v: jax.lax.psum(v, AXIS), deltas)
        return loss, aux, deltas, grads

    return grads_fn


def make_pipeline_step(spec, hp, mults, mesh, dropout=True,
                       donate=False, center_update_period=128):
    """Jitted 2-stage pipeline train step.

    ``step(params, opt_state, batch, lr, rng) -> (params, opt_state, loss,
    aux)`` where every ``batch`` leaf has leading microbatch axis B (one
    image each). Parameters stay replicated on both stages (each stage only
    touches its half; a weight-sharded variant would compose with
    TPU.TENSOR_SHARDING). The loss is the mean over the B microbatches —
    the same step as the data-parallel mean over B images.
    """
    _check_scope(spec)
    mults = sgd.freeze_mults(mults) if isinstance(mults, dict) else mults
    repl = NamedSharding(mesh, P())
    grads_fn = _make_grads_fn(spec, mesh, dropout)

    def step(params, opt_state, batch, lr, rng):
        loss, aux, deltas, grads = grads_fn(params, batch, rng)
        params, opt_state = sgd.update(params, grads, opt_state, lr, hp,
                                       mults)
        if spec.center_loss:
            params, opt_state = wsl_losses.center_tail(
                spec, params, opt_state, deltas, center_update_period)
        return params, opt_state, loss, aux

    return jax.jit(
        step,
        in_shardings=(repl, repl, repl, repl, repl),
        out_shardings=(repl, repl, repl, repl),
        donate_argnums=(0, 1) if donate else (),
    )


def make_pipeline_multi_step(spec, hp, mults, mesh, dropout=True,
                             donate=False, center_update_period=128):
    """K chained pipeline steps per device call via ``lax.scan``
    (TPU.STEPS_PER_CALL; dispatch amortization as in
    ``train_step.make_multi_train_step``, momentum-correction factors
    applied in-graph). ``multi(params, opt_state, batches, lrs, factors,
    rngs)`` with batch leaves stacked (K, B, ...) and ``rngs`` (K,) keys;
    returns ``(params, opt_state, losses (K,), aux {name: (K,)})``."""
    _check_scope(spec)
    mults = sgd.freeze_mults(mults) if isinstance(mults, dict) else mults
    repl = NamedSharding(mesh, P())
    grads_fn = _make_grads_fn(spec, mesh, dropout)

    def multi(params, opt_state, batches, lrs, factors, rngs):
        def one(carry, xs):
            p, s = carry
            batch, lr, factor, rng = xs
            s = sgd.scale_momentum(s, factor)
            loss, aux, deltas, grads = grads_fn(p, batch, rng)
            p, s = sgd.update(p, grads, s, lr, hp, mults)
            if spec.center_loss:
                p, s = wsl_losses.center_tail(spec, p, s, deltas,
                                              center_update_period)
            return (p, s), (loss, aux)

        (p, s), (losses, auxs) = jax.lax.scan(
            one, (params, opt_state), (batches, lrs, factors, rngs))
        return p, s, losses, auxs

    return jax.jit(
        multi,
        in_shardings=(repl, repl, repl, repl, repl, repl),
        out_shardings=(repl, repl, repl, repl),
        donate_argnums=(0, 1) if donate else (),
    )
