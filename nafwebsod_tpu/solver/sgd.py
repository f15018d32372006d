"""TPU-native solver: the reference's ACMWeightDecayMomentumSGDUpdate op.

Reproduces ``detectron/ops/acm_weightdecay_momentum_sgd_op.h:33-127`` +
``detectron/modeling/optimizer_wsl.py:75-137`` as a pure jittable update over
a flat param dict:

  * **gradient accumulation** over ``WSL.ITER_SIZE`` micro-iterations with
    normalization by ``iter_size`` (the op's ``iter_size * gpu_num``
    normalization: the ``gpu_num`` part is already handled here by averaging
    the loss over the data-parallel mesh axis, so only ``iter_size`` remains);
  * **weight decay added to the gradient** (decoupled per-param
    ``decay_mult``): biases get no decay and 2x lr (optimizer_wsl.py:106-112),
    GroupNorm scale/bias params decay with ``SOLVER.WEIGHT_DECAY_GN``
    (:114-117), a ``_lrm10_`` name infix means 10x lr (:125-126);
  * **Caffe-style momentum**: ``v = mu * v + lr * lr_mult * g; p -= v``
    (NOT the PyTorch ``p -= lr * v`` formulation — silently changes
    convergence if wrong, see SURVEY.md §7);
  * **momentum correction on LR changes** (detector.py:539-559): when the LR
    ratio leaves the ``SCALE_MOMENTUM_THRESHOLD`` band the momentum buffers
    are rescaled by ``new_lr / old_lr`` (host-driven, ``scale_momentum``).

Frozen params (e.g. the whole conv body under ``TRAIN.FREEZE_CONV_BODY``) are
excluded from the update entirely, mirroring the reference's TrainableParams
bookkeeping (detector.py:68-79) — weight decay must not touch them.
"""

from dataclasses import dataclass
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np


@dataclass(frozen=True)
class SGDHyperParams:
    """Static solver hyperparameters (hashable; closed over by jit).

    ``momentum_dtype``: storage dtype of the momentum buffers
    (TPU.BF16_MOMENTUM -> 'bfloat16'). The update itself ALWAYS computes
    in fp32 (buffers are upcast before the multiply and the fresh ``v`` is
    rounded back on store), so 'float32' reproduces the reference op
    bit-for-bit while 'bfloat16' halves the HBM-bound update's momentum
    traffic at one bf16 rounding per store — an opt-in numerics deviation
    (PARITY.md); checkpoints always carry fp32 momentum either way
    (engine/train._save upcasts, the resume path rounds back down).
    """
    momentum: float = 0.9
    weight_decay: float = 0.0005
    weight_decay_gn: float = 0.0
    iter_size: int = 1
    momentum_dtype: str = 'float32'


def param_multipliers(param_names, trainable=None):
    """name -> (lr_mult, decay_mult) following optimizer_wsl.py:100-126.

    ``trainable``: optional set of trainable names; others get (0, 0).
    """
    mults = {}
    for name in param_names:
        if trainable is not None and name not in trainable:
            mults[name] = (0.0, 0.0)
            continue
        if name.endswith('_b') and '_gn_' not in name:
            lr_mult, decay_mult = 2.0, 0.0   # bias: 2x lr, no decay
        elif '_gn_' in name:
            lr_mult, decay_mult = 1.0, 'gn'  # GN scale/bias: WEIGHT_DECAY_GN
        else:
            lr_mult, decay_mult = 1.0, 1.0
        if '_lrm10_' in name:
            lr_mult *= 10.0
        mults[name] = (lr_mult, decay_mult)
    return mults


def freeze_mults(mults):
    """Dict -> hashable tuple form for passing as a static jit argument."""
    return tuple(sorted(mults.items()))


def init_state(params, hp: SGDHyperParams):
    """Momentum buffers (+ gradient accumulator when iter_size > 1).

    Momentum is stored in ``hp.momentum_dtype``; the gradient accumulator
    always stays in the param dtype (accumulation precision is what
    ITER_SIZE exists for)."""
    mdt = jnp.dtype(hp.momentum_dtype)

    def _buf(v):
        # .dtype via numpy metadata only — no device transfer of the
        # (possibly hundreds of MB) host param leaves just to inspect it
        dt = getattr(v, 'dtype', None) or np.asarray(v).dtype
        return jnp.zeros(jnp.shape(v),
                         mdt if jnp.issubdtype(dt, jnp.floating) else dt)

    zeros = {k: _buf(v) for k, v in params.items()}
    state = {'momentum': zeros, 'it': jnp.zeros((), jnp.int32)}
    if hp.iter_size > 1:
        state['grad_acc'] = {k: jnp.zeros_like(v) for k, v in params.items()}
    return state


def _apply(params, grads, momentum_bufs, lr, hp, mults):
    new_params, new_mom = {}, {}
    for name, p in params.items():
        lr_mult, decay_mult = mults[name]
        if lr_mult == 0.0 and decay_mult == 0.0:
            new_params[name] = p
            new_mom[name] = momentum_bufs[name]
            continue
        wd = hp.weight_decay_gn if decay_mult == 'gn' else (
            hp.weight_decay * decay_mult)
        g = grads[name] + wd * p
        mbuf = momentum_bufs[name]
        # fp32 math regardless of the storage dtype (no-op casts for f32)
        v = hp.momentum * mbuf.astype(jnp.float32) + (lr * lr_mult) * g
        new_params[name] = p - v
        new_mom[name] = v.astype(mbuf.dtype)
    return new_params, new_mom


@partial(jax.jit, static_argnames=('hp', 'mults'))
def update(params, grads, state, lr, hp: SGDHyperParams, mults):
    """One micro-iteration. With iter_size == 1 this is a plain update; with
    iter_size > 1 gradients accumulate and the parameter update fires every
    ``iter_size``-th call (acm_weightdecay_momentum_sgd_op.h:79-112)."""
    mults = dict(mults)
    it = state['it'] + 1
    extra = {k: v for k, v in state.items()
             if k not in ('momentum', 'grad_acc', 'it')}
    if hp.iter_size == 1:
        new_params, new_mom = _apply(
            params, grads, state['momentum'], lr, hp, mults)
        return new_params, {'momentum': new_mom, 'it': it, **extra}

    acc = {k: state['grad_acc'][k] + grads[k] for k in grads}
    do_update = (it % hp.iter_size) == 0

    def fire(operand):
        params, acc, mom = operand
        mean_grads = {k: v / float(hp.iter_size) for k, v in acc.items()}
        new_params, new_mom = _apply(params, mean_grads, mom, lr, hp, mults)
        zero_acc = {k: jnp.zeros_like(v) for k, v in acc.items()}
        return new_params, zero_acc, new_mom

    def hold(operand):
        params, acc, mom = operand
        return params, acc, mom

    new_params, new_acc, new_mom = jax.lax.cond(
        do_update, fire, hold, (params, acc, state['momentum']))
    return new_params, {'momentum': new_mom, 'grad_acc': new_acc, 'it': it,
                        **extra}


@jax.jit
def scale_momentum(state, correction):
    """Momentum correction on LR steps (detector.py:539-559): v *= new/old.

    Dtype-preserving: a bf16-stored buffer (momentum_dtype) is scaled in
    fp32 and rounded back instead of being silently promoted by the f32
    ``correction`` scalar. Non-float buffers pass through unchanged
    (mirrors the ``_buf`` dtype guard in init_state) — scaling would
    silently truncate an integer buffer."""

    def _scale(v):
        if not jnp.issubdtype(v.dtype, jnp.floating):
            return v
        return (v.astype(jnp.float32) * correction).astype(v.dtype)

    new = dict(state)
    new['momentum'] = {k: _scale(v) for k, v in state['momentum'].items()}
    return new


def momentum_correction_factor(cfg, lr_new, lr_old):
    """Host-side decision mirroring detector.py:514-526: returns the factor to
    apply to momentum buffers, or None when inside the threshold band."""
    if not cfg.SOLVER.SCALE_MOMENTUM or lr_old <= 0:
        return None
    ratio = lr_new / lr_old
    thresh = cfg.SOLVER.SCALE_MOMENTUM_THRESHOLD
    if ratio > thresh or ratio < 1.0 / thresh:
        return ratio
    return None
