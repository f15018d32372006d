"""Learning-rate schedules.

Capability parity with ``detectron/utils/lr_policy.py``: policies
steps_with_decay / steps_with_lrs / step / cosine / exp plus linear/constant
warmup (reference lines 28-131). Pure Python over the global cfg — the result
is fed to the jitted train step as a scalar each iteration (the reference
similarly feeds a host scalar via ``UpdateWorkspaceLr``, detector.py:509-526).
"""

import numpy as np

from nafwebsod_tpu.core.config import cfg


def get_lr_at_iter(it):
    """LR at iteration ``it`` including warmup (ref lr_policy.py:28-43)."""
    lr = get_lr_func()(it)
    if it < cfg.SOLVER.WARM_UP_ITERS:
        method = cfg.SOLVER.WARM_UP_METHOD
        if method == 'constant':
            warmup_factor = cfg.SOLVER.WARM_UP_FACTOR
        elif method == 'linear':
            alpha = it / cfg.SOLVER.WARM_UP_ITERS
            warmup_factor = cfg.SOLVER.WARM_UP_FACTOR * (1 - alpha) + alpha
        else:
            raise KeyError('Unknown SOLVER.WARM_UP_METHOD: {}'.format(method))
        lr *= warmup_factor
    return np.float32(lr)


# ---------------------------------------------------------------------------- #
# Policies (ref lr_policy.py:46-116)
# ---------------------------------------------------------------------------- #

def lr_func_steps_with_lrs(cur_iter):
    """Explicit LR at each step range: SOLVER.STEPS paired with SOLVER.LRS."""
    ind = get_step_index(cur_iter)
    return cfg.SOLVER.LRS[ind]


def lr_func_steps_with_decay(cur_iter):
    """BASE_LR * GAMMA ** step_index — the flagship schedule
    (``configs/flickr_voc/na_wsddn_V-16-C5_1x.yaml`` uses STEPS [0, 150000])."""
    ind = get_step_index(cur_iter)
    return cfg.SOLVER.BASE_LR * cfg.SOLVER.GAMMA ** ind


def lr_func_step(cur_iter):
    return (cfg.SOLVER.BASE_LR *
            cfg.SOLVER.GAMMA ** (cur_iter // cfg.SOLVER.STEP_SIZE))


def lr_func_cosine(cur_iter):
    return (cfg.SOLVER.BASE_LR *
            (np.cos(np.pi * cur_iter / cfg.SOLVER.MAX_ITER) + 1.0) * 0.5)


def lr_func_exp(cur_iter):
    return cfg.SOLVER.BASE_LR * cfg.SOLVER.GAMMA ** (cur_iter / cfg.SOLVER.STEP_SIZE)


def get_step_index(cur_iter):
    """Index of the last element of SOLVER.STEPS <= cur_iter."""
    assert cfg.SOLVER.STEPS and cfg.SOLVER.STEPS[0] == 0, (
        'SOLVER.STEPS must be non-empty and start with 0 (got {}): an index '
        'of -1 before the first step would silently apply GAMMA**-1 '
        '(lr_policy.py:117 in the reference has the same guard)'.format(
            cfg.SOLVER.STEPS))
    steps = list(cfg.SOLVER.STEPS) + [cfg.SOLVER.MAX_ITER]
    for ind, step in enumerate(steps):
        if cur_iter < step:
            break
    return ind - 1


def get_lr_func():
    policy = 'lr_func_' + cfg.SOLVER.LR_POLICY
    if policy not in globals():
        raise NotImplementedError(
            'Unknown LR policy: {}'.format(cfg.SOLVER.LR_POLICY))
    return globals()[policy]
