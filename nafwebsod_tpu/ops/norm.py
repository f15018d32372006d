"""Normalization ops: GroupNorm (cfg.GROUP_NORM) and the group-count helper.

Capability parity with Caffe2's ``SpatialGN`` as used by the reference's GN
model variants (``detectron/modeling/ResNet.py:bottleneck_gn_transformation``,
mask heads `_gn` variants) and ``net_wsl.get_group_gn`` (net_wsl.py:298-314).
"""

import jax.numpy as jnp


def get_group_gn(dim, dim_per_gp=-1, num_groups=32):
    """Number of groups for `dim` channels (net_wsl.py:298-314)."""
    assert dim_per_gp == -1 or num_groups == -1, \
        'GroupNorm: can only specify G or C/G'
    if dim_per_gp > 0:
        assert dim % dim_per_gp == 0
        return dim // dim_per_gp
    assert dim % num_groups == 0
    return num_groups


def group_norm(x, scale, bias, num_groups=32, eps=1e-5):
    """GroupNorm over an NHWC tensor. scale/bias: (C,)."""
    n, h, w, c = x.shape
    g = num_groups
    xg = x.reshape(n, h, w, g, c // g)
    mean = jnp.mean(xg, axis=(1, 2, 4), keepdims=True)
    var = jnp.var(xg, axis=(1, 2, 4), keepdims=True)
    xg = (xg - mean) * jnp.reciprocal(jnp.sqrt(var + eps))
    x = xg.reshape(n, h, w, c)
    return x * scale + bias
