"""ResNet conv bodies (functional JAX, NHWC).

Capability parity with ``detectron/modeling/ResNet.py``: bottleneck residual
stages with AffineChannel (frozen-BN scale/bias) exactly as Detectron
fine-tunes pretrained BN networks (ResNet.py:204-334), the basic BN stem
(``:245-255``), STRIDE_1X1 placement, RES5_DILATION, and the conv4/conv5
body variants (``:35-127``). Param names follow the Detectron pkl blob
names (``res2_0_branch2a_w`` / ``..._bn_s`` / ``..._bn_b``) so pretrained
checkpoints load through ``utils/checkpoint.py`` unchanged.
"""

import jax
import jax.numpy as jnp
import numpy as np

BLOCK_COUNTS = {
    'resnet18': (2, 2, 2, 2),
    'resnet50': (3, 4, 6, 3),
    'resnet101': (3, 4, 23, 3),
    'resnet152': (3, 8, 36, 3),
}
STAGE_DIMS = (256, 512, 1024, 2048)
# ResNet-18 uses shallow basic blocks (ResNet18.py:124-230): 2x 3x3 convs,
# stage dims 64/128/256/512
SHALLOW_STAGE_DIMS = (64, 128, 256, 512)


def _conv(x, w, stride=1, dilation=1, pad=None, groups=1):
    kh = w.shape[0]
    if pad is None:
        pad = (kh - 1) // 2 * dilation
    return jax.lax.conv_general_dilated(
        x, w.astype(x.dtype), window_strides=(stride, stride),
        padding=((pad, pad), (pad, pad)), rhs_dilation=(dilation, dilation),
        dimension_numbers=('NHWC', 'HWIO', 'NHWC'),
        feature_group_count=groups,
        preferred_element_type=x.dtype)


def _affine(x, params, name):
    """AffineChannel: y = x * s + b (frozen BN)."""
    return x * params[name + '_s'].astype(x.dtype) + params[
        name + '_b'].astype(x.dtype)


def _conv_affine(x, params, prefix, stride=1, dilation=1, groups=1):
    x = _conv(x, params[prefix + '_w'], stride, dilation, groups=groups)
    return _affine(x, params, prefix + '_bn')


def _bottleneck(x, params, prefix, stride, dilation, stride_1x1=True,
                has_shortcut=False, groups=1):
    s1, s3 = (stride, 1) if stride_1x1 else (1, stride)
    cur = jax.nn.relu(_conv_affine(x, params, prefix + '_branch2a', s1))
    # ResNeXt grouped 3x3 (ResNet.py bottleneck_transformation group arg)
    cur = jax.nn.relu(_conv_affine(cur, params, prefix + '_branch2b', s3,
                                   dilation, groups=groups))
    cur = _conv_affine(cur, params, prefix + '_branch2c', 1)
    if has_shortcut:
        sc = _conv_affine(x, params, prefix + '_branch1', stride)
    else:
        sc = x
    return jax.nn.relu(cur + sc)


def _basic_block(x, params, prefix, stride, dilation, has_shortcut=False):
    """Shallow residual block (ResNet18.py:184-230): 3x3 conv x2."""
    cur = jax.nn.relu(_conv_affine(x, params, prefix + '_branch2a', stride,
                                   dilation))
    cur = _conv_affine(cur, params, prefix + '_branch2b', 1, dilation)
    if has_shortcut:
        sc = _conv_affine(x, params, prefix + '_branch1', stride)
    else:
        sc = x
    return jax.nn.relu(cur + sc)


def _stage(x, params, stage_prefix, n, stride_init, dilation, stride_1x1,
           shallow=False, groups=1):
    for i in range(n):
        prefix = '{}_{}'.format(stage_prefix, i)
        stride = stride_init if i == 0 else 1
        if shallow:
            # first block needs the projection shortcut whenever the stage
            # changes width, even at stride 1 (dilated res5)
            x = _basic_block(x, params, prefix, stride, dilation,
                             has_shortcut=prefix + '_branch1_w' in params)
        else:
            x = _bottleneck(x, params, prefix, stride, dilation, stride_1x1,
                            has_shortcut=(i == 0), groups=groups)
    return x


def forward(params, x, depth='resnet50', include_res5=False,
            res5_dilation=1, stride_1x1=True, freeze_at=2,
            return_stages=False, num_groups=1, width_per_group=64):
    """Run the ResNet body. x: (N, H, W, 3). Returns (features, out_dim,
    spatial_scale) following add_ResNet_convX_body (ResNet.py:91-127)."""
    dtype = x.dtype
    counts = BLOCK_COUNTS[depth]
    # stem: 7x7/2 conv + affine + relu + 3x3/2 maxpool (basic_bn_stem)
    x = _conv(x, params['conv1_w'], stride=2, pad=3)
    x = jax.nn.relu(_affine(x, params, 'res_conv1_bn'))
    x = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)),
                constant_values=-jnp.inf)
    x = jax.lax.reduce_window(x, -jnp.inf, jax.lax.max,
                              (1, 3, 3, 1), (1, 2, 2, 1), 'VALID')

    shallow = depth == 'resnet18'
    dims = SHALLOW_STAGE_DIMS if shallow else STAGE_DIMS
    n_stages = 4 if include_res5 else 3
    stages = []
    for si in range(n_stages):
        stride_init = 1 if si == 0 else 2
        dilation = res5_dilation if si == 3 else 1
        if si == 3 and res5_dilation == 2:
            stride_init = 1
        x = _stage(x, params, 'res{}'.format(si + 2), counts[si],
                   stride_init, dilation, stride_1x1, shallow=shallow,
                   groups=num_groups)
        if si + 2 == freeze_at:
            x = jax.lax.stop_gradient(x)
        stages.append(x)
    if return_stages:
        return stages, dims[:n_stages]
    if include_res5:
        return x, dims[3], 1.0 / 32.0 * res5_dilation
    return x, dims[2], 1.0 / 16.0


def param_shapes(depth='resnet50', include_res5=False, num_groups=1,
                 width_per_group=64):
    """num_groups > 1: ResNeXt trunk (ResNet.py:101,143 dim_bottleneck =
    NUM_GROUPS * WIDTH_PER_GROUP, doubled per stage; branch2b is a grouped
    conv with in-channels / groups per filter)."""
    shapes = {'conv1_w': (7, 7, 3, 64), 'res_conv1_bn_s': (64,),
              'res_conv1_bn_b': (64,)}
    counts = BLOCK_COUNTS[depth]
    shallow = depth == 'resnet18'
    dims = SHALLOW_STAGE_DIMS if shallow else STAGE_DIMS
    dim_in = 64
    n_stages = 4 if include_res5 else 3
    for si in range(n_stages):
        dim_out = dims[si]
        if num_groups > 1:
            dim_inner = num_groups * width_per_group * (2 ** si)
        else:
            dim_inner = dim_out // 4
        for i in range(counts[si]):
            p = 'res{}_{}'.format(si + 2, i)
            if shallow:
                shapes.update({
                    p + '_branch2a_w': (3, 3, dim_in, dim_out),
                    p + '_branch2a_bn_s': (dim_out,),
                    p + '_branch2a_bn_b': (dim_out,),
                    p + '_branch2b_w': (3, 3, dim_out, dim_out),
                    p + '_branch2b_bn_s': (dim_out,),
                    p + '_branch2b_bn_b': (dim_out,),
                })
                if i == 0 and si > 0:
                    shapes[p + '_branch1_w'] = (1, 1, dim_in, dim_out)
                    shapes[p + '_branch1_bn_s'] = (dim_out,)
                    shapes[p + '_branch1_bn_b'] = (dim_out,)
                dim_in = dim_out
                continue
            shapes.update({
                p + '_branch2a_w': (1, 1, dim_in, dim_inner),
                p + '_branch2a_bn_s': (dim_inner,),
                p + '_branch2a_bn_b': (dim_inner,),
                p + '_branch2b_w': (3, 3, dim_inner // num_groups,
                                    dim_inner),
                p + '_branch2b_bn_s': (dim_inner,),
                p + '_branch2b_bn_b': (dim_inner,),
                p + '_branch2c_w': (1, 1, dim_inner, dim_out),
                p + '_branch2c_bn_s': (dim_out,),
                p + '_branch2c_bn_b': (dim_out,),
            })
            if i == 0:
                shapes[p + '_branch1_w'] = (1, 1, dim_in, dim_out)
                shapes[p + '_branch1_bn_s'] = (dim_out,)
                shapes[p + '_branch1_bn_b'] = (dim_out,)
            dim_in = dim_out
    return shapes


def res5_head_param_shapes(depth='resnet50', num_groups=1,
                           width_per_group=64):
    """Shapes of the res5 stage alone — the RoI conv5 box head
    (ResNet.add_ResNet_roi_conv5_head, ResNet.py:143-170: the res5 stage
    applied to pooled RoI features, stride 2, then global average pool)."""
    full = param_shapes(depth, include_res5=True, num_groups=num_groups,
                        width_per_group=width_per_group)
    return {k: v for k, v in full.items() if k.startswith('res5')}


def init_res5_head_params(rng, depth='resnet50', num_groups=1,
                          width_per_group=64, dtype=jnp.float32):
    shapes = res5_head_param_shapes(depth, num_groups, width_per_group)
    params = {}
    keys = jax.random.split(rng, len(shapes))
    for i, (name, shape) in enumerate(sorted(shapes.items())):
        if name.endswith('_bn_s'):
            params[name] = jnp.ones(shape, dtype)
        elif name.endswith('_bn_b'):
            params[name] = jnp.zeros(shape, dtype)
        else:
            fan_in = int(np.prod(shape[:-1]))
            params[name] = np.sqrt(2.0 / fan_in) * jax.random.normal(
                keys[i], shape, dtype)
    return params


def roi_res5_spatial_forward(params, pooled, depth='resnet50', dilation=1,
                             stride_init=2, stride_1x1=True, num_groups=1):
    """res5 stage over pooled RoI features, keeping the spatial map —
    the mask-head building block (mask_rcnn_heads.py:
    add_ResNet_roi_conv5_head_for_masks:303-330, stride_init =
    RESOLUTION/7). Returns (R, res/stride, res/stride, 2048[/512])."""
    shallow = depth == 'resnet18'
    counts = BLOCK_COUNTS[depth]
    if dilation > 1:
        stride_init = 1
    return _stage(pooled, params, 'res5', counts[3], stride_init, dilation,
                  stride_1x1, shallow=shallow, groups=num_groups)


def roi_res5_forward(params, pooled, depth='resnet50', dilation=1,
                     stride_init=2, stride_1x1=True, num_groups=1):
    """Run the res5 stage over pooled RoI features (R, 14, 14, C_res4) and
    global-average-pool to (R, 2048[/512])."""
    x = roi_res5_spatial_forward(params, pooled, depth, dilation,
                                 stride_init, stride_1x1, num_groups)
    return jnp.mean(x, axis=(1, 2))


def init_params(rng, depth='resnet50', include_res5=False,
                num_groups=1, width_per_group=64, dtype=jnp.float32):
    shapes = param_shapes(depth, include_res5, num_groups, width_per_group)
    params = {}
    keys = jax.random.split(rng, len(shapes))
    for i, (name, shape) in enumerate(sorted(shapes.items())):
        if name.endswith('_bn_s'):
            params[name] = jnp.ones(shape, dtype)
        elif name.endswith('_bn_b'):
            params[name] = jnp.zeros(shape, dtype)
        else:
            fan_in = int(np.prod(shape[:-1]))
            std = np.sqrt(2.0 / fan_in)
            params[name] = std * jax.random.normal(keys[i], shape, dtype)
    return params
