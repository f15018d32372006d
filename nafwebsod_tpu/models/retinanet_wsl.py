"""Weakly-supervised RetinaNet (FPN) head.

Capability parity with ``retinanet_heads.add_wsl_fpn_retinanet_outputs``
(:249-370) and ``add_wsl_fpn_retinanet_losses`` (:513-538), wired through
``model_builder_wsl.py:580-594``: per FPN level two NUM_CONVS-deep conv
towers ('c' classification and 'd' detection streams, weights SHARED across
levels) each ending in a 3x3 prediction conv to num_classes-1 maps; the 'c'
stream takes a per-position softmax over classes (GroupSpatialSoftmax) and
the 'd' stream a per-class softmax over ALL spatial positions (Caffe2
Softmax axis=2 over the flattened H*W); their product is the WSDDN-style
per-position score map, RoIScorePool-summed into per-level image scores and
trained with CrossEntropyWithLogits against ``cls_labels``
(roi_data/retinanet_wsl.py:16-41).
"""

from dataclasses import dataclass

import jax
import jax.numpy as jnp

from nafwebsod_tpu.models import fpn as fpn_lib
from nafwebsod_tpu.models import resnet
from nafwebsod_tpu.ops import losses as loss_ops


@dataclass(frozen=True)
class RetinaNetWSLSpec:
    num_classes: int = 21
    depth: str = 'resnet50'
    fpn_dim: int = 256
    num_convs: int = 4
    min_level: int = 3
    max_level: int = 7
    freeze_at: int = 2
    mean_loss: bool = False
    compute_dtype: str = 'float32'


def init_tower_params(rng, num_classes, fpn_dim, num_convs):
    """The two WSL conv towers ('c'/'d' streams), shared across levels."""
    keys = jax.random.split(rng, 2 * (num_convs + 1))
    ki = 0
    c = num_classes - 1
    params = {}
    for stream in ('c', 'd'):
        for n in range(num_convs):
            params['retnet_cls_conv_n{}_{}_w'.format(n, stream)] = (
                0.01 * jax.random.normal(keys[ki], (3, 3, fpn_dim, fpn_dim)))
            params['retnet_cls_conv_n{}_{}_b'.format(n, stream)] = (
                jnp.zeros((fpn_dim,)))
            ki += 1
        params['retnet_cls_pred_{}_w'.format(stream)] = (
            0.01 * jax.random.normal(keys[ki], (3, 3, fpn_dim, c)))
        params['retnet_cls_pred_{}_b'.format(stream)] = jnp.zeros((c,))
        ki += 1
    return params


def init_params(spec, rng):
    r1, r2, r3 = jax.random.split(rng, 3)
    params = resnet.init_params(r1, spec.depth, include_res5=True)
    dims = (resnet.SHALLOW_STAGE_DIMS if spec.depth == 'resnet18'
            else resnet.STAGE_DIMS)
    params.update(fpn_lib.init_params(r2, list(dims), spec.fpn_dim,
                                      spec.min_level, spec.max_level))
    params.update(init_tower_params(r3, spec.num_classes, spec.fpn_dim,
                                    spec.num_convs))
    return params


def _conv3(x, params, name):
    w = params[name + '_w'].astype(x.dtype)
    y = jax.lax.conv_general_dilated(
        x, w, (1, 1), ((1, 1), (1, 1)),
        dimension_numbers=('NHWC', 'HWIO', 'NHWC'),
        preferred_element_type=x.dtype)
    return y + params[name + '_b'].astype(x.dtype)


def _tower(x, params, stream, num_convs):
    for n in range(num_convs):
        x = jax.nn.relu(_conv3(x, params, 'retnet_cls_conv_n{}_{}'.format(
            n, stream)))
    return _conv3(x, params, 'retnet_cls_pred_{}'.format(stream))


def tower_outputs(params, levels, num_convs):
    """Run the two streams over an externally-built pyramid. Returns
    ({level: per-position score map (1, h, w, C-1)},
     {level: image-level scores (1, C-1)})."""
    maps, img_scores = {}, {}
    for lvl, feat in levels.items():
        logits_c = _tower(feat, params, 'c', num_convs).astype(jnp.float32)
        logits_d = _tower(feat, params, 'd', num_convs).astype(jnp.float32)
        # 'c': softmax over CLASSES at each position (GroupSpatialSoftmax)
        prob_c = jax.nn.softmax(logits_c, axis=-1)
        # 'd': per-class softmax over ALL positions (Caffe2 Softmax axis=2)
        n, h, w, c = logits_d.shape
        flat = logits_d.reshape(n, h * w, c)
        prob_d = jax.nn.softmax(flat, axis=1).reshape(n, h, w, c)
        score_map = prob_c * prob_d
        maps[lvl] = score_map
        # RoIScorePool: sum over positions -> (1, C-1)
        img_scores[lvl] = jnp.sum(score_map, axis=(1, 2))
    return maps, img_scores


def forward(spec, params, image):
    """image: (1, H, W, 3). Returns dict {level: per-position score map
    (1, h, w, C-1)} and {level: image-level scores (1, C-1)}."""
    dtype = jnp.bfloat16 if spec.compute_dtype == 'bfloat16' else jnp.float32
    stages, _ = resnet.forward(params, image.astype(dtype), spec.depth,
                               include_res5=True, freeze_at=spec.freeze_at,
                               return_stages=True)
    levels, _ = fpn_lib.forward(params, stages, spec.fpn_dim,
                                spec.min_level, spec.max_level)
    return tower_outputs(params, levels, spec.num_convs)


def losses(spec, img_scores, cls_labels):
    """Per-level CrossEntropyWithLogits vs the image labels
    (retinanet_heads.py:513-538)."""
    out = {}
    for lvl, score in img_scores.items():
        out['cls_loss_fpn{}'.format(lvl)] = loss_ops.cross_entropy_with_logits(
            score, cls_labels, spec.mean_loss)
    return out


def forward_train(spec, params, image, cls_labels):
    _, img_scores = forward(spec, params, image)
    l = losses(spec, img_scores, cls_labels)
    return sum(l.values()), l
