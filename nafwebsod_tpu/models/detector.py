"""Model assembly: cfg -> pure jittable forward/loss functions.

Replaces the reference's string-dispatched graph factory
(``detectron/modeling/model_builder_wsl.py:163-208,289-458``) with a
functional builder: ``build_model(cfg)`` snapshots the relevant config into a
hashable ``ModelSpec`` and returns pure functions over a flat param dict.
The same CONV_BODY / ROI_BOX_HEAD strings used by reference YAMLs select the
TPU implementations.

Batching: the reference trains 1 image/GPU (TRAIN.IMS_PER_BATCH == 1,
asserted at wsl_heads.py:214); the per-image functions here are vmapped /
sharded by the parallel layer for multi-chip training.
"""

from dataclasses import dataclass
from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp

from nafwebsod_tpu.models import heads, vgg16
from nafwebsod_tpu.ops import losses as loss_ops
from nafwebsod_tpu.ops.entropy import spatial_entropy_weights

_SUPPORTED_BODIES = {
    'VGG16.add_VGG16_conv5_body_origin': 'vgg16_c5',
}
_SUPPORTED_HEADS = {
    'wsl_heads.add_VGG16_roi_2fc_head': 'vgg16_2fc',
    'webly_heads.add_VGG16_roi_2fc_noise_head': 'vgg16_2fc_noise',
}


@dataclass(frozen=True)
class ModelSpec:
    """Hashable snapshot of the model-relevant config keys."""
    num_classes: int = 21
    conv_body: str = 'vgg16_c5'
    box_head: str = 'vgg16_2fc_noise'
    dilation: int = 2
    freeze_conv_body: bool = True
    freeze_at: int = 2
    roi_xform_method: str = 'RoIPoolF'
    roi_resolution: int = 7
    roi_sampling_ratio: int = 2
    webly_on: bool = True
    webly_entropy: bool = True
    mean_loss: bool = True
    min_entropy_loss: bool = False
    compute_dtype: str = 'float32'
    # fc6/fc7 width; 4096 in the reference (wsl_heads.py:674-679). Tests use a
    # narrow tower to keep single-core CPU runtimes sane.
    hidden_dim: int = 4096

    @property
    def is_webly(self):
        return self.box_head.endswith('noise') or self.webly_on


def spec_from_cfg(cfg):
    body = cfg.MODEL.CONV_BODY
    head = cfg.FAST_RCNN.ROI_BOX_HEAD
    if body not in _SUPPORTED_BODIES:
        raise NotImplementedError('CONV_BODY {} not implemented'.format(body))
    if head not in _SUPPORTED_HEADS:
        raise NotImplementedError('ROI_BOX_HEAD {} not implemented'.format(head))
    return ModelSpec(
        num_classes=cfg.MODEL.NUM_CLASSES,
        conv_body=_SUPPORTED_BODIES[body],
        box_head=_SUPPORTED_HEADS[head],
        dilation=cfg.WSL.DILATION,
        freeze_conv_body=cfg.TRAIN.FREEZE_CONV_BODY,
        freeze_at=cfg.TRAIN.FREEZE_AT,
        roi_xform_method=cfg.FAST_RCNN.ROI_XFORM_METHOD,
        roi_resolution=cfg.FAST_RCNN.ROI_XFORM_RESOLUTION,
        roi_sampling_ratio=cfg.FAST_RCNN.ROI_XFORM_SAMPLING_RATIO,
        webly_on=cfg.WEBLY.WEBLY_ON,
        webly_entropy=cfg.WEBLY.ENTROPY,
        mean_loss=cfg.WSL.MEAN_LOSS,
        min_entropy_loss=cfg.WSL.MIN_ENTROPY_LOSS,
        compute_dtype=cfg.TPU.COMPUTE_DTYPE,
        hidden_dim=cfg.TPU.HEAD_HIDDEN_DIM,
    )


def init_params(spec: ModelSpec, rng):
    r1, r2 = jax.random.split(rng)
    params = vgg16.init_params(r1, dilation=spec.dilation)
    roi_feat_dim = 512 * spec.roi_resolution * spec.roi_resolution
    params.update(heads.init_head_params(
        r2, spec.num_classes, roi_feat_dim=roi_feat_dim,
        hidden=spec.hidden_dim,
        webly=spec.box_head == 'vgg16_2fc_noise'))
    return params


def trainable_param_names(spec: ModelSpec, params):
    """Names of params the solver may update, mirroring the reference's
    TrainableParams bookkeeping (detector.py:68-79): with FREEZE_CONV_BODY the
    whole conv body is excluded; otherwise stages up to FREEZE_AT are."""
    out = set()
    for name in params:
        stage_idx = next(
            (si for si, stage in enumerate(vgg16.VGG16_STAGES)
             if any(name.startswith(n) for n, _, _ in stage)), None)
        if stage_idx is None:
            out.add(name)  # head param
        elif spec.freeze_conv_body or stage_idx < spec.freeze_at:
            continue
        else:
            out.add(name)
    return out


def _run_body_and_head(spec, params, image, rois, obn_scores, train, rng):
    dtype = jnp.bfloat16 if spec.compute_dtype == 'bfloat16' else jnp.float32
    feat, spatial_scale = vgg16.forward(
        params, image.astype(dtype), dilation=spec.dilation,
        freeze_at=spec.freeze_at)
    if spec.freeze_conv_body:
        feat = jax.lax.stop_gradient(feat)
    feat = feat.astype(jnp.float32)  # heads run in fp32 (softmax numerics)
    kwargs = dict(method=spec.roi_xform_method, resolution=spec.roi_resolution,
                  sampling_ratio=spec.roi_sampling_ratio,
                  freeze_body=spec.freeze_conv_body, train=train, rng=rng)
    if spec.box_head == 'vgg16_2fc_noise':
        (fc7_clean, fc7_noisy), _ = heads.vgg16_roi_2fc_noise_head(
            params, feat, rois, obn_scores, spatial_scale, **kwargs)
        return fc7_clean, fc7_noisy
    fc7, _ = heads.vgg16_roi_2fc_head(
        params, feat, rois, obn_scores, spatial_scale, **kwargs)
    return fc7, None


@partial(jax.jit, static_argnames=('spec',))
def forward_test(spec: ModelSpec, params, image, rois, obn_scores,
                 valid_mask=None):
    """Per-image inference. Returns per-RoI class scores (R, num_classes)
    including the dummy background column (wsl_heads.py:58-67), plus raw
    outputs for diagnostics."""
    fc7_clean, fc7_noisy = _run_body_and_head(
        spec, params, image, rois, obn_scores, train=False, rng=None)
    if fc7_noisy is not None:
        out = heads.webly_outputs(params, fc7_clean, fc7_noisy, valid_mask)
    else:
        out = heads.wsl_outputs(params, fc7_clean, valid_mask)
    scores = heads.add_background_column(out['rois_pred'])
    return {'scores': scores, 'rois_pred': out['rois_pred']}


@partial(jax.jit, static_argnames=('spec',))
def forward_train(spec: ModelSpec, params, batch, rng):
    """Per-image training forward + losses.

    batch: dict with
      image      (H, W, 3) pixel-mean-subtracted BGR
      rois       (R, 5)
      obn_scores (R,) or (R, 1)
      labels_oh  (1, C-1) image-level labels (possibly mixup-blended)
      valid_mask (R,) bool for padded rois
    Returns (total_loss, aux dict of losses/metrics).
    Matches webly_heads.add_webly_losses / wsl_heads.add_wsl_losses.
    """
    image = batch['image']
    rois = batch['rois']
    obn = batch['obn_scores']
    labels_oh = batch['labels_oh']
    valid = batch.get('valid_mask')

    fc7_clean, fc7_noisy = _run_body_and_head(
        spec, params, image, rois, obn, train=True, rng=rng)
    if fc7_noisy is not None:
        out = heads.webly_outputs(params, fc7_clean, fc7_noisy, valid)
    else:
        out = heads.wsl_outputs(params, fc7_clean, valid)

    cls_prob = heads.cls_pred(out['rois_pred'])
    aux = {}
    losses = {}

    if spec.is_webly and 'rois_pred_noise' in out:
        cls_prob_noise = heads.cls_pred(out['rois_pred_noise'])
        if spec.webly_entropy:
            cw, cwn = spatial_entropy_weights(
                out['rois_pred'], cls_prob, rois, labels_oh, valid)
        else:
            cw = jnp.ones_like(labels_oh)
            cwn = jnp.ones_like(labels_oh)
        losses['loss_cls'] = loss_ops.weighted_cross_entropy_with_logits(
            cls_prob, labels_oh, cw, spec.mean_loss)
        losses['loss_cls_noise'] = loss_ops.weighted_cross_entropy_with_logits(
            cls_prob_noise, labels_oh, cwn, spec.mean_loss)
        aux['accuracy_cls'] = loss_ops.multilabel_accuracy(cls_prob, labels_oh)
        aux['accuracy_cls_noise'] = loss_ops.multilabel_accuracy(
            cls_prob_noise, labels_oh)
        aux['class_weight_mean'] = jnp.mean(cw)
        aux['class_weight_noise_mean'] = jnp.mean(cwn)
    else:
        losses['loss_cls'] = loss_ops.cross_entropy_with_logits(
            cls_prob, labels_oh, spec.mean_loss)
        aux['accuracy_cls'] = loss_ops.multilabel_accuracy(cls_prob, labels_oh)

    if spec.min_entropy_loss:
        losses['loss_entropy'] = 0.1 * loss_ops.min_entropy_loss(
            out['rois_pred'], labels_oh, valid)

    total = sum(losses.values())
    aux.update(losses)
    return total, aux
