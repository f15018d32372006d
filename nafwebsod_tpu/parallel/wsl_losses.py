"""Shared WSL loss assembly for the sharded training steps.

The plain-WSDDN / webly noise-aware image-level losses computed from the
(already replicated) fc7 tower outputs — the tail of
``detector.forward_train``'s webly branch (wsl_heads.py:58-67 two-stream +
webly_heads.py:132-216 noise split + the spatial-entropy weights of
entropy_op semantics). Used by ``parallel/tensor_shard.py`` (post
tensor-parallel towers) and ``parallel/pipeline.py`` (stage-1 head work).
"""

import jax.numpy as jnp

from nafwebsod_tpu.models import heads
from nafwebsod_tpu.ops import losses as loss_ops
from nafwebsod_tpu.ops.entropy import spatial_entropy_weights


def check_scope(spec, extra_unsupported=()):
    """Raise unless ``spec`` is a plain-WSDDN / webly 2fc model (the scope
    shared by the tensor-parallel and pipeline steps; other branches use
    the data-parallel step)."""
    unsupported = (spec.refine_k or spec.is_context or spec.csc or
                   spec.cpg or spec.center_loss or spec.min_entropy_loss or
                   spec.mask_on or spec.supervised or spec.cmil or
                   spec.is_fpn or spec.fused_noise_tower or
                   spec.box_head not in ('vgg16_2fc', 'vgg16_2fc_noise'))
    if unsupported or any(extra_unsupported):
        raise NotImplementedError(
            'this sharded step supports the plain WSDDN / webly '
            'noise-aware 2fc heads; other branches use the data-parallel '
            'step')


def wsl_head_losses(spec, params, fc7_clean, fc7_noisy, rois, labels_oh,
                    valid):
    """(total_loss, aux) from replicated tower outputs for one image."""
    losses, aux = {}, {}
    if spec.is_webly:
        out = heads.webly_outputs(params, fc7_clean, fc7_noisy, valid)
        cls_prob = heads.cls_pred(out['rois_pred'])
        cls_prob_noise = heads.cls_pred(out['rois_pred_noise'])
        if spec.webly_entropy:
            cw, cwn = spatial_entropy_weights(
                out['rois_pred'], cls_prob, rois, labels_oh, valid)
        else:
            cw = jnp.ones_like(labels_oh)
            cwn = jnp.ones_like(labels_oh)
        losses['loss_cls'] = loss_ops.weighted_cross_entropy_with_logits(
            cls_prob, labels_oh, cw, spec.mean_loss)
        losses['loss_cls_noise'] = (
            loss_ops.weighted_cross_entropy_with_logits(
                cls_prob_noise, labels_oh, cwn, spec.mean_loss))
        aux['accuracy_cls'] = loss_ops.multilabel_accuracy(cls_prob,
                                                           labels_oh)
        aux['accuracy_cls_noise'] = loss_ops.multilabel_accuracy(
            cls_prob_noise, labels_oh)
    else:
        out = heads.wsl_outputs(params, fc7_clean, valid)
        cls_prob = heads.cls_pred(out['rois_pred'])
        losses['loss_cls'] = loss_ops.cross_entropy_with_logits(
            cls_prob, labels_oh, spec.mean_loss)
        aux['accuracy_cls'] = loss_ops.multilabel_accuracy(cls_prob,
                                                           labels_oh)

    total = sum(losses.values())
    aux.update(losses)
    return total, aux
