"""Weakly-supervised mask branch (MODEL.MASK_ON).

Capability parity with the reference's WSL segmentation stack:
``wsl_seg_heads.add_seg_outputs/add_seg_losses`` (wsl_seg_heads.py:34-191)
on top of ``mask_rcnn_fcn_head`` (wsl_seg_heads.py:515-570): RoI features ->
2x (3x3 conv, dilation MRCNN.DILATION) -> 2x2 stride-2 deconv -> 1x1 conv to
num_classes-1 mask logits; the weak loss max-pools each RoI's mask logits to
a per-RoI class logit and applies WeightedSigmoidCrossEntropyWithLogits
against the broadcast image labels with detection-confidence weights
(the MaskUtility reconstruction in ops/seg.py).
"""

import jax
import jax.numpy as jnp

from nafwebsod_tpu.ops.roi_pool import roi_align, roi_pool
from nafwebsod_tpu.ops.seg import (mask_utility,
                                   weighted_sigmoid_cross_entropy_with_logits)


def init_mask_head_params(rng, num_classes, dim_in=512, dim_inner=256,
                          num_convs=2, gn=False, dtype=jnp.float32):
    """v1upXconvs(_gn) tower params (mask_rcnn_heads.py:137-230). The GN
    variant follows the reference's ConvGN: bias-free conv + per-channel
    group-norm scale/bias, and the bracket-free ``_mask_fcnK`` blob prefix
    (vs ``_[mask]_fcnK`` without GN) so pkl checkpoints interchange."""
    params = {}
    keys = jax.random.split(rng, num_convs + 2)
    d = dim_in
    for i in range(num_convs):
        prefix = ('_mask_fcn{}' if gn else '_[mask]_fcn{}').format(i + 1)
        params[prefix + '_w'] = (
            0.001 * jax.random.normal(keys[i], (3, 3, d, dim_inner), dtype))
        if gn:
            params[prefix + '_gn_s'] = jnp.ones((dim_inner,), dtype)
            params[prefix + '_gn_b'] = jnp.zeros((dim_inner,), dtype)
        else:
            params[prefix + '_b'] = jnp.zeros((dim_inner,), dtype)
        d = dim_inner
    # ConvTranspose 2x2 stride 2 (HWIO for conv_transpose)
    params['conv5_mask_w'] = 0.001 * jax.random.normal(
        keys[-2], (2, 2, dim_inner, dim_inner), dtype)
    params['conv5_mask_b'] = jnp.zeros((dim_inner,), dtype)
    params['mask_fcn_logits_w'] = 0.001 * jax.random.normal(
        keys[-1], (1, 1, dim_inner, num_classes - 1), dtype)
    params['mask_fcn_logits_b'] = jnp.zeros((num_classes - 1,), dtype)
    return params


def init_mask_v0up_params(rng, num_classes, dim_reduced=256,
                          depth='resnet50', share_res5=False, num_groups=1,
                          width_per_group=64, dtype=jnp.float32):
    """v0up(share) head params (mask_rcnn_heads.py:238-300): a ResNet res5
    stage over the pooled mask RoIs (params ``_[mask]_res5_*`` — or shared
    with the box head's ``res5_*`` for v0upshare, where none are created
    here), then deconv 2048->DIM_REDUCED + 1x1 logits."""
    from nafwebsod_tpu.models import resnet

    params = {}
    k1, k2, k3 = jax.random.split(rng, 3)
    dim_conv5 = 512 if depth == 'resnet18' else 2048
    if not share_res5:
        res5 = resnet.init_res5_head_params(
            k1, depth=depth, num_groups=num_groups,
            width_per_group=width_per_group, dtype=dtype)
        params.update({'_[mask]_' + name: v for name, v in res5.items()})
    params['conv5_mask_w'] = 0.001 * jax.random.normal(
        k2, (2, 2, dim_conv5, dim_reduced), dtype)
    params['conv5_mask_b'] = jnp.zeros((dim_reduced,), dtype)
    params['mask_fcn_logits_w'] = 0.001 * jax.random.normal(
        k3, (1, 1, dim_reduced, num_classes - 1), dtype)
    params['mask_fcn_logits_b'] = jnp.zeros((num_classes - 1,), dtype)
    return params


def mask_head_forward(params, feat, rois, spatial_scale, *, resolution=14,
                      method='RoIAlign', sampling_ratio=2, dilation=2,
                      num_convs=2):
    """feat: (H, W, C); rois: (R, 5). Returns (R, 2*res, 2*res, C-1) mask
    logits."""
    if method == 'RoIAlign':
        x = roi_align(feat, rois, resolution, resolution, spatial_scale,
                      max(sampling_ratio, 1))
    else:
        x = roi_pool(feat, rois, resolution, resolution, spatial_scale)
    return mask_head_from_pooled(params, x, dilation=dilation,
                                 num_convs=num_convs)


def mask_head_from_pooled(params, x, *, dilation=2, num_convs=2, gn=False,
                          variant='fcn', depth='resnet50', num_groups=1):
    """Conv/deconv/logit part of the mask head over pre-pooled RoI features
    (FPN bodies pool via the multilevel transform first).

    ``variant`` selects the reference architecture
    (mask_rcnn_heads.py:112-300): 'fcn' = v1upXconvs(_gn) with
    ``num_convs``/``gn``; 'v0up'/'v0upshare' = ResNet res5 stage + deconv
    (v0upshare reads the box head's shared ``res5_*`` params)."""
    x = x.astype(jnp.float32)
    if variant in ('v0up', 'v0upshare'):
        from nafwebsod_tpu.models import resnet
        prefix = 'res5' if variant == 'v0upshare' else '_[mask]_res5'
        stage_params = {k[len('_[mask]_'):] if variant == 'v0up' else k: v
                        for k, v in params.items()
                        if k.startswith(prefix)}
        # stride_init = RESOLUTION/7 (mask_rcnn_heads.py:319): pooled at
        # 14 -> res5 downsamples to 7 before the 2x deconv
        x = resnet.roi_res5_spatial_forward(
            stage_params, x, depth=depth,
            stride_init=max(x.shape[1] // 7, 1), num_groups=num_groups)
    else:
        for i in range(num_convs):
            prefix = ('_mask_fcn{}' if gn else '_[mask]_fcn{}').format(i + 1)
            x = jax.lax.conv_general_dilated(
                x, params[prefix + '_w'], window_strides=(1, 1),
                padding=((dilation, dilation), (dilation, dilation)),
                rhs_dilation=(dilation, dilation),
                dimension_numbers=('NHWC', 'HWIO', 'NHWC'))
            if gn:
                from nafwebsod_tpu.ops.norm import get_group_gn, group_norm
                c = x.shape[-1]
                x = group_norm(x, params[prefix + '_gn_s'],
                               params[prefix + '_gn_b'],
                               num_groups=get_group_gn(
                                   c, num_groups=min(32, c)))
                x = jax.nn.relu(x)
            else:
                x = jax.nn.relu(x + params[prefix + '_b'])
    # 2x upsample deconv
    x = jax.lax.conv_transpose(
        x, params['conv5_mask_w'], strides=(2, 2), padding='VALID',
        dimension_numbers=('NHWC', 'HWIO', 'NHWC'))
    x = jax.nn.relu(x + params['conv5_mask_b'])
    logits = jax.lax.conv_general_dilated(
        x, params['mask_fcn_logits_w'], window_strides=(1, 1),
        padding='VALID', dimension_numbers=('NHWC', 'HWIO', 'NHWC'))
    return logits + params['mask_fcn_logits_b']


def mask_losses(mask_logits, rois_pred, rois, labels_oh, valid_mask=None):
    """add_seg_losses (wsl_seg_heads.py:169-191): max-pool each RoI's mask
    logits over space -> per-RoI class logits; weighted sigmoid CE vs the
    broadcast image labels; AveragedLoss."""
    mask_w, _, mask_labels = mask_utility(rois_pred, rois, labels_oh)
    cls_logits = jnp.max(mask_logits, axis=(1, 2))  # (R, C-1)
    xent = weighted_sigmoid_cross_entropy_with_logits(
        cls_logits, mask_labels, mask_w)
    if valid_mask is not None:
        xent = xent * valid_mask
        return jnp.sum(xent) / jnp.maximum(jnp.sum(valid_mask), 1.0)
    return jnp.mean(xent)


ASPP_HOLES = (6, 12, 18, 24)


def init_deeplab_head_params(rng, num_classes, dim_in=512, hidden=1024,
                             mask_softmax=False, dtype=jnp.float32):
    """Deeplab ASPP head (wsl_seg_heads.py:deeplab_vgg16_head:428-501):
    four branches with holes 6/12/18/24, each fc6 (3x3 dilated) -> fc7 (1x1)
    -> mask_fc8_k (1x1 to C or C-1); outputs are SUMMED
    (add_deeplab_outputs)."""
    c = num_classes if mask_softmax else num_classes - 1
    params = {}
    keys = jax.random.split(rng, 3 * len(ASPP_HOLES))
    ki = 0
    for k in range(1, len(ASPP_HOLES) + 1):
        params['fc6_{}_w'.format(k)] = 0.01 * jax.random.normal(
            keys[ki], (3, 3, dim_in, hidden), dtype); ki += 1
        params['fc6_{}_b'.format(k)] = jnp.zeros((hidden,), dtype)
        params['fc7_{}_w'.format(k)] = 0.01 * jax.random.normal(
            keys[ki], (1, 1, hidden, hidden), dtype); ki += 1
        params['fc7_{}_b'.format(k)] = jnp.zeros((hidden,), dtype)
        params['mask_fc8_{}_w'.format(k)] = 0.01 * jax.random.normal(
            keys[ki], (1, 1, hidden, c), dtype); ki += 1
        params['mask_fc8_{}_b'.format(k)] = jnp.zeros((c,), dtype)
    return params


def _conv_nhwc(x, w, b, dilation=1):
    pad = (w.shape[0] - 1) // 2 * dilation
    y = jax.lax.conv_general_dilated(
        x, w, (1, 1), ((pad, pad), (pad, pad)),
        rhs_dilation=(dilation, dilation),
        dimension_numbers=('NHWC', 'HWIO', 'NHWC'))
    return y + b


def _dropout(x, rate, rng):
    if rng is None:
        return x
    keep = 1.0 - rate
    return jnp.where(jax.random.bernoulli(rng, keep, x.shape), x / keep, 0.0)


def deeplab_head_forward(params, feat, *, freeze_body=True, train=False,
                         rng=None):
    """feat: (1, H, W, 512) conv5 features. Returns summed mask logits
    (1, H, W, C[-1]) in float32.

    Computes at ``feat.dtype`` with f32 master weights cast per-use —
    the same mixed-precision convention as the fc towers
    (heads._fc_tower); the 12 ASPP 3x3/1x1 convs at the conv5 grid are
    the deeplab family's dominant GEMM cost and ran f32 before this
    (round-3 profile: ~18 ms/step of the 105 ms step at 704px)."""
    dt = feat.dtype
    # _[mask]_pool5: 3x3 stride-1 maxpool pad 1 (wsl_seg_heads.py:469-471)
    x = jnp.pad(feat, ((0, 0), (1, 1), (1, 1), (0, 0)),
                constant_values=-jnp.inf)
    x = jax.lax.reduce_window(x, -jnp.inf, jax.lax.max, (1, 3, 3, 1),
                              (1, 1, 1, 1), 'VALID')
    if freeze_body:
        x = jax.lax.stop_gradient(x)
    rngs = [None] * (2 * len(ASPP_HOLES))
    if train and rng is not None:
        rngs = list(jax.random.split(rng, 2 * len(ASPP_HOLES)))
    out = None
    for i, hole in enumerate(ASPP_HOLES):
        k = i + 1
        h = jax.nn.relu(_conv_nhwc(x, params['fc6_{}_w'.format(k)].astype(dt),
                                   params['fc6_{}_b'.format(k)].astype(dt),
                                   hole))
        h = _dropout(h, 0.5, rngs[2 * i]) if train else h
        h = jax.nn.relu(_conv_nhwc(h, params['fc7_{}_w'.format(k)].astype(dt),
                                   params['fc7_{}_b'.format(k)].astype(dt)))
        h = _dropout(h, 0.5, rngs[2 * i + 1]) if train else h
        logit = _conv_nhwc(h, params['mask_fc8_{}_w'.format(k)].astype(dt),
                           params['mask_fc8_{}_b'.format(k)].astype(dt))
        out = logit if out is None else out + logit
    # losses / CRF tail run f32 (deeplab_outputs' log/softmax chain)
    return out.astype(jnp.float32)


def deeplab_outputs(mask_fc8):
    """add_deeplab_outputs sigmoid path (wsl_seg_heads.py:92-130): per-class
    sigmoid; bg = 1 - max; bg/fg concat softmax'd over channels ->
    (1, H, W, C) probs; unary = -log(probs)."""
    sig = jax.nn.sigmoid(mask_fc8)
    fg = jnp.max(sig, axis=-1, keepdims=True)
    bg = 1.0 - fg
    bgfg = jnp.concatenate([bg, sig], axis=-1)
    probs = jax.nn.softmax(bgfg, axis=-1)
    unary = -jnp.log(jnp.maximum(probs, 1e-20))
    return sig, probs, unary


def deeplab_losses(mask_fc8, cpg, labels_oh, cls_prob, image, tau=0.7,
                   run_crf=True, cpg_sw_active=None, crf_filter_dtype=None):
    """add_deeplab_losses (wsl_seg_heads.py:288-370), sigmoid variant: seed
    loss = SigmoidCrossEntropyWithLogitsWSL vs DeeplabUtility targets at
    image resolution; CRF-consistency loss = KL(sigmoid probs, CRF-refined
    fg probs). cpg: (1, C-1, H_im, W_im) saliency maps.

    ``cpg_sw_active``: traced bool (``cur_iter < WSL.CPG_MAX_ITER``) enabling
    the CPGSW saliency switch (wsl_seg_heads.py:193-214): per confident
    class, the learned mask replaces the CPG map as the pseudo-label source,
    with the reference's cur_iter cutoff. None = disabled.
    ``crf_filter_dtype``: bilateral-lattice filtering dtype for the CRF
    target (seg.dense_crf) — the caller passes the model's compute dtype
    so bf16 specs get the halved-bandwidth filter."""
    from nafwebsod_tpu.ops.misc import kl_balanced
    from nafwebsod_tpu.ops.misc import sigmoid_cross_entropy_with_logits_wsl
    from nafwebsod_tpu.ops import seg as seg_ops
    from nafwebsod_tpu.ops.seg import (dense_crf, deeplab_utility_sigmoid,
                                       upsample_bilinear_wsl)

    h_im, w_im = cpg.shape[2], cpg.shape[3]
    targets = deeplab_utility_sigmoid(cpg, labels_oh, cls_prob, tau=tau)
    logits_up = upsample_bilinear_wsl(
        jnp.moveaxis(mask_fc8, -1, 1), h_im, w_im)       # (1, C-1, H, W)
    xent, _ = sigmoid_cross_entropy_with_logits_wsl(logits_up, targets)
    if cpg_sw_active is not None:
        loss_pc = jnp.mean(xent, axis=(2, 3))            # (1, C-1)
        cpg = seg_ops.cpg_sw(
            cpg, jax.lax.stop_gradient(logits_up), loss_pc, labels_oh,
            cls_prob, tau=tau, active=cpg_sw_active)
        targets = deeplab_utility_sigmoid(cpg, labels_oh, cls_prob, tau=tau)
        xent, _ = sigmoid_cross_entropy_with_logits_wsl(logits_up, targets)
    seed_loss = jnp.mean(jnp.sum(xent, axis=1))

    losses = {'mask_seed_loss': seed_loss}
    if run_crf:
        sig, probs, unary = deeplab_outputs(mask_fc8)
        # the CRF runs on the mask grid with the image resampled to that
        # grid — exactly the reference head's layout (wsl_seg_heads.py:126
        # UpsampleBilinearWSL(['data', 'mask_fc8_unary']) resizes the
        # IMAGE to the unary grid before DenseCRF: upsample_wsl_op.cc:10-23
        # takes output dims from Input(1)), so cell (i, j) reads the
        # pixels it covers
        im_small = jax.image.resize(
            image[0], (mask_fc8.shape[1], mask_fc8.shape[2],
                       image.shape[-1]), method='linear')
        q = dense_crf(jnp.moveaxis(unary[0], -1, 0), im_small,
                      filter_dtype=crf_filter_dtype)
        crf_fg = jnp.moveaxis(q[1:], 0, -1)[None]        # (1, h, w, C-1)
        # consistency loss: the reference KL op's balanced kernel with the
        # call site's (sigmoid-probs-as-logit, crf-target) slotting
        # (wsl_seg_heads.py:341; CRF target is constant — NO_GRADIENT)
        div = kl_balanced(sig, jax.lax.stop_gradient(crf_fg))
        losses['mask_constraint_loss'] = jnp.mean(div)
    return losses


def mask_probs_test(mask_logits):
    """Test-time: prepend the duplicated background channel then sigmoid
    (wsl_seg_heads.py:77-89)."""
    logits = jnp.concatenate([mask_logits[..., :1], mask_logits], axis=-1)
    return jax.nn.sigmoid(logits)
