"""Standalone numpy oracle of the reference Caffe2 forward graph.

This module is the cross-framework numeric-parity fixture: a direct
transcription of the REFERENCE semantics (Caffe2 protobuf ops + the custom
op .cc files) into plain numpy, written against the reference sources — NOT
against this repo's JAX implementation. It consumes the public pkl weight
schema in its native layouts (OIHW convs, (out, in) FCs, NCHW activations),
so running it next to the JAX model on the same checkpoint checks the whole
chain: checkpoint layout translation, conv body, RoIPoolF, RoIFeatureBoost,
FC towers, the WSDDN dual softmax, the noisy residual branch, and the
test-time background column.

Transcribed semantics, with sources:
  * conv / relu / maxpool stack — ``detectron/modeling/VGG16.py:9-58``
    (Caffe2 Conv pad=1 (pad=2 dilated), MaxPool floor output sizing).
  * RoIPoolF — Caffe2 ``roi_pool_op`` (classic Fast R-CNN pooling: rounded
    roi coords, +1 extents, floor/ceil bin edges, empty bins = 0).
  * RoIFeatureBoost — ``detectron/ops/roi_feature_boost_op.cc:25-31``
    (per-roi scalar multiply).
  * 2fc (+noisy) towers — ``detectron/modeling/wsl_heads.py:654-681``,
    ``webly_heads.py:463-502`` (the noisy tower reads the BOOSTED
    roi_feat; dropout is train-only).
  * WSDDN outputs — ``wsl_heads.py:23-78``: softmax over classes (fc8c),
    softmax over RoIs (fc8d transposed), elementwise product; the webly
    branch adds noisy logits before its own softmax pair
    (``webly_heads.py:57-74``); at test a background column duplicating
    class 0 is prepended (``wsl_heads.py:58-67``).
  * image score — ``wsl_heads.py:213-227`` ReduceSum over RoIs.
"""

import numpy as np


# --------------------------------------------------------------------------
# Caffe2 primitive ops (NCHW)
# --------------------------------------------------------------------------

def conv2d(x, w, b, pad=1, stride=1, dilation=1):
    """x: (N, C, H, W); w: (O, C, kh, kw) OIHW; b: (O,). Float32 im2col."""
    n, c, h, wd = x.shape
    o, _, kh, kw = w.shape
    ekh, ekw = (kh - 1) * dilation + 1, (kw - 1) * dilation + 1
    out_h = (h + 2 * pad - ekh) // stride + 1
    out_w = (wd + 2 * pad - ekw) // stride + 1
    xp = np.pad(x, ((0, 0), (0, 0), (pad, pad), (pad, pad)))
    cols = np.empty((n, c, kh, kw, out_h, out_w), np.float32)
    for i in range(kh):
        for j in range(kw):
            di, dj = i * dilation, j * dilation
            cols[:, :, i, j] = xp[:, :, di:di + out_h * stride:stride,
                                  dj:dj + out_w * stride:stride]
    cols = cols.reshape(n, c * kh * kw, out_h * out_w)
    wm = w.reshape(o, c * kh * kw)
    out = np.einsum('ok,nkp->nop', wm, cols, optimize=True)
    return (out + b.reshape(1, o, 1)).reshape(n, o, out_h, out_w)


def relu(x):
    return np.maximum(x, 0.0)


def max_pool(x, kernel=2, stride=2):
    """Caffe2 MaxPool, floor output sizing, pad 0."""
    n, c, h, w = x.shape
    out_h = (h - kernel) // stride + 1
    out_w = (w - kernel) // stride + 1
    out = np.full((n, c, out_h, out_w), -np.inf, np.float32)
    for i in range(kernel):
        for j in range(kernel):
            out = np.maximum(
                out, x[:, :, i:i + out_h * stride:stride,
                       j:j + out_w * stride:stride])
    return out


def fc(x, w, b):
    """x: (R, in); w: (out, in) Caffe layout; b: (out,)."""
    return x @ w.T + b


def softmax_rows(x):
    e = np.exp(x - x.max(axis=1, keepdims=True))
    return e / e.sum(axis=1, keepdims=True)


# --------------------------------------------------------------------------
# Custom ops
# --------------------------------------------------------------------------

def _c_round(x):
    """C round(): halves away from zero (Python's round() banker-rounds —
    round(2.5) differs; the Caffe2 kernel uses the C function)."""
    return int(np.sign(x) * np.floor(np.abs(x) + 0.5))


def roi_pool_f(feat, rois, pooled_h, pooled_w, spatial_scale):
    """Caffe2 RoIPoolF. feat: (C, H, W); rois: (R, 5) [batch x1 y1 x2 y2]
    in image coords. Returns (R, C, ph, pw)."""
    c, height, width = feat.shape
    r = rois.shape[0]
    out = np.zeros((r, c, pooled_h, pooled_w), np.float32)
    for ri in range(r):
        x1 = _c_round(rois[ri, 1] * spatial_scale)
        y1 = _c_round(rois[ri, 2] * spatial_scale)
        x2 = _c_round(rois[ri, 3] * spatial_scale)
        y2 = _c_round(rois[ri, 4] * spatial_scale)
        roi_h = max(y2 - y1 + 1, 1)
        roi_w = max(x2 - x1 + 1, 1)
        bin_h = roi_h / pooled_h
        bin_w = roi_w / pooled_w
        for ph in range(pooled_h):
            hs = min(max(int(np.floor(ph * bin_h)) + y1, 0), height)
            he = min(max(int(np.ceil((ph + 1) * bin_h)) + y1, 0), height)
            for pw in range(pooled_w):
                ws = min(max(int(np.floor(pw * bin_w)) + x1, 0), width)
                we = min(max(int(np.ceil((pw + 1) * bin_w)) + x1, 0), width)
                if he > hs and we > ws:
                    out[ri, :, ph, pw] = feat[:, hs:he, ws:we].max(
                        axis=(1, 2))
    return out


def roi_feature_boost(pooled, obn_scores):
    """roi_feature_boost_op.cc:25-31: scale each roi's features by its
    objectness scalar."""
    return pooled * np.asarray(obn_scores).reshape(-1, 1, 1, 1)


# --------------------------------------------------------------------------
# The graph
# --------------------------------------------------------------------------

VGG16_STACK = (
    ('conv1_1', 64), ('conv1_2', 64), 'pool',
    ('conv2_1', 128), ('conv2_2', 128), 'pool',
    ('conv3_1', 256), ('conv3_2', 256), ('conv3_3', 256), 'pool',
    ('conv4_1', 512), ('conv4_2', 512), ('conv4_3', 512),
)


def vgg16_conv5(blobs, im, dilation=2):
    """VGG16.py:9-58. im: (1, 3, H, W) mean-subtracted BGR. Returns the
    conv5_3 relu output (1, 512, h, w) and the spatial scale."""
    x = im.astype(np.float32)
    for item in VGG16_STACK:
        if item == 'pool':
            x = max_pool(x, 2, 2)
        else:
            name, _ = item
            x = relu(conv2d(x, blobs[name + '_w'], blobs[name + '_b']))
    if dilation == 2:
        x = max_pool(x, 2, 1)
        for name in ('conv5_1', 'conv5_2', 'conv5_3'):
            x = relu(conv2d(x, blobs[name + '_w'], blobs[name + '_b'],
                            pad=2, dilation=2))
        return x, 1.0 / 8.0
    x = max_pool(x, 2, 2)
    for name in ('conv5_1', 'conv5_2', 'conv5_3'):
        x = relu(conv2d(x, blobs[name + '_w'], blobs[name + '_b']))
    return x, 1.0 / 16.0


def two_fc_tower(blobs, flat, prefix=''):
    """fc6/relu -> fc7/relu (dropout is train-only; wsl_heads.py:674-679)."""
    h = relu(fc(flat, blobs[prefix + 'fc6_w'], blobs[prefix + 'fc6_b']))
    return relu(fc(h, blobs[prefix + 'fc7_w'], blobs[prefix + 'fc7_b']))


def wsddn_scores(fc8c, fc8d):
    """wsl_heads.py:51-55: per-roi softmax over classes x per-class softmax
    over rois."""
    alpha_cls = softmax_rows(fc8c)
    alpha_det = softmax_rows(fc8d.T).T
    return alpha_cls * alpha_det


def forward_test(blobs, im, rois, obn_scores, resolution=7, dilation=2,
                 webly=True):
    """Full reference inference graph for the (webly) WSDDN model on one
    image. Returns a dict of every intermediate stage."""
    stages = {}
    feat, scale = vgg16_conv5(blobs, im, dilation)
    stages['conv5'] = feat

    pooled = roi_pool_f(feat[0], rois, resolution, resolution, scale)
    pooled = roi_feature_boost(pooled, obn_scores)
    stages['roi_feat'] = pooled

    flat = pooled.reshape(pooled.shape[0], -1)       # NCHW flatten (C*H*W)
    fc7 = two_fc_tower(blobs, flat)
    stages['fc7'] = fc7
    fc8c = fc(fc7, blobs['fc8c_w'], blobs['fc8c_b'])
    fc8d = fc(fc7, blobs['fc8d_w'], blobs['fc8d_b'])
    rois_pred = wsddn_scores(fc8c, fc8d)
    stages['rois_pred'] = rois_pred

    if webly:
        fc7_noisy = two_fc_tower(blobs, flat, prefix='_[noisy]_')
        stages['fc7_noisy'] = fc7_noisy
        noisy_c = fc(fc7_noisy, blobs['noisy_fc8c_w'], blobs['noisy_fc8c_b'])
        noisy_d = fc(fc7_noisy, blobs['noisy_fc8d_w'], blobs['noisy_fc8d_b'])
        stages['rois_pred_noise'] = wsddn_scores(fc8c + noisy_c,
                                                 fc8d + noisy_d)

    # test-time bg column duplicates class 0 (wsl_heads.py:58-67)
    stages['cls_prob_roi'] = np.concatenate(
        [rois_pred[:, :1], rois_pred], axis=1)
    # image-level score (wsl_heads.py:213-227)
    stages['cls_prob_img'] = rois_pred.sum(axis=0, keepdims=True)
    return stages


# --------------------------------------------------------------------------
# Training-loss path (webly_heads.add_webly_losses)
# --------------------------------------------------------------------------

def roi_iou(rois):
    """N x N IoU matrix of (batch_idx, x1, y1, x2, y2) rois.

    Transcribed from ``detectron/ops/roi_iou_op.cu:27-62``: coordinates are
    TRUNCATED to int, extents use the VOC +1 convention, and the diagonal is
    set to exactly 1.0 before any arithmetic."""
    n = rois.shape[0]
    c = rois[:, 1:5].astype(np.int64)           # int casts in the kernel
    x1, y1, x2, y2 = c[:, 0], c[:, 1], c[:, 2], c[:, 3]
    ix1 = np.maximum(x1[:, None], x1[None, :]).astype(np.float32)
    iy1 = np.maximum(y1[:, None], y1[None, :]).astype(np.float32)
    ix2 = np.minimum(x2[:, None], x2[None, :]).astype(np.float32)
    iy2 = np.minimum(y2[:, None], y2[None, :]).astype(np.float32)
    w = np.maximum(ix2 - ix1 + 1.0, 0.0)
    h = np.maximum(iy2 - iy1 + 1.0, 0.0)
    inters = w * h
    area = ((x2 - x1 + 1.0) * (y2 - y1 + 1.0)).astype(np.float32)
    uni = area[:, None] + area[None, :] - inters
    j = (inters / uni).astype(np.float32)
    j[np.arange(n), np.arange(n)] = 1.0
    return j


def spatial_entropy_weight(rois_pred, cls_prob, rois, labels_oh):
    """The noise-aware class weighting graph, transcribed op-for-op from the
    live branch of ``webly_heads.add_spatial_entropy_weight``
    (webly_heads.py:265-391):

        J = RoIIoU(rois); E = ReplaceNaN(-p log p); D = LeakyRelu(J @ E)
        hatE = E * (E / D); hatE_sum = sum_rois hatE          (1, C)
        norm = clip(hatE_sum / (y * (log N - log y)), 0, 1)   (y = cls_prob)
        class_weight_noise = norm * (1 - labels_oh)
        class_weight = 1 - class_weight_noise

    Returns (class_weight, class_weight_noise, stages dict). Caffe2's
    LeakyRelu default alpha is 0.01; ReplaceNaN maps NaN -> 0 (0 * log 0)."""
    stages = {}
    j = roi_iou(rois)
    stages['J'] = j
    with np.errstate(divide='ignore', invalid='ignore'):
        e = -(rois_pred * np.log(rois_pred))
    e = np.where(np.isnan(e), 0.0, e).astype(np.float32)
    stages['E'] = e
    d = j @ e
    d = np.where(d >= 0, d, 0.01 * d)            # LeakyRelu(alpha=0.01)
    with np.errstate(divide='ignore', invalid='ignore'):
        hat_e = e * (e / d)
    stages['hatE'] = hat_e
    hat_e_sum = hat_e.sum(axis=0, keepdims=True)
    n_float = np.float32(rois_pred.shape[0])
    with np.errstate(divide='ignore', invalid='ignore'):
        y_norm = (np.log(n_float) - np.log(cls_prob)) * cls_prob
        norm = hat_e_sum / y_norm
    stages['y_logN__logy'] = y_norm
    norm = np.clip(norm, 0.0, 1.0)
    stages['hatE_sum_norm'] = norm
    class_weight_noise = (norm * (1.0 - labels_oh)).astype(np.float32)
    class_weight = (1.0 - class_weight_noise).astype(np.float32)
    return class_weight, class_weight_noise, stages


def cross_entropy_with_logits(x, l, w=None, is_mean=False):
    """Binary CE on *probabilities* (despite the name), transcribed from
    ``detectron/ops/cross_entropy_wsl_op.cc:8-46`` (weighted variant
    :89-132): probs clamped at kLOG_THRESHOLD=1e-20 before log, summed over
    all elements, / C when is_mean, / N. AveragedLoss on the scalar output
    (webly_heads.py:176-178) is the identity."""
    x = np.asarray(x, np.float32)
    n, c = x.shape
    norm = float(c) if is_mean else 1.0
    prob = np.maximum(x, 1e-20)
    one_prob = np.maximum(1.0 - x, 1e-20)
    elem = -(l * np.log(prob) + (1.0 - l) * np.log(one_prob))
    if w is not None:
        elem = elem * w
    return np.float32(elem.sum() / norm / n)


def cross_entropy_with_logits_grad(x, l, w=None, dy=1.0, is_mean=False):
    """Analytic dLoss/dX, transcribed from the reference gradient kernels
    (``cross_entropy_wsl_op.cc:49-88`` plain, :135-180 weighted): per-element
    grad clamped at kDIFF_THRESHOLD=1e4 BEFORE the weight multiply and the
    1/N scale."""
    x = np.asarray(x, np.float32)
    n, c = x.shape
    norm = float(c) if is_mean else 1.0
    prob = np.maximum(x, 1e-20)
    one_prob = np.maximum(1.0 - x, 1e-20)
    grad = dy * (-l / prob + (1.0 - l) / one_prob) / norm
    grad = np.minimum(grad, 1e4)
    if w is not None:
        grad = grad * w
    return (grad / n).astype(np.float32)


def forward_train(blobs, im, rois, obn_scores, labels_oh, resolution=7,
                  dilation=2, is_mean=False):
    """Reference TRAINING graph for the webly model on one image: the
    forward stages plus the noise-aware loss path
    (``webly_heads.add_webly_losses:123-197`` with WEBLY.ENTROPY on and no
    CPG/CSC). Dropout (train-time fc6/fc7) is omitted — it is a random
    mask, so parity is checked against the JAX path with masks disabled.

    Returns the forward stages dict extended with: cls_prob / cls_prob_noise
    (image scores), class_weight(_noise), loss_cls, loss_cls_noise, and the
    analytic d loss_cls / d cls_prob gradients."""
    stages = forward_test(blobs, im, rois, obn_scores,
                          resolution=resolution, dilation=dilation,
                          webly=True)
    # train-time image scores: plain ReduceSum over RoIs, NO bg column
    # (wsl_heads.add_cls_pred:213-227)
    cls_prob = stages['rois_pred'].sum(axis=0, keepdims=True)
    cls_prob_noise = stages['rois_pred_noise'].sum(axis=0, keepdims=True)
    stages['cls_prob'] = cls_prob
    stages['cls_prob_noise'] = cls_prob_noise

    cw, cwn, went = spatial_entropy_weight(
        stages['rois_pred'], cls_prob, rois, labels_oh)
    stages.update(went)
    stages['class_weight'] = cw
    stages['class_weight_noise'] = cwn

    stages['loss_cls'] = cross_entropy_with_logits(
        cls_prob, labels_oh, w=cw, is_mean=is_mean)
    stages['loss_cls_noise'] = cross_entropy_with_logits(
        cls_prob_noise, labels_oh, w=cwn, is_mean=is_mean)
    stages['d_loss_d_cls_prob'] = cross_entropy_with_logits_grad(
        cls_prob, labels_oh, w=cw, is_mean=is_mean)
    stages['d_loss_d_cls_prob_noise'] = cross_entropy_with_logits_grad(
        cls_prob_noise, labels_oh, w=cwn, is_mean=is_mean)
    return stages
