"""Keypoint R-CNN head (functional JAX, NHWC).

Capability parity with ``detectron/modeling/keypoint_rcnn_heads.py``:
``add_roi_pose_head_v1convX`` (RoI transform + X stacked 3x3 convs, :187-215)
and ``add_keypoint_outputs``/``add_keypoint_losses`` (:46-149): optional
deconv 2x upsample, per-keypoint heatmap logits, and the softmax-over-SPACE
loss — each keypoint's heatmap is flattened and its gt location index is the
class, weighted by visibility and optionally normalized by the total
keypoint count rather than the visible count.
"""

import jax
import jax.numpy as jnp

from nafwebsod_tpu.ops.roi_pool import roi_align


def init_keypoint_params(rng, dim_in=256, hidden=512, num_convs=8,
                         num_keypoints=17, deconv_dim=256,
                         dtype=jnp.float32):
    params = {}
    keys = jax.random.split(rng, num_convs + 2)
    d = dim_in
    for i in range(num_convs):
        params['kps_conv{}_w'.format(i + 1)] = 0.01 * jax.random.normal(
            keys[i], (3, 3, d, hidden), dtype)
        params['kps_conv{}_b'.format(i + 1)] = jnp.zeros((hidden,), dtype)
        d = hidden
    params['kps_deconv_w'] = 0.01 * jax.random.normal(
        keys[-2], (4, 4, d, deconv_dim), dtype)
    params['kps_deconv_b'] = jnp.zeros((deconv_dim,), dtype)
    params['kps_score_w'] = 0.001 * jax.random.normal(
        keys[-1], (1, 1, deconv_dim, num_keypoints), dtype)
    params['kps_score_b'] = jnp.zeros((num_keypoints,), dtype)
    return params


def forward(params, feat, rois, spatial_scale, *, resolution=14,
            num_convs=8):
    """feat: (H, W, C); rois: (R, 5). Returns per-RoI keypoint heatmaps
    (R, 2*res, 2*res, K)."""
    x = roi_align(feat, rois, resolution, resolution, spatial_scale, 2)
    x = x.astype(jnp.float32)
    for i in range(num_convs):
        w = params['kps_conv{}_w'.format(i + 1)]
        x = jax.lax.conv_general_dilated(
            x, w, (1, 1), ((1, 1), (1, 1)),
            dimension_numbers=('NHWC', 'HWIO', 'NHWC'))
        x = jax.nn.relu(x + params['kps_conv{}_b'.format(i + 1)])
    # deconv 2x (Caffe2 kernel 4 / stride 2 / pad 1 == exact 2x upsample)
    x = jax.lax.conv_transpose(
        x, params['kps_deconv_w'], strides=(2, 2), padding='SAME',
        dimension_numbers=('NHWC', 'HWIO', 'NHWC'))
    x = jax.nn.relu(x + params['kps_deconv_b'])
    logits = jax.lax.conv_general_dilated(
        x, params['kps_score_w'], (1, 1), 'VALID',
        dimension_numbers=('NHWC', 'HWIO', 'NHWC'))
    return logits + params['kps_score_b']


def keypoint_losses(kps_logits, locations, weights,
                    normalize_by_visible=False, loss_weight=1.0):
    """Softmax-over-space keypoint loss (keypoint_rcnn_heads.py:110-149).

    kps_logits: (R, Hh, Wh, K); locations: (R*K,) int32 flat heatmap indices
    (-1/ignored rows carry weight 0); weights: (R*K,) visibility weights.
    """
    r, hh, wh, k = kps_logits.shape
    flat = jnp.moveaxis(kps_logits, -1, 1).reshape(r * k, hh * wh)
    logp = jax.nn.log_softmax(flat, axis=1)
    safe_loc = jnp.clip(locations, 0, hh * wh - 1)
    picked = logp[jnp.arange(r * k), safe_loc]
    loss_sum = -jnp.sum(weights * picked)
    if normalize_by_visible:
        norm = jnp.maximum(jnp.sum(weights), 1.0)
    else:
        # normalize by the total keypoint capacity (see the long comment at
        # keypoint_rcnn_heads.py:128-140)
        norm = float(r * k)
    return loss_weight * loss_sum / norm


def keypoint_targets_dev(keypoints, rois, heatmap_size):
    """Device twin of ``keypoint_targets`` for the in-graph Faster R-CNN
    path: keypoints (R, K, 3) already gathered per sampled roi (via the
    proposal sampler's gt_assignment). Returns (locations (R*K,) int32,
    weights (R*K,) float32)."""
    x1, y1 = rois[:, 1:2], rois[:, 2:3]
    x2, y2 = rois[:, 3:4], rois[:, 4:5]
    sx = heatmap_size / jnp.maximum(x2 - x1, 1e-3)
    sy = heatmap_size / jnp.maximum(y2 - y1, 1e-3)
    hx = jnp.floor((keypoints[..., 0] - x1) * sx)
    hy = jnp.floor((keypoints[..., 1] - y1) * sy)
    ok = ((keypoints[..., 2] > 0) & (hx >= 0) & (hx < heatmap_size) &
          (hy >= 0) & (hy < heatmap_size))
    loc = jnp.where(ok, hy * heatmap_size + hx, -1).astype(jnp.int32)
    return loc.reshape(-1), ok.astype(jnp.float32).reshape(-1)


def keypoint_targets(keypoints, rois, heatmap_size):
    """Rasterize gt keypoints into flat heatmap location targets
    (roi_data/keypoint_rcnn.py semantics). keypoints: (R, K, 3) [x, y, vis]
    in image coords; rois: (R, 5). Returns (locations (R*K,) int32,
    weights (R*K,) float32)."""
    import numpy as np
    r, k, _ = keypoints.shape
    locations = np.full((r, k), -1, np.int32)
    weights = np.zeros((r, k), np.float32)
    for i in range(r):
        x1, y1, x2, y2 = rois[i, 1:5]
        scale_x = heatmap_size / max(x2 - x1, 1e-3)
        scale_y = heatmap_size / max(y2 - y1, 1e-3)
        for j in range(k):
            x, y, vis = keypoints[i, j]
            if vis <= 0:
                continue
            hx = int(np.floor((x - x1) * scale_x))
            hy = int(np.floor((y - y1) * scale_y))
            if 0 <= hx < heatmap_size and 0 <= hy < heatmap_size:
                locations[i, j] = hy * heatmap_size + hx
                weights[i, j] = 1.0
    return locations.reshape(-1), weights.reshape(-1)
