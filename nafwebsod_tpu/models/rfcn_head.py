"""R-FCN head with position-sensitive RoI pooling (functional JAX, NHWC).

Capability parity with ``detectron/modeling/rfcn_heads.py:29-99``
(add_rfcn_outputs) and Caffe2's PSRoIPool: 1x1 convs produce K*K
position-sensitive score maps per class (and per 4*reg-class for bbox);
each RoI bin (i, j) AVERAGE-pools its region from map group (i*K + j); the
K*K pooled grid is average-voted into per-RoI scores.
"""

import jax
import jax.numpy as jnp


def init_rfcn_params(rng, dim_in, num_classes, ps_grid=7, dim_reduce=1024,
                     cls_agnostic_bbox=False, dtype=jnp.float32):
    k1, k2, k3 = jax.random.split(rng, 3)
    num_reg = 2 if cls_agnostic_bbox else num_classes
    params = {}
    if dim_reduce:
        params['conv_dim_reduce_w'] = 0.01 * jax.random.normal(
            k1, (1, 1, dim_in, dim_reduce), dtype)
        params['conv_dim_reduce_b'] = jnp.zeros((dim_reduce,), dtype)
        dim_in = dim_reduce
    params['conv_cls_w'] = 0.01 * jax.random.normal(
        k2, (1, 1, dim_in, num_classes * ps_grid ** 2), dtype)
    params['conv_cls_b'] = jnp.zeros((num_classes * ps_grid ** 2,), dtype)
    params['conv_bbox_pred_w'] = 0.01 * jax.random.normal(
        k3, (1, 1, dim_in, 4 * num_reg * ps_grid ** 2), dtype)
    params['conv_bbox_pred_b'] = jnp.zeros((4 * num_reg * ps_grid ** 2,),
                                           dtype)
    return params


def psroi_pool(feat, rois, output_dim, group_size=7, spatial_scale=1.0 / 16):
    """Position-sensitive RoI average pooling (Caffe2 PSRoIPool semantics).

    feat: (H, W, K*K*output_dim) with channel layout group-major
    ((i*K + j) * output_dim + c, the Caffe2 NCHW channel order); rois:
    (R, 5). Returns (R, K, K, output_dim).
    """
    h, w, _ = feat.shape
    k = group_size

    def one_roi(roi):
        # PSRoIPool rounds roi starts down / ends up after scaling
        x1 = jnp.round(roi[1]) * spatial_scale
        y1 = jnp.round(roi[2]) * spatial_scale
        x2 = jnp.round(roi[3] + 1.0) * spatial_scale
        y2 = jnp.round(roi[4] + 1.0) * spatial_scale
        roi_w = jnp.maximum(x2 - x1, 0.1)
        roi_h = jnp.maximum(y2 - y1, 0.1)
        bin_w = roi_w / k
        bin_h = roi_h / k

        ys = jnp.arange(h, dtype=jnp.float32)
        xs = jnp.arange(w, dtype=jnp.float32)
        out = []
        for i in range(k):        # bin row
            hstart = jnp.floor(y1 + i * bin_h)
            hend = jnp.ceil(y1 + (i + 1) * bin_h)
            ymask = (ys >= jnp.clip(hstart, 0, h)) & (ys < jnp.clip(hend, 0, h))
            row = []
            for j in range(k):    # bin col
                wstart = jnp.floor(x1 + j * bin_w)
                wend = jnp.ceil(x1 + (j + 1) * bin_w)
                xmask = ((xs >= jnp.clip(wstart, 0, w)) &
                         (xs < jnp.clip(wend, 0, w)))
                group = feat[:, :, (i * k + j) * output_dim:
                             (i * k + j + 1) * output_dim]
                m = ymask[:, None] & xmask[None, :]
                s = jnp.sum(group * m[:, :, None], axis=(0, 1))
                cnt = jnp.maximum(jnp.sum(m), 1.0)
                row.append(s / cnt)
            out.append(jnp.stack(row))
        return jnp.stack(out)  # (K, K, C)

    return jax.vmap(one_roi)(rois)


def _conv1x1(x, w, b):
    y = jax.lax.conv_general_dilated(
        x, w.astype(x.dtype), (1, 1), 'VALID',
        dimension_numbers=('NHWC', 'HWIO', 'NHWC'),
        preferred_element_type=x.dtype)
    return y + b.astype(x.dtype)


def forward(params, feat, rois, num_classes, ps_grid=7,
            spatial_scale=1.0 / 16, cls_agnostic_bbox=False):
    """feat: (1, H, W, C). Returns (cls_score (R, num_classes),
    bbox_pred (R, 4*num_reg))."""
    x = feat
    if 'conv_dim_reduce_w' in params:
        x = jax.nn.relu(_conv1x1(x, params['conv_dim_reduce_w'],
                                 params['conv_dim_reduce_b']))
    cls_maps = _conv1x1(x, params['conv_cls_w'],
                        params['conv_cls_b'])[0].astype(jnp.float32)
    bbox_maps = _conv1x1(x, params['conv_bbox_pred_w'],
                         params['conv_bbox_pred_b'])[0].astype(jnp.float32)
    num_reg = 2 if cls_agnostic_bbox else num_classes
    pooled_cls = psroi_pool(cls_maps, rois, num_classes, ps_grid,
                            spatial_scale)
    pooled_bbox = psroi_pool(bbox_maps, rois, 4 * num_reg, ps_grid,
                             spatial_scale)
    # vote: average over the K*K grid (AveragePool kernel=K)
    cls_score = jnp.mean(pooled_cls, axis=(1, 2))
    bbox_pred = jnp.mean(pooled_bbox, axis=(1, 2))
    return cls_score, bbox_pred
