"""Training/eval visualization dumps: CPG saliency maps (cpg_vis.py) and
conv-feature channel-max rendering (feat_vis.py)."""

import os

import numpy as np
import jax
import jax.numpy as jnp

from nafwebsod_tpu.models import detector
from nafwebsod_tpu.utils import vis


def _wsl_batch():
    rng = np.random.RandomState(0)
    r = 8
    x1 = rng.uniform(0, 20, r)
    y1 = rng.uniform(0, 20, r)
    labels = np.zeros((1, 4), np.float32)
    labels[0, [0, 2]] = 1
    return {
        'image': jnp.asarray(rng.randn(1, 48, 48, 3).astype(np.float32)),
        'rois': jnp.asarray(np.stack(
            [np.zeros(r), x1, y1, x1 + 15, y1 + 15], 1).astype(np.float32)),
        'obn_scores': jnp.asarray(rng.rand(r, 1).astype(np.float32)),
        'labels_oh': jnp.asarray(labels),
        'valid_mask': jnp.ones((r,), bool),
    }


def test_forward_cpg_maps_and_vis(tmp_path):
    spec = detector.ModelSpec(
        num_classes=5, hidden_dim=16, webly_on=False, webly_entropy=False,
        box_head='vgg16_2fc', csc=True, cpg_tau=0.0)
    params = detector.init_params(spec, jax.random.PRNGKey(0))
    b = _wsl_batch()
    maps, idx, keep = detector.forward_cpg_maps(
        spec, params, b['image'], b['rois'], b['obn_scores'],
        b['valid_mask'], b['labels_oh'])
    maps = np.asarray(maps)
    assert maps.shape == (spec.max_gt_cpg, 48, 48)
    assert np.isfinite(maps).all()
    # kept maps are max-normalized to 1 (CPGScale semantics)
    for k in range(maps.shape[0]):
        if np.asarray(keep)[k]:
            assert maps[k].max() == np.float32(1.0)

    out = str(tmp_path / 'vis')
    vis.vis_training_cpg(out, 7, b['image'], maps, idx, keep,
                         pixel_means=np.zeros((1, 1, 3)))
    kept = [int(np.asarray(idx)[k]) for k in range(maps.shape[0])
            if np.asarray(keep)[k]]
    for c in kept:
        assert os.path.exists(
            os.path.join(out, 'iter7_class{}_cpg.png'.format(c)))


def test_forward_body_feat_and_feat_map_vis(tmp_path):
    spec = detector.ModelSpec(num_classes=5, hidden_dim=16,
                              compute_dtype='float32')
    params = detector.init_params(spec, jax.random.PRNGKey(0))
    b = _wsl_batch()
    feat = detector.forward_body_feat(spec, params, b['image'])
    feat = np.asarray(feat)
    assert feat.ndim == 4 and feat.shape[0] == 1
    assert feat.dtype == np.float32

    name = str(tmp_path / 'feat.png')
    blend = vis.feat_map_vis(name, b['image'], feat,
                             pixel_means=np.zeros((1, 1, 3)))
    assert os.path.exists(name)
    assert blend.shape == (48, 48, 3)


def test_vis_one_image_with_masks_and_keypoints(tmp_path):
    """Mask blending + contour and keypoint/skeleton rendering
    (reference vis.py vis_one_image segms/keypoints scope)."""
    from nafwebsod_tpu.utils import vis
    from nafwebsod_tpu.utils.segms import mask_to_rle

    im = np.full((60, 80, 3), 120, np.uint8)
    cls_boxes = [[], np.array([[10, 10, 40, 40, 0.9]], np.float32)]
    m = np.zeros((60, 80), np.uint8)
    m[12:38, 12:38] = 1
    segms = [[], [mask_to_rle(m)]]
    kps = np.zeros((1, 4, 17), np.float32)
    kps[0, 0] = np.linspace(12, 38, 17)   # x
    kps[0, 1] = np.linspace(12, 38, 17)   # y
    kps[0, 2] = 5.0                       # logits above kp_thresh
    out = vis.vis_one_image(im, cls_boxes, segms=segms,
                            keypoints=[[], kps],
                            thresh=0.5,
                            output_name=str(tmp_path / 'det.png'))
    assert (tmp_path / 'det.png').exists()
    # the blended mask must have changed pixels inside the mask region
    assert np.abs(out[20, 20].astype(int) - 120).sum() > 0


def test_vis_keypoints_below_thresh_draws_nothing():
    from nafwebsod_tpu.utils import vis
    im = np.zeros((30, 30, 3), np.uint8)
    kps = np.zeros((4, 17), np.float32)  # logits 0 < thresh 2
    out = vis.vis_keypoints(im, kps)
    assert out.sum() == 0
