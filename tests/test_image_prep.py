"""Device-side image prep (ops/image.py): resize+normalize inside the
jitted program must reproduce the host blob pipeline
(prep_im_for_blob, ref detectron/utils/blob.py:100-131), and the
device-prep fused inference path must match the host-prep fused path.
"""

import numpy as np
import pytest

from nafwebsod_tpu.core.config import cfg
from nafwebsod_tpu.data.minibatch import prep_im_for_blob
from nafwebsod_tpu.ops import image as image_ops


class TestDevicePrep:

    def test_compute_im_scale_matches_host(self):
        rng = np.random.RandomState(0)
        for h, w in [(375, 500), (500, 333), (60, 60), (1024, 600)]:
            im = rng.randint(0, 255, (h, w, 3), np.uint8)
            _, want = prep_im_for_blob(im, cfg.PIXEL_MEANS, 224, 400,
                                       cfg.PIXEL_STDS)
            got = image_ops.compute_im_scale(h, w, 224, 400)
            assert got == pytest.approx(want)

    def test_raw_canvas_replicate_margin(self):
        rng = np.random.RandomState(1)
        im = rng.randint(0, 255, (10, 12, 3), np.uint8)
        out = image_ops.raw_canvas(im, 16, 16)
        np.testing.assert_array_equal(out[:10, :12], im)
        # replicate margin below / right / corner
        for k in range(image_ops.EDGE_PAD):
            np.testing.assert_array_equal(out[10 + k, :12], im[9])
            np.testing.assert_array_equal(out[:10, 12 + k], im[:, 11])
        np.testing.assert_array_equal(
            out[10:10 + image_ops.EDGE_PAD, 12:12 + image_ops.EDGE_PAD],
            np.broadcast_to(im[9, 11],
                            (image_ops.EDGE_PAD, image_ops.EDGE_PAD, 3)))
        # zeros beyond the margin
        assert not out[10 + image_ops.EDGE_PAD:, :].any()
        assert not out[:, 12 + image_ops.EDGE_PAD:].any()

    @pytest.mark.parametrize('h,w,target,maxs', [
        (60, 90, 96, 160),    # upscale
        (120, 100, 64, 100),  # downscale
        (64, 64, 64, 128),    # unit scale
    ])
    def test_device_prep_matches_host_blob(self, h, w, target, maxs):
        import jax.numpy as jnp
        rng = np.random.RandomState(2)
        im = rng.randint(0, 255, (h, w, 3), np.uint8)
        want, im_scale = prep_im_for_blob(im, cfg.PIXEL_MEANS, target,
                                          maxs, cfg.PIXEL_STDS)
        vh, vw = image_ops.scaled_size(h, w, im_scale)
        assert (vh, vw) == want.shape[:2]
        raw = image_ops.raw_canvas(im, h + image_ops.EDGE_PAD + 6,
                                   w + image_ops.EDGE_PAD + 2)
        out_hw = (vh + 9, vw + 5)
        got = np.asarray(image_ops.device_prep(
            jnp.asarray(raw), jnp.float32(im_scale), jnp.int32(vh),
            jnp.int32(vw), out_hw,
            jnp.asarray(cfg.PIXEL_MEANS.reshape(-1), jnp.float32),
            jnp.asarray(cfg.PIXEL_STDS.reshape(-1), jnp.float32)))
        # scale_and_translate reproduces cv2 INTER_LINEAR to ~2e-3
        # pixel units (PIXEL_STDS is 1 so units carry through)
        np.testing.assert_allclose(got[:vh, :vw], want, atol=2.5e-2)
        # zero outside the valid extent
        assert not got[vh:, :].any()
        assert not got[:, vw:].any()


class TestFusedRawPath:
    """The device-prep fused inference path must produce the same
    detections as the host-prep fused path."""

    def _setup(self):
        from tests.test_engine import TestFusedDetect
        return TestFusedDetect()._setup()

    def test_raw_matches_host_prep(self, monkeypatch):
        from nafwebsod_tpu.engine import test as infer
        spec, params, im, boxes, obn = self._setup()
        monkeypatch.delenv('NAFWEBSOD_HOST_PREP', raising=False)
        cfg.TPU.DEVICE_IMAGE_PREP = 0
        host = infer.im_detect_fused(spec, params, im, boxes, obn)
        cfg.TPU.DEVICE_IMAGE_PREP = 1
        assert infer._device_prep_enabled()
        raw = infer.im_detect_fused(spec, params, im, boxes, obn)
        cfg.TPU.DEVICE_IMAGE_PREP = -1
        for j in range(1, cfg.MODEL.NUM_CLASSES):
            got = np.asarray(raw[j]).reshape(-1, 5)
            want = np.asarray(host[j]).reshape(-1, 5)
            assert got.shape == want.shape, 'class %d' % j
            got = got[np.lexsort(got.T)]
            want = want[np.lexsort(want.T)]
            # boxes identical (host-side origin coords), scores within
            # the resize deviation propagated through the net
            np.testing.assert_allclose(got[:, :4], want[:, :4],
                                       atol=1e-4, err_msg='class %d' % j)
            np.testing.assert_allclose(got[:, 4], want[:, 4],
                                       rtol=0.02, atol=2e-3,
                                       err_msg='class %d' % j)

    def test_batch_raw_matches_single_raw(self, monkeypatch):
        from nafwebsod_tpu.engine import test as infer
        spec, params, _, _, _ = self._setup()
        monkeypatch.delenv('NAFWEBSOD_HOST_PREP', raising=False)
        cfg.TPU.DEVICE_IMAGE_PREP = 1
        rng = np.random.RandomState(7)
        ims, bxs, obns = [], [], []
        for k in range(3):
            im_k = np.clip(cfg.PIXEL_MEANS.reshape(1, 1, 3) +
                           rng.randn(50 + 6 * k, 70 + 4 * k, 3) * 8,
                           0, 255).astype(np.uint8)
            h, w = im_k.shape[:2]
            b = rng.uniform(0, 40, (10 + 4 * k, 4)).astype(np.float32)
            b[:, 2:] = np.minimum(b[:, :2] + 5 +
                                  rng.uniform(0, 20, (len(b), 2)),
                                  [w - 1, h - 1])
            ims.append(im_k)
            bxs.append(b)
            obns.append(rng.rand(len(b), 1).astype(np.float32))
        try:
            batched = infer.im_detect_fused_batch(spec, params, ims, bxs,
                                                  obns)
            singles = [infer.im_detect_fused(spec, params, ims[k], bxs[k],
                                             obns[k]) for k in range(3)]
        finally:
            cfg.TPU.DEVICE_IMAGE_PREP = -1
        for k in range(3):
            for j in range(1, cfg.MODEL.NUM_CLASSES):
                got = np.asarray(batched[k][j]).reshape(-1, 5)
                want = np.asarray(singles[k][j]).reshape(-1, 5)
                got = got[np.lexsort(got.T)]
                want = want[np.lexsort(want.T)]
                np.testing.assert_allclose(
                    got, want, rtol=2e-4, atol=2e-4,
                    err_msg='image %d class %d' % (k, j))

    def test_env_override_forces_host(self, monkeypatch):
        from nafwebsod_tpu.engine import test as infer
        cfg.TPU.DEVICE_IMAGE_PREP = 1
        try:
            monkeypatch.setenv('NAFWEBSOD_HOST_PREP', '1')
            assert not infer._device_prep_enabled()
        finally:
            cfg.TPU.DEVICE_IMAGE_PREP = -1
