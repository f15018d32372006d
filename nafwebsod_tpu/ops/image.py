"""Device-side image preparation: resize + normalize inside the jitted
program, so only raw uint8 pixels cross the host->device link.

Reproduces the host blob prep (``data/minibatch.py:prep_im_for_blob``,
ref ``detectron/utils/blob.py:100-131``) on device:

  * bilinear resize with cv2 INTER_LINEAR's half-pixel sampling —
    ``jax.image.scale_and_translate(scale=s, translation=0,
    antialias=False)`` reproduces cv2's float path to ~2e-3 pixel units
    (verified on random images at up/down/unit scales);
  * BGR mean/std normalization AFTER the resize — normalization is
    affine and the 2-tap bilinear weights sum to 1 over the
    (replicate-padded) valid region, so resize-then-normalize equals the
    host path's normalize-then-resize;
  * zeros outside the scaled valid extent (``pad_image_to_bucket``
    semantics: mean-valued border pixels that rois never cover).

Why device-side: on remote-attached TPUs the f32 resized blob is the
single largest host->device transfer of the eval loop (~6.5 MB/image at
704 px vs ~1.5 MB raw uint8), and cv2.resize is the largest host-CPU
cost; both move off the critical path. Deviation from the reference
(which has no device prep) is documented in PARITY.md.
"""

import numpy as np

import jax
import jax.numpy as jnp

# Taps of the 2-tap (antialias=False) bilinear kernel reach at most one
# source pixel past the valid extent; replicate this margin so edge
# outputs clamp like cv2 instead of bleeding canvas zeros.
EDGE_PAD = 2


def compute_im_scale(h, w, target_size, max_size):
    """Short-side scale with long-side cap — the exact arithmetic of
    prep_im_for_blob (ref blob.py:110-118), without touching pixels."""
    im_size_min = min(h, w)
    im_size_max = max(h, w)
    im_scale = float(target_size) / float(im_size_min)
    if np.round(im_scale * im_size_max) > max_size:
        im_scale = float(max_size) / float(im_size_max)
    return im_scale


def scaled_size(h, w, im_scale):
    """Resized dims, with cv2.resize's dsize rounding (cvRound)."""
    return (int(np.rint(h * im_scale)), int(np.rint(w * im_scale)))


def raw_canvas(im, cap_h, cap_w):
    """Place a raw uint8 HxWx3 image on a (cap_h, cap_w, 3) uint8 canvas
    with an EDGE_PAD replicate margin (zeros beyond). Host side, cheap:
    one uint8 copy, no arithmetic."""
    h, w = im.shape[:2]
    assert h + EDGE_PAD <= cap_h and w + EDGE_PAD <= cap_w, (
        'raw canvas cap ({}, {}) too small for image ({}, {})'.format(
            cap_h, cap_w, h, w))
    out = np.zeros((cap_h, cap_w, im.shape[2]), np.uint8)
    out[:h, :w] = im
    out[h:h + EDGE_PAD, :w] = im[h - 1:h, :w]
    out[:h, w:w + EDGE_PAD] = im[:h, w - 1:w]
    out[h:h + EDGE_PAD, w:w + EDGE_PAD] = im[h - 1, w - 1]
    return out


def device_prep(raw_u8, im_scale, valid_h, valid_w, out_shape,
                pixel_means, pixel_stds):
    """Jittable resize + normalize + valid-extent mask.

    raw_u8      (Hc, Wc, 3) uint8 canvas from raw_canvas()
    im_scale    traced f32 scalar (per-image; dynamic under scan)
    valid_h/w   traced int32 resized extents from scaled_size()
    out_shape   STATIC (out_h, out_w) bucket canvas
    pixel_means/stds  (3,) f32 BGR
    Returns (out_h, out_w, 3) f32, zero outside [valid_h, valid_w).
    """
    out_h, out_w = out_shape
    x = raw_u8.astype(jnp.float32)
    scale2 = jnp.stack([im_scale, im_scale]).astype(jnp.float32)
    out = jax.image.scale_and_translate(
        x, (out_h, out_w, x.shape[2]), (0, 1), scale2,
        jnp.zeros((2,), jnp.float32), method='linear', antialias=False)
    out = (out - pixel_means.reshape(1, 1, -1)) / pixel_stds.reshape(1, 1, -1)
    row_ok = jax.lax.broadcasted_iota(jnp.int32, (out_h, out_w), 0) < valid_h
    col_ok = jax.lax.broadcasted_iota(jnp.int32, (out_h, out_w), 1) < valid_w
    return jnp.where((row_ok & col_ok)[:, :, None], out, 0.0)
