"""On-chip bit-exactness check: Pallas kernel vs the pure-XLA
reference formulation over boundary-size rois in f32 and bf16.
Run on a TPU host (tests cover the CPU paths; this drives the
TPU kernel itself)."""
import sys
import os
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np, jax, jax.numpy as jnp
from nafwebsod_tpu.ops.pallas.roi_pool_pallas import roi_pool_pallas
from nafwebsod_tpu.ops.roi_pool import roi_pool_xla

rng = np.random.RandomState(0)
H, W, C = 88, 88, 256
feat32 = rng.randn(H, W, C).astype(np.float32)

# roi sizes sweeping the small/full boundary: tiny, ~30-cell wide (edge of
# mbwu_s=32), ~56-cell tall (edge of mbh_s=8 bins), full-image, off-image
R = 512
x1 = rng.uniform(-10, 650, R); y1 = rng.uniform(-10, 650, R)
wds = rng.choice([8, 30, 120, 230, 240, 250, 450, 700], R)
hts = rng.choice([8, 30, 120, 390, 392, 400, 450, 700], R)
rois = np.stack([np.zeros(R), x1, y1, x1 + wds, y1 + hts], 1).astype(np.float32)
rois[:, 1:] = np.clip(rois[:, 1:], 0, 703)

for dtype in (jnp.float32, jnp.bfloat16):
    feat = jnp.asarray(feat32).astype(dtype)
    out_p = roi_pool_pallas(feat, jnp.asarray(rois), 7, 7, 0.125)
    ref = roi_pool_xla(jnp.asarray(feat, jnp.float32), jnp.asarray(rois),
                       7, 7, 0.125)
    ref = ref.astype(dtype)
    outs = np.asarray(out_p); refs = np.asarray(ref)
    bad = np.where(outs != refs)
    assert outs.dtype == refs.dtype
    if bad[0].size:
        i = bad[0][0]
        print('MISMATCH', dtype, 'roi', rois[i], outs[bad][:5], refs[bad][:5])
        sys.exit(1)
    print(dtype.__name__, 'exact match over', R, 'rois')
print('pallas pool ok')
# extra: heavy tiny-roi mix (exercises the tiny tier + boundaries at 128/168px)
wds2 = rng.choice([8, 16, 100, 126, 128, 130, 166, 168, 170, 200], R)
hts2 = rng.choice([8, 16, 100, 126, 128, 130, 166, 168, 170, 200], R)
rois2 = np.stack([np.zeros(R), x1, y1, x1 + wds2, y1 + hts2], 1).astype(np.float32)
rois2[:, 1:] = np.clip(rois2[:, 1:], 0, 703)
for dtype in (jnp.float32, jnp.bfloat16):
    feat = jnp.asarray(feat32).astype(dtype)
    out_p = np.asarray(roi_pool_pallas(feat, jnp.asarray(rois2), 7, 7, 0.125))
    ref = np.asarray(roi_pool_xla(jnp.asarray(feat, jnp.float32),
                                  jnp.asarray(rois2), 7, 7, 0.125).astype(dtype))
    assert (out_p == ref).all(), 'tiny-tier mismatch ' + str(dtype)
    print('tiny tier', dtype.__name__, 'exact')
