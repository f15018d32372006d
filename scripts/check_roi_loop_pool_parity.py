"""On-chip bit-exactness check: Pallas kernel vs the pure-XLA
reference formulation over boundary-size rois in f32 and bf16.
Run on a TPU host (tests cover the CPU paths; this drives the
TPU kernel itself)."""
import sys
import os
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np, jax, jax.numpy as jnp
from nafwebsod_tpu.ops.context import roi_context, roi_loop_pool_xla
from nafwebsod_tpu.ops.pallas.roi_loop_pool_pallas import roi_loop_pool_pallas

rng = np.random.RandomState(0)
H, W, C = 88, 88, 256
feat32 = rng.randn(H, W, C).astype(np.float32)

R = 256
x1 = rng.uniform(-10, 650, R); y1 = rng.uniform(-10, 650, R)
wds = rng.choice([8, 30, 120, 250, 440, 700], R)
hts = rng.choice([8, 30, 120, 390, 440, 700], R)
rois = np.stack([np.zeros(R), x1, y1, x1 + wds, y1 + hts], 1).astype(np.float32)
rois[:, 1:] = np.clip(rois[:, 1:], 0, 703)
frame, context = roi_context(jnp.asarray(rois), 704, 704, 1.8)

for name, r9 in (('frame', frame), ('context', context)):
    for dtype in (jnp.float32, jnp.bfloat16):
        feat = jnp.asarray(feat32).astype(dtype)
        out_p = np.asarray(roi_loop_pool_pallas(feat, r9, 7, 7, 0.125))
        ref = np.asarray(roi_loop_pool_xla(
            jnp.asarray(feat, jnp.float32), r9, 7, 7, 0.125).astype(dtype))
        bad = np.where(out_p != ref)
        if bad[0].size:
            i = bad[0][0]
            print('MISMATCH', name, dtype, np.asarray(r9)[i],
                  out_p[bad][:4], ref[bad][:4])
            sys.exit(1)
        print(name, dtype.__name__, 'exact over', R)
print('loop pool ok')
