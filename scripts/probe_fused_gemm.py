"""Microbenchmark: pre-stacked fused dual-tower GEMMs vs per-tower GEMMs.

Decides whether TPU.STACKED_TOWERS (weights stored pre-stacked in the
param pytree, split/joined only at checkpoint I/O so the on-disk reference
pkl schema is unchanged) can beat the unfused baseline. The earlier
FUSED_NOISE_TOWER / FUSED_FC7 experiments (ROADMAP negative results) lost
to the PER-STEP concat/stack of the fp32 weights; this probe stages the
stacked bf16 operands OUTSIDE the timed region to isolate the pure GEMM
question: does one (R, 25088) x (25088, 8192) dot beat two
(R, 25088) x (25088, 4096) dots (fc6 fwd is 82% MXU unfused —
BASELINE.md roofline), and does one batched (2, R, H) x (2, H, H) einsum
beat two (R, H) x (H, H) dots (fc7)?

Timing discipline per CLAUDE.md: scan-chained iterations inside one jit,
sync by fetching a scalar, best of 3 windows, serial on the tunnel chip.

OUTCOME (round-4 continuation): this microbench never finished on the rig
(the remote compile helper took >30 min for the first program that day),
so the question was settled at FULL-STEP granularity with bench.py
BENCH_STACKED=1 instead: pre-stacked fusion measured 45.2/45.2 vs 46.5
img/s unfused (clean serial windows) — fusion LOSES even with zero concat
traffic; see BASELINE.md. Kept for a future directly-attached-TPU rig
where the per-GEMM breakdown is cheap to obtain.
"""

import time

import numpy as np

import jax
import jax.numpy as jnp
from jax import lax

R, K, H = 2048, 25088, 4096
STEPS = 20


def timed(fn, args, label):
    best = None
    jitted = jax.jit(fn)
    out = jitted(*args)
    _ = float(jnp.sum(out))  # force through the tunnel
    for _ in range(3):
        t0 = time.perf_counter()
        out = jitted(*args)
        _ = float(jnp.sum(out))
        dt = (time.perf_counter() - t0) / STEPS * 1e3
        best = dt if best is None else min(best, dt)
    print(f'{label:36s} {best:7.3f} ms/step')
    return best


def chain(body):
    """Run STEPS dependent iterations of body inside one jit via scan."""
    def fn(x, *ws):
        def one(c, _):
            return body(c, *ws), None
        y, _ = lax.scan(one, x, None, length=STEPS)
        return y
    return fn


def main():
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((R, K)), jnp.bfloat16)
    w1 = jnp.asarray(rng.standard_normal((K, H)) * 0.01, jnp.bfloat16)
    w2 = jnp.asarray(rng.standard_normal((K, H)) * 0.01, jnp.bfloat16)
    wf = jnp.concatenate([w1, w2], axis=1)  # (K, 2H) staged outside timing
    w7a = jnp.asarray(rng.standard_normal((H, H)) * 0.01, jnp.bfloat16)
    w7b = jnp.asarray(rng.standard_normal((H, H)) * 0.01, jnp.bfloat16)
    w7s = jnp.stack([w7a, w7b])  # (2, H, H)

    print(f'devices: {jax.devices()}')

    # fc6 forward: carry is (R, K) -> project to H and lift back so the
    # chain stays data-dependent without adding another big GEMM's cost?
    # No: keep it honest — carry (R, K), each step computes the towers and
    # feeds a rank-1 perturbation back so XLA cannot hoist anything.
    def unfused6(c, w1, w2):
        h1 = jnp.dot(c, w1)
        h2 = jnp.dot(c, w2)
        s = jnp.sum(h1) + jnp.sum(h2)
        return c + (s * 1e-30).astype(c.dtype)

    def fused6(c, wf):
        h = jnp.dot(c, wf)
        s = jnp.sum(h)
        return c + (s * 1e-30).astype(c.dtype)

    a = timed(chain(unfused6), (x, w1, w2), 'fc6 fwd unfused (2x N=4096)')
    b = timed(chain(fused6), (x, wf), 'fc6 fwd fused   (1x N=8192)')

    # fc6 weight-grad: dW = x^T @ dy, M=25088 N=4096 vs N=8192
    dy1a = jnp.asarray(rng.standard_normal((R, H)), jnp.bfloat16)
    dy1b = jnp.asarray(rng.standard_normal((R, H)), jnp.bfloat16)
    dy2 = jnp.asarray(rng.standard_normal((R, 2 * H)), jnp.bfloat16)

    def unfused6_wg(c, dya, dyb):
        g1 = jnp.dot(c.T, dya)
        g2 = jnp.dot(c.T, dyb)
        s = jnp.sum(g1) + jnp.sum(g2)
        return c + (s * 1e-30).astype(c.dtype)

    def fused6_wg(c, dy):
        g = jnp.dot(c.T, dy)
        s = jnp.sum(g)
        return c + (s * 1e-30).astype(c.dtype)

    c_ = timed(chain(unfused6_wg), (x, dy1a, dy1b),
               'fc6 wgrad unfused (2x N=4096)')
    d = timed(chain(fused6_wg), (x, dy2), 'fc6 wgrad fused   (1x N=8192)')

    # fc7: two (R,H)x(H,H) vs one batched (2,R,H)x(2,H,H)
    h0 = jnp.asarray(rng.standard_normal((R, H)), jnp.bfloat16)
    h2s = jnp.stack([h0, h0 * 0.5])

    def unfused7(c, wa, wb):
        y1 = jnp.dot(c, wa)
        y2 = jnp.dot(c, wb)
        s = jnp.sum(y1) + jnp.sum(y2)
        return c + (s * 1e-30).astype(c.dtype)

    def fused7(c, ws):
        y = jnp.einsum('trh,tho->tro', c, ws)
        s = jnp.sum(y)
        return c + (s * 1e-30).astype(c.dtype)

    e = timed(chain(unfused7), (h0, w7a, w7b), 'fc7 unfused (2x dot HxH)')
    f = timed(chain(fused7), (h2s, w7s), 'fc7 batched (1x bmm 2xHxH)')

    # fc7 fused as one wide dot instead of bmm: only valid when both towers
    # share the input (they do not after per-tower dropout) — skip.
    print(f'fc6 fwd delta:   {a - b:+.3f} ms/step')
    print(f'fc6 wgrad delta: {c_ - d:+.3f} ms/step')
    print(f'fc7 delta:       {e - f:+.3f} ms/step')


if __name__ == '__main__':
    main()
