#!/usr/bin/env python
"""Measure the permutohedral blur's gather layout on the chip (VERDICT r4
optional perf item: the deeplab family's CRF bilateral blur is 12 serial
row-gathers at ~6.2 ms/step at the 88x88 mask grid).

Variants:
  baseline  — ops/permutohedral.apply as shipped: per blur round, two
              separate (M, V) row-gathers (n1, n2).
  stacked   — per round, ONE (2M, V) gather over the stacked [n1; n2]
              index vector, then a reshape-sum. Same math, same bytes;
              tests whether one big gather beats two smaller ones under
              XLA's v5e gather lowering.

The blur is inherently sequential ACROSS rounds (separable blur: round
j+1 consumes round j's output), so within-round fusion is the only
freedom. Run SERIALLY on the tunnel chip.

MEASURED OUTCOME (round 5): stacked wins in THIS isolated microbench
(4.254 -> 3.819 ms/blur) but LOSES inside the full deeplab train
program: +6.4 ms/step (86.7 -> 93.1, stable over 4 runs; the CRF target
is stop_gradient'ed so no backward runs through the blur — the
regression is XLA fusion/scheduling of the wide (2M, V) gather in the
larger program, not autodiff). The library ships the split form; the
stacked arm stays here as the documented negative result. Moral: a
lever that wins a microbenchmark must be re-measured in the program
that ships.
"""

import argparse
import os
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from nafwebsod_tpu.utils.env import apply_platform_override  # noqa: E402

apply_platform_override()

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from nafwebsod_tpu.ops import permutohedral as ph  # noqa: E402


def apply_stacked(lattice, values, nbr):
    """The rejected variant: ONE (2M)-row gather per blur round. 10%
    faster in this isolated microbench, +6.4 ms/step slower inside the
    full deeplab train program (see module docstring — fusion, not
    autodiff; measured negative result, BASELINE.md round 5)."""
    n, d, m = lattice['n'], lattice['d'], lattice['m']
    vdim = values.shape[1]
    bary = lattice['bary'].astype(values.dtype)
    w = (values[:, None, :] * bary[:, :, None]).reshape(m, vdim)
    lat = jax.ops.segment_sum(w, lattice['entry_uid'], num_segments=m)
    zero = jnp.zeros((1, vdim), lat.dtype)
    for j in range(d + 1):
        padded = jnp.concatenate([lat, zero], axis=0)
        g = padded[nbr[j]].reshape(2, m, vdim)
        lat = lat + 0.5 * (g[0] + g[1])
    padded = jnp.concatenate([lat, zero], axis=0)
    vert = padded[lattice['entry_uid']].reshape(n, d + 1, vdim)
    alpha = 1.0 / (1.0 + 2.0 ** (-float(d)))
    return jnp.sum(bary[:, :, None] * vert, axis=1) * alpha


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('--hw', type=int, default=88, help='mask grid side')
    ap.add_argument('--classes', type=int, default=21)
    ap.add_argument('--iters', type=int, default=10,
                    help='chained mean-field blur iterations per timing')
    ap.add_argument('--reps', type=int, default=5)
    args = ap.parse_args()

    h = w = args.hw
    rng = np.random.RandomState(0)
    img = rng.randn(h, w, 3).astype(np.float32) * 40
    ys, xs = np.meshgrid(np.arange(h, dtype=np.float32),
                         np.arange(w, dtype=np.float32), indexing='ij')
    sf = 500.0 / max(h, w)
    feat = np.concatenate([
        np.stack([xs, ys], -1).reshape(-1, 2) / (80.0 / sf),
        img.reshape(-1, 3) / 13.0], axis=-1)
    q0 = jax.nn.softmax(jnp.asarray(
        rng.randn(h * w, args.classes).astype(np.float32)), axis=1)

    lat = ph.build_lattice(jnp.asarray(feat))
    lat = {k: (jax.block_until_ready(v) if hasattr(v, 'block_until_ready')
               else v) for k, v in lat.items()}
    nbr = jnp.concatenate([lat['n1'], lat['n2']], axis=1)  # (d+1, 2M)

    @jax.jit
    def run_baseline(q):
        def step(i, q):
            return ph.apply(lat, q)
        return jax.lax.fori_loop(0, args.iters, step, q)

    @jax.jit
    def run_stacked(q):
        def step(i, q):
            return apply_stacked(lat, q, nbr)
        return jax.lax.fori_loop(0, args.iters, step, q)

    a = run_baseline(q0)
    b = run_stacked(q0)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                               rtol=1e-5, atol=1e-6)
    print('variants agree (rtol 1e-5)')

    for name, fn in (('baseline-2-gathers', run_baseline),
                     ('stacked-1-gather', run_stacked)):
        best = float('inf')
        out = fn(q0)
        float(out[0, 0])  # sync through the tunnel
        for _ in range(args.reps):
            t0 = time.perf_counter()
            out = fn(out)  # chained: each rep depends on the last
            float(out[0, 0])
            best = min(best, time.perf_counter() - t0)
        per_apply_ms = best / args.iters * 1e3
        print('%s: best %.1f ms / %d chained applies = %.3f ms per '
              'mean-field blur' % (name, best * 1e3, args.iters,
                                   per_apply_ms))


if __name__ == '__main__':
    main()
