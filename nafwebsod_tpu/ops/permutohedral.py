"""Permutohedral-lattice Gaussian filtering (Adams, Baek, Davis, 2010).

High-dimensional Gaussian filtering in O(N*d): embed each feature vector
into the hyperplane H_d, splat onto the enclosing lattice simplex with
barycentric weights, run a [1/2, 1, 1/2] blur along each of the d+1
lattice directions, and slice back. This is the filter inside the
Krähenbühl–Koltun DenseCRF's message passing.

TPU-native design: the classic implementation builds a HASH TABLE of
occupied lattice points on the host; this one is fully in-graph with
static shapes so it runs under ``jit`` on any backend (the axon TPU
runtime implements no host callbacks, so a host-side FFI lattice could
never serve the deeplab train path):

  * dedup of the N*(d+1) splat keys via lexicographic sort + boundary
    flags (capacity M = N*(d+1) is a static upper bound on occupied
    lattice points);
  * blur-neighbor lookup via vectorized lexicographic binary search over
    the sorted unique keys (log2(M) compare rounds, no hashing);
  * the lattice (splat ids, barycentric weights, neighbor tables) is
    built ONCE per feature set — mean-field iterations reuse it, paying
    only segment-sums and gathers per step.

Reference: ``/root/reference/detectron/ops/crf_op.cc:1-287`` wraps
DenseCRF2D whose permutohedral code lives in an EMPTY git submodule
upstream (``detectron/ops/densecrf``) — bit-parity is impossible; this
implements the published algorithm, validated against brute-force
Gaussian filtering in tests/test_permutohedral.py.
"""

from functools import partial

import numpy as np

import jax
import jax.numpy as jnp

_INT_SENTINEL = np.int32(2 ** 31 - 1)


def _lex_less(a, b):
    """a < b lexicographically over the trailing axis (int32 rows)."""
    d = a.shape[-1]
    lt = jnp.zeros(a.shape[:-1], bool)
    eq = jnp.ones(a.shape[:-1], bool)
    for c in range(d):
        lt = lt | (eq & (a[..., c] < b[..., c]))
        eq = eq & (a[..., c] == b[..., c])
    return lt


def _lex_search(sorted_keys, queries):
    """Index of each query row in ``sorted_keys`` (ascending lex order,
    sentinel-padded), or capacity if absent. Vectorized binary search."""
    m = sorted_keys.shape[0]
    steps = int(np.ceil(np.log2(max(m, 2)))) + 1
    lo = jnp.zeros(queries.shape[0], jnp.int32)
    hi = jnp.full(queries.shape[0], m, jnp.int32)
    for _ in range(steps):
        mid = (lo + hi) // 2
        key_mid = sorted_keys[jnp.clip(mid, 0, m - 1)]
        less = _lex_less(key_mid, queries)
        lo = jnp.where(less, mid + 1, lo)
        hi = jnp.where(less, hi, mid)
    idx = jnp.clip(lo, 0, m - 1)
    found = jnp.all(sorted_keys[idx] == queries, axis=-1)
    return jnp.where(found, lo, m)


def build_lattice(features):
    """Precompute the lattice for one feature set.

    features: (N, d) float32, already scaled so the target Gaussian has
    unit standard deviation per feature dimension.
    Returns a dict of static-shaped arrays consumed by ``apply``.
    """
    features = jnp.asarray(features, jnp.float32)
    n, d = features.shape
    m = n * (d + 1)

    # --- elevate onto H_d (E^T f with the paper's scaling) ---
    i = np.arange(d)
    scale = (np.sqrt(2.0 / 3.0) * (d + 1) /
             np.sqrt((i + 1.0) * (i + 2.0))).astype(np.float32)
    cf = features * scale                                    # (N, d)
    suffix = jnp.cumsum(cf[:, ::-1], axis=1)[:, ::-1]        # S_j = sum_{i>=j}
    sfull = jnp.concatenate([suffix, jnp.zeros((n, 1), jnp.float32)], 1)
    shifted = jnp.concatenate([jnp.zeros((n, 1), jnp.float32), cf], 1)
    elevated = sfull - jnp.arange(d + 1, dtype=jnp.float32) * shifted

    # --- nearest remainder-0 lattice point + simplex rank ---
    rem0 = jnp.round(elevated / (d + 1)) * (d + 1)           # (N, d+1)
    diff = elevated - rem0
    lt = diff[:, :, None] < diff[:, None, :]
    eq = diff[:, :, None] == diff[:, None, :]
    tril = np.tril(np.ones((d + 1, d + 1), bool), k=-1)      # j < i
    rank = (lt.sum(-1) + (eq & tril[None]).sum(-1)).astype(jnp.int32)
    sumv = jnp.round(jnp.sum(rem0, axis=-1) / (d + 1)).astype(jnp.int32)
    rank = rank + sumv[:, None]
    low = rank < 0
    high = rank > d
    rank = rank + (d + 1) * low.astype(jnp.int32) \
        - (d + 1) * high.astype(jnp.int32)
    rem0 = rem0 + (d + 1) * low.astype(jnp.float32) \
        - (d + 1) * high.astype(jnp.float32)

    # --- barycentric coordinates inside the simplex ---
    v = (elevated - rem0) / (d + 1)                          # (N, d+1)
    oh1 = jax.nn.one_hot(d - rank, d + 2, dtype=jnp.float32)
    oh2 = jax.nn.one_hot(d + 1 - rank, d + 2, dtype=jnp.float32)
    b = jnp.einsum('ni,nik->nk', v, oh1 - oh2)               # (N, d+2)
    b = b.at[:, 0].add(1.0 + b[:, d + 1])
    bary = b[:, :d + 1]                                      # (N, d+1)

    # --- integer keys of the d+1 simplex vertices (first d coords) ---
    rem0i = jnp.round(rem0[:, :d]).astype(jnp.int32)         # (N, d)
    keys = []
    for k in range(d + 1):
        # canonical simplex: coordinate i gets +k, or k-(d+1) for the
        # (rank > d-k) coordinates
        add = jnp.where(rank[:, :d] < d + 1 - k, k, k - (d + 1))
        keys.append(rem0i + add.astype(jnp.int32))
    keys = jnp.stack(keys, axis=1).reshape(m, d)             # (M, d)

    # --- dedup via lexsort (capacity M, sentinel padding) ---
    order = jnp.lexsort(tuple(keys[:, c] for c in reversed(range(d))))
    skeys = keys[order]
    new = jnp.concatenate([
        jnp.ones((1,), bool),
        jnp.any(skeys[1:] != skeys[:-1], axis=-1)])
    uid_sorted = (jnp.cumsum(new.astype(jnp.int32)) - 1)
    n_unique = uid_sorted[-1] + 1
    entry_uid = jnp.zeros((m,), jnp.int32).at[order].set(uid_sorted)
    unique_keys = jnp.zeros((m, d), jnp.int32).at[uid_sorted].set(skeys)
    unique_keys = jnp.where(jnp.arange(m)[:, None] < n_unique,
                            unique_keys, _INT_SENTINEL)

    # --- blur-neighbor tables (index m == "absent" -> zero row) ---
    n1_idx, n2_idx = [], []
    for j in range(d + 1):
        off = np.ones((d,), np.int32)
        if j < d:
            off[j] = -d
        off = jnp.asarray(off)
        n1_idx.append(_lex_search(unique_keys, unique_keys + off))
        n2_idx.append(_lex_search(unique_keys, unique_keys - off))
    return {
        'entry_uid': entry_uid,          # (M,)
        'bary': bary,                    # (N, d+1)
        'n1': jnp.stack(n1_idx),         # (d+1, M)
        'n2': jnp.stack(n2_idx),         # (d+1, M)
        'n': n, 'd': d, 'm': m,
    }


def apply(lattice, values):
    """Filter ``values`` (N, V) through a built lattice -> (N, V).

    Approximates out_i = sum_j exp(-|f_i - f_j|^2 / 2) * v_j up to a
    constant factor (use ``gaussian_filter`` for the normalized form —
    normalization also cancels the constant).

    All math runs in ``values.dtype``: pass bf16 values to halve the
    splat/blur/slice HBM traffic (the (M, V) buffers pad V to 128 lanes
    on TPU, so bandwidth — not FLOPs — is the whole cost; bf16 filtering
    carries ~0.3% relative error over the d+1 blur rounds)."""
    n, d, m = lattice['n'], lattice['d'], lattice['m']
    vdim = values.shape[1]
    bary = lattice['bary'].astype(values.dtype)
    w = (values[:, None, :] * bary[:, :, None]).reshape(m, vdim)
    lat = jax.ops.segment_sum(w, lattice['entry_uid'], num_segments=m)
    zero = jnp.zeros((1, vdim), lat.dtype)
    # Two M-row gathers per round, NOT one stacked (2M)-row gather: the
    # stacked form measured 10% faster in an ISOLATED forward microbench
    # (4.25 -> 3.82 ms/blur on v5e, scripts/bench_crf_blur.py) but +6.4
    # ms/step SLOWER inside the full deeplab train program (86.7 -> 93.1
    # measured, stable over 4 runs) — the (2M, V) gather forces a
    # materialized intermediate + strided-half add where XLA fuses the
    # two small gathers straight into the accumulate when scheduling the
    # larger program. Measured negative result, BASELINE.md round 5.
    for j in range(d + 1):
        padded = jnp.concatenate([lat, zero], axis=0)
        lat = lat + 0.5 * (padded[lattice['n1'][j]] +
                           padded[lattice['n2'][j]])
    padded = jnp.concatenate([lat, zero], axis=0)
    vert = padded[lattice['entry_uid']].reshape(n, d + 1, vdim)
    alpha = 1.0 / (1.0 + 2.0 ** (-float(d)))
    return jnp.sum(bary[:, :, None] * vert, axis=1) * alpha


def gaussian_filter(values, features, lattice=None):
    """Symmetric-normalized Gaussian filter (the DenseCRF convention):
    out = D^{-1/2} K D^{-1/2} v with D = diag(K 1), K the Gaussian
    affinity over ``features``. Pass a prebuilt ``lattice`` to amortize
    construction over repeated calls (mean-field iterations)."""
    if lattice is None:
        lattice = build_lattice(features)
    ones = apply(lattice, jnp.ones((lattice['n'], 1), jnp.float32))
    norm = jax.lax.rsqrt(jnp.maximum(ones, 1e-20))
    return norm * apply(lattice, values * norm), lattice
