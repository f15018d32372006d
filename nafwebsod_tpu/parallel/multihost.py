"""Multi-host (multi-process) data-parallel support.

The reference is strictly single-host: its data parallelism is per-GPU graph
replication + NCCLAllreduce inside one process
(``detectron/modeling/optimizer_wsl.py:18-72``). On TPU pods the natural
scale-out unit is one *process per host*, each owning its local chips, with
``jit`` running one SPMD program over the global ``Mesh`` (SURVEY.md §5.8:
"host-side input pipeline sharded per host feeding device-resident
buffers"). This module contains the host-side glue:

  * ``shard_roidb`` — each host keeps a strided slice of the roidb and runs
    its own loader threads over it (the per-host analogue of the reference's
    per-GPU BlobsQueue feeding, ``loader_wsl.py:215-258``);
  * ``global_canvas`` — hosts agree on a per-iteration image canvas
    (max over the per-host padded sizes) so every process traces and feeds
    the same static shapes;
  * ``form_global_batch`` — wraps each host-local batch leaf into a global
    ``jax.Array`` over the mesh via
    ``jax.make_array_from_process_local_data`` (every leaf is sharded on
    the batch axis; replicated step inputs like lr stay plain numpy at the
    call sites, which jit accepts directly).

Single-process (``jax.process_count() == 1``) short-circuits everywhere to
the exact prior behavior, so this path adds nothing on the dev rig; the
multi-process branches follow the documented jax multi-controller contract
and are exercised shape-level by ``tests/test_multihost.py`` on the virtual
mesh (a true multi-process run needs pod hardware this environment does not
have — see ROADMAP.md).
"""

import jax
import numpy as np
from jax.sharding import NamedSharding, PartitionSpec as P


def process_index():
    return jax.process_index()


def is_multihost():
    return jax.process_count() > 1


def local_device_count(num_devices_global):
    """Images this host contributes per step: its share of the global
    per-step batch (one image per device, reference 1 im/GPU)."""
    n_proc = jax.process_count()
    assert num_devices_global % n_proc == 0, (
        'global device count {} must divide evenly over {} processes'.format(
            num_devices_global, n_proc))
    return num_devices_global // n_proc


def shard_roidb(roidb, rank=None, world=None):
    """Strided per-host roidb slice (deterministic, no coordination needed).

    The flip-augmented roidb interleaves (orig, flipped) pairs
    (``data/roidb.py``); a stride-``world`` slice keeps each host's class
    balance close to global. Hosts shuffle independently, which matches the
    reference's per-loader-thread randomization."""
    rank = jax.process_index() if rank is None else rank
    world = jax.process_count() if world is None else world
    if world <= 1:
        return roidb
    return roidb[rank::world]


def global_canvas(h, w):
    """Agree on the (H, W) canvas for this iteration across hosts: the max
    of the per-host padded sizes. One tiny device all-gather per iteration;
    identity in single-process runs."""
    if not is_multihost():
        return h, w
    from jax.experimental import multihost_utils
    sizes = multihost_utils.process_allgather(
        np.asarray([h, w], np.int32))  # (n_proc, 2)
    sizes = np.asarray(sizes).reshape(-1, 2)
    return int(sizes[:, 0].max()), int(sizes[:, 1].max())


def pad_batch_images(batch, H, W):
    """Zero-pad the stacked image leaf (n, 1, h, w, 3) up to (H, W) — the
    cross-host completion of ``stack_minibatches``'s local padding (zero
    padding is numerically transparent there for the same reasons)."""
    im = batch['image']
    if im.shape[2] == H and im.shape[3] == W:
        return batch
    out = np.zeros(im.shape[:2] + (H, W) + im.shape[4:], im.dtype)
    out[:, :, :im.shape[2], :im.shape[3]] = im
    batch = dict(batch)
    batch['image'] = out
    return batch


def form_global_batch(mesh, local_batch, batch_axis=0):
    """Lift a host-local batch dict into global ``jax.Array`` leaves.

    EVERY leaf must carry this host's ``local_devices`` images on
    ``batch_axis`` (0, or 1 with a leading window axis for the
    STEPS_PER_CALL driver) — that is the contract ``stack_minibatches``
    establishes, including the injected ``cur_iter``. Returns the dict of
    global arrays sharded ``P('data')`` (or ``P(None, 'data')``) over
    ``mesh``. Single-process returns the input unchanged — jit's
    in_shardings handle the transfer exactly as before."""
    if not is_multihost():
        return local_batch
    spec = (P(None, 'data') if batch_axis == 1 else P('data'))
    sharding = NamedSharding(mesh, spec)
    return {
        k: jax.make_array_from_process_local_data(sharding, np.asarray(v))
        for k, v in local_batch.items()
    }


def lift_full_batch(shardings, batch):
    """Lift a FULL (globally identical) host batch into global arrays.

    The exotic sharded layouts (RoI-shard / tensor-parallel) run
    multi-process in full-batch mode: every controller builds the whole
    global batch from the host-identical rng stream, and each leaf is
    placed by ``jax.make_array_from_callback`` under its step's input
    sharding (each process fills only its addressable shards — no
    cross-host data movement). ``shardings`` maps leaf name ->
    ``NamedSharding``; leaves without an entry raise (the step would
    silently mis-shard them). Identity when single-process."""
    if not is_multihost():
        return batch
    out = {}
    for k, v in batch.items():
        v = np.asarray(v)
        out[k] = jax.make_array_from_callback(
            v.shape, shardings[k], lambda idx, v=v: v[idx])
    return out


def lift_tree_global(shardings, tree):
    """Lift a pytree of HOST-IDENTICAL leaves (params / opt state built
    from the same seed or checkpoint on every controller) into global
    ``jax.Array``s under a matching pytree of ``NamedSharding``s — the
    resident-layout analogue of ``lift_full_batch`` (jit rejects numpy
    inputs under non-trivial shardings in multi-process runs). Each
    process fills only its addressable shards. Identity when
    single-process."""
    if not is_multihost():
        return tree

    def one(s, v):
        v = np.asarray(v)
        return jax.make_array_from_callback(v.shape, s,
                                            lambda idx, v=v: v[idx])

    return jax.tree.map(one, shardings, tree)


def replicate_global(mesh, value):
    """Replicated global array from a host-identical value (keys included).
    Identity when single-process."""
    if not is_multihost():
        return value
    from jax import random as jr
    from jax.sharding import NamedSharding as NS
    sharding = NS(mesh, P())
    if hasattr(value, 'dtype') and jax.numpy.issubdtype(
            value.dtype, jax.dtypes.prng_key):
        impl = jr.key_impl(value)
        data = np.asarray(jr.key_data(value))
        g = jax.make_array_from_callback(data.shape, sharding,
                                         lambda idx: data[idx])
        return jr.wrap_key_data(g, impl=impl)
    v = np.asarray(value)
    return jax.make_array_from_callback(v.shape, sharding,
                                        lambda idx: v[idx])


def local_device_rngs(rngs_global, window, num_devices_global):
    """This host's per-device rng rows out of the host-identically computed
    global stream: the stream is laid out (window * num_devices,) with the
    device axis fastest, so host ``r`` owns columns
    [r * local, (r + 1) * local) of every window row. Identity when
    single-process. Works for typed key arrays and raw (n, 2) PRNGKeys."""
    if not is_multihost():
        return rngs_global
    local = local_device_count(num_devices_global)
    tail = rngs_global.shape[1:]
    r = rngs_global.reshape((window, num_devices_global) + tail)
    start = jax.process_index() * local
    r = r[:, start:start + local]
    return r.reshape((window * local,) + tail)


def form_global_rngs(mesh, rngs_local, batch_axis=0):
    """Global sharded rng-key array from this host's local rows (the rng
    analogue of ``form_global_batch``). Typed key arrays round-trip through
    ``key_data``/``wrap_key_data`` since the process-local assembly API
    takes raw numpy."""
    if not is_multihost():
        return rngs_local
    import jax.numpy as jnp
    from jax import random as jr
    spec = (P(None, 'data') if batch_axis == 1 else P('data'))
    sharding = NamedSharding(mesh, spec)
    if jnp.issubdtype(rngs_local.dtype, jax.dtypes.prng_key):
        impl = jr.key_impl(rngs_local)
        data = np.asarray(jr.key_data(rngs_local))
        g = jax.make_array_from_process_local_data(sharding, data)
        return jr.wrap_key_data(g, impl=impl)
    return jax.make_array_from_process_local_data(
        sharding, np.asarray(rngs_local))
