"""Device mesh for data-parallel training.

The reference's entire distributed story is single-host synchronous data
parallelism: per-GPU graph replication + NCCLAllreduce on gradients
(``detectron/modeling/optimizer_wsl.py:42-72``). The TPU-native equivalent is
a 1-D ``jax.sharding.Mesh`` over the ``data`` axis: params replicated, the
per-iteration image batch sharded one image per chip (TRAIN.IMS_PER_BATCH is
per-device, matching the reference's 1 im/GPU), and XLA inserting the gradient
all-reduce over ICI when the jitted step consumes sharded inputs and produces
replicated params.
"""

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(num_devices=None, devices=None):
    """1-D data-parallel mesh over the first ``num_devices`` devices."""
    if devices is None:
        devices = jax.devices()
        if num_devices is not None:
            assert len(devices) >= num_devices, (
                'requested {} devices, have {}'.format(
                    num_devices, len(devices)))
            devices = devices[:num_devices]
    return Mesh(np.asarray(devices), ('data',))


def data_sharding(mesh):
    """Leading-axis sharding for per-device batches."""
    return NamedSharding(mesh, P('data'))


def replicated(mesh):
    return NamedSharding(mesh, P())


def shard_map_compat(f, **kw):
    """jax.shard_map across jax versions: new jax spells it jax.shard_map
    (check_vma), older jax.experimental.shard_map (check_rep). The ONE
    shim every sharded step builder uses."""
    try:
        from jax import shard_map as _sm
        return _sm(f, check_vma=False, **kw)
    except ImportError:
        from jax.experimental.shard_map import shard_map as _sme
        return _sme(f, check_rep=False, **kw)
