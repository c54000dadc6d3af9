"""Multi-host (DCN x ICI) initialization and mesh construction.

The reference is single-node only (SURVEY.md §2k): process-per-GPU spawn +
NCCL file rendezvous (`train.py:33-113`).  The TPU-native equivalent for
scaling past one host is `jax.distributed.initialize` (one process per
host, all local chips visible to it) plus a mesh whose outer axis spans
hosts over DCN and whose inner axis spans the chips of one host over ICI.

For the pure data-parallel training step in `parallel/trainer.py` a single
flat `data` axis is sufficient — psum/pmean over it lowers to a
hierarchical reduce (ICI within a slice, DCN across) automatically when the
device order groups each host's chips contiguously, which
`mesh_utils.create_device_mesh` guarantees.  `make_hybrid_mesh` exposes the
explicit 2D (dcn, ici) form for shardings that must distinguish the two
fabrics (e.g. replicate params per host, shard batch over everything).

Usage (one command per host):

    python train.py ... --num-nodes 4 --node-rank $RANK \
        --coordinator host0:8476

which reaches `initialize_multihost` before any jax array is created.
"""

from __future__ import annotations

import numpy as np
import jax
from jax.sharding import Mesh


def initialize_multihost(coordinator_address=None, num_processes=None,
                         process_id=None):
    """Bring up the JAX distributed runtime (no-op for single process).

    Args mirror `jax.distributed.initialize`; on TPU pods with standard
    env (TPU_WORKER_ID etc.) all three may be None and are auto-detected.
    MUST run before any computation touches a device.
    """
    if num_processes is not None and int(num_processes) <= 1:
        return False
    jax.distributed.initialize(coordinator_address=coordinator_address,
                               num_processes=num_processes,
                               process_id=process_id)
    return True


def make_data_mesh(axis="data"):
    """Flat data-parallel mesh over every chip of every host.

    Device order groups local chips contiguously so the psum over `axis`
    reduces over ICI first and crosses DCN once per host pair."""
    devs = sorted(jax.devices(), key=lambda d: (d.process_index, d.id))
    return Mesh(np.asarray(devs), (axis,))


def make_hybrid_mesh(dcn_axis="hosts", ici_axis="data"):
    """2D (hosts x local-chips) mesh: outer axis crosses DCN, inner ICI.

    Use for shardings that must keep traffic on ICI (e.g. model/tensor
    axes) while batch data parallelism spans hosts."""
    n_proc = jax.process_count()
    devs = sorted(jax.devices(), key=lambda d: (d.process_index, d.id))
    local = len(devs) // n_proc
    grid = np.asarray(devs).reshape(n_proc, local)
    return Mesh(grid, (dcn_axis, ici_axis))


def shard_host_batch(mesh, tree, axis="data"):
    """Assemble a global batch from per-host local shards.

    Each host passes ONLY its local slice (see `local_batch_slice`);
    returns jax.Arrays sharded over `axis` of `mesh` whose global shape is
    local_shape * process_count on the leading dim.  Single-process: a
    plain device_put with the sharding (so the loop code is uniform)."""
    import jax.numpy as jnp
    from jax.sharding import NamedSharding, PartitionSpec as P

    sharding = NamedSharding(mesh, P(axis))

    def one(x):
        x = np.asarray(x)
        if jax.process_count() == 1:
            return jax.device_put(jnp.asarray(x), sharding)
        return jax.make_array_from_process_local_data(sharding, x)

    return jax.tree_util.tree_map(one, tree)


def local_batch_slice(global_batch_size):
    """[start, stop) of this host's shard of the global batch (data loaders
    are per-host; each feeds only its slice, ref InfiniteSampler's
    rank-sharding analog, `misc.py:113-144`)."""
    n = jax.process_count()
    assert global_batch_size % n == 0, (global_batch_size, n)
    per = global_batch_size // n
    i = jax.process_index()
    return i * per, (i + 1) * per
