"""Device mesh + sharding layout for data parallelism over ICI.

SURVEY.md §2.3/§2.4: the only parallelism the acceptance ladder exercises is
DP over a v5e-8 slice — a 1-D ``Mesh(('data',))`` with the batch sharded on
``data`` and parameters replicated. Gradient all-reduce and eval-metric psum
are emitted by the SPMD partitioner as ICI collectives; no hand-written
communication. The mesh helper is N-D-ready so channel sharding (TP) could be
added later without restructuring (SURVEY.md §2.3 TP row).
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"


def make_mesh(devices=None) -> Mesh:
    devices = list(devices if devices is not None else jax.devices())
    return Mesh(np.asarray(devices), (DATA_AXIS,))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Leading (batch) dim sharded over data axis; rest replicated."""
    return NamedSharding(mesh, P(DATA_AXIS))

def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch_pytree(batch, mesh: Mesh):
    """NamedSharding for every leaf of a HostBatch-like pytree (all leaves
    have a leading batch dim)."""
    s = batch_sharding(mesh)
    return jax.tree.map(lambda _: s, batch)


def check_divisible(global_batch: int, mesh: Mesh) -> None:
    n = mesh.devices.size
    if global_batch % n:
        raise ValueError(
            f"global batch {global_batch} not divisible by {n} devices")
