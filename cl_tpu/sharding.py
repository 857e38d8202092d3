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


# ---------------------------------------------------------------------------
# N-D readiness (SURVEY.md §2.3 TP row): nothing in the acceptance ladder
# needs tensor parallelism (the UNet fits one chip), but the mesh and the
# param-sharding rules below let a 2-D ('data','model') layout shard conv
# output channels over ICI without restructuring the framework.
# ---------------------------------------------------------------------------

MODEL_AXIS = "model"


def make_mesh_2d(model: int, devices=None) -> Mesh:
    """('data', 'model') mesh: model-axis size ``model``, data gets the
    rest. Conv channel sharding rides the model axis."""
    devices = list(devices if devices is not None else jax.devices())
    if len(devices) % model:
        raise ValueError(f"{len(devices)} devices not divisible by "
                         f"model={model}")
    arr = np.asarray(devices).reshape(len(devices) // model, model)
    return Mesh(arr, (DATA_AXIS, MODEL_AXIS))


def param_specs(params, mesh: Mesh, *, min_channels: int = 64):
    """NamedSharding pytree: conv kernels whose output-channel dim is
    divisible by the model-axis size and >= ``min_channels`` shard that dim
    on 'model'; everything else is replicated. With a 1-D mesh this
    returns all-replicated (DP semantics unchanged)."""
    if MODEL_AXIS not in mesh.axis_names:
        rep = replicated(mesh)
        return jax.tree.map(lambda _: rep, params)
    m = mesh.shape[MODEL_AXIS]

    def spec(leaf):
        if (leaf.ndim == 4 and leaf.shape[-1] >= min_channels
                and leaf.shape[-1] % m == 0):
            return NamedSharding(
                mesh, P(*(None,) * (leaf.ndim - 1), MODEL_AXIS))
        return NamedSharding(mesh, P())

    return jax.tree.map(spec, params)
