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


def check_divisible(global_batch: int, mesh: Mesh) -> None:
    n = mesh.devices.size
    if global_batch % n:
        raise ValueError(
            f"global batch {global_batch} not divisible by {n} devices")


# ---------------------------------------------------------------------------
# Multi-controller readiness (SURVEY.md §2.4 "multi-controller-ready driver
# structure", §5.8). A v5e-8 slice is single-host (ICI only, no DCN), so
# nothing in the acceptance ladder needs this; on a multi-host slice the
# driver runs one process per host and the two helpers below are the only
# points where process topology matters: startup, and host→HBM puts.
# ---------------------------------------------------------------------------


def initialize_multihost() -> None:
    """Idempotent ``jax.distributed.initialize()`` (TPU pods autodetect the
    coordinator from the runtime env). Must run before the first device
    query. The caller explicitly requested multi-host (train.multihost), so
    a failed init RAISES — silently degrading to independent
    single-controller processes would train N wrong replicas."""
    import jax.distributed as jdist

    state = getattr(jdist, "global_state", None)
    if state is not None and getattr(state, "client", None) is not None:
        return  # already initialized
    try:
        jdist.initialize()
    except (ValueError, RuntimeError) as e:
        raise RuntimeError(
            "train.multihost=true but jax.distributed.initialize() failed "
            "(no coordinator env?). Run one process per host under a TPU "
            "pod runtime, or drop the flag for single-host training."
        ) from e


def process_local_rows(n_global: int) -> slice:
    """Row range of the global batch this process feeds. Processes hold
    equal contiguous row blocks in process-index order (the layout
    ``jax.make_array_from_process_local_data`` expects for a batch sharded
    on the leading axis)."""
    n_proc = jax.process_count()
    if n_global % n_proc:
        raise ValueError(
            f"global batch {n_global} not divisible by {n_proc} processes")
    per = n_global // n_proc
    i = jax.process_index()
    return slice(i * per, (i + 1) * per)


def put_global_batch(batch, sharding, *, force_local_api: bool = False):
    """Host→HBM put of a (numpy) batch pytree under ``sharding``.

    Single-controller: one ``jax.device_put`` (the fast path; XLA splits the
    host buffer across the local shards). Multi-controller: every process
    computes the same seeded global batch (host work is duplicated — cheap
    at this scale and keeps the data layer deterministic, SURVEY.md §6) and
    contributes only its local rows via
    ``jax.make_array_from_process_local_data``.
    """
    if sharding is None:
        return jax.device_put(batch)
    if jax.process_count() == 1 and not force_local_api:
        return jax.device_put(batch, sharding)
    rows = process_local_rows(jax.tree.leaves(batch)[0].shape[0])
    return jax.tree.map(
        lambda x: jax.make_array_from_process_local_data(
            sharding, np.asarray(x)[rows]),
        batch)


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
