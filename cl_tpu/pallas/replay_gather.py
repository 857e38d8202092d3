"""On-device replay-buffer gather from an HBM-resident buffer.

SURVEY.md §2.2 "replay_gather": the device-resident replay variant
(``replay_device_resident``, ≤256² — SURVEY.md §7 buffer-residency hard
part) keeps the (image, mask) buffer in HBM and gathers the sampled rows
into the step's batch without a host round trip. The kernel DMAs
buffer[idx[i]] → out[i] directly HBM→HBM per sampled row, with the index
vector scalar-prefetched so the DMA source address is known before the
body runs (PrefetchScalarGridSpec).

Fallback (interpret/CPU or ``use_pallas=False``): ``jnp.take`` — identical
result, XLA gather path.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from cl_tpu.pallas import common


def _gather_kernel(idx_ref, buf_ref, out_ref, sem):
    i = pl.program_id(0)
    dma = pltpu.make_async_copy(
        buf_ref.at[idx_ref[i]],
        out_ref.at[i],
        sem,
    )
    dma.start()
    dma.wait()


def gather(buffer: jax.Array, indices: jax.Array) -> jax.Array:
    """buffer [N, ...] (any dtype), indices [k] int32 → [k, ...].

    Equivalent to ``buffer[indices]``; rows are moved HBM→HBM by DMA, one
    grid step per sampled row, no VMEM staging of the full row needed.
    """
    if common.interpret_mode():
        return jnp.take(buffer, indices, axis=0)
    k = indices.shape[0]
    row_shape = buffer.shape[1:]
    # Flatten rows to 2-D and view the bytes as f32 for the DMA: this
    # box's TPU compile helper only accepts f32 DMA kernels (uint8/int32
    # variants crash it), and a DMA moves bytes regardless — the bitcast
    # is a free layout-preserving view, inverted after the gather.
    n = buffer.shape[0]
    flat = buffer.reshape(n, -1)
    src_dtype = buffer.dtype
    if src_dtype == jnp.uint8:
        assert flat.shape[1] % 4 == 0, "row bytes must be 4-aligned"
        flat = jax.lax.bitcast_convert_type(
            flat.reshape(n, flat.shape[1] // 4, 4), jnp.float32)
    elif src_dtype == jnp.int32:
        flat = jax.lax.bitcast_convert_type(flat, jnp.float32)
    elif src_dtype != jnp.float32:
        return jnp.take(buffer, indices, axis=0)
    # The DMA path wants lane-shaped rows: [n, sublanes, 128]. Rows whose
    # f32 element count isn't 128-divisible (only tiny smoke shapes) use
    # the XLA gather fallback.
    if flat.shape[1] % 128:
        return jnp.take(buffer, indices, axis=0)
    flat = flat.reshape(n, flat.shape[1] // 128, 128)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(k,),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
        # ANY-space refs must be whole-array; the kernel addresses row i
        # itself via out_ref.at[i].
        out_specs=pl.BlockSpec(memory_space=pl.ANY),
        scratch_shapes=[pltpu.SemaphoreType.DMA],
    )
    out = pl.pallas_call(
        _gather_kernel,
        out_shape=jax.ShapeDtypeStruct((k,) + flat.shape[1:], jnp.float32),
        grid_spec=grid_spec,
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
    )(indices.astype(jnp.int32), flat)
    out = out.reshape(k, -1)
    if src_dtype == jnp.uint8:
        out = jax.lax.bitcast_convert_type(out, jnp.uint8)
    elif src_dtype == jnp.int32:
        out = jax.lax.bitcast_convert_type(out, jnp.int32)
    return out.reshape((k,) + row_shape)


class DeviceReplayBuffer:
    """HBM-resident fixed-capacity replay store (images + masks uint8).

    Mirrors the host ``ReplayBuffer`` sampling semantics (same seeded
    RandomState stream for indices) but keeps storage and gather on device.
    Slots are written via ``jax.Array.at[...].set`` (XLA dynamic-update).
    """

    def __init__(self, capacity: int, source_size: int, *, seed: int):
        import numpy as np

        self.capacity = int(capacity)
        self.images = jnp.zeros((capacity, source_size, source_size, 3),
                                jnp.uint8)
        self.masks = jnp.full((capacity, source_size, source_size), 255,
                              jnp.uint8)
        self.count = 0
        self._seen = 0
        self.rng = np.random.RandomState(seed)

    def __len__(self) -> int:
        return self.count

    def add_examples(self, dataset, n: int, *, task_id: int) -> None:
        """Reservoir sampling with the same RandomState call pattern as the
        host ``ReplayBuffer.add_examples`` (one randint per overflow item)."""
        import numpy as np

        take = self.rng.permutation(len(dataset))[:n]
        imgs, msks, slots = [], [], []
        for i in take:
            if self.count < self.capacity:
                slot = self.count
                self.count += 1
            else:
                j = self.rng.randint(0, self._seen + 1)
                slot = j if j < self.capacity else None
            self._seen += 1
            if slot is None:
                continue
            img, mask = dataset[int(i)]
            imgs.append(img)
            msks.append(mask.astype(np.uint8))
            slots.append(slot)
        if not slots:
            return
        slots_a = jnp.asarray(np.asarray(slots, np.int32))
        self.images = self.images.at[slots_a].set(
            jnp.asarray(np.stack(imgs)))
        self.masks = self.masks.at[slots_a].set(jnp.asarray(np.stack(msks)))

    def sample_indices(self, k: int):
        import numpy as np

        if self.count == 0:
            return None
        return jnp.asarray(
            self.rng.randint(0, self.count, size=k).astype(np.int32))

    def gather(self, indices) -> tuple[jax.Array, jax.Array]:
        return gather(self.images, indices), gather(self.masks, indices)

    def sample_flips(self, k: int, flip_prob: float):
        import numpy as np

        return jnp.asarray(self.rng.rand(k) < flip_prob)

    # ------------------------------------------------------------------
    # Checkpoint interface — same shape as the host ReplayBuffer's.
    def state_dict(self) -> dict:
        import numpy as np

        return {
            "capacity": self.capacity,
            "images": np.asarray(jax.device_get(self.images)),
            "masks": np.asarray(jax.device_get(self.masks)),
            "count": self.count,
            "seen": self._seen,
            "rng_state": self.rng.get_state(),
        }

    def load_state_dict(self, sd: dict) -> None:
        """Accepts either buffer's checkpoint format: the host
        ``ReplayBuffer`` writes n stacked rows and no ``count``; pad those
        to capacity (both buffers share the same RandomState stream, so a
        cross-topology resume — e.g. a DP run's checkpoint restored on a
        single device — stays deterministic)."""
        import numpy as np

        self.capacity = int(sd["capacity"])
        imgs, masks = np.asarray(sd["images"]), np.asarray(sd["masks"])
        if "count" in sd:
            self.count = int(sd["count"])
        else:  # host-format: n stored rows, capacity-pad
            self.count = imgs.shape[0] if imgs.ndim > 1 else 0
            S = self.images.shape[1]
            pad_i = np.zeros((self.capacity, S, S, 3), np.uint8)
            pad_m = np.full((self.capacity, S, S), 255, np.uint8)
            if self.count:
                pad_i[:self.count] = imgs
                pad_m[:self.count] = masks
            imgs, masks = pad_i, pad_m
        self.images = jnp.asarray(imgs)
        self.masks = jnp.asarray(masks)
        self._seen = int(sd["seen"])
        self.rng.set_state(sd["rng_state"])
