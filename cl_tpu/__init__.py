"""cl_tpu — TPU-native continual-learning semantic-segmentation framework.

A ground-up JAX / XLA / Pallas / sharded-jit design with the capability
surface of the PyTorch research repo ``LorenzoFramba/Continual-Learning``
(UNet encoder-decoder, task-/class-incremental training, EWC / LwF / replay,
per-task checkpointing, per-task mIoU + forgetting reporting).

The reference mount supplied for the survey was empty (SURVEY.md §0), so the
capability contract is BASELINE.json and SURVEY.md §1-§5; acceptance parity is
measured against the in-repo torch-CPU implementation in ``reference_impl/``.

Layer map (SURVEY.md §1):
  L0 config.py          — frozen dataclass configs + CLI + presets
  L1 data/              — synthetic/task datasets, host pipeline, prefetch
  L2 models/unet.py     — Flax linen UNet, NHWC, bf16-capable
  L3 methods/           — EWC / LwF / replay as pure pytree functions
  L4 train.py           — task loop in Python, whole train step jit-compiled
  L5 metrics/checkpoint — on-device confusion-matrix mIoU, orbax per task
Pallas kernels (SURVEY.md §2.2) live in pallas/ with jnp fallbacks.
"""

__version__ = "0.1.0"

__all__ = ["Config", "get_preset", "parse_overrides", "__version__"]


def __getattr__(name):
    """Lazy config surface (keeps `import cl_tpu` light): cl_tpu.Config,
    cl_tpu.get_preset(name), cl_tpu.parse_overrides(argv). The train/eval
    entry points live in cl_tpu.train (`from cl_tpu.train import train,
    evaluate`) — NOT re-exported here, because the `train` submodule would
    shadow a same-named function attribute after any import of it."""
    if name in ("Config", "get_preset", "parse_overrides"):
        import importlib

        return getattr(importlib.import_module("cl_tpu.config"), name)
    raise AttributeError(f"module 'cl_tpu' has no attribute {name!r}")
