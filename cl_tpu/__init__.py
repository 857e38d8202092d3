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
