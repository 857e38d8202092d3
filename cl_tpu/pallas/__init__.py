"""Pallas TPU kernels — the native-equivalent layer (SURVEY.md §2.2).

The reference has no native code (SURVEY.md §2.2: pure-Python PyTorch repo);
BASELINE.json:5 assigns the rebuild fused kernels for:
  * augment.py        — uint8 resize→flip→normalize, one HBM round-trip
  * ewc_fused.py      — flattened-vector EWC penalty + Fisher accumulate
  * kd_loss.py        — fused softmax-T KL distillation loss
  * replay_gather.py  — on-device gather from an HBM-resident replay buffer

Every kernel has a pure-jnp oracle (in cl_tpu/{augment,losses}.py) used for
interpret-mode equivalence tests and as the ``use_pallas=False`` fallback.
"""
