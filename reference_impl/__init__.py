"""reference_impl — minimal PyTorch-CPU oracle for acceptance parity.

The reference mount for LorenzoFramba/Continual-Learning was EMPTY at survey
time (SURVEY.md §0), so per the survey's operational consequence this package
realizes the BASELINE.json capability surface in plain PyTorch and serves as
the parity + speed baseline: the JAX/TPU framework is held to mIoU within
0.5 pts and ≥3× images/sec/chip against THIS implementation (BASELINE.md).

It is deliberately boring and obviously correct:
  * same data layer as cl_tpu (cl_tpu.data.{synthetic,tasks,pipeline}) —
    identical images, labels, shuffle order, flip decisions;
  * same augmentation arithmetic (cl_tpu.augment.augment_reference_np);
  * UNet mirroring cl_tpu.models.unet layer-for-layer (NCHW/torch idioms);
  * EWC / LwF / replay with the same formulas and hyperparameters;
  * same eval arithmetic (confusion matrix → IoU in float64).
"""
