"""Analytic model FLOPs and MFU for the ladder/bench artifacts.

"Model FLOPs" is the standard accounting: the algorithmic work of the
model itself (2 FLOPs per MAC), with the train step counted as 3x the
forward (dx + dW each cost ~one forward's MACs).  Rematerialization
(train.remat) and padded-head waste are intentionally NOT counted —
MFU answers "how much of the chip does the MODEL's math use", so
recompute overhead shows up as lower MFU, as it should.

Peak is the v5e bf16 MXU rate (197 TFLOP/s/chip).  f32 configs are
reported against the same bf16 peak (the conventional choice; the
artifact row carries the dtype so readers can discount).  VERDICT r4
next #7.
"""

from __future__ import annotations

PEAK_BF16_FLOPS = 197e12  # TPU v5e (lite) per-chip bf16 peak


def unet_fwd_flops_per_image(base_channels: int, image_size: int,
                             num_classes: int, in_ch: int = 3,
                             depth: int = 4) -> float:
    """Forward FLOPs of one image through cl_tpu's UNet
    (models/unet.py: `depth` DoubleConv encoder levels + bottleneck +
    mirrored 2x2-upconv decoder + 1x1 head; channels double per level).

    BN/ReLU/pool elementwise work is O(activations) and <1% of the conv
    MACs at every ladder shape — excluded (model-FLOPs convention).
    """

    def conv3x3(s: int, cin: int, cout: int) -> float:
        return 2.0 * 9.0 * s * s * cin * cout

    def upconv2x2(s_out: int, cin: int, cout: int) -> float:
        # stride-2 ConvTranspose 2x2: each OUTPUT pixel sees exactly one
        # 2x2 tap -> cin*cout MACs per output pixel.
        return 2.0 * s_out * s_out * cin * cout

    c = base_channels
    total = 0.0
    # encoder: level i at resolution H/2^i, channels c*2^i
    for i in range(depth):
        s = image_size >> i
        ci = c << i
        prev = in_ch if i == 0 else (ci >> 1)
        total += conv3x3(s, prev, ci) + conv3x3(s, ci, ci)
    # bottleneck at H/2^depth, channels c*2^depth
    s = image_size >> depth
    cb = c << depth
    total += conv3x3(s, cb >> 1, cb) + conv3x3(s, cb, cb)
    # decoder: level i (deep->shallow) at resolution H/2^i, channels c*2^i;
    # upconv from 2*ci -> ci, then DoubleConv on the skip-concat (2*ci -> ci)
    for i in reversed(range(depth)):
        s = image_size >> i
        ci = c << i
        total += upconv2x2(s, 2 * ci, ci)
        total += conv3x3(s, 2 * ci, ci) + conv3x3(s, ci, ci)
    # 1x1 head
    total += 2.0 * image_size * image_size * c * num_classes
    return total


def unet_train_flops_per_image(base_channels: int, image_size: int,
                               num_classes: int, in_ch: int = 3,
                               depth: int = 4) -> float:
    """Train-step FLOPs per image: fwd + bwd ~= 3x fwd."""
    return 3.0 * unet_fwd_flops_per_image(
        base_channels, image_size, num_classes, in_ch, depth)


def mfu(images_per_sec_per_chip: float, flops_per_image: float,
        peak: float = PEAK_BF16_FLOPS) -> float:
    """Model FLOPs utilization in [0, 1]."""
    if not images_per_sec_per_chip:
        return 0.0
    return images_per_sec_per_chip * flops_per_image / peak
