"""Torch UNet mirroring cl_tpu/models/unet.py layer-for-layer.

Module names match the flax param tree (enc0..enc{d-1}, bottleneck,
up{level}, dec{level}, head) so the torch→pytree weight importer
(tests/parity/weight_io.py) is a pure name/layout mapping.
"""

from __future__ import annotations

import torch
import torch.nn as nn


class DoubleConv(nn.Module):
    def __init__(self, cin: int, cout: int):
        super().__init__()
        self.conv0 = nn.Conv2d(cin, cout, 3, padding=1, bias=False)
        self.bn0 = nn.BatchNorm2d(cout, eps=1e-5, momentum=0.1)
        self.conv1 = nn.Conv2d(cout, cout, 3, padding=1, bias=False)
        self.bn1 = nn.BatchNorm2d(cout, eps=1e-5, momentum=0.1)

    def forward(self, x):
        x = torch.relu(self.bn0(self.conv0(x)))
        return torch.relu(self.bn1(self.conv1(x)))


class UNet(nn.Module):
    """UNet(x: [B, 3, H, W]) -> logits [B, C, H, W]."""

    def __init__(self, num_classes: int, base_channels: int = 32,
                 depth: int = 4):
        super().__init__()
        self.depth = depth
        c = base_channels
        cin = 3
        for level in range(depth):
            setattr(self, f"enc{level}", DoubleConv(cin, c * 2 ** level))
            cin = c * 2 ** level
        self.bottleneck = DoubleConv(cin, c * 2 ** depth)
        for level in reversed(range(depth)):
            feats = c * 2 ** level
            setattr(self, f"up{level}",
                    nn.ConvTranspose2d(feats * 2, feats, 2, stride=2))
            # input = concat(skip feats, upsampled feats)
            setattr(self, f"dec{level}", DoubleConv(feats * 2, feats))
        self.head = nn.Conv2d(c, num_classes, 1)
        self.pool = nn.MaxPool2d(2)

    def forward(self, x):
        skips = []
        for level in range(self.depth):
            x = getattr(self, f"enc{level}")(x)
            skips.append(x)
            x = self.pool(x)
        x = self.bottleneck(x)
        for level in reversed(range(self.depth)):
            x = getattr(self, f"up{level}")(x)
            x = torch.cat([skips[level], x], dim=1)
            x = getattr(self, f"dec{level}")(x)
        return self.head(x)

    def expand_head(self, new_width: int) -> None:
        """Grow the 1×1 head, copying old-class weights exactly (the
        reference's per-task head rebuild, SURVEY.md §3.1; mirrors
        cl_tpu.models.unet.expand_head_params)."""
        old = self.head
        if new_width <= old.out_channels:
            return
        new = nn.Conv2d(old.in_channels, new_width, 1)
        with torch.no_grad():
            new.weight[:old.out_channels] = old.weight
            new.bias[:old.out_channels] = old.bias
            new.bias[old.out_channels:] = 0.0
        self.head = new
