"""Torch EWC / LwF — same math as cl_tpu/methods (SURVEY.md §2.1).

Replay is framework-independent: the oracle reuses
``cl_tpu.methods.replay.ReplayBuffer`` directly (numpy, seeded).
"""

from __future__ import annotations

import copy

import torch
import torch.nn.functional as F

NEG_INF = -1e9


def mask_logits(logits: torch.Tensor, valid: torch.Tensor) -> torch.Tensor:
    """logits [B, C, H, W]; valid bool [C]."""
    return torch.where(valid[None, :, None, None], logits,
                       torch.tensor(NEG_INF, dtype=logits.dtype))


def cross_entropy(logits, labels, valid, ignore_index=255):
    return F.cross_entropy(mask_logits(logits, valid), labels.long(),
                           ignore_index=ignore_index)


class EWC:
    """Online (consolidated) or separate per-task diagonal-Fisher EWC.

    Python-side loops over ``model.parameters()`` — exactly the reference
    mechanism BASELINE.json:5 describes (and what the Pallas kernels in
    cl_tpu replace)."""

    def __init__(self, mode: str = "online", gamma: float = 1.0):
        self.mode = mode
        self.gamma = gamma
        self.anchors: list[dict] = []   # separate mode
        self.fishers: list[dict] = []
        self.anchor: dict | None = None  # online mode
        self.fisher: dict | None = None

    def compute_fisher(self, model, batches, valid, *, n_batches: int,
                       ignore_index: int = 255):
        fisher = {n: torch.zeros_like(p) for n, p in
                  model.named_parameters()}
        used = 0
        for x, y in batches:
            if used >= n_batches:
                break
            model.zero_grad()
            loss = cross_entropy(model(x), y, valid,
                                 ignore_index=ignore_index)
            loss.backward()
            for n, p in model.named_parameters():
                if p.grad is not None:
                    fisher[n] += p.grad.detach() ** 2
            used += 1
        model.zero_grad()
        return {n: f / max(used, 1) for n, f in fisher.items()}

    def after_task(self, model, fisher_new):
        anchor = {n: p.detach().clone() for n, p in
                  model.named_parameters()}
        if self.mode == "online":
            if self.fisher is None:
                self.fisher = fisher_new
            else:
                self.fisher = {n: self.gamma * self.fisher[n] + fisher_new[n]
                               for n in fisher_new}
            self.anchor = anchor
        else:
            self.anchors.append(anchor)
            self.fishers.append(fisher_new)

    def penalty(self, model) -> torch.Tensor:
        total = torch.tensor(0.0)
        if self.mode == "online":
            if self.anchor is None:
                return total
            for n, p in model.named_parameters():
                d = p - self.anchor[n]
                total = total + (self.fisher[n] * d * d).sum()
        else:
            for anchor, fisher in zip(self.anchors, self.fishers):
                for n, p in model.named_parameters():
                    d = p - anchor[n]
                    total = total + (fisher[n] * d * d).sum()
        return 0.5 * total


class LwF:
    def __init__(self, temperature: float = 2.0):
        self.t = temperature
        self.old_model = None
        self.old_valid = None

    def after_task(self, model, valid):
        self.old_model = copy.deepcopy(model).eval()
        for p in self.old_model.parameters():
            p.requires_grad_(False)
        self.old_valid = valid.clone()

    def distill_loss(self, new_logits, x, labels, ignore_index=255):
        if self.old_model is None:
            return torch.tensor(0.0)
        with torch.no_grad():
            old_logits = self.old_model(x)
        t = self.t
        # grow-head mode: the snapshot's head is narrower; distill on the
        # old-class columns only (same restriction as the padded-head
        # old_valid mask)
        new_logits = new_logits[:, :self.old_valid.shape[0]]
        new_m = mask_logits(new_logits, self.old_valid) / t
        old_m = mask_logits(old_logits, self.old_valid) / t
        p_old = F.softmax(old_m, dim=1)
        kl = (p_old * (F.log_softmax(old_m, dim=1)
                       - F.log_softmax(new_m, dim=1))).sum(dim=1)
        mask = (labels != ignore_index)
        n = mask.sum().clamp(min=1).float()
        return (t * t) * (kl * mask).sum() / n
