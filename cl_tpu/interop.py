"""Torch ↔ JAX weight interop for the UNet family.

Framework feature + parity foundation (SURVEY.md §4.2): load a PyTorch UNet
state-dict (from ``reference_impl.unet.UNet`` or a ``torch.save`` checkpoint
of it) into the flax param/batch-stats pytree, and export back.

Layout mapping:
  * Conv2d weight           [O, I, kh, kw] -> flax Conv kernel [kh, kw, I, O]
  * ConvTranspose2d weight  [I, O, kh, kw] -> flax ConvTranspose kernel
    [kh, kw, I, O] with both spatial axes reversed (torch transposed conv
    flips the kernel; lax.conv_transpose does not — validated exact by
    tests/parity).
  * BatchNorm2d weight/bias -> scale/bias; running_mean/var -> batch_stats.

Module names line up 1:1 because ``reference_impl.unet`` names its modules
after the flax tree (enc{l}.conv{i}/bn{i}, bottleneck, up{l}, dec{l}, head).
"""

from __future__ import annotations

from typing import Any

import numpy as np


def _np(t) -> np.ndarray:
    return t.detach().cpu().numpy() if hasattr(t, "detach") else np.asarray(t)


def torch_state_dict_to_variables(sd: dict[str, Any]) -> dict[str, Any]:
    """Map a torch UNet ``state_dict()`` to flax ``{'params', 'batch_stats'}``."""
    params: dict[str, Any] = {}
    stats: dict[str, Any] = {}

    def setp(tree, path, value):
        node = tree
        for k in path[:-1]:
            node = node.setdefault(k, {})
        node[path[-1]] = value

    for name, t in sd.items():
        parts = name.split(".")
        arr = _np(t)
        if parts[-1] == "num_batches_tracked":
            continue
        *mod, leaf = parts
        # DoubleConv members live one level down (enc0.conv0 -> enc0/conv0);
        # top-level up{l}/head are flat torch modules.
        if mod[-1].startswith("bn"):
            if leaf == "weight":
                setp(params, mod + ["scale"], arr)
            elif leaf == "bias":
                setp(params, mod + ["bias"], arr)
            elif leaf == "running_mean":
                setp(stats, mod + ["mean"], arr)
            elif leaf == "running_var":
                setp(stats, mod + ["var"], arr)
        elif leaf == "weight":
            if mod[-1].startswith("up"):
                # ConvTranspose2d [I, O, kh, kw] -> [kh, kw, I, O] with
                # spatial axes REVERSED: torch's transposed conv is the
                # gradient of a correlation (implicit kernel flip), while
                # lax.conv_transpose(transpose_kernel=False) correlates
                # directly (SURVEY.md §7 "ConvTranspose parity"; validated
                # exact by tests/parity/test_forward.py).
                setp(params, mod + ["kernel"],
                     np.ascontiguousarray(
                         arr.transpose(2, 3, 0, 1)[::-1, ::-1]))
            else:
                # Conv2d [O, I, kh, kw] -> [kh, kw, I, O]
                setp(params, mod + ["kernel"], arr.transpose(2, 3, 1, 0))
        elif leaf == "bias":
            setp(params, mod + ["bias"], arr)
        else:
            raise ValueError(f"unmapped torch entry {name!r}")
    out = {"params": params}
    if stats:
        out["batch_stats"] = stats
    return out


def variables_to_torch_state_dict(variables: dict[str, Any]) -> dict[str, Any]:
    """Inverse mapping (returns numpy arrays; caller wraps in torch tensors)."""
    sd: dict[str, np.ndarray] = {}

    def walk(node, path):
        if isinstance(node, dict):
            for k, v in node.items():
                walk(v, path + [k])
            return
        arr = np.asarray(node)
        mod, leaf = path[:-1], path[-1]
        name = ".".join(mod)
        if leaf == "kernel":
            if mod[-1].startswith("up"):
                sd[name + ".weight"] = np.ascontiguousarray(
                    arr[::-1, ::-1].transpose(2, 3, 0, 1))
            else:
                sd[name + ".weight"] = arr.transpose(3, 2, 0, 1)
        elif leaf == "scale":
            sd[name + ".weight"] = arr
        elif leaf == "bias":
            sd[name + ".bias"] = arr
        elif leaf == "mean":
            sd[name + ".running_mean"] = arr
        elif leaf == "var":
            sd[name + ".running_var"] = arr
        else:
            raise ValueError(f"unmapped flax leaf {'.'.join(path)!r}")

    walk(variables.get("params", {}), [])
    walk(variables.get("batch_stats", {}), [])
    return sd
