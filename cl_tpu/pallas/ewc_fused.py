"""Fused EWC penalty over the flattened parameter vector.

Stage-6 deliverable (SURVEY.md §2.2): single-pass Σ F_i (θ_i − θ*_i)² instead
of the reference's Python loop over ``model.parameters()``. Delegates to the
tree-map version until the Pallas kernel lands.
"""

from __future__ import annotations

from cl_tpu.methods import ewc as ewc_lib


def penalty(params, state, *, mode: str):
    return ewc_lib.penalty(params, state, mode=mode)
