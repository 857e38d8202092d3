"""Compile-generation fingerprint for perf artifacts (VERDICT r4 next #9).

The axon relay behind this box has been observed to restart onto a
DIFFERENT compile service mid-round (2026-08-21: the same rev measured
190.7 then 141.5 img/s hours apart — DESIGN.md §8 round 4c).  Port
probing cannot identify the generation (all relay ports answer from one
process), so the fingerprint is the compiler's own output: the sha256 of
the compiled-HLO text of a small fixed canary program, plus its compile
wall time.  Two compile services that would codegen the framework
differently produce different optimized HLO for the canary (the r4
regression was visible in exactly such text: a kCustom serial gather
with different backend_config).

The canary deliberately contains the two op classes the 2026-08-21
generation shift mis-compiled: a 1-D dynamic gather and a Pallas kernel.
"""

from __future__ import annotations

import hashlib
import re
import time


def _canonical(txt: str) -> str:
    """Strip source-location noise (op metadata, stack-frame index
    tables) — those vary with the caller's line numbers and frame ids,
    not with the compiler."""
    txt = re.sub(r", metadata=\{[^{}]*\}", "", txt)
    # The tpu_custom_call "body" payload is the CLIENT-serialized Mosaic
    # IR (produced by local jax, embeds kernel source locations) — not
    # compile-service output; the service's codegen shows up in the
    # surrounding XLA text (fusion structure, window/backend configs).
    txt = re.sub(r'"body":"[A-Za-z0-9+/=]*"', '"body":"<client-ir>"', txt)
    keep = []
    for line in txt.splitlines():
        s = line.strip()
        if re.match(r"^\d+ \{(file_name_id|file_location_id|"
                    r"function_name_id|line)[=_]", s):
            continue
        # stack-frame string tables: `3 "/path/to/caller.py"` /
        # `2 "main"` — the CALLER's file name otherwise leaks into the
        # hash (observed: bench.py vs run.py produced different "ids"
        # for the same compile service).
        if re.match(r'^\d+ "[^"]*"$', s):
            continue
        keep.append(line)
    return "\n".join(keep)


def _canary_compiled_text() -> str:
    import jax
    import jax.numpy as jnp
    import numpy as np
    from jax.experimental import pallas as pl

    def _k(x_ref, o_ref):
        o_ref[...] = x_ref[...] * 2.0 + 1.0

    def canary(x, idx):
        g = jnp.take(x.reshape(-1), idx)  # the r4-regressed op class
        y = pl.pallas_call(
            _k, out_shape=jax.ShapeDtypeStruct((8, 128), jnp.float32),
        )(x)
        return y.sum() + g.sum()

    x = jnp.zeros((8, 128), jnp.float32)
    idx = jnp.asarray(np.arange(1024) % 1024, jnp.int32)
    return jax.jit(canary).lower(x, idx).compile().as_text()


def compile_generation() -> dict:
    """{"id": 12-hex hash, "compile_s": float} — or {"id": "error:..."}
    if the canary cannot compile (never raises; perf artifacts must not
    die on fingerprinting)."""
    t0 = time.perf_counter()
    try:
        txt = _canary_compiled_text()
    except Exception as e:  # pragma: no cover - relay-dependent
        return {"id": f"error:{type(e).__name__}", "compile_s": None}
    canon = _canonical(txt)
    gid = hashlib.sha256(canon.encode()).hexdigest()[:12]
    # Forensic capture: ids have been observed to FLIP between runs
    # minutes apart (r5, during heavy relay use) — keep each distinct
    # canonical text on disk so a flip can be diffed, not just noticed.
    try:
        path = f"/tmp/cl_tpu_canary_{gid}.txt"
        import os
        if not os.path.exists(path):
            with open(path, "w") as f:
                f.write(canon)
    except OSError:
        pass
    return {
        "id": gid,
        "compile_s": round(time.perf_counter() - t0, 2),
    }
