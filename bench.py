"""Headline benchmark: train images/sec/chip, UNet-32 @ 512², bf16, vs the
torch-CPU reference implementation (BASELINE.md — the reference repo
publishes no numbers; the acceptance target is >=3x torch-CPU).

Prints ONE JSON line:
    {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}

The torch-CPU baseline is measured once on this host and cached in
``.bench_baseline.json`` (keyed by a benchmark-shape hash); delete the file
to re-measure. Flags:
    --small        128² variant for quick checks
    --methods      config-5 step (EWC+LwF+replay active, widened batch)
    --batch=N      override the per-chip batch (default 8; torch baseline
                   re-measured at the same batch for a fair ratio)
    --conv=IMPL    model.conv_impl for the jax side (xla | pallas); the
                   torch baseline is impl-independent so the cache is shared
    --packed=BOOL  model.packed_unet for the jax side (default true — the
                   packed-domain path is the production single-chip mode:
                   53.5 vs 70.1 ms/step at 512²/b8 bf16, DESIGN.md §8)
    --remeasure    refresh the cached torch baseline
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

CACHE = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                     ".bench_baseline.json")

# Benchmark shape: config-5 geometry on one chip (BASELINE.json:11), no CL
# methods in the step (the headline metric is the UNet train step itself).
IMG = 512
SRC = 576
BATCH = 8
BASE_CH = 32
CLASSES = 19
WARMUP = 10
STEPS = 100
TORCH_STEPS = 5


def _shape_key(img: int, batch: int, methods: bool) -> str:
    k = f"unet{BASE_CH}_c{CLASSES}_b{batch}_i{img}"
    return k + "_methods" if methods else k


def _host_batches(img: int, src: int, n: int, batch: int,
                  methods: bool = False):
    """Deterministic uint8 batches shared by both frameworks."""
    from cl_tpu.config import parse_overrides
    from cl_tpu.data import pipeline

    over = [
        f"data.num_classes={CLASSES}", f"data.image_size={img}",
        f"data.source_size={src}", f"data.batch_size={batch}",
        f"data.train_images_per_task={batch * 4}",
        f"model.base_channels={BASE_CH}",
    ]
    if methods:
        # config-5 method set; 1 replay row per 8 fresh (64+8 over v5e-8,
        # BASELINE.json:11) — the replay widening is applied by the caller.
        over += ["method.methods=ewc,lwf,replay",
                 f"method.replay_batch={max(1, batch // 8)}"]
    cfg = parse_overrides(over)
    out = []
    it = pipeline.train_batches(cfg, 0, epoch=0)
    while len(out) < n:
        for b in it:
            out.append(b)
            if len(out) >= n:
                break
        it = pipeline.train_batches(cfg, 0, epoch=len(out))
    return cfg, out


def _widen(b, k, rng):
    """Replay-widen a HostBatch with k duplicated rows (shape-faithful to
    the config-5 step; content doesn't matter for speed)."""
    import numpy as np

    from cl_tpu.data import pipeline

    idx = rng.randint(0, b.image.shape[0], size=k)
    return pipeline.HostBatch(
        image=np.concatenate([b.image, b.image[idx]]),
        mask=np.concatenate([b.mask, b.mask[idx]]),
        flip=np.concatenate([b.flip, b.flip[idx]]))


def _arm_method_state(cfg, state, model):
    """Make EWC and LwF ACTIVE (weight=1) so the step carries the real
    config-5 work: penalty over a consolidated Fisher + teacher forward +
    KD. Fisher content is synthetic (|θ|²-scaled ones); speed-only."""
    import jax
    import jax.numpy as jnp

    from cl_tpu.data import tasks as task_lib
    from cl_tpu.methods import ewc as ewc_lib, lwf as lwf_lib

    valid = jnp.asarray(task_lib.valid_class_mask(
        CLASSES, task_lib.seen_classes(cfg.classes_per_task, 0)))
    fisher = jax.tree.map(
        lambda p: jnp.ones_like(p, jnp.float32), state.params)
    state = state.replace(ewc=ewc_lib.ewc_after_task(
        state.ewc, state.params, fisher, mode=cfg.method.ewc_mode,
        gamma=cfg.method.ewc_gamma, task_id=0))
    state = state.replace(lwf=lwf_lib.lwf_after_task(
        state.lwf, {"params": state.params, **state.model_state}, valid))
    return state


LAST_VERIFIED = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                             "benchmarks", "last_verified_bench.json")


def _git_rev() -> str:
    import subprocess
    try:
        return subprocess.run(
            ["git", "rev-parse", "--short", "HEAD"],
            cwd=os.path.dirname(os.path.abspath(__file__)),
            capture_output=True, text=True, timeout=10).stdout.strip()
    except Exception:
        return "unknown"


def _read_last_verified(metric: str):
    """Most recent successfully-measured value for this metric (or null) —
    included in the structured-error line so a wedged-relay round still
    carries the last real number and the rev it was measured at."""
    try:
        with open(LAST_VERIFIED) as f:
            return json.load(f).get(metric)
    except Exception:
        return None


def _write_last_verified(metric: str, value: float,
                         generation: str | None = None) -> None:
    rec = {}
    try:
        with open(LAST_VERIFIED) as f:
            rec = json.load(f)
    except Exception:
        pass
    prev = rec.get(metric) or {}
    entry = {"value": value, "rev": _git_rev(),
             "utc": time.strftime("%Y-%m-%dT%H:%M:%SZ", time.gmtime())}
    if generation:
        entry["compile_generation"] = generation
    # Keep a short history: the device relay behind this box has been
    # observed to RESTART with a different compile path mid-round
    # (2026-08-21: the same rev measured 190.7 then 141.5 img/s hours
    # apart) — a single overwritten scalar hides such environment
    # swings from the artifact chain.
    hist = (prev.get("history") or [])[-9:]
    if prev.get("value") is not None:
        hist = hist + [{k: prev[k]
                        for k in ("value", "rev", "utc",
                                  "compile_generation", "note")
                        if k in prev}]
    entry["history"] = hist
    rec[metric] = entry
    # Atomic: a crash mid-write must not lose the last-real-number history.
    tmp = LAST_VERIFIED + ".tmp"
    with open(tmp, "w") as f:
        json.dump(rec, f, indent=1)
    os.replace(tmp, LAST_VERIFIED)


def _note(msg: str) -> None:
    """Progress marker on stderr (flushed) — the measured run can take
    minutes through the device relay; these make a stalled relay
    distinguishable from a slow compile in driver logs."""
    print(f"# bench: {msg}", file=sys.stderr, flush=True)


class RelayWedgedError(RuntimeError):
    """The device relay accepted a dispatch but never returned the result."""


def _probe_device(warn_after: float = 60.0, fail_after: float = 300.0) -> None:
    """Round-trip one tiny matmul before the real benchmark.

    The axon relay has been observed (2026-08-20) in a state where
    dispatch succeeds but result READBACK hangs forever; without this
    probe the benchmark just sits silent. The probe runs in a daemon
    thread; the main thread prints an escalating stderr warning while it
    hasn't returned and, after ``fail_after`` seconds, raises
    RelayWedgedError so the round's artifact is a fast structured error
    instead of a driver timeout (rc=124, parsed=null — BENCH_r02.json).
    Exceptions inside the probe thread are captured and re-raised here so
    a deterministic device error is never misreported as a wedge."""
    import threading

    import jax
    import jax.numpy as jnp

    done = threading.Event()
    err: list[BaseException] = []

    def _run():
        try:
            x = jnp.ones((128, 128), jnp.float32)
            float(jax.jit(lambda a: (a @ a).sum())(x))
        except BaseException as e:  # noqa: BLE001 — re-raised on main thread
            err.append(e)
        finally:
            done.set()

    # The probe thread stays daemon: if the relay wedges, the dispatch can
    # never be cancelled — the leaked thread is the only clean exit.
    t = threading.Thread(target=_run, daemon=True)
    t0 = time.perf_counter()
    t.start()
    waited = 0.0
    while not done.wait(timeout=min(warn_after, max(0.0, fail_after - waited))):
        waited = time.perf_counter() - t0
        if waited >= fail_after:
            raise RelayWedgedError(
                f"device probe readback did not return within {waited:.0f}s "
                "— the TPU relay is accepting dispatches but not returning "
                "results")
        _note(f"device probe readback still pending after {waited:.0f}s — "
              "the TPU relay is accepting dispatches but not returning "
              f"results; failing at {fail_after:.0f}s")
    if err:
        raise err[0]
    _note(f"device probe ok ({time.perf_counter() - t0:.1f}s)")


def bench_jax(img: int, src: int, batch: int, methods: bool,
              conv_impl: str = "xla", packed: bool = True,
              act_store: str = "dtype") -> float:
    import numpy as np
    import jax.numpy as jnp

    from cl_tpu import train as train_lib
    from cl_tpu.data import pipeline, tasks as task_lib

    cfg, host = _host_batches(img, src, 4, batch, methods)
    cfg = cfg.replace(train=cfg.train.__class__(
        **{**cfg.train.__dict__, "compute_dtype": "bfloat16",
           "data_parallel": False}))
    if conv_impl != "xla" or packed or act_store != "dtype":
        cfg = cfg.replace(model=cfg.model.__class__(
            **{**cfg.model.__dict__, "conv_impl": conv_impl,
               "packed_unet": packed, "conv_act_store": act_store}))
    if methods:
        rng = np.random.RandomState(7)
        host = [_widen(b, cfg.method.replay_batch, rng) for b in host]
    model = train_lib.build_model(cfg)
    tx = train_lib.build_optimizer(cfg)
    state = train_lib.init_state(cfg, model, tx)
    if methods:
        state = _arm_method_state(cfg, state, model)
    step = train_lib.make_train_step(cfg, model, tx, mesh=None)
    valid = jnp.asarray(task_lib.valid_class_mask(
        CLASSES, task_lib.seen_classes(cfg.classes_per_task, 0)))
    dev = [pipeline.HostBatch(jnp.asarray(b.image), jnp.asarray(b.mask),
                              jnp.asarray(b.flip)) for b in host]

    _note("per-step program: compile + warmup")
    for i in range(WARMUP):
        state, aux = step(state, dev[i % len(dev)], valid)
    float(aux["loss"])  # host fetch = the only reliable sync through the
    #                     axon relay (block_until_ready returns early there)
    _note("warmup done")

    # ONE dispatch for the whole measured run (lax.scan over pre-staged
    # batches) — the ladder's production mode (data.epoch_scan=true; one
    # dispatch per epoch). The per-step Python loop pays this relay's
    # ~1 ms fixed dispatch cost per step (DESIGN.md §8 "dispatch floor"),
    # which is measurement overhead, not step time.
    import jax
    body = train_lib.make_train_step(cfg, model, tx, mesh=None,
                                     as_body=True)
    stack = pipeline.HostBatch(
        image=jnp.stack([b.image for b in dev]),
        mask=jnp.stack([b.mask for b in dev]),
        flip=jnp.stack([b.flip for b in dev]))
    n_src = len(dev)

    @jax.jit
    def run_scan(state):
        def f(st, i):
            b = pipeline.HostBatch(stack.image[i % n_src],
                                   stack.mask[i % n_src],
                                   stack.flip[i % n_src])
            st, aux = body(st, b, valid)
            return st, aux["loss"]
        return jax.lax.scan(f, state, jnp.arange(STEPS))

    _note("scan program: compile + warm run")
    state2, losses = run_scan(state)   # compile + warm
    float(losses[-1])
    _note("measuring")
    t0 = time.perf_counter()
    state2, losses = run_scan(state)
    float(losses[-1])
    dt = (time.perf_counter() - t0) / STEPS
    return dev[0].image.shape[0] / dt  # images/sec on this one chip


def bench_torch(img: int, src: int, batch: int, methods: bool) -> float:
    import numpy as np
    import torch

    from cl_tpu.data import tasks as task_lib
    from reference_impl.train import _to_torch
    from reference_impl.methods import EWC, LwF, cross_entropy
    from reference_impl.unet import UNet

    cfg, host = _host_batches(img, src, 3, batch, methods)
    torch.manual_seed(0)
    model = UNet(CLASSES, BASE_CH, 4)
    opt = torch.optim.Adam(model.parameters(), lr=1e-3)
    valid = torch.from_numpy(task_lib.valid_class_mask(
        CLASSES, task_lib.seen_classes(cfg.classes_per_task, 0)))
    model.train()
    ewc = lwf = None
    if methods:
        rng = np.random.RandomState(7)
        host = [_widen(b, cfg.method.replay_batch, rng) for b in host]
        ewc = EWC(mode=cfg.method.ewc_mode)
        ewc.after_task(model, {n: torch.ones_like(p) for n, p in
                               model.named_parameters()})
        lwf = LwF(temperature=cfg.method.lwf_temperature)
        lwf.after_task(model, valid)

    def one(b):
        x, y = _to_torch(b, cfg)
        logits = model(x)
        loss = cross_entropy(logits, y, valid)
        if methods:
            loss = loss + cfg.method.ewc_lambda * ewc.penalty(model)
            loss = loss + cfg.method.lwf_alpha * lwf.distill_loss(
                logits, x, y, cfg.data.ignore_index)
        opt.zero_grad()
        loss.backward()
        opt.step()

    one(host[0])  # warmup
    n_img = host[0].image.shape[0]
    t0 = time.perf_counter()
    for i in range(TORCH_STEPS):
        one(host[i % len(host)])
    dt = (time.perf_counter() - t0) / TORCH_STEPS
    return n_img / dt


def main() -> int:
    img, src = (128, 160) if "--small" in sys.argv else (IMG, SRC)
    methods = "--methods" in sys.argv
    batch = BATCH
    conv_impl = "xla"
    packed = True
    act_store = "dtype"
    for a in sys.argv:
        if a.startswith("--batch="):
            batch = int(a.split("=", 1)[1])
        if a.startswith("--conv="):
            conv_impl = a.split("=", 1)[1]
        if a.startswith("--packed="):
            packed = a.split("=", 1)[1].lower() in ("true", "1", "on")
        if a.startswith("--act="):
            act_store = a.split("=", 1)[1]  # dtype | int8
    key = _shape_key(img, batch, methods)

    cache = {}
    if os.path.exists(CACHE):
        with open(CACHE) as f:
            cache = json.load(f)
    if key not in cache or "--remeasure" in sys.argv:
        cache[key] = bench_torch(img, src, batch, methods)
        with open(CACHE, "w") as f:
            json.dump(cache, f)
    baseline = cache[key]

    suffix = ("_methods" if methods else "") + (
        f"_{conv_impl}conv" if conv_impl != "xla" else "") + (
        f"_{act_store}act" if act_store != "dtype" else "")
    metric = (f"train_images_per_sec_per_chip_unet{BASE_CH}_{img}px"
              f"_bf16{suffix}")

    # The device relay on this box occasionally drops a program with a
    # transient runtime error; retry once on THOSE signatures only —
    # deterministic failures (OOM, shape errors) surface immediately.
    # The probe sits INSIDE the retry so a transient probe error gets the
    # same one-shot retry the measured run does. A wedged relay (probe
    # never returns) degrades to ONE parseable error line + nonzero exit
    # instead of hanging into the driver's timeout.
    _TRANSIENT = ("FAILED_PRECONDITION", "UNAVAILABLE", "DEADLINE_EXCEEDED",
                  "INTERNAL")

    def _attempt(probe_fail_after: float) -> float:
        try:
            _probe_device(fail_after=probe_fail_after)
            return bench_jax(img, src, batch, methods, conv_impl, packed,
                             act_store)
        except RelayWedgedError:
            raise
        except Exception as e:
            if not any(s in str(e) for s in _TRANSIENT):
                raise
            print(f"# bench failed ({type(e).__name__}: {e}); retrying once",
                  file=sys.stderr)
            time.sleep(10)
            _probe_device(fail_after=probe_fail_after)
            return bench_jax(img, src, batch, methods, conv_impl, packed,
                             act_store)

    # Relay wedges (probe dispatch accepted, readback never returns) have
    # recurred across judging sessions and are often transient on the scale
    # of minutes. Recovery path: after the first 300 s fast-fail, back off
    # and re-probe twice (+2 min, then +4 min; re-probes fail after 120 s)
    # before emitting the structured error — total worst case ~14 min,
    # with every wedge onset timestamped in the error detail.
    wedge_onsets: list[str] = []
    value = None
    for i, (backoff, probe_to) in enumerate([(0, 300.0), (120, 120.0),
                                             (240, 120.0)]):
        if backoff:
            _note(f"relay wedged — backing off {backoff}s before re-probe "
                  f"cycle {i}/2")
            time.sleep(backoff)
        try:
            value = _attempt(probe_to)
            break
        except RelayWedgedError as e:
            wedge_onsets.append(time.strftime("%Y-%m-%dT%H:%M:%SZ",
                                              time.gmtime()))
            last_err = e
    if value is None:
        print(json.dumps({
            "metric": metric, "value": None, "unit": "images/sec/chip",
            "vs_baseline": None, "error": "relay_readback_wedged",
            "detail": str(last_err), "wedge_onsets_utc": wedge_onsets,
            "last_verified": _read_last_verified(metric),
        }))
        return 1

    # Generation fingerprint + MFU (VERDICT r4 next #7/#9): the canary
    # compile identifies the relay's compile service; MFU is analytic
    # model FLOPs (benchmarks/flops.py) against the v5e bf16 peak.
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from benchmarks.flops import mfu, unet_train_flops_per_image
    from benchmarks.genid import compile_generation
    gen = compile_generation()
    flops_img = unet_train_flops_per_image(BASE_CH, img, CLASSES)
    _write_last_verified(metric, round(value, 2), generation=gen["id"])
    print(json.dumps({
        "metric": metric,
        "value": round(value, 2),
        "unit": "images/sec/chip",
        "vs_baseline": round(value / baseline, 2),
        "mfu": round(mfu(value, flops_img), 4),
        "compile_generation": gen,
    }))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
