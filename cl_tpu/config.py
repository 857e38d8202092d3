"""L0 — typed frozen configs, the BASELINE preset ladder, and a tiny CLI.

Capability contract: SURVEY.md §1 L0 and §2.1 "Config"; every BASELINE.json
config (BASELINE.json:6-12) is expressible as one named preset below.
Reference equivalent: argparse flags in ``main.py``/``config.py`` (SURVEY.md
§2.1, reconstruction — reference mount empty, see SURVEY.md §0).
"""

from __future__ import annotations

import dataclasses
import hashlib
import json
from typing import Any

# ---------------------------------------------------------------------------
# Config dataclasses
# ---------------------------------------------------------------------------


@dataclasses.dataclass(frozen=True)
class DataConfig:
    """Dataset + input-pipeline configuration (L1)."""

    dataset: str = "synthetic"  # synthetic | synthetic_native | voc_dir | cityscapes_dir
    data_dir: str = ""  # directory layout root for *_dir datasets
    num_classes: int = 2  # global label-space size incl. background
    image_size: int = 128  # square H=W after resize
    source_size: int = 160  # decoded size before device-side resize
    train_images_per_task: int = 64
    val_images_per_task: int = 16
    batch_size: int = 8  # global batch
    flip_prob: float = 0.5
    mean: tuple[float, float, float] = (0.485, 0.456, 0.406)
    std: tuple[float, float, float] = (0.229, 0.224, 0.225)
    ignore_index: int = 255
    shuffle_seed: int = 1234
    prefetch_depth: int = 2  # double-buffered host->HBM
    # HBM-resident dataset cache: one bulk transfer per task, batches formed
    # on device by gather (identical seeded stream — see data/device_cache.py).
    # Removes the per-step host->HBM put.
    device_cache: bool = False
    # With device_cache: run each train/eval/Fisher epoch as ONE lax.scan
    # dispatch over the device-resident plan (zero per-step dispatches).
    # False = one fused dispatch per step (debuggability). Result-identical
    # (tested: tests/unit/test_device_cache.py).
    epoch_scan: bool = True
    # With device_cache: drop every task's HBM val cache after the
    # task-boundary eval sweep instead of keeping all seen tasks' caches
    # resident forever. Training then runs with ZERO val bytes in HBM
    # (they accreted ~60-130 MB/task at 512² — VERDICT r4 #3) at the
    # cost of a per-boundary host re-decode, which the eval-rate metric
    # already excludes (eval_overhead_seconds.cache_build).
    val_cache_evict: bool = True


@dataclasses.dataclass(frozen=True)
class ModelConfig:
    """UNet configuration (L2). Reference: SURVEY.md §2.1 "UNet"."""

    base_channels: int = 32  # 32 = UNet-small, 64 = UNet-64ch
    depth: int = 4  # encoder levels
    norm: str = "batch"  # batch | group | none
    # Padded-head strategy (SURVEY.md §7 hard parts): the 1x1 head always has
    # `max_classes` outputs; invalid classes are masked in loss/eval. This
    # bounds jit recompiles to 1 instead of T. Set False for the
    # grow-the-head variant (recompiles once per task).
    padded_head: bool = True
    # 3x3-conv implementation: "xla" = lax conv; "v3" = the gen-3
    # zero-prep Pallas kernel (pallas/conv3x3_v3.py — no halo pad, DMA
    # row halos, block-shift column halos) on all supported shapes;
    # "auto" = v3 only on the measured-win large-spatial levels
    # (conv3x3_v3.profitable); "pallas" = the gen-2 in-kernel-DMA
    # kernel (pallas/conv3x3.py, kept for comparison); "hybrid" = XLA
    # fwd/dx + gen-2 Pallas dW. The gen-3 kernel beats XLA's emitter
    # standalone fwd AND bwd (1.9x at 512²x32ch), but in-step the
    # custom-call boundary still breaks conv<->BN fusion — XLA stays
    # the default for the plain model; the packed-level path is where
    # v3 pays (DESIGN.md §8).
    conv_impl: str = "xla"
    # Packed-domain UNet: run the leading levels entirely on lane-packed
    # views — gen-3 packed convs, PackedBatchNorm (analytic VJP), packed
    # pool and transposed conv, concat distributed over the decoder's
    # split convs — so no layout round-trips exist between ops
    # (models/unet.py::UNet._packed_body; DESIGN.md §8). ON by default,
    # auto-gated to the measured-win envelope below; under a DP mesh the
    # body runs inside shard_map with psum'd BatchNorm stats; under
    # spatial_parallel it falls back to the standard body (warned).
    packed_unet: bool = True
    # Measured-win envelope for packed execution: engages only at
    # image_size >= packed_min_size AND base_channels <= 32. Full-rung
    # A/Bs: 128² f32 197 vs 250 img/s (XLA wins); 256²/64ch f32 203 vs
    # 214 AND bf16 260 vs 301 (XLA wins both dtypes — DESIGN.md §8
    # "64-channel envelope": P=2 halves the lane-packing benefit and
    # 64-ch operands already near-fill the MXU); 512²/32ch packed wins
    # +31–62%. 0 forces packed everywhere (tests / future shapes).
    packed_min_size: int = 256
    # Fuse the encoder skip-cotangent add into the packed pool backward
    # kernel (pool_pack.maxpool2x2_packed_tee): the pool input IS the
    # skip tensor, so its cotangent is d_skip + route(d_pool); unfused,
    # XLA materializes that add as a full-resolution HBM round-trip.
    # Bit-identical results either way (tests/unit/test_packed_boundary).
    pool_tee: bool = True
    # k=2/s=2 transposed-conv implementation: "xla" = nn.ConvTranspose;
    # "matmul" = one einsum + pixel shuffle with the SAME param tree (the
    # no-overlap case is a single tap per output pixel). Measured A/B at
    # 512²/b8 bf16: matmul kills the backward's 1.6 ms activation
    # `reverse` but its pixel-shuffle transposes cost ~3.5 ms of
    # copy/layout — net 70.1→71.9 ms/step, so XLA stays the default
    # (DESIGN.md §8).
    upconv_impl: str = "xla"
    # Saved-activation storage for the packed convs' backward (r4,
    # pallas/conv3x3_v3.py conv_bn_fused_q): "dtype" = residuals in the
    # compute dtype (exact); "int8" = forward epilogues quantize the
    # saved activations to int8 with per-row scales and the dx/dW
    # kernels dequantize in-register — forward output is EXACT, only
    # gradients carry the ≤0.4%-of-row-absmax quantization noise
    # (trajectory-gated: benchmarks/dtype_traj.py, PARITY.md "dtype
    # trajectory"). Halves the backward's saved-tensor HBM streams —
    # the step's dominant cost at 512² (DESIGN.md §8 int8 micro).
    conv_act_store: str = "dtype"  # dtype | int8


@dataclasses.dataclass(frozen=True)
class MethodConfig:
    """Continual-learning method configuration (L3)."""

    # Any subset of {"ewc", "lwf", "replay"}; empty = finetune baseline.
    methods: tuple[str, ...] = ()
    # EWC (SURVEY.md §2.1 "EWC")
    ewc_lambda: float = 100.0
    ewc_mode: str = "online"  # online (consolidated) | separate (per-task)
    ewc_gamma: float = 1.0  # online-EWC decay of old Fisher
    ewc_fisher_batches: int = 8  # batches used for the Fisher pass
    ewc_fisher_kind: str = "empirical"  # empirical (label grad) | true (sampled)
    # LwF (SURVEY.md §2.1 "LwF")
    lwf_alpha: float = 1.0
    lwf_temperature: float = 2.0
    # Replay (SURVEY.md §2.1 "Replay")
    replay_capacity: int = 64  # total images in buffer
    replay_batch: int = 4  # replay samples mixed into each step's batch
    # HBM-resident replay buffer (replicated per chip under DP). At the
    # default capacity 64 it is ~50 MB even at 512²; mind HBM only for
    # large capacities at large resolutions.
    replay_device_resident: bool = False


@dataclasses.dataclass(frozen=True)
class TrainConfig:
    """Training-driver configuration (L4)."""

    num_tasks: int = 1
    epochs_per_task: int = 2
    lr: float = 1e-3
    optimizer: str = "adam"  # adam | sgd
    momentum: float = 0.9
    weight_decay: float = 0.0
    compute_dtype: str = "float32"  # float32 | bfloat16 (params stay f32)
    # Per-level rematerialization (jax.checkpoint via nn.remat on every
    # UNet level): only level-boundary activations stay resident for the
    # backward; each level's internals are recomputed. Trades ~⅓ more
    # forward FLOPs for the level-internal share of activation HBM —
    # the knob that fits batch-9 512² training inside one 16 GB chip
    # when a compiler generation holds ~20 GB of step temps live
    # (DESIGN.md §8 round 4c). Bit-identical results (remat is a
    # scheduling transform, not an arithmetic one).
    remat: bool = False
    seed: int = 0
    checkpoint_dir: str = ""  # empty = no checkpointing
    resume: bool = False
    log_path: str = ""  # JSONL event log; empty = stdout only
    tensorboard_dir: str = ""  # optional TB scalar mirror; empty = off
    profile_dir: str = ""  # jax.profiler trace output; empty = off
    fail_after_task: int = -1  # test-only fault injection (SURVEY.md §5.3)
    # Reference-style per-epoch prints (SURVEY.md §2.1 "Logging"): also
    # evaluate the CURRENT task's val set after every epoch and log its
    # mIoU. Off by default — it adds one eval pass per epoch.
    eval_every_epoch: bool = False
    data_parallel: bool = True  # shard batch over all visible devices
    # Spatial parallelism (SURVEY.md §5.7 — the >HBM-resolution path):
    # shard the image HEIGHT over all visible devices with ppermute halo
    # exchange for the 3x3 convs and psum'd GroupNorm stats
    # (cl_tpu/parallel/spatial.py). Takes precedence over data_parallel;
    # requires model.norm="group" and H divisible by n_devices * 2^depth.
    spatial_parallel: bool = False
    multihost: bool = False  # jax.distributed.initialize() for multi-host
    #                          slices (one process per host; SURVEY.md §2.4)
    use_pallas: bool = True  # fused kernels; False = pure-jnp fallbacks
    # Augment kernel choice. Standalone at 576->512 the jnp einsum resize
    # (one big MXU matmul over all image-channels) measured 17.5 ms vs the
    # per-(image,channel) pallas programs' 27.8 ms; inside the full fused
    # step both give the same step time (XLA overlaps augment with the
    # model), so jnp is the default — identical math, identical speed,
    # fewer programs to compile, and it partitions under DP. The kernel
    # stays available behind this flag.
    pallas_augment: bool = False
    # Fused 1×1-head + CE kernel (pallas/head_ce.py): the train loss
    # computes head logits tile-wise in VMEM instead of materializing the
    # [B,H,W,C] logit tensor in HBM (DESIGN.md §8). Applies when
    # use_pallas is on and LwF is off (KD needs materialized logits) and
    # spatial_parallel is off. "auto" (default) enables it where it
    # measured faster — base_channels ≤ 32 (+2.3% at 512²/32ch; at
    # 256²/64ch the class-major feature transposes outweigh the saved
    # logits traffic, −2.7%). "true"/"false" force it. Train-loss
    # numerics: f32 matmul accumulation instead of XLA's bf16-conv
    # rounding — same f32 CE arithmetic, oracle-tested.
    fused_head_ce: str = "auto"
    # Pixel-major packed-view head+CE (head_ce.head_cross_entropy_packed):
    # consumes the packed UNet's lane-packed features directly, removing
    # the unpack relayout + class-major transposes (~4 ms at 512²). ON
    # by default: the gen-3 kernel converts each VMEM tile to
    # class-major IN-KERNEL (p Mosaic 2-D transposes, zero extra HBM
    # traffic) and runs the proven class-major CE math — measured
    # 45.8 → 43.3 ms/step at 512²/b8 vs the XLA unpack+transpose
    # boundary (DESIGN.md §8 "packed head"; two earlier block-diagonal
    # generations measured negative).
    packed_head_ce: bool = True


@dataclasses.dataclass(frozen=True)
class Config:
    data: DataConfig = dataclasses.field(default_factory=DataConfig)
    model: ModelConfig = dataclasses.field(default_factory=ModelConfig)
    method: MethodConfig = dataclasses.field(default_factory=MethodConfig)
    train: TrainConfig = dataclasses.field(default_factory=TrainConfig)

    # ------------------------------------------------------------------
    def to_dict(self) -> dict[str, Any]:
        return dataclasses.asdict(self)

    # Operational fields that don't change the training trajectory — a
    # resume with e.g. a different log path, without the fault-injection
    # flag, or with the (bit-identical, tested) HBM dataset cache toggled
    # must still match the stored hash. The pallas kernel flags stay IN
    # the hash: their f32 reduction orders differ from the jnp oracles, so
    # flipping them mid-run is a (tiny) trajectory change.
    _HASH_EXCLUDE = {
        "train": ("checkpoint_dir", "resume", "log_path", "profile_dir",
                  "tensorboard_dir", "fail_after_task", "multihost",
                  "eval_every_epoch"),
        # Both input-residency options are result-identical to the host
        # pipeline (same seeded streams; tested exactly), so toggling them
        # across a resume — e.g. a DP checkpoint restored single-device —
        # is operational, not a trajectory change. epoch_scan only fuses
        # the dispatch granularity of the same program (tested identical).
        "data": ("device_cache", "epoch_scan"),
        "method": ("replay_device_resident",),
    }

    def config_hash(self) -> str:
        """Stable hash stored in checkpoints and logs (SURVEY.md §5.6)."""
        d = self.to_dict()
        for section, keys in self._HASH_EXCLUDE.items():
            for k in keys:
                d[section].pop(k, None)
        blob = json.dumps(d, sort_keys=True).encode()
        return hashlib.sha256(blob).hexdigest()[:12]

    def replace(self, **sections) -> "Config":
        return dataclasses.replace(self, **sections)

    # ------------------------------------------------------------------
    @property
    def classes_per_task(self) -> list[list[int]]:
        """Class-incremental split of the label space (SURVEY.md §2.1).

        Class 0 (background) belongs to every task; foreground classes
        1..C-1 are split into contiguous, near-equal chunks, one per task.
        """
        from cl_tpu.data import tasks

        return tasks.make_task_splits(self.data.num_classes, self.train.num_tasks)


# ---------------------------------------------------------------------------
# Preset ladder — 1:1 with BASELINE.json:6-12 (see BASELINE.md table)
# ---------------------------------------------------------------------------


def _preset_baseline_1() -> Config:
    """UNet-small (32ch) binary seg, single task, 128² synthetic, CPU-runnable."""
    return Config(
        data=DataConfig(dataset="synthetic", num_classes=2, image_size=128,
                        source_size=160, batch_size=8),
        model=ModelConfig(base_channels=32),
        method=MethodConfig(methods=()),
        train=TrainConfig(num_tasks=1, epochs_per_task=2),
    )


def _preset_baseline_2() -> Config:
    """UNet-64ch single-task 21-class VOC-style, 256², fused augmentation.

    Ships f32 for parity-protocol faithfulness with the torch-f32 oracle;
    bf16 measures 301.2 vs 213.6 img/s at this shape (DESIGN.md §8 round
    3b) — opt in with ``train.compute_dtype=bfloat16``."""
    return Config(
        data=DataConfig(dataset="synthetic_native", num_classes=21, image_size=256,
                        source_size=320, batch_size=8,
                        train_images_per_task=128, val_images_per_task=32,
                        device_cache=True),
        model=ModelConfig(base_channels=64),
        method=MethodConfig(methods=()),
        train=TrainConfig(num_tasks=1, epochs_per_task=2),
    )


def _preset_baseline_3() -> Config:
    """2-task class-incremental, 512², EWC Fisher regularization.

    λ_ewc=3e4 is the measured 512² sweet spot (benchmarks/
    ab512_lambda.json sweep 10→1e5): best forgetting (0.553 vs 0.689 at
    the generic default 100/1e3, 0.593 at 1e5) with mean final mIoU
    unchanged (0.360 vs 0.361-0.363) — the generic MethodConfig default
    is demonstrably inert at this scale (VERDICT r2 weak #5)."""
    return Config(
        data=DataConfig(dataset="synthetic_native", num_classes=21, image_size=512,
                        source_size=576, batch_size=8,
                        train_images_per_task=128, val_images_per_task=32,
                        device_cache=True),
        model=ModelConfig(base_channels=32),
        method=MethodConfig(methods=("ewc",), ewc_lambda=3e4),
        train=TrainConfig(num_tasks=2, epochs_per_task=2),
    )


def _preset_baseline_4() -> Config:
    """5-task incremental 19-class Cityscapes-style, LwF + replay, 512²."""
    return Config(
        data=DataConfig(dataset="synthetic_native", num_classes=19, image_size=512,
                        source_size=576, batch_size=8,
                        train_images_per_task=128, val_images_per_task=32,
                        device_cache=True),
        model=ModelConfig(base_channels=32),
        method=MethodConfig(methods=("lwf", "replay"),
                            replay_device_resident=True),
        train=TrainConfig(num_tasks=5, epochs_per_task=2),
    )


def _preset_baseline_5() -> Config:
    """Full continual (EWC+LwF+replay), data-parallel v5e-8, bf16, 512²."""
    return Config(
        data=DataConfig(dataset="synthetic_native", num_classes=19, image_size=512,
                        source_size=576, batch_size=64,  # 8 per chip on v5e-8
                        train_images_per_task=256, val_images_per_task=64,
                        device_cache=True),
        model=ModelConfig(base_channels=32),
        # replay_batch=8: the replay-widened batch (64+8) must shard evenly
        # over the 8-chip mesh (train() checks batch+replay_batch).
        # Both HBM residency tiers are on: under the DP mesh the dataset
        # cache and replay buffer replicate per chip and the plan-gathered
        # batch reshards in-program (no per-step host->device traffic).
        method=MethodConfig(methods=("ewc", "lwf", "replay"),
                            ewc_lambda=3e4,  # 512² sweep — see baseline_3
                            replay_batch=8, replay_device_resident=True),
        # remat: the big-memory config runs with per-level
        # rematerialization on (bit-identical, tests/unit/test_remat.py)
        # — per-chip batch-8 512² activations exceed 16 GB HBM under
        # the 2026-08-21 relay compiler generation without it
        # (DESIGN.md §8 round 4c).
        train=TrainConfig(num_tasks=5, epochs_per_task=2,
                          compute_dtype="bfloat16", data_parallel=True,
                          remat=True),
    )


PRESETS = {
    "baseline_1": _preset_baseline_1,
    "baseline_2": _preset_baseline_2,
    "baseline_3": _preset_baseline_3,
    "baseline_4": _preset_baseline_4,
    "baseline_5": _preset_baseline_5,
    # tiny smoke preset for tests
    "smoke": lambda: Config(
        data=DataConfig(num_classes=2, image_size=32, source_size=40,
                        batch_size=4, train_images_per_task=8,
                        val_images_per_task=4),
        model=ModelConfig(base_channels=8),
        train=TrainConfig(num_tasks=1, epochs_per_task=1),
    ),
}


def get_preset(name: str) -> Config:
    try:
        return PRESETS[name]()
    except KeyError:
        raise KeyError(f"unknown preset {name!r}; have {sorted(PRESETS)}") from None


# ---------------------------------------------------------------------------
# CLI: `python -m cl_tpu.cli preset=baseline_1 train.lr=3e-4 method.methods=ewc,lwf`
# ---------------------------------------------------------------------------

_SECTIONS = {"data": DataConfig, "model": ModelConfig,
             "method": MethodConfig, "train": TrainConfig}


def _coerce(value: str, target_type: Any):
    import typing

    origin = typing.get_origin(target_type)
    if origin is tuple:
        inner = typing.get_args(target_type)[0]
        if value == "":
            return ()
        return tuple(_coerce(v, inner) for v in value.split(","))
    if target_type is bool:
        return value.lower() in ("1", "true", "yes", "on")
    if target_type is int:
        return int(value)
    if target_type is float:
        return float(value)
    return value


def parse_overrides(argv: list[str], base: Config | None = None) -> Config:
    """Parse ``section.key=value`` overrides, plus ``preset=NAME``."""
    cfg = base or Config()
    # preset first, wherever it appears
    for arg in argv:
        if arg.startswith("preset="):
            cfg = get_preset(arg.split("=", 1)[1])
    updates: dict[str, dict[str, Any]] = {}
    for arg in argv:
        if arg.startswith("preset="):
            continue
        if "=" not in arg or "." not in arg.split("=", 1)[0]:
            raise ValueError(f"expected section.key=value, got {arg!r}")
        key, value = arg.split("=", 1)
        section, field_name = key.split(".", 1)
        if section not in _SECTIONS:
            raise ValueError(f"unknown config section {section!r}")
        field_types = {f.name: f.type for f in
                       dataclasses.fields(_SECTIONS[section])}
        if field_name not in field_types:
            raise ValueError(f"unknown field {key!r}")
        ftype = field_types[field_name]
        if isinstance(ftype, str):  # from __future__ annotations
            import typing
            ftype = typing.get_type_hints(_SECTIONS[section])[field_name]
        updates.setdefault(section, {})[field_name] = _coerce(value, ftype)
    replacements: dict[str, Any] = {}
    for section, kv in updates.items():
        replacements[section] = dataclasses.replace(getattr(cfg, section), **kv)
    return cfg.replace(**replacements) if replacements else cfg
