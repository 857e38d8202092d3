"""L4 — training driver: Python task loop, ONE jitted XLA program per step.

Reference behavior (SURVEY.md §3.1): per-task outer loop; inner epoch loop of
forward → CE + method penalty → backward → optimizer step; eval over all seen
tasks; after-task hooks (Fisher pass / model snapshot / buffer fill); per-task
checkpoint.

TPU-native design:
  * The entire per-batch body — device-side augmentation, forward, CE + EWC
    penalty + LwF distillation, backward, optimizer update — is one jitted
    XLA program ("loss computation and optimizer step all run on-device",
    BASELINE.json:5). With the padded head + constant replay-widened batch,
    it compiles exactly ONCE for the whole T-task run.
  * Data parallelism: batch input carries a NamedSharding over the 1-D mesh;
    state is replicated; the SPMD partitioner inserts the gradient
    all-reduce over ICI (SURVEY.md §2.3 DP row).
  * Host→HBM: uint8 batches, double-buffered (pipeline.prefetch_to_device).
"""

from __future__ import annotations

import time
import warnings
from typing import Any, Callable

import jax
import jax.numpy as jnp
import numpy as np
import optax
from flax import struct

from cl_tpu import augment as augment_lib
from cl_tpu import losses, metrics, sharding
from cl_tpu.config import Config
from cl_tpu.data import pipeline
from cl_tpu.data import tasks as task_lib
from cl_tpu.methods import ewc as ewc_lib
from cl_tpu.methods import lwf as lwf_lib
from cl_tpu.methods.replay import ReplayBuffer
from cl_tpu.models.unet import UNet


class TrainState(struct.PyTreeNode):
    """Full train-state pytree: checkpointed as-is (SURVEY.md §3.5)."""

    step: jax.Array
    params: Any
    model_state: Any  # batch_stats etc. ({} for norm != batch)
    opt_state: Any
    ewc: Any   # EWCState or None (structure fixed per config)
    lwf: Any   # LwFState or None
    rng: jax.Array


def _dtype(cfg: Config):
    return jnp.bfloat16 if cfg.train.compute_dtype == "bfloat16" else jnp.float32


def _augment(batch: "pipeline.HostBatch", d, compute_dtype,
             use_pallas: bool):
    """Device-side fused resize->flip->normalize (jnp or Pallas)."""
    if use_pallas:
        from cl_tpu.pallas import augment as augment_pallas
        return augment_pallas.augment(
            batch.image, batch.mask, batch.flip, out_size=d.image_size,
            mean=d.mean, std=d.std, compute_dtype=compute_dtype)
    return augment_lib.augment_jnp(
        batch.image, batch.mask, batch.flip, out_size=d.image_size,
        mean=d.mean, std=d.std, compute_dtype=compute_dtype)


def build_model(cfg: Config, head_width: int | None = None) -> UNet:
    """``head_width`` overrides the padded full-width head — the
    grow-the-head variant (model.padded_head=False, SURVEY.md §7)."""
    return UNet(num_classes=cfg.data.num_classes,
                base_channels=cfg.model.base_channels,
                depth=cfg.model.depth, norm=cfg.model.norm,
                dtype=_dtype(cfg), head_width=head_width,
                conv_impl=cfg.model.conv_impl,
                upconv_impl=cfg.model.upconv_impl,
                pool_tee=cfg.model.pool_tee,
                act_q=(cfg.model.conv_act_store == "int8"),
                remat=cfg.train.remat,
                packed=(cfg.model.packed_unet
                        and (cfg.model.packed_min_size == 0
                             or (cfg.data.image_size
                                 >= cfg.model.packed_min_size
                                 and cfg.model.base_channels <= 32))))


def task_head_width(cfg: Config, task_id: int) -> int:
    """Head width for grow-mode: seen classes are contiguous global ids
    (splits are contiguous), so width = max(seen) + 1."""
    seen = task_lib.seen_classes(cfg.classes_per_task, task_id)
    return max(seen) + 1


def _pad_logits(logits: jax.Array, num_classes: int) -> jax.Array:
    """Grow-mode logits are narrower than the global label space; pad with
    -inf so loss masking and the confusion matrix see a fixed width."""
    w = logits.shape[-1]
    if w == num_classes:
        return logits
    return jnp.pad(logits, ((0, 0), (0, 0), (0, 0), (0, num_classes - w)),
                   constant_values=losses.NEG_INF)


def build_optimizer(cfg: Config) -> optax.GradientTransformation:
    t = cfg.train
    if t.optimizer == "adam":
        tx = optax.adam(t.lr)
    elif t.optimizer == "sgd":
        tx = optax.sgd(t.lr, momentum=t.momentum)
    else:
        raise ValueError(f"unknown optimizer {t.optimizer!r}")
    if t.weight_decay:
        tx = optax.chain(optax.add_decayed_weights(t.weight_decay), tx)
    return tx


def init_state(cfg: Config, model: UNet, tx) -> TrainState:
    rng = jax.random.PRNGKey(cfg.train.seed)
    init_rng, state_rng = jax.random.split(rng)
    x = jnp.zeros((1, cfg.data.image_size, cfg.data.image_size, 3),
                  jnp.float32)
    variables = model.init(init_rng, x, train=False)
    params = variables["params"]
    model_state = {k: v for k, v in variables.items() if k != "params"}
    m = cfg.method
    ewc_state = None
    if "ewc" in m.methods:
        ewc_state = ewc_lib.make_ewc_state(
            params, mode=m.ewc_mode,
            max_tasks=max(cfg.train.num_tasks - 1, 1))
    lwf_state = None
    if "lwf" in m.methods:
        lwf_state = lwf_lib.make_lwf_state(variables, cfg.data.num_classes)
    return TrainState(step=jnp.int32(0), params=params,
                      model_state=model_state, opt_state=tx.init(params),
                      ewc=ewc_state, lwf=lwf_state, rng=state_rng)


# ---------------------------------------------------------------------------
# The single jitted train step
# ---------------------------------------------------------------------------


def spatial_apply_fn(cfg: Config, spatial_mesh) -> Callable:
    """``model.apply``-compatible wrapper around the height-sharded UNet
    forward (cl_tpu/parallel/spatial.py): same params pytree, same math,
    halo exchange + psum'd GroupNorm inside shard_map."""
    from cl_tpu.parallel import spatial as spatial_lib

    depth = cfg.model.depth
    dtype = _dtype(cfg)

    def apply(variables, x, train=False, mutable=None):
        out = spatial_lib.spatial_apply(variables["params"], x,
                                        spatial_mesh, depth=depth,
                                        dtype=dtype)
        return (out, {}) if mutable else out

    return apply


def packed_dp_apply_fn(cfg: Config, mesh, model: UNet) -> Callable:
    """``model.apply``-compatible wrapper running the PACKED UNet body
    per-shard inside ``jax.shard_map`` over the data axis: pallas custom
    calls have no SPMD partitioning rule, so under plain sharded jit the
    partitioner would all-gather their operands; per-shard execution with
    psum'd BatchNorm statistics (UNet.dp_axis → DeferredBatchNorm /
    nn.BatchNorm(axis_name)) keeps the math global-batch-identical to
    the XLA DP path (tests/dp/test_packed_dp.py)."""
    from jax.sharding import PartitionSpec as P

    ax = sharding.DATA_AXIS
    m = model.clone(dp_axis=ax)

    def apply(variables, x, train=False, mutable=None, **kw):
        mut = list(mutable) if mutable else []

        def local(variables, x):
            if mut:
                return m.apply(variables, x, train=train, mutable=mut,
                               **kw)
            return m.apply(variables, x, train=train, **kw)

        # Output structure varies: logits / NHWC features are one
        # batch-sharded array, but when the packed body engages with
        # packed_features the model returns (raw, scale, shift) — raw
        # batch-sharded, the deferred-BN vectors replicated (their stats
        # are psum'd).  Mirror UNet.__call__'s own static engagement
        # gate (same inputs) to pick the matching out_specs.
        from cl_tpu.models.unet import packed_prefix

        feat_tuple = False
        if (kw.get("return_features") and kw.get("packed_features")
                and m.packed and m.norm == "batch"
                and x.shape[1] == x.shape[2]):
            feat_tuple = packed_prefix(
                x.shape[1], m.base_channels, m.depth,
                jnp.dtype(m.dtype).itemsize) > 0
        out = (P(ax), P(), P()) if feat_tuple else P(ax)
        fn = jax.shard_map(
            local, mesh=mesh, in_specs=(P(), P(ax)),
            out_specs=(out, P()) if mut else out,
            # batch-stat updates are computed from psum'd sums, hence
            # replicated; pallas calls carry no varying-axes annotation.
            check_vma=False)
        return fn(variables, x)

    return apply


def _pick_fwd_apply(cfg: Config, model: UNet, mesh, spatial_mesh):
    if spatial_mesh is not None:
        return spatial_apply_fn(cfg, spatial_mesh)
    if mesh is not None and cfg.model.packed_unet:
        return packed_dp_apply_fn(cfg, mesh, model)
    return model.apply


def make_train_step(cfg: Config, model: UNet, tx,
                    mesh=None, as_body: bool = False,
                    spatial_mesh=None) -> Callable:
    """``as_body=True`` returns the UNJITTED step function, for callers
    that fuse extra device work (plan-driven cache gather) around it and
    jit the composition themselves. ``spatial_mesh`` switches the forward
    to the height-sharded UNet (train.spatial_parallel); losses then use
    the jnp paths, which partition over the sharded H dim under SPMD."""
    m = cfg.method
    use_ewc = "ewc" in m.methods
    use_lwf = "lwf" in m.methods
    use_pallas = cfg.train.use_pallas and spatial_mesh is None
    # Batch-dim kernels under a mesh: a bare pallas_call has no SPMD
    # partitioning rule, so the partitioner would all-gather the sharded
    # batch around it. CE/KD therefore run through shard_map when a mesh
    # is present — each device runs the class-major kernel on its local
    # pixels and the global mean is psum(total)/psum(count) (see
    # ce_loss.cross_entropy_sharded). Augment keeps its jnp default
    # (TrainConfig.pallas_augment); EWC kernels need no wrapping (params
    # are replicated — nothing reshards).
    use_pallas_batch = use_pallas and mesh is None
    # Fused head+CE (pallas/head_ce.py): logits never materialize in HBM.
    # Under LwF the KD-fused variants compute the TEACHER logit tile in
    # VMEM from teacher pre-head features too (head_cross_entropy_kd*),
    # so the fused head no longer drops out (round-2's `not use_lwf`
    # gate cost baseline_4 ~43% throughput). Only the spatial forward
    # (stitched logits) falls back to the unfused path.
    fh = str(cfg.train.fused_head_ce).lower()
    fh_on = (cfg.model.base_channels <= 32 if fh == "auto"
             else fh in ("true", "on", "1"))
    use_fused_head = use_pallas and spatial_mesh is None and fh_on
    ce_sharded = kd_sharded = head_ce_sharded = None
    head_ce_packed_sharded = None
    head_ce_kd_sharded = head_ce_kd_packed_sharded = None
    if use_fused_head and mesh is not None:
        from jax.sharding import PartitionSpec as P

        from cl_tpu.pallas import head_ce as head_pallas_s

        head_ce_sharded = jax.shard_map(
            lambda ft, hw, hb, lb, v: head_pallas_s.head_cross_entropy_sharded(
                ft, hw, hb, lb, v, axis=sharding.DATA_AXIS,
                ignore_index=cfg.data.ignore_index),
            mesh=mesh,
            in_specs=(P(sharding.DATA_AXIS), P(), P(),
                      P(sharding.DATA_AXIS), P()),
            out_specs=(P(), P()), check_vma=False)
        if use_lwf:
            head_ce_kd_sharded = jax.shard_map(
                lambda ft, hw, hb, tf, tw, tb, lb, v, ov:
                head_pallas_s.head_cross_entropy_kd_sharded(
                    ft, hw, hb, tf, tw, tb, lb, v, ov,
                    axis=sharding.DATA_AXIS,
                    temperature=m.lwf_temperature,
                    ignore_index=cfg.data.ignore_index),
                mesh=mesh,
                in_specs=(P(sharding.DATA_AXIS), P(), P(),
                          P(sharding.DATA_AXIS), P(), P(),
                          P(sharding.DATA_AXIS), P(), P()),
                out_specs=(P(), P(), P()), check_vma=False)
        if cfg.model.packed_unet and cfg.train.packed_head_ce:
            from cl_tpu.pallas.conv3x3 import pick_pack as _ppk

            _Ppk = _ppk(cfg.model.base_channels, cfg.model.base_channels)
            head_ce_packed_sharded = jax.shard_map(
                lambda ft, sc, sh, hw, hb, lb, v:
                head_pallas_s.head_cross_entropy_packed_bn_sharded(
                    ft, sc, sh, hw, hb, lb, v, p=_Ppk,
                    axis=sharding.DATA_AXIS,
                    ignore_index=cfg.data.ignore_index),
                mesh=mesh,
                in_specs=(P(sharding.DATA_AXIS), P(), P(), P(), P(),
                          P(sharding.DATA_AXIS), P()),
                out_specs=(P(), P()), check_vma=False)
            if use_lwf:
                head_ce_kd_packed_sharded = jax.shard_map(
                    lambda ft, sc, sh, hw, hb, tf, tsc, tsh, tw, tb, lb,
                    v, ov:
                    head_pallas_s.head_cross_entropy_kd_packed_bn_sharded(
                        ft, sc, sh, hw, hb, tf, tsc, tsh, tw, tb, lb, v,
                        ov, p=_Ppk, axis=sharding.DATA_AXIS,
                        temperature=m.lwf_temperature,
                        ignore_index=cfg.data.ignore_index),
                    mesh=mesh,
                    in_specs=(P(sharding.DATA_AXIS), P(), P(), P(), P(),
                              P(sharding.DATA_AXIS), P(), P(), P(), P(),
                              P(sharding.DATA_AXIS), P(), P()),
                    out_specs=(P(), P(), P()), check_vma=False)
    if use_pallas and mesh is not None:
        from jax.sharding import PartitionSpec as P

        from cl_tpu.pallas import ce_loss as ce_pallas_s
        from cl_tpu.pallas import kd_loss as kd_pallas_s

        ce_sharded = jax.shard_map(
            lambda lg, lb, v: ce_pallas_s.cross_entropy_sharded(
                lg, lb, v, axis=sharding.DATA_AXIS,
                ignore_index=cfg.data.ignore_index),
            mesh=mesh,
            in_specs=(P(sharding.DATA_AXIS), P(sharding.DATA_AXIS), P()),
            out_specs=(P(), P()),
            # pallas_call carries no varying-mesh-axes annotation;
            # correctness of the replicated outputs is by the psums above.
            check_vma=False)
        if use_lwf:
            kd_sharded = jax.shard_map(
                lambda nw, od, v, lb: kd_pallas_s.kd_loss_sharded(
                    nw, od, v, lb, axis=sharding.DATA_AXIS,
                    temperature=m.lwf_temperature,
                    ignore_index=cfg.data.ignore_index),
                mesh=mesh,
                in_specs=(P(sharding.DATA_AXIS), P(sharding.DATA_AXIS),
                          P(), P(sharding.DATA_AXIS)),
                out_specs=P(), check_vma=False)
    # EWC's fused penalty kernel runs on REPLICATED operands (params,
    # θ*/F) — semantically nothing reshards, but a bare pallas_call has
    # no SPMD partitioning rule, so a multi-device program must still
    # route it through an all-replicated shard_map (found by the r5
    # v5e-8 topology AOT compile, benchmarks/v5e8_projection.py; the
    # 8-device CPU dryrun never caught it because interpret mode turns
    # pallas into partitionable jnp).
    ewc_penalty_fn = None
    if use_ewc and use_pallas:
        from cl_tpu.pallas import ewc_fused

        if mesh is not None:
            from jax.sharding import PartitionSpec as P
            ewc_penalty_fn = jax.shard_map(
                lambda prm, st: ewc_fused.penalty(prm, st,
                                                  mode=m.ewc_mode),
                mesh=mesh, in_specs=(P(), P()), out_specs=P(),
                check_vma=False)
        else:
            ewc_penalty_fn = lambda prm, st: ewc_fused.penalty(  # noqa: E731
                prm, st, mode=m.ewc_mode)
    # Augment is gated separately: the jnp einsum resize outruns the
    # per-(image,channel) pallas programs (see TrainConfig.pallas_augment).
    use_pallas_aug = use_pallas_batch and cfg.train.pallas_augment
    compute_dtype = _dtype(cfg)
    d = cfg.data

    fwd_apply = _pick_fwd_apply(cfg, model, mesh, spatial_mesh)

    # Packed-view head+CE: when the packed UNet engages, the fused head
    # consumes the packed features directly — no unpack relayout or
    # class-major transpose on either side (pallas/head_ce.py; the
    # layout conversion happens per-tile in VMEM, so any class count
    # works).
    want_packed_feats = (use_fused_head and cfg.model.packed_unet
                         and cfg.train.packed_head_ce
                         and spatial_mesh is None)

    def apply_train(params, model_state, x, features: bool = False):
        mutable = list(model_state.keys())
        kw = {"return_features": True} if features else {}
        if features and want_packed_feats:
            kw["packed_features"] = True
        if mutable:
            out, new_ms = fwd_apply(
                {"params": params, **model_state}, x, train=True,
                mutable=mutable, **kw)
            return out, new_ms
        return fwd_apply({"params": params}, x, train=True, **kw), {}

    def step(state: TrainState, batch: pipeline.HostBatch,
             valid_classes: jax.Array):
        x, y = _augment(batch, d, compute_dtype, use_pallas_aug)

        old = old_feats = None
        if use_lwf:
            if use_fused_head:
                # teacher PRE-HEAD features: the KD-fused head kernels
                # compute the teacher logit tile in VMEM, so neither
                # logit tensor materializes (pallas/head_ce.py KD section)
                old_feats = lwf_lib.old_features(
                    fwd_apply, state.lwf, x, packed=want_packed_feats)
            else:
                old = _pad_logits(
                    lwf_lib.old_logits(fwd_apply, state.lwf, x),
                    d.num_classes)

        def finish(params, ce, n_pix, new_ms, logits=None, old_t=None,
                   kd=None):
            total = ce
            aux = {"ce": ce, "n_pix": n_pix}
            if use_ewc:
                if ewc_penalty_fn is not None:
                    pen = ewc_penalty_fn(params, state.ewc)
                else:
                    pen = ewc_lib.penalty(params, state.ewc,
                                          mode=m.ewc_mode)
                total = total + m.ewc_lambda * pen
                aux["ewc_penalty"] = pen
            if use_lwf:
                if kd is not None:
                    pass  # KD-fused head already computed it
                elif kd_sharded is not None:
                    kd = state.lwf.weight * kd_sharded(
                        logits, old_t, state.lwf.old_valid, y)
                else:
                    kd = lwf_lib.distill_loss(
                        logits, old_t, state.lwf, y,
                        temperature=m.lwf_temperature,
                        use_pallas=use_pallas_batch,
                        ignore_index=d.ignore_index)
                total = total + m.lwf_alpha * kd
                aux["kd"] = kd
            aux["loss"] = total
            return total, (aux, new_ms)

        def loss_fn(params):
            if use_fused_head:
                feats, new_ms = apply_train(params, state.model_state, x,
                                            features=True)
                hk, hb = params["head"]["kernel"], params["head"]["bias"]
                from cl_tpu.pallas import head_ce as head_pallas
                # the packed body returns (raw, scale, shift) when it
                # engaged; the BN·ReLU prologue runs inside the kernel
                pk = isinstance(feats, tuple)
                if use_lwf:
                    thk = state.lwf.old_params["head"]["kernel"]
                    thb = state.lwf.old_params["head"]["bias"]
                    ov = state.lwf.old_valid
                    if pk:
                        raw, f_sc, f_sh = feats
                        traw, t_sc, t_sh = old_feats
                        pp = raw.shape[-1] // cfg.model.base_channels
                        if head_ce_kd_packed_sharded is not None:
                            ce, kd_raw, n_pix = head_ce_kd_packed_sharded(
                                raw, f_sc, f_sh, hk, hb, traw, t_sc,
                                t_sh, thk, thb, y, valid_classes, ov)
                        else:
                            ce, kd_raw, n_pix = \
                                head_pallas.head_cross_entropy_kd_packed_bn(
                                    raw, f_sc, f_sh, hk, hb, traw, t_sc,
                                    t_sh, thk, thb, y, valid_classes, ov,
                                    p=pp, temperature=m.lwf_temperature,
                                    ignore_index=d.ignore_index)
                    elif head_ce_kd_sharded is not None:
                        ce, kd_raw, n_pix = head_ce_kd_sharded(
                            feats, hk, hb, old_feats, thk, thb, y,
                            valid_classes, ov)
                    else:
                        ce, kd_raw, n_pix = \
                            head_pallas.head_cross_entropy_kd(
                                feats, hk, hb, old_feats, thk, thb, y,
                                valid_classes, ov,
                                temperature=m.lwf_temperature,
                                ignore_index=d.ignore_index)
                    return finish(params, ce, n_pix, new_ms,
                                  kd=state.lwf.weight * kd_raw)
                if pk and head_ce_packed_sharded is not None:
                    raw, f_sc, f_sh = feats
                    ce, n_pix = head_ce_packed_sharded(
                        raw, f_sc, f_sh, hk, hb, y, valid_classes)
                elif pk:
                    raw, f_sc, f_sh = feats
                    ce, n_pix = head_pallas.head_cross_entropy_packed_bn(
                        raw, f_sc, f_sh, hk, hb, y, valid_classes,
                        p=raw.shape[-1] // cfg.model.base_channels,
                        ignore_index=d.ignore_index)
                elif head_ce_sharded is not None:
                    ce, n_pix = head_ce_sharded(feats, hk, hb, y,
                                                valid_classes)
                else:
                    ce, n_pix = head_pallas.head_cross_entropy(
                        feats, hk, hb, y, valid_classes,
                        ignore_index=d.ignore_index)
                return finish(params, ce, n_pix, new_ms)
            logits, new_ms = apply_train(params, state.model_state, x)
            logits = _pad_logits(logits, d.num_classes)
            old_t = old
            if (use_pallas_batch or ce_sharded is not None) \
                    and compute_dtype != jnp.float32:
                # Feed the loss kernels compute-dtype logits: the model's
                # f32 logits ARE upcast bf16 conv outputs, so the downcast
                # is lossless and XLA folds the two casts away — the loss
                # operands halve without changing a single value (grads
                # round to bf16 at the same cast boundary either way).
                logits = logits.astype(compute_dtype)
                if old_t is not None:
                    old_t = old_t.astype(compute_dtype)
            if use_pallas_batch:
                from cl_tpu.pallas import ce_loss as ce_pallas
                ce, n_pix = ce_pallas.cross_entropy(
                    logits, y, valid_classes, ignore_index=d.ignore_index)
            elif ce_sharded is not None:
                ce, n_pix = ce_sharded(logits, y, valid_classes)
            else:
                ce, n_pix = losses.cross_entropy(
                    logits, y, valid_classes, ignore_index=d.ignore_index)
            return finish(params, ce, n_pix, new_ms, logits=logits,
                          old_t=old_t)

        grads, (aux, new_ms) = jax.grad(loss_fn, has_aux=True)(state.params)
        updates, new_opt = tx.update(grads, state.opt_state, state.params)
        new_params = optax.apply_updates(state.params, updates)
        new_state = state.replace(step=state.step + 1, params=new_params,
                                  model_state=new_ms, opt_state=new_opt)
        return new_state, aux

    if as_body:
        return step
    if mesh is not None:
        bspec = sharding.batch_sharding(mesh)
        rspec = sharding.replicated(mesh)
        batch_shardings = pipeline.HostBatch(bspec, bspec, bspec)
        # rspec is a pytree-prefix: the whole state is replicated; grads
        # all-reduce over ICI is inserted by the SPMD partitioner.
        return jax.jit(
            step,
            in_shardings=(rspec, batch_shardings, rspec),
            out_shardings=(rspec, rspec),
            donate_argnums=(0,),
        )
    return jax.jit(step, donate_argnums=(0,))


def make_cached_train_step(cfg: Config, model: UNet, tx, *,
                           replay_source: str = "none",
                           mesh=None) -> Callable:
    """ONE-dispatch-per-step training over the HBM dataset cache
    (data/cached_exec.py): slice row ``s`` of the device-resident epoch
    plan, gather the batch, widen with replay rows, augment, train.
    ``replay_source``: "none" | "batch" (empty buffer: duplicate fresh
    rows) | "buffer" (gather from HBM replay arrays). Under a DP ``mesh``
    the cache/plan are replicated and the gathered batch reshards onto the
    data axis in-program."""
    from cl_tpu.data import cached_exec

    body = make_train_step(cfg, model, tx, mesh=mesh, as_body=True)

    if replay_source == "none":
        def step(state, s, images, masks, plan_idx, plan_flip, valid):
            batch = cached_exec.gather_batch(
                images, masks, (plan_idx, plan_flip), s)
            new_state, aux = body(state, _constrain_batch(batch, mesh), valid)
            return new_state, aux, s + 1
    elif replay_source == "batch":
        def step(state, s, images, masks, plan_idx, plan_flip, valid,
                 rep_plan_idx):
            batch = cached_exec.gather_batch(
                images, masks, (plan_idx, plan_flip), s)
            batch = cached_exec.widen_with_replay(
                batch, "batch", rep_plan_idx, None, s)
            new_state, aux = body(state, _constrain_batch(batch, mesh), valid)
            return new_state, aux, s + 1
    elif replay_source == "buffer":
        def step(state, s, images, masks, plan_idx, plan_flip, valid,
                 rep_plan_idx, rep_plan_flip, rep_images, rep_masks):
            batch = cached_exec.gather_batch(
                images, masks, (plan_idx, plan_flip), s)
            batch = cached_exec.widen_with_replay(
                batch, "buffer", rep_plan_idx, rep_plan_flip, s,
                rep_images, rep_masks)
            new_state, aux = body(state, _constrain_batch(batch, mesh), valid)
            return new_state, aux, s + 1
    else:
        raise ValueError(f"unknown replay_source {replay_source!r}")
    if mesh is not None:
        rspec = sharding.replicated(mesh)
        n_extra = {"none": 0, "batch": 1, "buffer": 4}[replay_source]
        return jax.jit(step, in_shardings=(rspec,) * (7 + n_extra),
                       out_shardings=(rspec, rspec, rspec),
                       donate_argnums=(0, 1))
    return jax.jit(step, donate_argnums=(0, 1))


def _constrain_batch(batch, mesh):
    """Reshard a device-gathered batch onto the DP data axis inside a
    jitted program (the cache is replicated per chip; the slice is local —
    no collective)."""
    if mesh is None:
        return batch
    bspec = sharding.batch_sharding(mesh)
    return jax.tree.map(
        lambda a: jax.lax.with_sharding_constraint(a, bspec), batch)


def make_cached_train_epoch(cfg: Config, model: UNet, tx, *,
                            replay_source: str = "none",
                            mesh=None) -> Callable:
    """ONE-dispatch-per-EPOCH training: ``lax.scan`` over the
    device-resident epoch plan, the whole epoch as a single XLA program.

    The per-step path (make_cached_train_step) already got per-step
    host→device traffic to zero, but still paid one dispatch RPC per step
    — 15-45 ms on a relay-attached host, ~half the 512² step budget
    (VERDICT round-1 weakness 2). Everything a step consumes is already in
    HBM (cache, plan, replay arrays), so the TPU-native shape is a scan:
    carry = TrainState, xs = plan rows, per-step aux losses stacked on
    device. Under a DP ``mesh``, the scanned batch is resharded onto the
    data axis in-program (cache and plan are replicated)."""
    from cl_tpu.data import cached_exec

    body = make_train_step(cfg, model, tx, mesh=mesh, as_body=True)

    def epoch(state: TrainState, images, masks, plan_idx, plan_flip,
              valid: jax.Array, *rep):
        if replay_source == "buffer":
            rep_idx, rep_flip, rep_images, rep_masks = rep
            xs = (plan_idx, plan_flip, rep_idx, rep_flip)
        elif replay_source == "batch":
            (rep_idx,) = rep
            rep_images = rep_masks = None
            xs = (plan_idx, plan_flip, rep_idx)
        else:
            xs = (plan_idx, plan_flip)

        def scan_body(state, x):
            batch = cached_exec.gather_batch_row(images, masks, x[0], x[1])
            if replay_source == "batch":
                batch = cached_exec.widen_with_replay_row(
                    batch, "batch", x[2], None)
            elif replay_source == "buffer":
                batch = cached_exec.widen_with_replay_row(
                    batch, "buffer", x[2], x[3], rep_images, rep_masks)
            batch = _constrain_batch(batch, mesh)
            return body(state, batch, valid)

        return jax.lax.scan(scan_body, state, xs)

    if mesh is not None:
        rspec = sharding.replicated(mesh)
        n_extra = {"none": 0, "batch": 1, "buffer": 4}[replay_source]
        return jax.jit(epoch,
                       in_shardings=(rspec,) * (6 + n_extra),
                       out_shardings=(rspec, rspec),
                       donate_argnums=(0,))
    return jax.jit(epoch, donate_argnums=(0,))


# ---------------------------------------------------------------------------
# Eval
# ---------------------------------------------------------------------------


def make_eval_step(cfg: Config, model: UNet, mesh=None,
                   as_body: bool = False, spatial_mesh=None) -> Callable:
    d = cfg.data
    compute_dtype = _dtype(cfg)
    use_pallas_aug = (cfg.train.use_pallas and mesh is None
                      and spatial_mesh is None and cfg.train.pallas_augment)
    fwd_apply = _pick_fwd_apply(cfg, model, mesh, spatial_mesh)

    def step(conf, params, model_state, batch, valid_classes):
        x, y = _augment(batch, d, compute_dtype, use_pallas_aug)
        logits = _pad_logits(
            fwd_apply({"params": params, **model_state}, x, train=False),
            d.num_classes)
        return metrics.confusion_matrix_update(
            conf, logits, y, valid_classes, ignore_index=d.ignore_index)

    if as_body:
        return step
    if mesh is not None:
        bspec = sharding.batch_sharding(mesh)
        rspec = sharding.replicated(mesh)
        batch_shardings = pipeline.HostBatch(bspec, bspec, bspec)
        return jax.jit(step, in_shardings=(
            rspec, None, None, batch_shardings, rspec))
    return jax.jit(step)


def make_cached_eval_step(cfg: Config, model: UNet, mesh=None) -> Callable:
    """ONE-dispatch-per-step eval over the HBM dataset cache; padded plan
    rows (val set not batch-divisible) carry an all-ignore mask."""
    from cl_tpu.data import cached_exec

    body = make_eval_step(cfg, model, mesh=mesh, as_body=True)
    ignore = cfg.data.ignore_index

    def step(conf, s, params, model_state, images, masks, plan_idx,
             plan_pad, valid):
        batch = cached_exec.gather_batch(
            images, masks, (plan_idx, jnp.zeros_like(plan_idx, bool),
                            plan_pad), s, ignore_index=ignore)
        batch = _constrain_batch(batch, mesh)
        return body(conf, params, model_state, batch, valid), s + 1

    if mesh is not None:
        rspec = sharding.replicated(mesh)
        return jax.jit(step, in_shardings=(rspec,) * 9,
                       out_shardings=(rspec, rspec), donate_argnums=(0, 1))
    return jax.jit(step, donate_argnums=(0, 1))


def make_cached_eval_epoch(cfg: Config, model: UNet, mesh=None) -> Callable:
    """ONE-dispatch-per-EPOCH eval: scan the val plan, confusion matrix as
    the carry. Padded plan rows (val set not batch-divisible) carry an
    all-ignore mask, exactly like the per-step path."""
    from cl_tpu.data import cached_exec

    body = make_eval_step(cfg, model, mesh=mesh, as_body=True)
    ignore = cfg.data.ignore_index

    def epoch(conf, params, model_state, images, masks, plan_idx, plan_pad,
              valid):
        def scan_body(conf, x):
            idx, pad = x
            batch = cached_exec.gather_batch_row(
                images, masks, idx, jnp.zeros_like(idx, bool),
                pad=pad, ignore_index=ignore)
            batch = _constrain_batch(batch, mesh)
            return body(conf, params, model_state, batch, valid), None

        conf, _ = jax.lax.scan(scan_body, conf, (plan_idx, plan_pad))
        return conf

    if mesh is not None:
        rspec = sharding.replicated(mesh)
        return jax.jit(epoch, in_shardings=(rspec,) * 8,
                       out_shardings=rspec, donate_argnums=(0,))
    return jax.jit(epoch, donate_argnums=(0,))


def evaluate_task(cfg: Config, eval_step, state: TrainState, task_id: int,
                  seen_valid: np.ndarray, mesh=None) -> dict:
    """mIoU of ``task_id``'s val set via the host pipeline, predicting
    among all seen classes (standard class-incremental eval; mirrored by
    the torch oracle). The HBM-cache path evaluates through
    ``make_cached_eval_step`` inside ``train()`` instead."""
    C = cfg.data.num_classes
    conf = jnp.zeros((C, C), jnp.float32)
    valid = jnp.asarray(seen_valid)
    it = pipeline.val_batches(cfg, task_id)
    bs = sharding.batch_sharding(mesh) if mesh is not None else None
    batch_it = pipeline.prefetch_to_device(
        it, depth=cfg.data.prefetch_depth, sharding=bs)
    for batch in batch_it:
        conf = eval_step(conf, state.params, state.model_state, batch, valid)
    return eval_result(cfg, conf, task_id)


def eval_result(cfg: Config, conf, task_id: int) -> dict:
    """Finish an eval: fetch the confusion matrix, reduce to mIoU."""
    conf_np = np.asarray(jax.device_get(conf))
    task_classes = [task_lib.BACKGROUND] + cfg.classes_per_task[task_id]
    return {
        "confusion": conf_np,
        "miou": metrics.miou(conf_np, task_classes),
        "per_class_iou": metrics.iou_from_confusion(conf_np).tolist(),
    }


# ---------------------------------------------------------------------------
# Fisher pass (EWC after-task, SURVEY.md §3.3)
# ---------------------------------------------------------------------------


def make_fisher_step(cfg: Config, model: UNet, mesh=None,
                     as_body: bool = False, spatial_mesh=None) -> Callable:
    m = cfg.method
    d = cfg.data

    use_pallas = cfg.train.use_pallas and spatial_mesh is None
    fwd_apply = _pick_fwd_apply(cfg, model, mesh, spatial_mesh)

    sq_acc_fn = None
    if use_pallas:
        from cl_tpu.pallas import ewc_fused
        if mesh is not None:
            # Replicated-operand pallas kernel under a multi-device
            # program: must go through shard_map (same topology-compile
            # finding as the penalty kernel in make_train_step).
            from jax.sharding import PartitionSpec as P
            sq_acc_fn = jax.shard_map(
                ewc_fused.sq_accumulate, mesh=mesh,
                in_specs=(P(), P()), out_specs=P(), check_vma=False)
        else:
            sq_acc_fn = ewc_fused.sq_accumulate

    def step(fisher_acc, params, model_state, batch, valid_classes, rng):
        x, y = _augment(batch, d, _dtype(cfg),
                        use_pallas and mesh is None
                        and cfg.train.pallas_augment)
        if use_pallas:
            grads = ewc_lib.fisher_batch_grads(
                fwd_apply, params, model_state, x, y, valid_classes,
                kind=m.ewc_fisher_kind, rng=rng,
                ignore_index=d.ignore_index, square=False)
            # fused acc += g² (SURVEY.md §2.2 "ewc_fused")
            return sq_acc_fn(fisher_acc, grads)
        sq = ewc_lib.fisher_batch_grads(
            fwd_apply, params, model_state, x, y, valid_classes,
            kind=m.ewc_fisher_kind, rng=rng, ignore_index=d.ignore_index)
        return jax.tree.map(lambda a, s: a + s, fisher_acc, sq)

    if as_body:
        return step
    if mesh is not None:
        bspec = sharding.batch_sharding(mesh)
        rspec = sharding.replicated(mesh)
        batch_shardings = pipeline.HostBatch(bspec, bspec, bspec)
        return jax.jit(step, in_shardings=(
            None, None, None, batch_shardings, rspec, None))
    return jax.jit(step)


def make_cached_fisher_step(cfg: Config, model: UNet, mesh=None) -> Callable:
    """ONE-dispatch-per-step Fisher accumulation over the HBM dataset
    cache. ``rng_keys`` is the host path's exact per-batch split-chain
    (``fisher_rng_keys``), indexed by step — so sampled-Fisher draws are
    identical whichever input path runs."""
    from cl_tpu.data import cached_exec

    body = make_fisher_step(cfg, model, mesh=mesh, as_body=True)

    def step(acc, s, params, model_state, images, masks, plan_idx,
             plan_flip, valid, rng_keys):
        batch = cached_exec.gather_batch(
            images, masks, (plan_idx, plan_flip), s)
        batch = _constrain_batch(batch, mesh)
        return body(acc, params, model_state, batch, valid,
                    rng_keys[s]), s + 1

    if mesh is not None:
        rspec = sharding.replicated(mesh)
        return jax.jit(step, in_shardings=(rspec,) * 10,
                       out_shardings=(rspec, rspec), donate_argnums=(0, 1))
    return jax.jit(step, donate_argnums=(0, 1))


def make_cached_fisher_epoch(cfg: Config, model: UNet, mesh=None) -> Callable:
    """ONE-dispatch Fisher pass: scan the (sliced-to-nf) plan rows with
    the f32 squared-grad accumulator as the carry. ``rng_keys`` rides the
    scan xs so sampled-Fisher draws match the host path exactly."""
    from cl_tpu.data import cached_exec

    body = make_fisher_step(cfg, model, mesh=mesh, as_body=True)

    def epoch(acc, params, model_state, images, masks, plan_idx, plan_flip,
              valid, rng_keys):
        def scan_body(acc, x):
            idx, flip, key = x
            batch = cached_exec.gather_batch_row(images, masks, idx, flip)
            batch = _constrain_batch(batch, mesh)
            return body(acc, params, model_state, batch, valid, key), None

        acc, _ = jax.lax.scan(scan_body, acc,
                              (plan_idx, plan_flip, rng_keys))
        return acc

    if mesh is not None:
        rspec = sharding.replicated(mesh)
        return jax.jit(epoch, in_shardings=(rspec,) * 9,
                       out_shardings=rspec, donate_argnums=(0,))
    return jax.jit(epoch, donate_argnums=(0,))


def fisher_rng_keys(state: TrainState, task_id: int, n: int) -> jax.Array:
    """The host Fisher pass's per-batch keys, as one stacked array: the
    sequential ``rng, sub = split(rng)`` chain from
    ``fold_in(state.rng, 1000 + task_id)`` (mirrors run_fisher_pass)."""
    rng = jax.random.fold_in(state.rng, 1000 + task_id)
    subs = []
    for _ in range(n):
        rng, sub = jax.random.split(rng)
        subs.append(sub)
    return jnp.stack(subs) if subs else jnp.zeros((0, 2), jnp.uint32)


def run_fisher_pass(cfg: Config, fisher_step, state: TrainState,
                    task_id: int, seen_valid: np.ndarray, mesh=None):
    """Average squared grads over up to ``ewc_fisher_batches`` batches via
    the host pipeline. The HBM-cache path accumulates through
    ``make_cached_fisher_step`` inside ``train()`` instead."""
    acc = jax.tree.map(lambda p: jnp.zeros_like(p, jnp.float32), state.params)
    valid = jnp.asarray(seen_valid)
    rng = jax.random.fold_in(state.rng, 1000 + task_id)
    n = 0
    bs = sharding.batch_sharding(mesh) if mesh is not None else None
    it = pipeline.train_batches(cfg, task_id, epoch=10_000 + task_id)
    batch_it = pipeline.prefetch_to_device(
        it, depth=cfg.data.prefetch_depth, sharding=bs)
    try:
        for batch in batch_it:
            if n >= cfg.method.ewc_fisher_batches:
                break
            rng, sub = jax.random.split(rng)
            acc = fisher_step(acc, state.params, state.model_state, batch,
                              valid, sub)
            n += 1
    finally:
        # The pass usually stops early; close the generator so it drops
        # its prefetch threads NOW rather than at some later rebind/GC.
        batch_it.close()
    n = max(n, 1)
    return jax.tree.map(lambda a: a / n, acc)


def _expand_state(cfg: Config, state: TrainState, tx, new_width: int,
                  task_id: int) -> TrainState:
    """Grow-mode state surgery: expand head params (copy old classes, init
    new — SURVEY.md §3.1 ``model.expand_head``), expand EWC anchors/Fisher
    and the LwF snapshot with ZERO columns (no penalty / no distillation
    signal on classes that post-date the stored state), and re-init the
    optimizer (param shapes changed — the reference rebuilds its optimizer
    with the new head too)."""
    from cl_tpu.models import unet as unet_lib

    rng_exp = jax.random.fold_in(state.rng, 500 + task_id)
    params = unet_lib.expand_head_params(state.params, new_width, rng_exp)
    ewc = state.ewc
    if ewc is not None:
        ewc = ewc._replace(
            anchor=unet_lib.expand_head_zeros(ewc.anchor, new_width),
            fisher=unet_lib.expand_head_zeros(ewc.fisher, new_width))
    lwf = state.lwf
    if lwf is not None:
        lwf = lwf._replace(
            old_params=unet_lib.expand_head_zeros(lwf.old_params, new_width))
    return TrainState(step=state.step, params=params,
                      model_state=state.model_state,
                      opt_state=tx.init(params), ewc=ewc, lwf=lwf,
                      rng=state.rng)


def _device_replay_mix(buf, batch: pipeline.HostBatch, k: int, *,
                       flip_prob: float) -> pipeline.HostBatch:
    """Widen a device batch with k replay rows gathered from the
    HBM-resident buffer (``cl_tpu.pallas.replay_gather``). Empty buffer
    (task 0): duplicate fresh rows so the step shape is constant from the
    first step (mirrors ``ReplayBuffer.sample_or_current``)."""
    idx = buf.sample_indices(k)
    if idx is None:
        B = batch.image.shape[0]
        dup = jnp.asarray(buf.rng.randint(0, B, size=k).astype("int32"))
        imgs = jnp.take(batch.image, dup, axis=0)
        masks = jnp.take(batch.mask, dup, axis=0)
        flips = jnp.take(batch.flip, dup, axis=0)
    else:
        imgs, masks = buf.gather(idx)
        flips = buf.sample_flips(k, flip_prob)
    return pipeline.HostBatch(
        image=jnp.concatenate([batch.image, imgs]),
        mask=jnp.concatenate([batch.mask, masks]),
        flip=jnp.concatenate([batch.flip, flips]),
    )


# ---------------------------------------------------------------------------
# Full continual run
# ---------------------------------------------------------------------------


def _inject_variables(cfg: Config, state: TrainState, tx,
                      variables) -> TrainState:
    """Replace the freshly-initialized model variables with caller-supplied
    ones — the shared-weights parity gates (tests/parity/test_endtoend.py)
    train the torch oracle and this framework from IDENTICAL initial
    weights. Method state that embeds the variables' structure (LwF
    snapshot buffers, EWC anchors) is rebuilt around them and the
    optimizer re-initializes for the new params. Padded-head mode only
    (the injected head must already have the full class width)."""
    params = jax.tree.map(jnp.asarray, variables["params"])
    model_state = {k: jax.tree.map(jnp.asarray, v)
                   for k, v in variables.items() if k != "params"}
    ewc = state.ewc
    if ewc is not None:
        ewc = ewc_lib.make_ewc_state(
            params, mode=cfg.method.ewc_mode,
            max_tasks=max(cfg.train.num_tasks - 1, 1))
    lwf = state.lwf
    if lwf is not None:
        lwf = lwf_lib.make_lwf_state(
            {"params": params, **model_state}, cfg.data.num_classes)
    return state.replace(params=params, model_state=model_state,
                         opt_state=tx.init(params), ewc=ewc, lwf=lwf)


def _live_set_mb(state: TrainState, caches: dict, rep_arrays: dict) -> dict:
    """MB of every long-lived device buffer, keyed by subsystem — the
    task-boundary HBM live-set log (VERDICT r4 #3).  Covers the train
    state (params/optimizer/BN stats), method state (EWC θ*/F, LwF
    teacher), the HBM dataset caches (train + any resident val), and the
    device replay arrays.  Step/compile temps are XLA's and are not
    enumerable here — this is the persistent baseline they stack on."""
    def mb(tree) -> float:
        return sum(a.nbytes for a in jax.tree.leaves(tree)
                   if hasattr(a, "nbytes")) / 1e6

    out = {
        "params_mb": mb(state.params),
        "opt_state_mb": mb(state.opt_state),
        "model_state_mb": mb(state.model_state),
        "ewc_mb": mb(state.ewc),
        "lwf_teacher_mb": mb(state.lwf),
    }
    train_mb = val_mb = 0.0
    n_val = 0
    for key, c in caches.items():
        sz = mb((c.images, c.masks))
        if isinstance(key, tuple):
            val_mb += sz
            n_val += 1
        else:
            train_mb += sz
    out["train_cache_mb"] = train_mb
    out["val_caches_mb"] = val_mb
    out["val_caches_n"] = n_val
    out["replay_arrays_mb"] = sum(mb(v) for v in rep_arrays.values())
    out["total_mb"] = sum(v for k, v in out.items() if k.endswith("_mb"))
    return {k: (round(v, 1) if isinstance(v, float) else v)
            for k, v in out.items()}


def train(cfg: Config, init_variables=None) -> dict:
    """The public train API (SURVEY.md §1 L4: ``train(cfg) -> results``).

    ``init_variables``: optional flax ``{'params'[, 'batch_stats']}``
    pytree to start from instead of the seeded flax init (e.g. imported
    torch weights via ``cl_tpu.interop``)."""
    from cl_tpu.logging_utils import EventLogger

    logger = EventLogger(cfg.train.log_path,
                         cfg.train.tensorboard_dir)
    try:
        return _train_impl(cfg, logger, init_variables)
    finally:
        # Flush + release the JSONL handle and the TB writer even on a
        # crash (fault injection, ValueError) — long-lived processes run
        # many train() calls.
        logger.close()
        # Release the per-run dataset memo: directory datasets would be
        # re-served stale if the data dir changes between train() calls
        # in one process, and decoded sets would pin memory for the
        # process lifetime.
        pipeline.make_datasets.cache_clear()


def _train_impl(cfg: Config, logger, init_variables=None) -> dict:
    from cl_tpu import checkpoint as ckpt_lib

    if cfg.train.multihost:
        # Multi-host slice: one controller process per host (SURVEY.md
        # §2.4); must run before the first device query below.
        sharding.initialize_multihost()
    mesh = smesh = None
    if cfg.train.spatial_parallel and len(jax.devices()) > 1:
        # Height-sharded training (SURVEY.md §5.7): takes precedence over
        # DP; batch stays replicated, H shards with halo exchange.
        from cl_tpu.parallel import spatial as spatial_lib
        if cfg.model.norm != "group":
            raise ValueError(
                "spatial_parallel needs model.norm='group' (BatchNorm "
                "batch stats are not sharded spatially)")
        n = len(jax.devices())
        if cfg.data.image_size % (n * (1 << cfg.model.depth)):
            raise ValueError(
                f"spatial_parallel: image_size {cfg.data.image_size} must "
                f"divide by n_devices*2^depth = {n * (1 << cfg.model.depth)}")
        smesh = spatial_lib.make_space_mesh(n)
    elif cfg.train.data_parallel and len(jax.devices()) > 1:
        mesh = sharding.make_mesh()
        sharding.check_divisible(cfg.data.batch_size, mesh)

    if cfg.model.packed_unet and smesh is not None:
        # Spatial sharding splits H across devices — the packed kernels'
        # halo DMAs are single-device (and spatial needs group norm,
        # which the packed body doesn't support anyway).  Under a DP
        # mesh the packed body runs per-shard inside shard_map with
        # psum'd BN stats (packed_dp_apply_fn) — no fallback needed.
        logger.log(event="packed_unet_disabled", reason="spatial_mesh")
        warnings.warn("model.packed_unet disabled under spatial_parallel "
                      "(falling back to the standard body)", stacklevel=2)
        cfg = cfg.replace(model=cfg.model.__class__(
            **{**cfg.model.__dict__, "packed_unet": False}))

    # Grow-the-head variant (model.padded_head=False): head width follows
    # the seen-class set; steps are rebuilt (recompiled) on every growth —
    # bounded by T recompiles (SURVEY.md §7 "head expansion under jit").
    grow = not cfg.model.padded_head
    model = build_model(
        cfg, head_width=task_head_width(cfg, 0) if grow else None)
    tx = build_optimizer(cfg)
    state = init_state(cfg, model, tx)
    if init_variables is not None:
        if grow:
            raise ValueError("init_variables requires model.padded_head "
                             "(injected head width must be full)")
        state = _inject_variables(cfg, state, tx, init_variables)

    # Fused plan-driven steps for the HBM dataset cache (built lazily;
    # cleared whenever the model is rebuilt in grow mode). Late-binding
    # closure: factories read the CURRENT ``model`` at build time.
    csteps: dict = {}

    def _build_steps(model):
        csteps.clear()
        return (make_train_step(cfg, model, tx, mesh=mesh,
                                spatial_mesh=smesh),
                make_eval_step(cfg, model, mesh=mesh, spatial_mesh=smesh),
                make_fisher_step(cfg, model, mesh=mesh, spatial_mesh=smesh)
                if "ewc" in cfg.method.methods else None)

    train_step, eval_step, fisher_step = _build_steps(model)

    def _cached_step(kind: str, mode: str = "none"):
        key = (kind, mode)
        if key not in csteps:
            if kind == "train":
                csteps[key] = make_cached_train_step(
                    cfg, model, tx, replay_source=mode, mesh=mesh)
            elif kind == "train_epoch":
                csteps[key] = make_cached_train_epoch(
                    cfg, model, tx, replay_source=mode, mesh=mesh)
            elif kind == "eval":
                csteps[key] = make_cached_eval_step(cfg, model, mesh=mesh)
            elif kind == "eval_epoch":
                csteps[key] = make_cached_eval_epoch(cfg, model, mesh=mesh)
            elif kind == "fisher":
                csteps[key] = make_cached_fisher_step(cfg, model, mesh=mesh)
            else:
                csteps[key] = make_cached_fisher_epoch(cfg, model, mesh=mesh)
        return csteps[key]

    splits = cfg.classes_per_task
    T = cfg.train.num_tasks
    use_replay = "replay" in cfg.method.methods
    dev_replay = use_replay and cfg.method.replay_device_resident
    if dev_replay and smesh is not None:
        logger.log(event="replay_device_resident_disabled",
                   reason="spatial_mesh")
        warnings.warn("method.replay_device_resident disabled under "
                      "spatial_parallel (falling back to the host buffer; "
                      "result-identical)", stacklevel=2)
        dev_replay = False
    if dev_replay and mesh is not None and not cfg.data.device_cache:
        # The host-pipeline DP path mixes replay rows with the Pallas
        # per-row DMA gather, which has no SPMD partitioning rule — feed
        # from the host buffer instead (same RandomState stream, so the
        # fallback is result-identical). Under device_cache the plan-driven
        # path gathers replay rows with jnp.take inside the sharded
        # program, so HBM residency works on a mesh there.
        logger.log(event="replay_device_resident_disabled", reason="dp_mesh")
        warnings.warn("method.replay_device_resident disabled under a DP "
                      "mesh without data.device_cache (falling back to the "
                      "host buffer; result-identical)", stacklevel=2)
        dev_replay = False
    if dev_replay:
        from cl_tpu.pallas.replay_gather import DeviceReplayBuffer
        replay = DeviceReplayBuffer(cfg.method.replay_capacity,
                                    cfg.data.source_size,
                                    seed=cfg.data.shuffle_seed + 999)
    elif use_replay:
        replay = ReplayBuffer(cfg.method.replay_capacity,
                              seed=cfg.data.shuffle_seed + 999)
    else:
        replay = None

    # HBM-resident dataset cache (data/device_cache.py): one bulk transfer
    # per task, batches gathered on device — removes the per-step host→HBM
    # put, which dominates e2e time once the step is fast (DESIGN.md §8).
    dev_cache = cfg.data.device_cache
    if dev_cache and smesh is not None:
        # The host pipeline delivers a bit-identical stream (shared
        # epoch_plan). Spatial: the fused cached steps embed the unsharded
        # forward, so running them under smesh would silently train on one
        # shard. (A DP mesh IS supported: the cache replicates per chip
        # and the gathered batch reshards onto the data axis in-program.)
        logger.log(event="device_cache_disabled", reason="spatial_mesh")
        warnings.warn("data.device_cache disabled under spatial_parallel "
                      "(falling back to the host pipeline; "
                      "result-identical)", stacklevel=2)
        dev_cache = False
    caches: dict = {}
    rep_arrays: dict = {}  # per-task device copy of the replay arrays
    cache_sharding = sharding.replicated(mesh) if mesh is not None else None

    def _train_cache(task_id: int):
        if task_id not in caches:
            from cl_tpu.data.device_cache import DeviceDatasetCache
            ds, _ = pipeline.make_datasets(cfg, task_id)
            caches[task_id] = DeviceDatasetCache(ds, sharding=cache_sharding)
        return caches[task_id]

    if use_replay and mesh is not None:
        # Replay widens every step's batch by replay_batch rows before the
        # put, so the WIDENED batch is what shards over the mesh.
        sharding.check_divisible(
            cfg.data.batch_size + cfg.method.replay_batch, mesh)

    miou_matrix = np.full((T, T), np.nan)
    start_task = 0
    if cfg.train.resume and cfg.train.checkpoint_dir:
        if grow:
            lt = ckpt_lib.latest_task(cfg)
            if lt is not None:  # template must match the stored head width
                model = build_model(cfg,
                                    head_width=task_head_width(cfg, lt))
                state = init_state(cfg, model, tx)
                train_step, eval_step, fisher_step = _build_steps(model)
        restored = ckpt_lib.restore_latest(cfg, state, replay)
        if restored is not None:
            state, replay, last_task, miou_matrix = restored
            start_task = last_task + 1
            logger.log(event="resumed", task=last_task)

    bs = sharding.batch_sharding(mesh) if mesh is not None else None
    step_times: list[tuple[float, int]] = []  # (epoch seconds, steps)
    # Eval accounting (r5, VERDICT r4 #5 / ADVICE r4 #1): the reported
    # eval rate is STEADY-STATE — each (program, head-width)'s first
    # dispatch (= its compile) and all val-cache builds (decode + H2D)
    # are accumulated separately and surfaced in the report instead of
    # being silently folded into the rate.
    eval_times: list[tuple[float, int]] = []  # steady (exec s, images)
    eval_overhead = {"cache_build_s": 0.0, "compile_s": 0.0,
                     "compile_passes": 0, "host_path_used": False}

    for task_id in range(start_task, T):
        seen = task_lib.seen_classes(splits, task_id)
        seen_valid = task_lib.valid_class_mask(cfg.data.num_classes, seen)
        valid_dev = jnp.asarray(seen_valid)
        t_task = time.perf_counter()

        def _eval_task(k, seen_valid=seen_valid, valid_dev=valid_dev):
            """Task k's val mIoU among currently-seen classes — through
            the plan-driven cache or the host pipeline.  Feeds the eval
            steady-state/overhead accounting (see ``eval_overhead``)."""
            if not dev_cache:
                first = not eval_overhead["host_path_used"]
                eval_overhead["host_path_used"] = True
                t0 = time.perf_counter()
                r = evaluate_task(cfg, eval_step, state, k, seen_valid,
                                  mesh=mesh)
                r["n_images"] = len(pipeline.make_datasets(cfg, k)[1])
                exec_s = time.perf_counter() - t0
                if first:
                    eval_overhead["compile_passes"] += 1
                    eval_overhead["compile_s"] += exec_s
                else:
                    eval_times.append((exec_s, int(r["n_images"])))
                return r
            from cl_tpu.data import cached_exec
            t0 = time.perf_counter()
            if ("val", k) not in caches:
                from cl_tpu.data.device_cache import DeviceDatasetCache
                _, val_ds = pipeline.make_datasets(cfg, k)
                caches[("val", k)] = DeviceDatasetCache(
                    val_ds, sharding=cache_sharding)
                eval_overhead["cache_build_s"] += time.perf_counter() - t0
            vcache = caches[("val", k)]
            vplan = cached_exec.build_plan(
                vcache.n, batch_size=cfg.data.batch_size, epoch=0,
                seed=cfg.data.shuffle_seed + 1000 * k, shuffle=False,
                flip_prob=0.0, pad_final=True)
            C = cfg.data.num_classes
            conf = jnp.zeros((C, C), jnp.float32)
            tkind = ("eval_epoch" if cfg.data.epoch_scan and vplan.steps
                     else "eval")
            first = (tkind, "none") not in csteps  # compile on first use
            t1 = time.perf_counter()
            if cfg.data.epoch_scan and vplan.steps:
                ev = _cached_step("eval_epoch")
                conf = ev(conf, state.params, state.model_state,
                          vcache.images, vcache.masks, vplan.idx,
                          vplan.pad, valid_dev)
            else:
                ev = _cached_step("eval")
                s = jnp.int32(0)
                for _ in range(vplan.steps):
                    conf, s = ev(conf, s, state.params, state.model_state,
                                 vcache.images, vcache.masks, vplan.idx,
                                 vplan.pad, valid_dev)
            r = eval_result(cfg, conf, k)  # conf fetch = the exec sync
            exec_s = time.perf_counter() - t1
            if first:
                eval_overhead["compile_passes"] += 1
                eval_overhead["compile_s"] += exec_s
            else:
                eval_times.append((exec_s, int(vcache.n)))
            r["n_images"] = int(vcache.n)
            return r

        if grow:
            w = task_head_width(cfg, task_id)
            if state.params["head"]["kernel"].shape[-1] < w:
                state = _expand_state(cfg, state, tx, w, task_id)
                model = build_model(cfg, head_width=w)
                train_step, eval_step, fisher_step = _build_steps(model)
                logger.log(event="head_expanded", task=task_id, width=w)

        for epoch in range(cfg.train.epochs_per_task):
            # Tracing/profiling subsystem (SURVEY.md §5.1): Perfetto/
            # TensorBoard trace of the first steady-state epoch.
            profiling = (cfg.train.profile_dir and task_id == start_task
                         and epoch == min(1, cfg.train.epochs_per_task - 1))
            if profiling:
                jax.profiler.start_trace(cfg.train.profile_dir)
            # Loss values stay on device during the epoch — fetching them
            # per step would sync the pipeline and stall the double buffer.
            losses_dev, n_steps = [], 0
            if dev_cache:
                # Plan-driven fused execution (data/cached_exec.py): the
                # epoch's (idx, flip) plan uploads once, then every step
                # is ONE dispatch with zero host→device traffic.
                from cl_tpu.data import cached_exec
                cache = _train_cache(task_id)
                plan = cached_exec.build_plan(
                    cache.n, batch_size=cfg.data.batch_size, epoch=epoch,
                    seed=cfg.data.shuffle_seed + 1000 * task_id,
                    shuffle=True, flip_prob=cfg.data.flip_prob)
                rep_args, mode = (), "none"
                if use_replay:
                    mode, r_idx, r_flip = cached_exec.build_replay_plan(
                        replay, steps=plan.steps,
                        k=cfg.method.replay_batch,
                        batch_size=cfg.data.batch_size,
                        flip_prob=cfg.data.flip_prob)
                    if mode == "buffer":
                        if task_id not in rep_arrays:
                            rep_arrays.clear()  # previous task's upload
                            rep_arrays[task_id] = \
                                cached_exec.replay_arrays(replay)
                        r_imgs, r_msks = rep_arrays[task_id]
                        rep_args = (r_idx, r_flip, r_imgs, r_msks)
                    else:
                        rep_args = (r_idx,)
                # First use of a (kind, mode) program compiles on its
                # first call — that epoch is excluded from steady-state
                # timing below (the replay path switches "batch"→"buffer"
                # at task 1, which is a second compile).
                tkind = "train_epoch" if cfg.data.epoch_scan else "train"
                first_program_use = (tkind, mode) not in csteps
                cstep = _cached_step(tkind, mode)
                t_ep = time.perf_counter()
                if cfg.data.epoch_scan:
                    # ONE dispatch for the whole epoch (lax.scan over the
                    # plan); per-step losses come back stacked on device.
                    if plan.steps:
                        state, auxs = cstep(
                            state, cache.images, cache.masks, plan.idx,
                            plan.flip, valid_dev, *rep_args)
                        losses_dev.append(auxs["loss"])
                        n_steps = plan.steps
                else:
                    s = jnp.int32(0)
                    for _ in range(plan.steps):
                        state, aux, s = cstep(
                            state, s, cache.images, cache.masks, plan.idx,
                            plan.flip, valid_dev, *rep_args)
                        losses_dev.append(aux["loss"])
                        n_steps += 1
            else:
                src = pipeline.train_batches(cfg, task_id, epoch)
                if use_replay and not dev_replay:
                    k = cfg.method.replay_batch

                    def mixed(it=src):
                        for b in it:
                            yield pipeline.replay_mix(
                                b, replay.sample_or_current(
                                    k, b, flip_prob=cfg.data.flip_prob))
                    src = mixed()
                batch_it = pipeline.prefetch_to_device(
                    src, depth=cfg.data.prefetch_depth, sharding=bs)
                t_ep = time.perf_counter()
                for batch in batch_it:
                    if dev_replay:
                        batch = _device_replay_mix(
                            replay, batch, cfg.method.replay_batch,
                            flip_prob=cfg.data.flip_prob)
                    state, aux = train_step(state, batch, valid_dev)
                    losses_dev.append(aux["loss"])
                    n_steps += 1
            # device_get of the losses is the epoch sync (per-step syncs
            # would stall the double buffer; block_until_ready is
            # unreliable through the device relay).
            ep_loss = float(np.mean(jax.device_get(losses_dev))) \
                if losses_dev else 0.0
            ep_time = time.perf_counter() - t_ep
            # Steady state only: the run's first epoch carries the jit
            # compile; in grow mode every task's first epoch recompiles.
            # Profiled epochs carry trace overhead; exclude them from the
            # steady-state rate alongside compile epochs.
            compiling = (epoch == 0 and (task_id == start_task or grow)
                         or (dev_cache and first_program_use)
                         or profiling)
            if not compiling:
                step_times.append((ep_time, n_steps))
            if profiling:
                jax.profiler.stop_trace()
                logger.log(event="profile", dir=cfg.train.profile_dir)
            logger.log(event="epoch", task=task_id, epoch=epoch,
                       loss=ep_loss, steps=n_steps)
            if cfg.train.eval_every_epoch:
                # Reference-style per-epoch print (SURVEY.md §2.1
                # "Logging": loss/mIoU per epoch).
                r = _eval_task(task_id)
                logger.log(event="epoch_eval", task=task_id, epoch=epoch,
                           miou=r["miou"])

        # ---- eval over all seen tasks (SURVEY.md §3.1) ----
        for k in range(task_id + 1):
            res = _eval_task(k)
            miou_matrix[task_id, k] = res["miou"]
            logger.log(event="eval", after_task=task_id, task=k,
                       miou=res["miou"])

        # ---- after-task hooks (SURVEY.md §3.1) ----
        if fisher_step is not None and task_id < T - 1:
            if dev_cache:
                from cl_tpu.data import cached_exec
                cache = _train_cache(task_id)
                fplan = cached_exec.build_plan(
                    cache.n, batch_size=cfg.data.batch_size,
                    epoch=10_000 + task_id,
                    seed=cfg.data.shuffle_seed + 1000 * task_id,
                    shuffle=True, flip_prob=cfg.data.flip_prob)
                nf = min(fplan.steps, cfg.method.ewc_fisher_batches)
                acc = jax.tree.map(
                    lambda p: jnp.zeros_like(p, jnp.float32), state.params)
                rng_keys = fisher_rng_keys(state, task_id, nf)
                if cfg.data.epoch_scan and nf:
                    fs = _cached_step("fisher_epoch")
                    acc = fs(acc, state.params, state.model_state,
                             cache.images, cache.masks, fplan.idx[:nf],
                             fplan.flip[:nf], valid_dev, rng_keys)
                else:
                    fs = _cached_step("fisher")
                    s = jnp.int32(0)
                    for _ in range(nf):
                        acc, s = fs(acc, s, state.params, state.model_state,
                                    cache.images, cache.masks, fplan.idx,
                                    fplan.flip, valid_dev, rng_keys)
                fisher_new = jax.tree.map(lambda a: a / max(nf, 1), acc)
            else:
                fisher_new = run_fisher_pass(cfg, fisher_step, state,
                                             task_id, seen_valid, mesh=mesh)
            state = state.replace(ewc=ewc_lib.ewc_after_task(
                state.ewc, state.params, fisher_new,
                mode=cfg.method.ewc_mode, gamma=cfg.method.ewc_gamma,
                task_id=task_id))
        if state.lwf is not None and task_id < T - 1:
            state = state.replace(lwf=lwf_lib.lwf_after_task(
                state.lwf, {"params": state.params, **state.model_state},
                valid_dev))
        if use_replay:
            train_ds, _ = pipeline.make_datasets(cfg, task_id)
            per_task = max(1, cfg.method.replay_capacity // T)
            replay.add_examples(train_ds, per_task, task_id=task_id)
        caches.pop(task_id, None)  # free the finished task's HBM train cache

        if cfg.data.val_cache_evict:
            # Free all val caches after the boundary eval sweep: training
            # the next task then carries zero val bytes in HBM; each
            # cache is lazily re-decoded at the next boundary (the build
            # lands in eval_overhead_seconds, not the eval rate).
            for vk in [c for c in caches if isinstance(c, tuple)]:
                caches.pop(vk)

        # Device-resident live-set accounting (VERDICT r4 #3; SURVEY §7
        # "replay buffer residency"/"EWC at scale"): enumerate every
        # long-lived HBM buffer at the task boundary so inter-task
        # accretion is a logged number, not a forensic exercise.
        logger.log(event="hbm_live_set", task=task_id,
                   **_live_set_mb(state, caches, rep_arrays))

        if cfg.train.checkpoint_dir:
            ckpt_lib.save_task(cfg, state, replay, task_id, miou_matrix)
        logger.log(event="task_done", task=task_id,
                   seconds=time.perf_counter() - t_task)

        if cfg.train.fail_after_task == task_id:
            # Flush the async checkpoint before dying so the resume test
            # sees a complete task_{t} directory (SURVEY.md §5.3).
            ckpt_lib.wait_for_saves()
            raise RuntimeError(
                f"fault injection: fail_after_task={task_id}")

    # Barrier for the last task's async checkpoint (SURVEY.md §5.4).
    ckpt_lib.wait_for_saves()
    report = metrics.forgetting_report(miou_matrix)
    report["config_hash"] = cfg.config_hash()
    if step_times:
        total_s = sum(t for t, _ in step_times)
        total_steps = sum(n for _, n in step_times)
        n_dev = mesh.devices.size if mesh is not None else 1
        gb = cfg.data.batch_size + (
            cfg.method.replay_batch if use_replay else 0)
        if total_s > 0 and total_steps > 0:
            report["images_per_sec_per_chip"] = float(
                gb * total_steps / total_s / n_dev)
    if eval_times:
        # Steady-state only: ``_eval_task`` routes each eval program's
        # compile pass and every val-cache build (decode + H2D) into
        # ``eval_overhead`` instead of these rows, so the rate is the
        # repeat-visit execute rate (VERDICT r4 #5; ADVICE r4 #1).
        # Single-task single-eval runs have no steady row and report no
        # rate rather than a compile-dominated one.
        e_s = sum(t for t, _ in eval_times)
        e_n = sum(n for _, n in eval_times)
        n_dev = mesh.devices.size if mesh is not None else 1
        if e_s > 0 and e_n > 0:
            report["eval_images_per_sec_per_chip"] = float(
                e_n / e_s / n_dev)
    if eval_overhead["compile_passes"] or eval_overhead["cache_build_s"]:
        report["eval_overhead_seconds"] = {
            "cache_build": round(eval_overhead["cache_build_s"], 3),
            "compile_passes": eval_overhead["compile_passes"],
            "compile": round(eval_overhead["compile_s"], 3)}
    logger.log(event="done", **{k: v for k, v in report.items()
                                if k != "miou_matrix"})
    return report


def evaluate(cfg: Config, state: TrainState, task_id: int,
             seen_task: int | None = None) -> dict:
    """Public eval API (SURVEY.md §1 L4: ``evaluate(model, loader, task)``).

    Honors ``train.data_parallel`` exactly like ``train()``: on a multi-
    device host the val batch shards over the DP mesh and the confusion
    matrix psums across it."""
    mesh = None
    if cfg.train.data_parallel and len(jax.devices()) > 1:
        mesh = sharding.make_mesh()
        sharding.check_divisible(cfg.data.batch_size, mesh)
    width = state.params["head"]["kernel"].shape[-1]
    model = build_model(
        cfg, head_width=width if width != cfg.data.num_classes else None)
    eval_step = make_eval_step(cfg, model, mesh=mesh)
    seen_task = task_id if seen_task is None else seen_task
    seen = task_lib.seen_classes(cfg.classes_per_task, seen_task)
    seen_valid = task_lib.valid_class_mask(cfg.data.num_classes, seen)
    return evaluate_task(cfg, eval_step, state, task_id, seen_valid,
                         mesh=mesh)
