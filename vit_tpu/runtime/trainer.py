"""Training step (cross-entropy fine-tuning / from-scratch) over a device mesh.

The reference is inference-only (SURVEY.md: no training exists), but a
complete framework at this model family's scale ships one.  This is the
multi-chip path the driver dry-runs: params sharded tensor-parallel, batch
sharded data-parallel, XLA inserting the psum/all-reduce collectives from the
shardings (scaling-book recipe — no hand-written communication).
"""

from __future__ import annotations

from typing import Any, Tuple

import jax
import jax.numpy as jnp
import optax
from jax.sharding import NamedSharding

from vit_tpu.config import ViTConfig
from vit_tpu.models import vit
from vit_tpu.ops.dispatch import REFERENCE_OPS, OpsImpl
from vit_tpu.parallel import batch_sharding, param_shardings, replicate


def cross_entropy_loss(
    logits: jax.Array, labels: jax.Array, label_smoothing: float = 0.0
) -> jax.Array:
    """CE over int labels (B,) or soft target rows (B, K) — soft rows come
    from the augmentation layer (mixup/cutmix, runtime/augment.py).
    ``label_smoothing`` applies to int labels only; soft rows are assumed
    already smoothed by their producer."""
    logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
    if labels.ndim == logits.ndim:  # soft targets
        return -(labels.astype(jnp.float32) * logp).sum(axis=-1).mean()
    if label_smoothing:
        from vit_tpu.runtime.augment import soft_targets

        y = soft_targets(labels, logits.shape[-1], label_smoothing)
        return -(y * logp).sum(axis=-1).mean()
    nll = -jnp.take_along_axis(logp, labels[:, None], axis=-1)[:, 0]
    return nll.mean()


def distillation_loss(
    cls_logits: jax.Array,
    dist_logits: jax.Array,
    labels: jax.Array,
    teacher_logits: jax.Array,
    alpha: float = 0.5,
    hard: bool = True,
    tau: float = 1.0,
    label_smoothing: float = 0.0,
) -> jax.Array:
    """DeiT distillation objective (Touvron et al. 2021): the CLS head
    trains on the true labels, the distillation head on the teacher.

    ``hard`` (the paper's best variant) uses the teacher's argmax as a hard
    label: L = (1-alpha)*CE(cls, y) + alpha*CE(dist, argmax(teacher)).
    ``hard=False`` is soft KD: alpha * tau^2 * KL(teacher_tau || dist_tau).
    Teacher logits must already be stop-gradient (the teacher is frozen).
    """
    ce = cross_entropy_loss(cls_logits, labels, label_smoothing)
    if hard:
        kd = cross_entropy_loss(dist_logits, teacher_logits.argmax(axis=-1))
    else:
        t = jax.nn.log_softmax(teacher_logits.astype(jnp.float32) / tau, -1)
        s = jax.nn.log_softmax(dist_logits.astype(jnp.float32) / tau, -1)
        kd = (tau * tau) * (jnp.exp(t) * (t - s)).sum(axis=-1).mean()
    return (1.0 - alpha) * ce + alpha * kd


def make_distill_train_step(
    cfg: ViTConfig,
    optimizer: optax.GradientTransformation,
    teacher_fwd,
    ops: OpsImpl = REFERENCE_OPS,
    remat: bool = True,
    compute_dtype=None,
    alpha: float = 0.5,
    hard: bool = True,
    tau: float = 1.0,
    label_smoothing: float = 0.0,
):
    """Build ``(params, opt_state, images, labels) -> (params, opt_state,
    loss)`` training a DeiT-distilled student against a frozen teacher.

    ``teacher_fwd``: ``images -> logits`` closure over the frozen teacher
    (any config/ops — typically vit.logits_fn over a pretrained tree); it
    runs inside the step jit under stop_gradient, so the whole
    student-update + teacher-inference chain is ONE dispatch.
    The student must be a distilled config (dual heads)."""
    if not cfg.distilled:
        raise ValueError(
            f"distillation training needs a distilled student config "
            f"(got {cfg.name}; use deit_*)"
        )

    def loss_fn(params, images, labels):
        t_logits = jax.lax.stop_gradient(teacher_fwd(images))

        def fwd(p, x):
            if compute_dtype is not None:
                p = vit.cast_params(p, compute_dtype)
                x = x.astype(compute_dtype)
            return vit.forward(p, x, cfg, ops, separate_heads=True)

        if remat:
            fwd = jax.checkpoint(fwd)
        cls_logits, dist_logits = fwd(params, images)
        return distillation_loss(
            cls_logits, dist_logits, labels, t_logits,
            alpha=alpha, hard=hard, tau=tau,
            label_smoothing=label_smoothing,
        )

    def train_step(params, opt_state, images, labels):
        loss, grads = jax.value_and_grad(loss_fn)(params, images, labels)
        updates, opt_state = optimizer.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, loss

    return train_step


def kernel_backward_compiler_options():
    """Compiler options for jits containing the fused-block backward kernels.

    XLA stages some Pallas-call operands (per-layer weight slices from the
    scan-stacked params) in VMEM; the backward kernels' operand set
    overflows the default ~19 MiB scoped-vmem budget at B/16 scale, so TPU
    compiles raise it (v5e has 128 MiB VMEM; Mosaic's own budget is set
    separately via CompilerParams).  None on non-TPU backends."""
    if jax.default_backend() == "tpu":
        return {"xla_tpu_scoped_vmem_limit_kib": "81920"}
    return None


def make_mae_train_step(
    cfg: ViTConfig,
    mae_cfg,
    optimizer: optax.GradientTransformation,
    ops: OpsImpl = REFERENCE_OPS,
    compute_dtype=None,
):
    """Build the MAE pretraining step ``(params, opt_state, images, rng)
    -> (params, opt_state, loss)`` (models/mae.py; no labels — the targets
    are the images' own masked pixels).

    No remat knob: at the default 75% mask the encoder runs on ~25% of the
    tokens, so activation memory is a fraction of supervised training's,
    and the fused_train kernel path recomputes in VMEM already (CLAUDE.md:
    never wrap fused_train in jax.checkpoint).
    """
    from vit_tpu.models import mae as mae_mod

    def loss_fn(params, images, rng):
        if compute_dtype is not None:
            params = vit.cast_params(params, compute_dtype)
        return mae_mod.forward_loss(params, images, rng, cfg, mae_cfg, ops)

    def train_step(params, opt_state, images, rng):
        loss, grads = jax.value_and_grad(loss_fn)(params, images, rng)
        updates, opt_state = optimizer.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, loss

    return train_step


def jit_mae_step_for_mesh(
    cfg: ViTConfig,
    mae_cfg,
    optimizer: optax.GradientTransformation,
    mesh,
    params_like: Any,
    opt_state_like: Any,
    ops: OpsImpl = REFERENCE_OPS,
    compute_dtype=None,
    zero1: bool = False,
    fsdp: bool = False,
):
    """jit the MAE step with explicit mesh shardings: batch over dp,
    encoder params under the standard TP/replication rules, decoder
    replicated (parallel/sharding.py), rng replicated.  ``zero1``/``fsdp``
    as in :func:`jit_train_step_for_mesh`."""
    if fsdp:
        from vit_tpu.parallel.sharding import fsdp_param_shardings

        p_shard = fsdp_param_shardings(mesh, params_like)
    else:
        p_shard = param_shardings(mesh, params_like)
    o_shard = _opt_state_shardings(
        opt_state_like, params_like, p_shard, mesh, zero1=zero1 and not fsdp
    )
    step = make_mae_train_step(cfg, mae_cfg, optimizer, ops, compute_dtype)
    return jax.jit(
        step,
        in_shardings=(p_shard, o_shard, batch_sharding(mesh, 4), replicate(mesh)),
        out_shardings=(p_shard, o_shard, replicate(mesh)),
        donate_argnums=(0, 1),
    )


def jit_mae_step_dp_shard_map(
    cfg: ViTConfig,
    mae_cfg,
    optimizer: optax.GradientTransformation,
    mesh,
    ops: OpsImpl,
    compute_dtype=None,
    zero1_like=None,
):
    """Data-parallel MAE step for the Pallas-kernel op paths (GSPMD cannot
    partition pallas calls — same split as jit_train_step_dp_shard_map):
    per-shard value_and_grad under shard_map, pmean'd loss/grads, optimizer
    update on replicated params outside.  The mask rng decorrelates across
    dp shards via the axis index (each shard masks its own images).
    ``zero1_like`` = ``(params_like, opt_state_like)`` shards the optimizer
    state over dp exactly as in jit_train_step_dp_shard_map."""
    from jax.sharding import PartitionSpec as P

    from vit_tpu.models import mae as mae_mod

    def loss_fn(params, images, rng):
        if compute_dtype is not None:
            params = vit.cast_params(params, compute_dtype)
        return mae_mod.forward_loss(params, images, rng, cfg, mae_cfg, ops)

    def local(params, images, rng):
        k = jax.random.fold_in(rng, jax.lax.axis_index("dp"))
        loss, grads = jax.value_and_grad(loss_fn)(params, images, k)
        loss = jax.lax.pmean(loss, "dp")
        grads = jax.tree.map(lambda g: jax.lax.pmean(g, "dp"), grads)
        return loss, grads

    grad_fn = jax.shard_map(
        local,
        mesh=mesh,
        in_specs=(P(), P("dp"), P()),
        out_specs=(P(), P()),
        check_vma=False,
    )

    def step(params, opt_state, images, rng):
        loss, grads = grad_fn(params, images, rng)
        updates, opt_state = optimizer.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, loss

    jit_kw = {}
    if zero1_like is not None:
        params_like, opt_state_like = zero1_like
        rep = replicate(mesh)
        p_shard = jax.tree.map(lambda _: rep, params_like)
        o_shard = _opt_state_shardings(
            opt_state_like, params_like, p_shard, mesh, zero1=True
        )
        jit_kw = dict(
            in_shardings=(p_shard, o_shard, batch_sharding(mesh, 4), rep),
            out_shardings=(p_shard, o_shard, rep),
        )
    return jax.jit(
        step,
        donate_argnums=(0, 1),
        compiler_options=kernel_backward_compiler_options(),
        **jit_kw,
    )


def _make_loss_fn(cfg, ops, remat, compute_dtype, label_smoothing=0.0,
                  forward_fn=None):
    """``forward_fn`` overrides the model forward with any
    ``(params, images) -> logits`` closure (e.g. the train-time ToMe
    forward, models/tome.forward_train); the default is vit.forward with
    the chosen op table (rng threads into its dropout).  A forward_fn
    declaring a third parameter receives the per-step dropout rng too
    (the ToMe x dropout composition)."""
    fwd_takes_rng = False
    if forward_fn is not None:
        import inspect

        sig = inspect.signature(forward_fn)
        required = [
            q for q in sig.parameters.values()
            if q.default is inspect.Parameter.empty
            and q.kind in (inspect.Parameter.POSITIONAL_ONLY,
                           inspect.Parameter.POSITIONAL_OR_KEYWORD)
        ]
        fwd_takes_rng = len(required) >= 3

    def loss_fn(params, images, labels, rng=None):
        def fwd(p, x):
            if compute_dtype is not None:
                p = vit.cast_params(p, compute_dtype)
                x = x.astype(compute_dtype)
            if forward_fn is not None:
                if fwd_takes_rng:
                    return forward_fn(p, x, rng)
                return forward_fn(p, x)
            return vit.forward(p, x, cfg, ops, dropout_rng=rng)

        if remat:
            fwd = jax.checkpoint(fwd)
        logits = fwd(params, images)
        return cross_entropy_loss(logits, labels, label_smoothing)

    return loss_fn


def _make_distill_loss_fn(cfg, ops, remat, compute_dtype, teacher_fwd,
                          alpha, hard, tau, label_smoothing=0.0):
    """Distillation twin of :func:`_make_loss_fn` for the shard_map kernel
    train paths: separate-head student forward through ``ops`` plus the
    frozen-teacher inference, both inside the step (one dispatch).  The
    teacher closure may itself run the fused inference megakernels — the
    teacher leg is frozen inference, exactly what those kernels exist for
    (measured ~2.1x the xla per-op rate, docs/performance.md)."""

    def loss_fn(params, images, labels, rng=None):
        del rng  # distillation composes with no dropout (train_setup guard)
        t_logits = jax.lax.stop_gradient(teacher_fwd(images))

        def fwd(p, x):
            if compute_dtype is not None:
                p = vit.cast_params(p, compute_dtype)
                x = x.astype(compute_dtype)
            return vit.forward(p, x, cfg, ops, separate_heads=True)

        if remat:
            fwd = jax.checkpoint(fwd)
        cls_logits, dist_logits = fwd(params, images)
        return distillation_loss(
            cls_logits, dist_logits, labels, t_logits,
            alpha=alpha, hard=hard, tau=tau,
            label_smoothing=label_smoothing,
        )

    return loss_fn


def _value_and_grad_accum(loss_fn, params, images, labels, k, rng=None):
    """(loss, grads) with the batch split into ``k`` microbatches whose
    gradients accumulate under ``lax.scan`` — k× less activation memory at
    one optimizer update per step.  Equal microbatches make the mean of
    per-microbatch means exactly the full-batch mean."""
    if k <= 1:
        return jax.value_and_grad(loss_fn)(params, images, labels, rng)
    b = images.shape[0]
    if b % k:
        raise ValueError(
            f"batch {b} must be divisible by grad_accum {k}"
        )
    xs = images.reshape(k, b // k, *images.shape[1:])
    ys = labels.reshape(k, b // k, *labels.shape[1:])
    rngs = jax.random.split(rng, k) if rng is not None else jnp.zeros((k, 1))

    def body(carry, xyr):
        loss_acc, g_acc = carry
        x, y, r = xyr
        loss, grads = jax.value_and_grad(loss_fn)(
            params, x, y, r if rng is not None else None
        )
        g_acc = jax.tree.map(jnp.add, g_acc, grads)
        return (loss_acc + loss, g_acc), None

    init = (
        jnp.zeros((), jnp.float32),
        jax.tree.map(lambda p: jnp.zeros(p.shape, p.dtype), params),
    )
    (loss, grads), _ = jax.lax.scan(body, init, (xs, ys, rngs))
    return loss / k, jax.tree.map(lambda g: g / k, grads)


def make_ema_update(decay: float = 0.999):
    """Jitted exponential-moving-average tracker for eval-time weights:
    ``ema = decay * ema + (1-decay) * params`` per leaf, one fused HBM
    pass (old ema buffers donated)."""

    def update(ema, params):
        return jax.tree.map(
            lambda e, p: e * decay + p.astype(e.dtype) * (1.0 - decay),
            ema, params,
        )

    return jax.jit(update, donate_argnums=(0,))


def make_train_step(
    cfg: ViTConfig,
    optimizer: optax.GradientTransformation,
    ops: OpsImpl = REFERENCE_OPS,
    remat: bool = True,
    use_dropout: bool = False,
    compute_dtype=None,
    label_smoothing: float = 0.0,
    augment_fn=None,
    grad_accum: int = 1,
    forward_fn=None,
):
    """Build ``(params, opt_state, images, labels[, rng]) -> (params,
    opt_state, loss)``.

    ``remat`` wraps the forward in jax.checkpoint so activations are
    rematerialized in the backward pass (HBM for FLOPs — the standard TPU
    memory trade).  ``use_dropout`` adds a per-step rng argument and applies
    cfg.dropout inside the blocks (requires the unfused op path).
    ``compute_dtype`` (e.g. jnp.bfloat16) enables mixed precision: fp32
    master weights and optimizer state, casts to the compute dtype inside
    the loss (gradients land back in fp32 through the cast).
    ``label_smoothing`` smooths int labels inside the loss.
    ``augment_fn`` (runtime/augment.make_augment_fn) runs on-device inside
    the step — it consumes the rng argument and emits soft targets, so it
    owns any smoothing itself (the loss then gets soft rows).
    ``grad_accum`` k > 1 splits the batch into k scanned microbatches whose
    gradients accumulate before the single optimizer update (k× less
    activation memory at the same numerics).
    """

    loss_fn = _make_loss_fn(
        cfg, ops, remat, compute_dtype,
        0.0 if augment_fn is not None else label_smoothing,
        forward_fn=forward_fn,
    )
    needs_rng = use_dropout or augment_fn is not None

    def compute(params, images, labels, rng):
        if augment_fn is not None:
            if use_dropout:
                k_aug, rng = jax.random.split(rng)
            else:
                k_aug, rng = rng, None
            images, labels = augment_fn(k_aug, images, labels)
        return _value_and_grad_accum(
            loss_fn, params, images, labels, grad_accum,
            rng if use_dropout else None,
        )

    if needs_rng:

        def train_step(params, opt_state, images, labels, rng):
            loss, grads = compute(params, images, labels, rng)
            updates, opt_state = optimizer.update(grads, opt_state, params)
            params = optax.apply_updates(params, updates)
            return params, opt_state, loss

    else:

        def train_step(params, opt_state, images, labels):
            loss, grads = compute(params, images, labels, None)
            updates, opt_state = optimizer.update(grads, opt_state, params)
            params = optax.apply_updates(params, updates)
            return params, opt_state, loss

    return train_step


def jit_train_step_for_mesh(
    cfg: ViTConfig,
    optimizer: optax.GradientTransformation,
    mesh,
    params_like: Any,
    opt_state_like: Any,
    ops: OpsImpl = REFERENCE_OPS,
    remat: bool = True,
    compute_dtype=None,
    label_smoothing: float = 0.0,
    augment_fn=None,
    grad_accum: int = 1,
    use_dropout: bool = False,
    forward_fn=None,
    zero1: bool = False,
    fsdp: bool = False,
):
    """jit the train step with explicit mesh shardings.

    Params + optimizer state follow the TP rules (optimizer moments shard
    like their params); images/labels shard over dp; loss is replicated.
    ``compute_dtype`` enables mixed precision exactly as in make_train_step
    (fp32 master weights/optimizer state, casts inside the loss);
    ``label_smoothing``/``augment_fn``/``grad_accum`` forward too (an
    augment_fn adds a replicated rng argument to the jitted step).
    ``zero1`` shards the optimizer state over dp (see
    :func:`_opt_state_shardings`); ``fsdp`` shards the PARAMS themselves
    over dp as well (parallel/sharding.fsdp_param_shardings — ZeRO-3;
    optimizer state follows the params, so zero1 is implied).
    """
    if fsdp:
        from vit_tpu.parallel.sharding import fsdp_param_shardings

        p_shard = fsdp_param_shardings(mesh, params_like)
    else:
        p_shard = param_shardings(mesh, params_like)
    # optax states are pytrees whose array leaves mirror param shapes (mu/nu)
    # or are scalars (count); map matching-structure leaves to param rules.
    o_shard = _opt_state_shardings(
        opt_state_like, params_like, p_shard, mesh, zero1=zero1 and not fsdp
    )
    step = make_train_step(
        cfg, optimizer, ops, remat, use_dropout=use_dropout,
        compute_dtype=compute_dtype,
        label_smoothing=label_smoothing, augment_fn=augment_fn,
        grad_accum=grad_accum, forward_fn=forward_fn,
    )
    data_sh = (batch_sharding(mesh, 4), batch_sharding(mesh, 1))
    if augment_fn is not None or use_dropout:
        data_sh = data_sh + (replicate(mesh),)  # the rng key
    return jax.jit(
        step,
        in_shardings=(p_shard, o_shard) + data_sh,
        out_shardings=(p_shard, o_shard, replicate(mesh)),
        donate_argnums=(0, 1),
    )


def jit_distill_step_for_mesh(
    cfg: ViTConfig,
    optimizer: optax.GradientTransformation,
    mesh,
    params_like: Any,
    opt_state_like: Any,
    teacher_fwd,
    ops: OpsImpl = REFERENCE_OPS,
    remat: bool = True,
    compute_dtype=None,
    alpha: float = 0.5,
    hard: bool = True,
    tau: float = 1.0,
    label_smoothing: float = 0.0,
    zero1: bool = False,
    fsdp: bool = False,
):
    """jit ``make_distill_train_step`` with explicit mesh shardings
    (student params TP/replication rules, batch over dp — the same
    placement as jit_train_step_for_mesh).  The frozen teacher params ride
    as closure constants inside ``teacher_fwd`` and replicate via GSPMD.
    ``zero1``/``fsdp`` as in :func:`jit_train_step_for_mesh`."""
    if fsdp:
        from vit_tpu.parallel.sharding import fsdp_param_shardings

        p_shard = fsdp_param_shardings(mesh, params_like)
    else:
        p_shard = param_shardings(mesh, params_like)
    o_shard = _opt_state_shardings(
        opt_state_like, params_like, p_shard, mesh, zero1=zero1 and not fsdp
    )
    step = make_distill_train_step(
        cfg, optimizer, teacher_fwd, ops, remat=remat,
        compute_dtype=compute_dtype, alpha=alpha, hard=hard, tau=tau,
        label_smoothing=label_smoothing,
    )
    return jax.jit(
        step,
        in_shardings=(
            p_shard, o_shard, batch_sharding(mesh, 4), batch_sharding(mesh, 1)
        ),
        out_shardings=(p_shard, o_shard, replicate(mesh)),
        donate_argnums=(0, 1),
    )


def make_train_step_fused_adamw(
    cfg: ViTConfig,
    lr,
    ops: OpsImpl = REFERENCE_OPS,
    remat: bool = False,
    compute_dtype=None,
    b1: float = 0.9,
    b2: float = 0.999,
    eps: float = 1e-8,
    weight_decay: float = 0.0,
):
    """Train step with the fused in-place AdamW Pallas kernel
    (ops/pallas/adamw_kernel.py) instead of optax: one HBM pass per leaf
    for the whole optimizer update.  State is ``(count, mu, nu)``
    (init with :func:`init_fused_adamw_state`); math matches optax.adamw.
    ``lr`` may be a float or an ``optax``-style schedule fn of the step.
    """
    from vit_tpu.ops.pallas.adamw_kernel import adamw_update

    loss_fn = _make_loss_fn(cfg, ops, remat, compute_dtype)

    def train_step(params, opt_state, images, labels):
        count, mu, nu = opt_state
        loss, grads = jax.value_and_grad(loss_fn)(params, images, labels)
        step = count + 1
        lr_t = lr(step) if callable(lr) else lr
        params, mu, nu = adamw_update(
            grads, params, mu, nu, step, lr_t,
            b1=b1, b2=b2, eps=eps, weight_decay=weight_decay,
        )
        return params, (step, mu, nu), loss

    return train_step


def init_fused_adamw_state(params):
    """(count, mu, nu) state for :func:`make_train_step_fused_adamw`."""
    zeros = jax.tree.map(lambda p: jnp.zeros(p.shape, jnp.float32), params)
    return (
        jnp.zeros((), jnp.int32),
        zeros,
        jax.tree.map(lambda p: jnp.zeros(p.shape, jnp.float32), params),
    )


def jit_train_step_dp_shard_map(
    cfg: ViTConfig,
    optimizer: optax.GradientTransformation,
    mesh,
    ops: OpsImpl,
    remat: bool = False,
    compute_dtype=None,
    fused_adamw: dict = None,
    label_smoothing: float = 0.0,
    augment_fn=None,
    grad_accum: int = 1,
    use_dropout: bool = False,
    forward_fn=None,
    zero1_like=None,
    distill: dict = None,
):
    """Data-parallel train step for Pallas-kernel op paths (e.g.
    'fused_train'), which GSPMD cannot partition: per-shard value_and_grad
    under shard_map with pmean'd loss/grads (the one collective), optimizer
    update on replicated params outside.  Params and optimizer state stay
    replicated; the batch splits over 'dp'.

    ``remat`` defaults OFF: the fused_train backward megakernels already
    recompute in VMEM, and jax.checkpoint on top redoes the forward
    (+25%/step measured — CLAUDE.md).  Pass remat=True only for jnp op
    tables that need activation rematerialization.

    ``fused_adamw`` (dict with lr/b1/b2/eps/weight_decay) swaps optax for
    the in-place Pallas AdamW kernel; state is then ``(count, mu, nu)``
    from :func:`init_fused_adamw_state`.

    ``augment_fn`` runs per shard on the local batch (rng decorrelated
    across shards via the dp index; mixup/cutmix partners therefore come
    from the same shard) and adds an rng argument to the step.
    ``grad_accum`` accumulates over microbatches of the LOCAL batch.
    ``use_dropout`` threads a per-step rng into the forward (cfg.dropout /
    cfg.drop_path through the fused_train kernels' in-kernel regularizers;
    the rng decorrelates across dp shards like augment's).

    ``zero1_like`` = ``(params_like, opt_state_like)`` enables ZeRO-1:
    the optimizer state shards over dp (``_opt_state_shardings`` with
    zero1=True) while params stay replicated — the kernels inside the
    shard_map see full params, but the optax update outside it runs
    dp-sharded, and GSPMD all-gathers only the applied updates.

    ``distill`` (dict with teacher_fwd/alpha/hard/tau) swaps the loss for
    DeiT distillation (:func:`_make_distill_loss_fn`): the student runs the
    separate-head forward through ``ops`` and the frozen teacher closure
    runs inside the same shard_map shard — this is what lets
    ``--distill-teacher`` ride the fused_train kernels end-to-end.
    """
    from jax.sharding import PartitionSpec as P

    if distill is not None:
        if augment_fn is not None or use_dropout or forward_fn is not None:
            raise ValueError(
                "distillation composes with none of augment/dropout/"
                "forward_fn on the shard_map path (train_setup guards this)"
            )
        loss_fn = _make_distill_loss_fn(
            cfg, ops, remat, compute_dtype,
            distill["teacher_fwd"], distill["alpha"], distill["hard"],
            distill["tau"], label_smoothing,
        )
    else:
        loss_fn = _make_loss_fn(
            cfg, ops, remat, compute_dtype,
            0.0 if augment_fn is not None else label_smoothing,
            forward_fn=forward_fn,
        )
    needs_rng = augment_fn is not None or use_dropout

    def local(params, images, labels, rng=None):
        if rng is not None:
            rng = jax.random.fold_in(rng, jax.lax.axis_index("dp"))
        if augment_fn is not None:
            if use_dropout:
                k_aug, rng = jax.random.split(rng)
            else:
                k_aug, rng = rng, None
            images, labels = augment_fn(k_aug, images, labels)
        loss, grads = _value_and_grad_accum(
            loss_fn, params, images, labels, grad_accum,
            rng if use_dropout else None,
        )
        loss = jax.lax.pmean(loss, "dp")
        grads = jax.tree.map(lambda g: jax.lax.pmean(g, "dp"), grads)
        return loss, grads

    in_specs = (P(), P("dp"), P("dp")) + ((P(),) if needs_rng else ())
    grad_fn = jax.shard_map(
        local,
        mesh=mesh,
        in_specs=in_specs,
        out_specs=(P(), P()),
        check_vma=False,
    )

    if fused_adamw is not None:
        from vit_tpu.ops.pallas.adamw_kernel import adamw_update

        lr = fused_adamw["lr"]

        def step(params, opt_state, images, labels, *rng):
            loss, grads = grad_fn(params, images, labels, *rng)
            count, mu, nu = opt_state
            step_no = count + 1
            lr_t = lr(step_no) if callable(lr) else lr
            params, mu, nu = adamw_update(
                grads, params, mu, nu, step_no, lr_t,
                b1=fused_adamw.get("b1", 0.9),
                b2=fused_adamw.get("b2", 0.999),
                eps=fused_adamw.get("eps", 1e-8),
                weight_decay=fused_adamw.get("weight_decay", 0.0),
            )
            return params, (step_no, mu, nu), loss

    else:

        def step(params, opt_state, images, labels, *rng):
            loss, grads = grad_fn(params, images, labels, *rng)
            updates, opt_state = optimizer.update(grads, opt_state, params)
            params = optax.apply_updates(params, updates)
            return params, opt_state, loss

    jit_kw = {}
    if zero1_like is not None:
        params_like, opt_state_like = zero1_like
        rep = replicate(mesh)
        p_shard = jax.tree.map(lambda _: rep, params_like)
        o_shard = _opt_state_shardings(
            opt_state_like, params_like, p_shard, mesh, zero1=True
        )
        data_sh = (batch_sharding(mesh, 4), batch_sharding(mesh, 1))
        if needs_rng:
            data_sh = data_sh + (rep,)
        jit_kw = dict(
            in_shardings=(p_shard, o_shard) + data_sh,
            out_shardings=(p_shard, o_shard, rep),
        )
    return jax.jit(
        step,
        donate_argnums=(0, 1),
        compiler_options=kernel_backward_compiler_options(),
        **jit_kw,
    )


def jit_train_step_kernel_tp(
    cfg: ViTConfig,
    optimizer: optax.GradientTransformation,
    mesh,
    params_like: Any,
    opt_state_like: Any,
    remat: bool = False,
    compute_dtype=None,
    gelu_variant: str = "exact",
    label_smoothing: float = 0.0,
    zero1: bool = False,
):
    """Tensor-parallel training THROUGH the fused Pallas kernels: the
    forward is parallel/tp_forward's shard_map (local-head attention
    kernels, psum epilogues), whose pallas_calls carry custom VJPs backed
    by the backward megakernels — jax.grad transposes the shard_map, so
    tp-sharded params get tp-sharded grads and replicated leaves get
    psum'd cotangents automatically.  Batch shards over 'dp'."""
    from vit_tpu.parallel import batch_sharding, param_shardings
    from vit_tpu.parallel.tp_forward import shard_forward_tp

    fwd = shard_forward_tp(cfg, mesh, "fused", params_like, gelu_variant)

    def loss_fn(params, images, labels):
        def run(p, x):
            if compute_dtype is not None:
                p = vit.cast_params(p, compute_dtype)
                x = x.astype(compute_dtype)
            return fwd(p, x)

        if remat:
            run = jax.checkpoint(run)
        return cross_entropy_loss(run(params, images), labels, label_smoothing)

    def step(params, opt_state, images, labels):
        loss, grads = jax.value_and_grad(loss_fn)(params, images, labels)
        updates, opt_state = optimizer.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, loss

    p_shard = param_shardings(mesh, params_like)
    o_shard = _opt_state_shardings(
        opt_state_like, params_like, p_shard, mesh, zero1=zero1
    )
    return jax.jit(
        step,
        in_shardings=(p_shard, o_shard, batch_sharding(mesh, 4), batch_sharding(mesh, 1)),
        out_shardings=(p_shard, o_shard, replicate(mesh)),
        donate_argnums=(0, 1),
        compiler_options=kernel_backward_compiler_options(),
    )


def _opt_state_shardings(opt_state, params, p_shard, mesh, zero1=False):
    """Shard optimizer-state leaves like their corresponding params when the
    shapes line up (adam mu/nu mirror param shapes); replicate everything
    else (step counts etc.).

    ``zero1`` additionally shards each param-shaped state leaf over the
    'dp' mesh axis on its largest still-free axis (parallel/sharding.py
    ``zero1_pspec`` — the ZeRO-1 optimizer-state partition, Rajbhandari et
    al. 2019 §5.1).  Params stay replicated over dp; GSPMD materializes
    the ZeRO dataflow from the shardings alone: the dp grad all-reduce
    becomes a reduce-scatter into the sharded moment update plus an
    all-gather of the applied updates.  Cuts optimizer HBM ~dp× — at
    ViT-H scale (632M params) adam mu/nu are 5.1 GB replicated, 0.64 GB
    on an 8-way dp mesh.
    """
    from vit_tpu.parallel.sharding import zero1_pspec

    dp_size = dict(zip(mesh.axis_names, mesh.devices.shape)).get("dp", 1)
    param_leaves = jax.tree.leaves(params)
    shard_leaves = jax.tree.leaves(p_shard)
    by_shape = {}
    for leaf, s in zip(param_leaves, shard_leaves):
        key = (leaf.shape, leaf.dtype)
        if zero1:
            s = NamedSharding(
                mesh, zero1_pspec(s.spec, leaf.shape, mesh.axis_names, dp_size)
            )
        by_shape.setdefault(key, s)

    rep = replicate(mesh)

    def rule(leaf):
        return by_shape.get((getattr(leaf, "shape", None), getattr(leaf, "dtype", None)), rep)

    return jax.tree.map(rule, opt_state)


def init_train_state(
    key: jax.Array,
    cfg: ViTConfig,
    optimizer: optax.GradientTransformation,
    dtype=jnp.float32,
) -> Tuple[Any, Any]:
    params = vit.init_params(key, cfg, dtype)
    opt_state = optimizer.init(params)
    return params, opt_state
