"""End-to-end convergence gates, one per trainer family.

Loss-decrease checks (the round-2 gates) can pass with a partially
detached or mis-scaled gradient; these tests demand actual memorization —
overfit 32 fixed synthetic images to >=95% train top-1 within a bounded
step budget — which fails loudly when any part of the gradient is wrong
(demonstrated by the injected wrong-sign-encoder-gradient control below,
which stays at chance accuracy under the identical budget).

The reference has no training at all (SURVEY.md §5 checkpoint/resume);
the oracle-gating convention here follows CLAUDE.md.
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from vit_tpu.config import VIT_B_16
from vit_tpu.models import vit
from vit_tpu.ops.dispatch import get_ops
from vit_tpu.runtime import trainer

STEPS = 40  # prototyped: every healthy family reaches 100% by step ~10
GATE = 0.95
LR = 3e-3


def _tiny(depth, num_classes, name):
    return dataclasses.replace(
        VIT_B_16, depth=depth, embed_dim=64, num_heads=4, image_size=32,
        patch_size=16, num_classes=num_classes, name=name,
    )


def _data(cfg, n=32, seed=0):
    rng = np.random.default_rng(seed)
    x = jnp.asarray(
        rng.normal(size=(n, 3, cfg.image_size, cfg.image_size)), jnp.float32
    )
    y = jnp.asarray(np.arange(n) % cfg.num_classes, jnp.int32)
    return x, y


def _train_to_gate(cfg, step_fn, params, opt_state, x, y, check_every=10):
    """Run up to STEPS, returning the best train top-1 seen at checkpoints."""
    fwd = jax.jit(vit.logits_fn(cfg))
    best = 0.0
    for i in range(STEPS):
        params, opt_state, loss = step_fn(params, opt_state, x, y)
        if (i + 1) % check_every == 0:
            acc = float(
                (np.asarray(fwd(params, x)).argmax(-1) == np.asarray(y)).mean()
            )
            best = max(best, acc)
            if best >= GATE:
                break
    assert np.isfinite(float(loss)), "loss went non-finite"
    return best


@pytest.mark.parametrize("ops_name", ["xla", "fused_train", "qat"])
def test_single_device_family_converges(ops_name):
    cfg = _tiny(2, 11, f"vit_tiny_conv_{ops_name}")
    x, y = _data(cfg)
    opt = optax.adamw(LR)
    params, opt_state = trainer.init_train_state(jax.random.key(0), cfg, opt)
    step = jax.jit(
        trainer.make_train_step(cfg, opt, get_ops(ops_name), remat=False)
    )
    best = _train_to_gate(cfg, step, params, opt_state, x, y)
    assert best >= GATE, f"{ops_name}: best train top-1 {best:.3f} < {GATE}"


def test_sp_converges():
    from jax.sharding import Mesh

    from vit_tpu.parallel.sequence import make_sp_train_step

    if jax.device_count() < 4:
        pytest.skip("needs 4 virtual devices")
    cfg = _tiny(3, 13, "vit_tiny_conv_sp")  # 5 tokens over sp=4, ragged
    x, y = _data(cfg)
    opt = optax.adamw(LR)
    params, opt_state = trainer.init_train_state(jax.random.key(0), cfg, opt)
    mesh = Mesh(np.array(jax.devices()[:4]), ("sp",))
    step = make_sp_train_step(cfg, opt, mesh)
    best = _train_to_gate(cfg, step, params, opt_state, x, y)
    assert best >= GATE, f"sp: best train top-1 {best:.3f} < {GATE}"


def test_pp_converges():
    from jax.sharding import Mesh, NamedSharding, PartitionSpec

    from vit_tpu.parallel.pipeline import make_pp_train_step, pp_param_pspecs

    if jax.device_count() < 2:
        pytest.skip("needs 2 virtual devices")
    cfg = _tiny(4, 11, "vit_tiny_conv_pp")
    x, y = _data(cfg)
    opt = optax.adamw(LR)
    params, _ = trainer.init_train_state(jax.random.key(0), cfg, opt)
    mesh = Mesh(np.array(jax.devices()[:2]), ("pp",))
    params = jax.device_put(
        params,
        jax.tree.map(
            lambda s: NamedSharding(mesh, s), pp_param_pspecs(params),
            is_leaf=lambda s: isinstance(s, PartitionSpec),
        ),
    )
    opt_state = opt.init(params)
    step = make_pp_train_step(cfg, opt, mesh, num_microbatches=4)
    best = _train_to_gate(cfg, step, params, opt_state, x, y)
    assert best >= GATE, f"pp: best train top-1 {best:.3f} < {GATE}"


def _wrong_sign_on_blocks():
    """The injected bug: encoder-block gradients with flipped sign — the
    exact failure class of a transposition mistake in a hand-written VJP.
    Uniform grad scaling would be laundered by Adam's per-parameter
    normalization; a sign error is not."""

    def init(params):
        return ()

    def update(updates, state, params=None):
        updates = dict(updates)
        updates["blocks"] = jax.tree.map(lambda g: -g, updates["blocks"])
        return updates, state

    return optax.GradientTransformation(init, update)


def test_convergence_gate_catches_injected_grad_bug():
    """Negative control: under the identical budget, a wrong-sign encoder
    gradient must NOT pass the gate — proving the gate has teeth (a
    loss-decrease check alone can be fooled; this cannot)."""
    cfg = _tiny(2, 11, "vit_tiny_conv_bug")
    x, y = _data(cfg)
    opt = optax.chain(_wrong_sign_on_blocks(), optax.adamw(LR))
    params, opt_state = trainer.init_train_state(jax.random.key(0), cfg, opt)
    step = jax.jit(
        trainer.make_train_step(cfg, opt, get_ops("xla"), remat=False)
    )
    fwd = jax.jit(vit.logits_fn(cfg))
    for _ in range(STEPS):
        params, opt_state, _loss = step(params, opt_state, x, y)
    acc = float((np.asarray(fwd(params, x)).argmax(-1) == np.asarray(y)).mean())
    assert acc < GATE, (
        f"injected wrong-sign gradient still reached {acc:.3f} — the "
        "convergence gate would not detect a broken backward"
    )


def test_kernel_tp_converges():
    """Tensor-parallel training THROUGH the fused kernels (custom-VJP
    pallas calls under shard_map) must also pass the memorization gate."""
    from jax.sharding import Mesh

    from vit_tpu.parallel import param_shardings, shard_params

    if jax.device_count() < 2:
        pytest.skip("needs 2 virtual devices")
    cfg = _tiny(2, 11, "vit_tiny_conv_ktp")
    x, y = _data(cfg)
    opt = optax.adamw(LR)
    params, opt_state = trainer.init_train_state(jax.random.key(0), cfg, opt)
    mesh = Mesh(np.array(jax.devices()[:2]).reshape(1, 2), ("dp", "tp"))
    params = shard_params(params, mesh)
    opt_state = jax.device_put(
        opt_state,
        trainer._opt_state_shardings(
            opt_state, params, param_shardings(mesh, params), mesh
        ),
    )
    step = trainer.jit_train_step_kernel_tp(
        cfg, opt, mesh, params, opt_state, remat=False
    )
    best = _train_to_gate(cfg, step, params, opt_state, x, y)
    assert best >= GATE, f"kernel-tp: best train top-1 {best:.3f} < {GATE}"


def test_fused_train_with_regularizers_converges():
    """The regularized fused_train path (in-kernel dropout + stochastic
    depth) must still memorize — a wrong mask gate in any backward kernel
    stalls this exactly like the injected-bug control."""
    cfg = dataclasses.replace(
        _tiny(2, 11, "vit_tiny_conv_reg"), dropout=0.1, drop_path=0.1
    )
    x, y = _data(cfg)
    opt = optax.adamw(LR)
    params, opt_state = trainer.init_train_state(jax.random.key(0), cfg, opt)
    raw = jax.jit(
        trainer.make_train_step(
            cfg, opt, get_ops("fused_train"), remat=False, use_dropout=True
        )
    )
    key = jax.random.key(7)

    def step(params, opt_state, x, y, _box=[0]):
        _box[0] += 1
        return raw(params, opt_state, x, y, jax.random.fold_in(key, _box[0]))

    # eval through the clean (no-dropout) forward, as at deployment
    best = _train_to_gate(cfg, step, params, opt_state, x, y)
    assert best >= GATE, f"regularized fused_train: top-1 {best:.3f} < {GATE}"


def test_tome_train_converges():
    """Train-time ToMe on the fused kernels must memorize: a wrong merge
    transpose or a biased-probs mismatch in kernel A's VJP stalls this."""
    from vit_tpu.models import tome as tome_model

    cfg = dataclasses.replace(
        _tiny(2, 11, "vit_tiny_conv_tome"), image_size=64, patch_size=8
    )  # 65 tokens: room to merge
    x, y = _data(cfg)
    opt = optax.adamw(LR)
    params, opt_state = trainer.init_train_state(jax.random.key(0), cfg, opt)
    step = jax.jit(
        trainer.make_train_step(
            cfg, opt, get_ops("fused_train"), remat=False,
            forward_fn=lambda p, im: tome_model.forward_train(p, im, cfg, 4),
        )
    )
    best = _train_to_gate(cfg, step, params, opt_state, x, y)
    assert best >= GATE, f"tome train: best top-1 {best:.3f} < {GATE}"
