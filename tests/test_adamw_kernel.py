"""Fused AdamW kernel vs optax.adamw (interpret mode on CPU)."""

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from vit_tpu.ops.pallas.adamw_kernel import adamw_update


def _tree_allclose(a, b, atol):
    for x, y in zip(jax.tree.leaves(a), jax.tree.leaves(b)):
        np.testing.assert_allclose(
            np.asarray(x, np.float32), np.asarray(y, np.float32),
            atol=atol, rtol=atol,
        )


@pytest.mark.parametrize("wd", [0.0, 0.05])
def test_matches_optax_adamw(wd):
    # leaves covering: kernel path (>=2^15, 128-divisible), jnp fallback
    # (small / non-divisible)
    key = jax.random.key(0)
    ks = jax.random.split(key, 6)
    params = {
        "big": jax.random.normal(ks[0], (64, 512), jnp.float32),  # kernel
        "mid": jax.random.normal(ks[1], (768,), jnp.float32),     # fallback
        "odd": jax.random.normal(ks[2], (1000,), jnp.float32),    # non-128
    }
    grads = {
        "big": jax.random.normal(ks[3], (64, 512), jnp.float32),
        "mid": jax.random.normal(ks[4], (768,), jnp.float32),
        "odd": jax.random.normal(ks[5], (1000,), jnp.float32),
    }
    lr = 1e-3
    opt = optax.adamw(lr, weight_decay=wd)
    state = opt.init(params)

    mu = jax.tree.map(lambda p: jnp.zeros_like(p), params)
    nu = jax.tree.map(lambda p: jnp.zeros_like(p), params)
    p_fused, p_opt = params, params
    for step in range(1, 4):  # multiple steps exercise bias correction
        updates, state = opt.update(grads, state, p_opt)
        p_opt = optax.apply_updates(p_opt, updates)
        p_fused, mu, nu = adamw_update(
            grads, p_fused, mu, nu, jnp.int32(step), lr,
            weight_decay=wd, interpret=True,
        )
    _tree_allclose(p_fused, p_opt, atol=1e-6)


def test_trainer_fused_adamw_step_matches_optax(tiny_cfg):
    from vit_tpu.ops.dispatch import get_ops
    from vit_tpu.runtime import trainer

    rng = np.random.default_rng(0)
    images = jnp.asarray(
        rng.normal(size=(4, 3, tiny_cfg.image_size, tiny_cfg.image_size)),
        jnp.float32,
    )
    labels = jnp.asarray(rng.integers(0, tiny_cfg.num_classes, 4), jnp.int32)
    opt = optax.adamw(1e-3, weight_decay=0.01)
    params, opt_state = trainer.init_train_state(jax.random.key(1), tiny_cfg, opt)

    step_opt = jax.jit(trainer.make_train_step(tiny_cfg, opt, get_ops("xla"),
                                               remat=False))
    p1, _, l1 = step_opt(params, opt_state, images, labels)

    fused_state = trainer.init_fused_adamw_state(params)
    step_fused = jax.jit(trainer.make_train_step_fused_adamw(
        tiny_cfg, 1e-3, get_ops("xla"), weight_decay=0.01,
    ))
    p2, (count, _, _), l2 = step_fused(params, fused_state, images, labels)

    assert int(count) == 1
    assert abs(float(l1) - float(l2)) < 1e-6
    _tree_allclose(p1, p2, atol=1e-6)


def test_lr_schedule_callable(tiny_cfg):
    from vit_tpu.ops.dispatch import get_ops
    from vit_tpu.runtime import trainer

    sched = optax.warmup_cosine_decay_schedule(0.0, 1e-3, 2, 10)
    step = jax.jit(trainer.make_train_step_fused_adamw(
        tiny_cfg, sched, get_ops("xla"),
    ))
    params = trainer.init_train_state(
        jax.random.key(2), tiny_cfg, optax.sgd(0.1)
    )[0]
    state = trainer.init_fused_adamw_state(params)
    rng = np.random.default_rng(1)
    images = jnp.asarray(
        rng.normal(size=(4, 3, tiny_cfg.image_size, tiny_cfg.image_size)),
        jnp.float32,
    )
    labels = jnp.asarray(rng.integers(0, tiny_cfg.num_classes, 4), jnp.int32)
    for _ in range(3):
        params, state, loss = step(params, state, images, labels)
    assert np.isfinite(float(loss))
