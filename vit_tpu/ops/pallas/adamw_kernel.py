"""Fused in-place AdamW update kernel.

optax's adamw lowers to several elementwise passes plus a separate
``apply_updates`` add — ~4 ms of the B/16 batch-64 train step.  This kernel
does the whole update (moment updates, bias correction, decoupled weight
decay, parameter write) in ONE pass per leaf with the parameter/moment
buffers aliased in place (``input_output_aliases``), which is the HBM floor:
read g+p+m+v, write p+m+v.

Math matches ``optax.adamw`` exactly (scale_by_adam with eps_root=0 +
add_decayed_weights + scale(-lr)); parity is gated in
tests/test_adamw_kernel.py.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# leaves smaller than this (or not 128-divisible) take the jnp path —
# kernel launch overhead beats the fusion win there
_MIN_KERNEL_SIZE = 1 << 15
_LANES = 128


def _adamw_kernel(sc_ref, g_ref, p_ref, m_ref, v_ref, p_out, m_out, v_out,
                  *, b1, b2, eps, wd):
    lr = sc_ref[0, 0]
    bc1 = sc_ref[0, 1]  # 1 / (1 - b1^t)
    bc2 = sc_ref[0, 2]  # 1 / (1 - b2^t)
    g = g_ref[:].astype(jnp.float32)
    m = b1 * m_ref[:] + (1.0 - b1) * g
    v = b2 * v_ref[:] + (1.0 - b2) * (g * g)
    p = p_ref[:].astype(jnp.float32)
    upd = (m * bc1) / (jnp.sqrt(v * bc2) + eps) + wd * p
    p_out[:] = (p - lr * upd).astype(p_out.dtype)
    m_out[:] = m
    v_out[:] = v


def _adamw_jnp(g, p, m, v, lr, bc1, bc2, b1, b2, eps, wd):
    g = g.astype(jnp.float32)
    m = b1 * m + (1.0 - b1) * g
    v = b2 * v + (1.0 - b2) * (g * g)
    upd = (m * bc1) / (jnp.sqrt(v * bc2) + eps) + wd * p.astype(jnp.float32)
    return (p.astype(jnp.float32) - lr * upd).astype(p.dtype), m, v


def _leaf_update(g, p, m, v, scalars, b1, b2, eps, wd, interpret):
    n = p.size
    if n < _MIN_KERNEL_SIZE or n % _LANES:
        lr, bc1, bc2 = scalars[0, 0], scalars[0, 1], scalars[0, 2]
        return _adamw_jnp(g, p, m, v, lr, bc1, bc2, b1, b2, eps, wd)
    rows = n // _LANES
    block_rows = min(rows, 4096)
    shape2 = (rows, _LANES)
    grid = (pl.cdiv(rows, block_rows),)
    row_spec = pl.BlockSpec((block_rows, _LANES), lambda i: (i, 0),
                            memory_space=pltpu.VMEM)
    p_new, m_new, v_new = pl.pallas_call(
        functools.partial(_adamw_kernel, b1=b1, b2=b2, eps=eps, wd=wd),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, 4), lambda i: (0, 0), memory_space=pltpu.SMEM),
            row_spec, row_spec, row_spec, row_spec,
        ],
        out_specs=(row_spec, row_spec, row_spec),
        out_shape=(
            jax.ShapeDtypeStruct(shape2, p.dtype),
            jax.ShapeDtypeStruct(shape2, jnp.float32),
            jax.ShapeDtypeStruct(shape2, jnp.float32),
        ),
        # in-place: p, m, v buffers are reused for the outputs
        input_output_aliases={2: 0, 3: 1, 4: 2},
        interpret=interpret,
    )(
        scalars,
        g.reshape(shape2),
        p.reshape(shape2),
        m.reshape(shape2),
        v.reshape(shape2),
    )
    return p_new.reshape(p.shape), m_new.reshape(p.shape), v_new.reshape(p.shape)


def adamw_update(
    grads, params, mu, nu, step, lr,
    b1=0.9, b2=0.999, eps=1e-8, weight_decay=0.0, interpret=None,
):
    """One AdamW step over a pytree: -> (new_params, new_mu, new_nu).

    ``step`` is the 1-based step number (traced ok); ``lr`` a scalar.
    mu/nu are fp32 trees shaped like params.
    """
    if interpret is None:
        from vit_tpu.ops.pallas import interpret_default

        interpret = interpret_default()
    t = step.astype(jnp.float32) if hasattr(step, "astype") else float(step)
    bc1 = 1.0 / (1.0 - b1**t)
    bc2 = 1.0 / (1.0 - b2**t)
    scalars = jnp.stack(
        [jnp.float32(lr), jnp.float32(bc1), jnp.float32(bc2), jnp.float32(0)]
    ).reshape(1, 4)

    flat_g, treedef = jax.tree.flatten(grads)
    flat_p = treedef.flatten_up_to(params)
    flat_m = treedef.flatten_up_to(mu)
    flat_v = treedef.flatten_up_to(nu)
    out_p, out_m, out_v = [], [], []
    for g, p, m, v in zip(flat_g, flat_p, flat_m, flat_v):
        pn, mn, vn = _leaf_update(
            g, p, m, v, scalars, b1, b2, eps, weight_decay, interpret
        )
        out_p.append(pn)
        out_m.append(mn)
        out_v.append(vn)
    return (
        jax.tree.unflatten(treedef, out_p),
        jax.tree.unflatten(treedef, out_m),
        jax.tree.unflatten(treedef, out_v),
    )
