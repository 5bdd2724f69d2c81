"""Framework-native checkpointing for params/optimizer pytrees.

The reference's only "checkpoint" is the raw Weight_*.bin dump (SURVEY.md
§5); this module adds a first-class format for the TPU framework: a single
``.npz`` with dotted-path keys (portable, zero dependencies), plus Orbax
for sharded/async multi-host checkpoints when available.
"""

from __future__ import annotations

from pathlib import Path
from typing import Any

import numpy as np

from vit_tpu.utils import flatten_tree, unflatten_tree


def _savez_exact(path, **arrays) -> None:
    """np.savez to EXACTLY ``path``: bare np.savez silently appends '.npz'
    to a suffixless name, so '--save-state ckpt' would write 'ckpt.npz'
    while the log and a later '--resume ckpt' refer to 'ckpt'.  Writing
    through an open file handle pins the name."""
    with open(path, "wb") as fh:
        np.savez(fh, **arrays)


def save_npz(tree: Any, path) -> None:
    """Save a (possibly nested-dict) pytree of arrays to one .npz file."""
    flat = {k: np.asarray(v) for k, v in flatten_tree(tree).items()}
    _savez_exact(path, **flat)


def load_npz(path, dtype=None) -> Any:
    """Load a .npz checkpoint back into the nested-dict pytree."""
    with np.load(path) as z:
        flat = {k: (z[k].astype(dtype) if dtype else z[k]) for k in z.files}
    return unflatten_tree(flat)


def save_train_state(params: Any, opt_state: Any, step: int, path) -> None:
    """Checkpoint a full training state (params + optimizer + step) to one
    .npz — the resume story the reference lacks entirely (its only
    persistence is the Weight_*.bin dump, SURVEY.md §5).  Optimizer states
    are arbitrary pytrees (optax namedtuples, the fused-AdamW tuple), so
    their leaves are stored positionally and restored against a
    same-structure template."""
    import jax

    flat_p = {
        f"params.{k}": np.asarray(v) for k, v in flatten_tree(params).items()
    }
    flat_o = {
        f"opt.{i}": np.asarray(x) for i, x in enumerate(jax.tree.leaves(opt_state))
    }
    _savez_exact(path, __step__=np.int64(step), **flat_p, **flat_o)


def is_train_state(path) -> bool:
    """True when ``path`` is a save_train_state archive (params + optimizer
    + step) rather than a bare params .npz."""
    with np.load(path) as z:
        return "__step__" in z.files


def load_params_from_state(path, dtype=None) -> Any:
    """Extract just the params pytree from a save_train_state archive."""
    with np.load(path) as z:
        flat = {
            k[len("params."):]: (z[k].astype(dtype) if dtype else z[k])
            for k in z.files if k.startswith("params.")
        }
    return unflatten_tree(flat)


def peek_step(path) -> int:
    """Read just the step counter from a save_train_state archive —
    cheap (no tensor loads): callers need it before the full restore,
    e.g. to size an lr-schedule horizon around a resume."""
    with np.load(path) as z:
        if "__step__" not in z.files:
            raise ValueError(
                f"{path}: not a train-state archive (no __step__); "
                "was this saved with --save-state?"
            )
        return int(z["__step__"])


def load_train_state(path, opt_state_like: Any):
    """-> (params, opt_state, step).  ``opt_state_like`` provides the
    optimizer pytree structure (e.g. ``optimizer.init(params)``)."""
    import jax

    with np.load(path) as z:
        step = int(z["__step__"])
        params = unflatten_tree(
            {k[len("params."):]: z[k] for k in z.files if k.startswith("params.")}
        )
        template_leaves = jax.tree.leaves(opt_state_like)
        n_ckpt = sum(1 for k in z.files if k.startswith("opt."))
        if n_ckpt != len(template_leaves):
            # a leaf-COUNT mismatch must not restore a shape-coincident
            # prefix (mu/nu/count come first in most optax states) —
            # that is a semantically wrong optimizer state, silently
            raise ValueError(
                f"checkpoint has {n_ckpt} optimizer leaves, template has "
                f"{len(template_leaves)} (optimizer mismatch?)"
            )
        leaves = [z[f"opt.{i}"] for i in range(len(template_leaves))]
        for i, (got, want) in enumerate(zip(leaves, template_leaves)):
            if tuple(got.shape) != tuple(np.shape(want)):
                raise ValueError(
                    f"opt leaf {i}: checkpoint shape {got.shape} != "
                    f"template {np.shape(want)} (optimizer mismatch?)"
                )
        opt_state = jax.tree.unflatten(
            jax.tree.structure(opt_state_like), leaves
        )
    return params, opt_state, step


def save_orbax(tree: Any, path) -> None:
    """Orbax checkpoint (sharded arrays, async-capable, multi-host)."""
    import orbax.checkpoint as ocp

    ckptr = ocp.StandardCheckpointer()
    ckptr.save(Path(path).absolute(), tree)
    ckptr.wait_until_finished()


def load_orbax(path, like: Any = None) -> Any:
    import orbax.checkpoint as ocp

    ckptr = ocp.StandardCheckpointer()
    if like is not None:
        return ckptr.restore(Path(path).absolute(), target=like)
    return ckptr.restore(Path(path).absolute())
