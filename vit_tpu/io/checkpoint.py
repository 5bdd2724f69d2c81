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


def save_npz(tree: Any, path) -> None:
    """Save a (possibly nested-dict) pytree of arrays to one .npz file."""
    flat = {k: np.asarray(v) for k, v in flatten_tree(tree).items()}
    np.savez(path, **flat)


def load_npz(path, dtype=None) -> Any:
    """Load a .npz checkpoint back into the nested-dict pytree."""
    with np.load(path) as z:
        flat = {k: (z[k].astype(dtype) if dtype else z[k]) for k in z.files}
    return unflatten_tree(flat)


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
