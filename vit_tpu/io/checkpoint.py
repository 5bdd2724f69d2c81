"""Framework-native checkpointing for params/optimizer pytrees.

The reference's only "checkpoint" is the raw Weight_*.bin dump (SURVEY.md
§5); this module adds a first-class format for the TPU framework: a single
``.npz`` with dotted-path keys (portable, zero dependencies), plus Orbax
for sharded/async multi-host checkpoints when available.
"""

from __future__ import annotations

from pathlib import Path
from typing import Any, Dict

import numpy as np


def _flatten(tree: Any, prefix: str = "") -> Dict[str, np.ndarray]:
    out: Dict[str, np.ndarray] = {}
    if isinstance(tree, dict):
        for k, v in sorted(tree.items()):
            out.update(_flatten(v, f"{prefix}{k}/"))
    else:
        out[prefix[:-1]] = np.asarray(tree)
    return out


def _unflatten(flat: Dict[str, np.ndarray]) -> Any:
    tree: Dict[str, Any] = {}
    for path, value in flat.items():
        node = tree
        parts = path.split("/")
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        node[parts[-1]] = value
    return tree


def save_npz(tree: Any, path) -> None:
    """Save a (possibly nested-dict) pytree of arrays to one .npz file."""
    flat = _flatten(tree)
    np.savez(path, **flat)


def load_npz(path, dtype=None) -> Any:
    """Load a .npz checkpoint back into the nested-dict pytree."""
    with np.load(path) as z:
        flat = {k: (z[k].astype(dtype) if dtype else z[k]) for k in z.files}
    return _unflatten(flat)


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
