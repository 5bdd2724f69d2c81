"""Nested-dict pytree helpers shared across io/ops/runtime."""

from __future__ import annotations

from typing import Any, Dict

import numpy as np


def flatten_tree(tree: Any, prefix: str = "", sep: str = "/") -> Dict[str, Any]:
    """Nested dicts -> {'a/b/c': leaf}; leaves pass through unchanged."""
    out: Dict[str, Any] = {}
    if isinstance(tree, dict):
        for k, v in sorted(tree.items()):
            out.update(flatten_tree(v, f"{prefix}{k}{sep}", sep))
    else:
        out[prefix[: -len(sep)]] = tree
    return out


def unflatten_tree(flat: Dict[str, Any], sep: str = "/") -> Any:
    """Inverse of flatten_tree."""
    tree: Dict[str, Any] = {}
    for path, value in flat.items():
        node = tree
        parts = path.split(sep)
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        node[parts[-1]] = value
    return tree


def cast_tree(tree: Any, dtype) -> Any:
    """Cast every array leaf of a nested-dict tree to ``dtype``."""
    if isinstance(tree, dict):
        return {k: cast_tree(v, dtype) for k, v in tree.items()}
    return tree.astype(dtype)
