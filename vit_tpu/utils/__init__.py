"""Shared utilities (pytree helpers)."""

from vit_tpu.utils.tree import cast_tree, flatten_tree, unflatten_tree

__all__ = ["cast_tree", "flatten_tree", "unflatten_tree"]
