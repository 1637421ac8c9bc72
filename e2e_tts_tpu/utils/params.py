"""Parameter introspection helpers (reference: models/__init__.py:9-37)."""

from __future__ import annotations

from typing import Any

import jax
import numpy as np


def get_param_num(params: Any) -> int:
    """Total parameter count of a pytree."""
    return sum(int(np.prod(l.shape)) for l in jax.tree_util.tree_leaves(params))


def show_params(params: Any, max_rows: int = 0) -> int:
    """Print name/shape per parameter; returns the total count."""
    flat = jax.tree_util.tree_flatten_with_path(params)[0]
    total = 0
    print("=" * 40, "Model Parameters", "=" * 40)
    for i, (kp, leaf) in enumerate(flat):
        if not max_rows or i < max_rows:
            print(jax.tree_util.keystr(kp), tuple(leaf.shape))
        total += int(np.prod(leaf.shape))
    print(f"[*] Parameter Size: {total}")
    print("=" * 100)
    return total


def param_summary(params: Any, depth: int = 1) -> dict:
    """Parameter counts grouped by top-level module path."""
    flat = jax.tree_util.tree_flatten_with_path(params)[0]
    groups: dict = {}
    for kp, leaf in flat:
        parts = [getattr(k, "key", str(k)) for k in kp][:depth]
        key = "/".join(parts)
        groups[key] = groups.get(key, 0) + int(np.prod(leaf.shape))
    return groups
