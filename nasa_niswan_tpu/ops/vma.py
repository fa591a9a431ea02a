"""shard_map varying-manual-axes typing helpers (no model dependencies)."""

from __future__ import annotations

from typing import Any

import jax


def vary_like(tree, ref) -> Any:
    """Mark every leaf of ``tree`` as varying over the manual mesh axes of
    ``ref`` (shard_map varying-manual-axes typing): freshly created zeros are
    unvarying, which breaks scan-carry type agreement when the carry output
    is computed from sharded data.  No-op outside shard_map."""
    vma = tuple(getattr(jax.typeof(ref), "vma", ()) or ())
    if not vma:
        return tree

    def fix(z):
        have = tuple(getattr(jax.typeof(z), "vma", ()) or ())
        need = tuple(a for a in vma if a not in have)
        return jax.lax.pcast(z, need, to="varying") if need else z

    return jax.tree.map(fix, tree)
