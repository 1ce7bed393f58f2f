"""Full-train-state checkpointing (params, optimizer, PRNG, counters,
and env state) so resume is exact.

The reference saves model weights only (SURVEY.md §5.4,
/root/reference/src/agent/ppo_agent.py:377-488) which silently restarts
Adam moments and the entropy schedule on resume; we save everything.
Uses orbax if present, with a numpy ``.npz`` fallback."""

from __future__ import annotations

import os

import jax
import numpy as np


def _flatten(tree):
    leaves, treedef = jax.tree_util.tree_flatten(tree)
    return leaves, treedef


def save(path: str, tree) -> None:
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    try:
        import orbax.checkpoint as ocp  # type: ignore

        ckptr = ocp.StandardCheckpointer()
        ckptr.save(os.path.abspath(path), tree, force=True)
        ckptr.wait_until_finished()
        return
    except Exception:
        pass
    leaves, _ = _flatten(tree)
    np.savez(
        path if path.endswith(".npz") else path + ".npz",
        *[np.asarray(leaf) for leaf in leaves],
    )


def restore(path: str, like):
    """Restore a pytree with the same structure as ``like``."""
    try:
        import orbax.checkpoint as ocp  # type: ignore

        if os.path.isdir(path):
            ckptr = ocp.StandardCheckpointer()
            return ckptr.restore(os.path.abspath(path), target=like)
    except Exception:
        pass
    npz_path = path if path.endswith(".npz") else path + ".npz"
    data = np.load(npz_path)
    leaves, treedef = _flatten(like)
    new_leaves = [
        np.asarray(data[f"arr_{i}"]).astype(np.asarray(leaf).dtype)
        for i, leaf in enumerate(leaves)
    ]
    return jax.tree_util.tree_unflatten(treedef, new_leaves)


def latest(dirpath: str, prefix: str = "ckpt_"):
    """Newest checkpoint path under ``dirpath`` or None (resume-from-latest
    on restart, SURVEY.md §5.3)."""
    if not os.path.isdir(dirpath):
        return None
    cands = [
        f
        for f in os.listdir(dirpath)
        if f.startswith(prefix)
    ]
    if not cands:
        return None

    def step_of(f):
        stem = f[len(prefix):]
        stem = stem[:-4] if stem.endswith(".npz") else stem
        try:
            return int(stem)
        except ValueError:
            return -1

    best = max(cands, key=step_of)
    return os.path.join(dirpath, best)
