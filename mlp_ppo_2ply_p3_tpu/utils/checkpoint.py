"""Full-train-state checkpointing (params, optimizer, PRNG, counters,
and env state) so resume is exact.

The reference saves model weights only (SURVEY.md §5.4,
/root/reference/src/agent/ppo_agent.py:377-488) which silently restarts
Adam moments and the entropy schedule on resume; we save everything.
Uses orbax if present, with a numpy ``.npz`` fallback."""

from __future__ import annotations

import json
import os

import jax
import numpy as np


def _flatten(tree):
    leaves, treedef = jax.tree_util.tree_flatten(tree)
    return leaves, treedef


def _fingerprint(leaves, treedef) -> str:
    """Structure fingerprint stored beside the npz payload so a pytree
    evolution between save and restore fails LOUDLY instead of silently
    mis-restoring positional arrays (round-2 Weak #8)."""
    return json.dumps(
        {
            "treedef": str(treedef),
            "leaves": [
                [list(np.shape(x)), str(np.asarray(x).dtype)] for x in leaves
            ],
        }
    )


def save(path: str, tree, backend: str = "auto") -> None:
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    if backend == "auto":
        try:
            import orbax.checkpoint as ocp  # type: ignore

            ckptr = ocp.StandardCheckpointer()
            ckptr.save(os.path.abspath(path), tree, force=True)
            ckptr.wait_until_finished()
            return
        except Exception:
            pass
    leaves, treedef = _flatten(tree)
    np.savez(
        path if path.endswith(".npz") else path + ".npz",
        __fingerprint__=np.frombuffer(
            _fingerprint(leaves, treedef).encode(), dtype=np.uint8
        ),
        *[np.asarray(leaf) for leaf in leaves],
    )


def restore(path: str, like, backend: str = "auto"):
    """Restore a pytree with the same structure as ``like``; raises
    ValueError when the stored structure (treedef / shapes / dtypes)
    does not match ``like``."""
    if backend == "auto":
        try:
            import orbax.checkpoint as ocp  # type: ignore

            if os.path.isdir(path):
                ckptr = ocp.StandardCheckpointer()
                return ckptr.restore(os.path.abspath(path), target=like)
        except Exception:
            if os.path.isdir(path):
                raise
    npz_path = path if path.endswith(".npz") else path + ".npz"
    data = np.load(npz_path)
    leaves, treedef = _flatten(like)
    if "__fingerprint__" in data:
        stored = bytes(data["__fingerprint__"]).decode()
        expected = _fingerprint(leaves, treedef)
        if stored != expected:
            s, e = json.loads(stored), json.loads(expected)
            raise ValueError(
                f"checkpoint structure mismatch at {npz_path}: "
                f"saved {len(s['leaves'])} leaves "
                f"(treedef match: {s['treedef'] == e['treedef']}), "
                f"target expects {len(e['leaves'])}; first differing leaf: "
                f"{next((i for i, (a, b) in enumerate(zip(s['leaves'], e['leaves'])) if a != b), 'count')}"
            )
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
