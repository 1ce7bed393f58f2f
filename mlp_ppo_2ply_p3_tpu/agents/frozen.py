"""Versioned frozen benchmark opponents for league evaluation.

The BASELINE quality metric is "win-rate vs pubeval", but the true
pubeval weight VALUES are unavailable without network egress
(agents.pubeval documents the gap), so the fixed-opponent story is
strengthened with a second, stronger fixed opponent: a committed
checkpoint of a trained value net, played greedily 1-ply
(agents.basic.greedy_1ply).  Round-3 VERDICT "Next round" #6.

The asset is self-describing (model config stored next to the weights),
so it keeps working when the training run under evaluation uses a
different hidden size.  ``league_eval`` (ppo.train) reports a
``win_rate_vs_frozen_v1`` column whenever the asset exists; quality is
then comparable across rounds.
"""

from __future__ import annotations

import os

import numpy as np

from ..models import mlp

# The committed v1 benchmark net: the final checkpoint of the round-4
# afterstate4096 learning run (docs/LEARNING.md), value head played
# greedy 1-ply.
FROZEN_V1_PATH = os.path.join(os.path.dirname(__file__), os.pardir,
                              "assets", "frozen_benchmark_v1.npz")

_LAYERS = ("fc1", "action", "value", "score")


def save_frozen(path: str, params, model_cfg: mlp.ModelConfig) -> None:
    """Write a self-describing frozen-opponent asset (named keys, not
    positional, so it is robust to pytree evolution)."""
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    arrays = {}
    for layer in _LAYERS:
        arrays[f"{layer}_w"] = np.asarray(params[layer]["w"])
        arrays[f"{layer}_b"] = np.asarray(params[layer]["b"])
    arrays["hidden_size"] = np.asarray(model_cfg.hidden_size)
    arrays["action_size"] = np.asarray(model_cfg.action_size)
    arrays["input_size"] = np.asarray(model_cfg.input_size)
    np.savez(path, **arrays)


def load_frozen(path: str = FROZEN_V1_PATH):
    """(params, ModelConfig) from a frozen asset, or None if absent."""
    if not os.path.exists(path):
        return None
    data = np.load(path)
    params = {
        layer: {
            "w": np.asarray(data[f"{layer}_w"]),
            "b": np.asarray(data[f"{layer}_b"]),
        }
        for layer in _LAYERS
    }
    cfg = mlp.ModelConfig(
        input_size=int(data["input_size"]),
        hidden_size=int(data["hidden_size"]),
        action_size=int(data["action_size"]),
    )
    return params, cfg
