"""Backgammon MLP actor-critic as plain parameter pytrees + pure fns.

Architecture parity with the reference network
(/root/reference/src/agent/policy_network.py:44-75): 198 -> hidden
(ReLU) -> {action logits (A), state value (1)}.  We add a third head,
``score`` (1), used by the afterstate policy (scoring each candidate
afterstate — the TD-Gammon-style evaluation the reference computed
features for but never used, SURVEY.md Q1).

Initialization mirrors torch ``nn.Linear`` defaults
(U(-1/sqrt(fan_in), 1/sqrt(fan_in)) for weights and biases) so learning
curves are comparable.  Params are float32; forward compute can run in
bfloat16 on the MXU with float32 accumulation.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp

from ..core.constants import FEATURE_DIM


@dataclasses.dataclass(frozen=True)
class ModelConfig:
    input_size: int = FEATURE_DIM
    hidden_size: int = 128          # reference HIDDEN_SIZE (config.py:8)
    action_size: int = 500          # reference max_legal_moves (env :68)
    compute_dtype: str = "float32"  # "bfloat16" for MXU-friendly inference


def _linear_init(key, fan_in, fan_out):
    kw, kb = jax.random.split(key)
    bound = 1.0 / jnp.sqrt(jnp.float32(fan_in))
    w = jax.random.uniform(kw, (fan_in, fan_out), jnp.float32, -bound, bound)
    b = jax.random.uniform(kb, (fan_out,), jnp.float32, -bound, bound)
    return {"w": w, "b": b}


def init_params(key, cfg: ModelConfig):
    k1, k2, k3, k4 = jax.random.split(key, 4)
    return {
        "fc1": _linear_init(k1, cfg.input_size, cfg.hidden_size),
        "action": _linear_init(k2, cfg.hidden_size, cfg.action_size),
        "value": _linear_init(k3, cfg.hidden_size, 1),
        "score": _linear_init(k4, cfg.hidden_size, 1),
    }


def _dense(p, x, dtype):
    return x.astype(dtype) @ p["w"].astype(dtype) + p["b"].astype(dtype)


def trunk(params, x, cfg: ModelConfig):
    dt = jnp.dtype(cfg.compute_dtype)
    return jax.nn.relu(_dense(params["fc1"], x, dt))


def forward(params, x, cfg: ModelConfig):
    """(..., 198) -> (logits (..., A), value (...,)) — reference forward
    (policy_network.py:58-75)."""
    h = trunk(params, x, cfg)
    logits = _dense(params["action"], h, h.dtype).astype(jnp.float32)
    value = _dense(params["value"], h, h.dtype).astype(jnp.float32)[..., 0]
    return logits, value


def value(params, x, cfg: ModelConfig):
    """(..., 198) -> (...,) state/afterstate value via the value head."""
    h = trunk(params, x, cfg)
    return _dense(params["value"], h, h.dtype).astype(jnp.float32)[..., 0]


def score(params, x, cfg: ModelConfig):
    """(..., 198) -> (...,) afterstate policy score (logit per candidate)."""
    h = trunk(params, x, cfg)
    return _dense(params["score"], h, h.dtype).astype(jnp.float32)[..., 0]
