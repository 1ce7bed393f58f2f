"""Return / advantage estimators over (T, B) rollout columns.

Two modes:

- ``gae``: standard GAE(lambda) with bootstrap, computed per env column
  (fixes reference quirks Q3 — no GAE — and Q6 — returns bleeding across
  interleaved envs, src/agent/ppo_agent.py:206-216 + train.py:64-66).
- ``mc_returns_ref``: the reference's plain reversed discounted sum with
  R=0 reset at dones and *no bootstrap* at the rollout boundary
  (ppo_agent.py:206-216), but correctly applied per env column.  Used by
  the parity preset.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def gae(rewards, values, dones, last_value, gamma: float, lam: float):
    """rewards/values/dones: (T, B); last_value: (B,) bootstrap V(s_T).

    Returns (advantages (T,B), returns (T,B))."""
    not_done = 1.0 - dones.astype(jnp.float32)

    def scan_fn(carry, xs):
        adv_next, v_next = carry
        r, v, nd = xs
        delta = r + gamma * v_next * nd - v
        adv = delta + gamma * lam * nd * adv_next
        return (adv, v), adv

    (_, _), advs = jax.lax.scan(
        scan_fn,
        (jnp.zeros_like(last_value), last_value),
        (rewards, values, not_done),
        reverse=True,
    )
    return advs, advs + values


def mc_returns_ref(rewards, dones, gamma: float):
    """Reference-style Monte-Carlo returns: reversed discounted sum, reset
    at done, zero bootstrap.  (T, B) -> (T, B)."""
    not_done = 1.0 - dones.astype(jnp.float32)

    def scan_fn(r_next, xs):
        r, nd = xs
        ret = r + gamma * r_next * nd
        return ret, ret

    _, rets = jax.lax.scan(
        scan_fn,
        jnp.zeros(rewards.shape[1], rewards.dtype),
        (rewards, not_done),
        reverse=True,
    )
    return rets
