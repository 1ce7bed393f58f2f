"""Return / advantage estimators over (T, B) rollout columns.

Three modes:

- ``negamax_gae``: GAE(lambda) in the MOVER's perspective for zero-sum
  self-play — the default for learning runs.  The reference's absolute
  credit (SURVEY.md Q5: one shared net, both sides' transitions in one
  stream, only the winner's final move rewarded, no negation) makes the
  value function perspective-free: V(s) estimates "someone eventually
  wins" (~constant), advantages vanish, and the discounted +1 flows back
  through BOTH players' moves — reinforcing the loser's path to the
  loss.  Measured on a 500-update / 131M-step afterstate4096 run: league
  win-rate flat at ~0.17 (docs/learning_absolute_perspective.jsonl).
  The fix is the standard two-player trick: value and advantage are
  defined for the player to move, and the bootstrap/advantage recursions
  NEGATE whenever the mover changes between consecutive steps.
- ``gae``: standard single-perspective GAE(lambda) with bootstrap, per
  env column (fixes reference quirks Q3 — no GAE — and Q6 — returns
  bleeding across interleaved envs, src/agent/ppo_agent.py:206-216 +
  train.py:64-66).
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


def negamax_gae(rewards, values, dones, flips, last_value,
                gamma: float, lam: float):
    """Mover-perspective GAE for alternating zero-sum self-play.

    Args:
      rewards: (T, B) mover-perspective step rewards (the winner's final
        move carries +r; invalid-action -1 hits the retrying mover).
      values:  (T, B) V(s_t) — the net's value of s_t FOR THE MOVER of
        s_t (the 198-feature one-hot marks the mover).
      dones:   (T, B).
      flips:   (T, B) bool — mover changes between t and t+1 (normal
        half-turn / auto-pass: True; invalid-action retry: False).
      last_value: (B,) V(s_T) for s_T's mover.

    delta_t = r_t + gamma * s_t * V(s_{t+1}) * nd_t - V(s_t)
    A_t     = delta_t + gamma * lam * s_t * nd_t * A_{t+1}
    with s_t = -1 where the mover flips (the opponent's good fortune is
    our loss), +1 otherwise.  Returns (advantages, value targets)."""
    nd = 1.0 - dones.astype(jnp.float32)
    sign = jnp.where(flips, -1.0, 1.0)

    def scan_fn(carry, xs):
        adv_next, v_next = carry
        r, v, s, n = xs
        delta = r + gamma * s * v_next * n - v
        adv = delta + gamma * lam * s * n * adv_next
        return (adv, v), adv

    (_, _), advs = jax.lax.scan(
        scan_fn,
        (jnp.zeros_like(last_value), last_value),
        (rewards, values, sign, nd),
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
