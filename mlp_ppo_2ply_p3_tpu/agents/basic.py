"""Basic action-selection policies over the batched env state.

All are pure functions ``(params?, state, key?) -> actions (B,)`` meant
to be called inside jitted rollout loops.

- ``random_actions``: uniform over the legal-move prefix.
- ``greedy_1ply``: argmax of the value head over candidate afterstates
  (TD-Gammon 1-ply; BASELINE config #1's agent).  The reference computed
  these afterstate features every step and never used them (SURVEY.md
  Q1); here they are the decision rule.
- ``index_policy``: the reference-style blind-index policy
  (obs -> 500 masked logits; src/agent/ppo_agent.py:138-191), sample or
  argmax.
- ``afterstate_policy``: softmax over score-head evaluations of the
  legal afterstates.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..env import bg_env
from ..models import mlp

NEG_INF = -1e9


def random_actions(state: bg_env.EnvState, key):
    b = state.n_moves.shape[0]
    u = jax.random.uniform(key, (b,))
    n = jnp.maximum(state.n_moves, 1)
    return (u * n).astype(jnp.int32) % n


def afterstate_values(params, state: bg_env.EnvState, mcfg: mlp.ModelConfig):
    """(B, M) value of each legal afterstate FOR THE MOVER.

    The value head is trained on states encoded for the player ABOUT TO
    MOVE (mover-perspective/negamax GAE, ppo.gae).  An afterstate has
    the OPPONENT to move next, so its mover-value is the negated value
    of the opponent's view: -V(opponent_view(after), mover=opp).
    Evaluating afterstates with mover=us (the pre-negamax convention)
    asks the net about a position where we move twice — measurably ~25
    win-rate points weaker vs the fixed baseline."""
    from ..core import features as F
    from ..core.board import opponent_view

    opp = opponent_view(state.after)                     # (B, M, 52)
    feats = jax.vmap(F.encode_canonical)(
        opp, (1 - state.turn).astype(jnp.int8)
    )
    return -mlp.value(params, feats, mcfg)


def greedy_1ply(params, state: bg_env.EnvState, mcfg: mlp.ModelConfig):
    vals = afterstate_values(params, state, mcfg)  # (B, M) mover-persp.
    mask = bg_env.action_mask(state)
    return jnp.argmax(jnp.where(mask, vals, NEG_INF), axis=-1).astype(jnp.int32)


def index_policy_logits(params, state: bg_env.EnvState, mcfg: mlp.ModelConfig):
    """Masked logits + value.  (The reference's ``logits +
    log(mask + 1e-45)`` masking, ppo_agent.py:166, relies on a float32
    subnormal that XLA flushes to zero; see ppo.learner._masked_logits.)"""
    obs = bg_env.observe(state)
    logits, value = mlp.forward(params, obs, mcfg)
    m = state.after.shape[1]
    mask = bg_env.action_mask(state)
    any_valid = (state.n_moves > 0)[:, None]
    masked = jnp.where(mask | jnp.logical_not(any_valid), logits[:, :m], NEG_INF)
    return masked, value


def index_policy(params, state, key, mcfg: mlp.ModelConfig, sample: bool = True):
    masked, _ = index_policy_logits(params, state, mcfg)
    if sample:
        return jax.random.categorical(key, masked, axis=-1).astype(jnp.int32)
    return jnp.argmax(masked, axis=-1).astype(jnp.int32)


def afterstate_policy_logits(params, state: bg_env.EnvState, mcfg: mlp.ModelConfig):
    feats = bg_env.afterstate_features(state)
    scores = mlp.score(params, feats, mcfg)  # (B, M)
    mask = bg_env.action_mask(state)
    return jnp.where(mask, scores, NEG_INF)


def afterstate_policy(params, state, key, mcfg: mlp.ModelConfig, sample: bool = True):
    logits = afterstate_policy_logits(params, state, mcfg)
    if sample:
        return jax.random.categorical(key, logits, axis=-1).astype(jnp.int32)
    return jnp.argmax(logits, axis=-1).astype(jnp.int32)
