"""League / arena evaluation: pit two policies against each other over a
batch of lockstep games and measure honest win rates.

Replaces the reference's broken win-rate bookkeeping (SURVEY.md Q8:
``info["winner"] == info["current_player"]`` is tautologically true, so
its "win rate" is always 1).  Here the two sides are different policies;
side assignment alternates across the batch; each game's first
completion is latched and scored.

Policies are passed as ``(params, state, key) -> (B,) actions`` pure
functions with their parameters separate, so ``play_jit`` can treat the
function as a static (hashable, stable-identity) argument and the
params as traced inputs — one compilation per (policy pair, config),
not per call.  Policy factories that need a model/search config should
be memoized (see ppo.train._league_policies) so their identity is
stable across calls.
"""

from __future__ import annotations

from functools import partial
from typing import Callable, NamedTuple

import jax
import jax.numpy as jnp

from ..env import bg_env

# A policy maps (params, state, key) -> (B,) int32 actions.
Policy = Callable[[object, bg_env.EnvState, jax.Array], jax.Array]


class ArenaResult(NamedTuple):
    wins_a: jax.Array        # () int32
    wins_b: jax.Array        # ()
    finished: jax.Array      # () games that reached a result
    points_a: jax.Array      # () total match points (gammons count 2, bg 3)
    points_b: jax.Array      # ()
    plies: jax.Array         # () total half-turns played up to each
    #                             game's first completion (unfinished
    #                             games contribute max_plies)


def play(policy_a: Policy, params_a, policy_b: Policy, params_b, key,
         env_cfg: bg_env.EnvConfig, n_games: int,
         max_plies: int = 400) -> ArenaResult:
    """Play ``n_games`` lockstep; A is player 0 in even games, player 1 in
    odd games.  Returns first-completion results per game."""
    k_reset, k_run = jax.random.split(key)
    state = bg_env.reset(k_reset, env_cfg, n_games)
    a_side = (jnp.arange(n_games) % 2).astype(jnp.int8)  # A plays this color

    def step_fn(carry, k):
        state, done_latch, winner_side, game_score, plies = carry
        k_a, k_b, k_env = jax.random.split(k, 3)
        act_a = policy_a(params_a, state, k_a)
        act_b = policy_b(params_b, state, k_b)
        actions = jnp.where(state.turn == a_side, act_a, act_b)
        plies = plies + jnp.sum(jnp.logical_not(done_latch).astype(jnp.int32))
        state, info = bg_env.step(state, actions, k_env, env_cfg)
        won_now = (info.winner >= 0) & jnp.logical_not(done_latch)
        winner_side = jnp.where(won_now, info.winner, winner_side)
        game_score = jnp.where(won_now, info.game_score, game_score)
        done_latch = done_latch | (info.winner >= 0)
        return (state, done_latch, winner_side, game_score, plies), None

    init = (
        state,
        jnp.zeros((n_games,), bool),
        jnp.full((n_games,), -1, jnp.int8),
        jnp.zeros((n_games,), jnp.int32),
        jnp.zeros((), jnp.int32),
    )
    keys = jax.random.split(k_run, max_plies)
    (state, done, winner_side, game_score, plies), _ = jax.lax.scan(
        step_fn, init, keys
    )

    a_won = done & (winner_side == a_side)
    b_won = done & (winner_side == (1 - a_side))
    return ArenaResult(
        wins_a=jnp.sum(a_won.astype(jnp.int32)),
        wins_b=jnp.sum(b_won.astype(jnp.int32)),
        finished=jnp.sum(done.astype(jnp.int32)),
        points_a=jnp.sum(jnp.where(a_won, game_score, 0)),
        points_b=jnp.sum(jnp.where(b_won, game_score, 0)),
        plies=plies,
    )


def play_hostloop(policy_a: Policy, params_a, policy_b: Policy, params_b,
                  key, env_cfg: bg_env.EnvConfig, n_games: int,
                  max_plies: int = 400) -> ArenaResult:
    """``play`` with the ply loop on the HOST and one jitted body per
    step: required for heavyweight search policies (2-ply expectimax),
    whose program is itself a chunked multi-level pipeline — a 300-step
    ``lax.scan`` over it compiles into a program large enough to crash
    the TPU worker.  Semantics identical to ``play`` (same latching and
    scoring; one compilation of the step body)."""
    k_reset, k_run = jax.random.split(key)
    state = bg_env.reset(k_reset, env_cfg, n_games)
    a_side = (jnp.arange(n_games) % 2).astype(jnp.int8)

    @jax.jit
    def step_once(carry, k):
        state, done_latch, winner_side, game_score, plies = carry
        k_a, k_b, k_env = jax.random.split(k, 3)
        act_a = policy_a(params_a, state, k_a)
        act_b = policy_b(params_b, state, k_b)
        actions = jnp.where(state.turn == a_side, act_a, act_b)
        plies = plies + jnp.sum(jnp.logical_not(done_latch).astype(jnp.int32))
        state, info = bg_env.step(state, actions, k_env, env_cfg)
        won_now = (info.winner >= 0) & jnp.logical_not(done_latch)
        winner_side = jnp.where(won_now, info.winner, winner_side)
        game_score = jnp.where(won_now, info.game_score, game_score)
        done_latch = done_latch | (info.winner >= 0)
        return (state, done_latch, winner_side, game_score, plies), done_latch

    carry = (
        state,
        jnp.zeros((n_games,), bool),
        jnp.full((n_games,), -1, jnp.int8),
        jnp.zeros((n_games,), jnp.int32),
        jnp.zeros((), jnp.int32),
    )
    for k in jax.random.split(k_run, max_plies):
        carry, done = step_once(carry, k)
        # early exit once every game is latched (host loop can!)
        if bool(jax.device_get(jnp.all(done))):
            break
    _, done, winner_side, game_score, plies = carry

    a_won = done & (winner_side == a_side)
    b_won = done & (winner_side == (1 - a_side))
    return ArenaResult(
        wins_a=jnp.sum(a_won.astype(jnp.int32)),
        wins_b=jnp.sum(b_won.astype(jnp.int32)),
        finished=jnp.sum(done.astype(jnp.int32)),
        points_a=jnp.sum(jnp.where(a_won, game_score, 0)),
        points_b=jnp.sum(jnp.where(b_won, game_score, 0)),
        plies=plies,
    )


def win_rate(result: ArenaResult) -> float:
    f = max(1, int(result.finished))
    return float(result.wins_a) / f


@partial(jax.jit, static_argnames=("policy_a", "policy_b", "env_cfg",
                                   "n_games", "max_plies"))
def play_jit(policy_a, params_a, policy_b, params_b, key, env_cfg, n_games,
             max_plies=400):
    return play(policy_a, params_a, policy_b, params_b, key, env_cfg,
                n_games, max_plies)
