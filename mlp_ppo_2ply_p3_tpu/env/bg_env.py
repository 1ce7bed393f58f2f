"""Batched lockstep backgammon environment as pure jitted functions.

Functional re-design of the reference gym env
(/root/reference/src/environment/backgammon_env.py:35-405): ``B`` games
advance in lockstep under one ``jit``; there is no Python object state,
no per-step host sync, and the serial/multiprocess vectorizers
(vec_bg_env.py) are subsumed by ``vmap``.

Reference semantics replicated exactly (SURVEY.md quirks register):
- reset protocol (Q11): a non-double roll decides the starter (higher
  first die -> player 0), a second non-double roll is the first-move
  roll (backgammon_env.py:93-107).  Sampling is direct from the
  30-outcome non-double distribution (core.dice).
- step on a finished game auto-resets and returns ``done=True`` with 0
  reward (:119-121).
- all-moves-masked => auto-pass consuming the step, reward 0 (:124-140,
  Q12).
- invalid action index => reward -1, state unchanged, same player
  retries (:143-149, Q12).
- win detection with gammon (x1.5) / backgammon (x2.0) rewards and
  1/2/3 match scoring to ``match_length`` (:156-181).

A *move* is one of the precomputed afterstate boards
(``state.after[b, action]``); committing is a gather, so invalid boards
are unrepresentable on the hot path.
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..core import board as B
from ..core import dice as D
from ..core import features as F
from ..core.constants import (
    INITIAL_POINTS_P1,
    INITIAL_POINTS_P2,
    MATCH_LENGTH,
    NUM_CHECKERS,
    REWARD_INVALID_ACTION,
    REWARD_WIN_BACKGAMMON,
    REWARD_WIN_GAMMON,
    REWARD_WIN_NORMAL,
)
from ..core.movegen import MovegenConfig, legal_afterstates_batch

import numpy as np


@dataclasses.dataclass(frozen=True)
class EnvConfig:
    match_length: int = MATCH_LENGTH
    movegen: MovegenConfig = MovegenConfig()

    @property
    def max_moves(self) -> int:
        return self.movegen.max_moves


class EnvState(NamedTuple):
    """All arrays carry a leading batch axis B."""

    points: jax.Array      # (B, 2, 24) int8 absolute per-player counts
    bar: jax.Array         # (B, 2) int8
    off: jax.Array         # (B, 2) int8
    turn: jax.Array        # (B,) int8 current player
    dice: jax.Array        # (B, 2) int8
    score: jax.Array       # (B, 2) int32 match scores
    game_over: jax.Array   # (B,) bool
    match_over: jax.Array  # (B,) bool
    after: jax.Array       # (B, M, 52) int8 canonical afterstates
    n_moves: jax.Array     # (B,) int32
    overflow: jax.Array    # (B,) bool movegen width-cap saturation


class StepInfo(NamedTuple):
    reward: jax.Array      # (B,) float32
    done: jax.Array        # (B,) bool
    winner: jax.Array      # (B,) int8, -1 if game not won this step
    game_score: jax.Array  # (B,) int32, 0/1/2/3
    invalid: jax.Array     # (B,) bool
    passed: jax.Array      # (B,) bool (auto-pass steps)


def _initial_arrays():
    pts = np.zeros((2, 24), dtype=np.int8)
    for p, n in INITIAL_POINTS_P1.items():
        pts[0, p] = n
    for p, n in INITIAL_POINTS_P2.items():
        pts[1, p] = n
    return jnp.asarray(pts)


_INIT_POINTS = _initial_arrays()
_ZERO2 = jnp.zeros((2,), jnp.int8)


def _fresh_game(key):
    """New game: initial board + starter decided by a non-double roll +
    a second non-double first-move roll (reference Q11)."""
    k1, k2 = jax.random.split(key)
    starter_roll = D.roll_nondouble(k1)
    # reference backgammon_env.py:99-102: roll[0] < roll[1] -> player 2
    turn = (starter_roll[0] < starter_roll[1]).astype(jnp.int8)
    first_dice = D.roll_nondouble(k2)
    return _INIT_POINTS, _ZERO2, _ZERO2, turn, first_dice


def _movegen_batch(points, bar, off, turn, dice_, cfg: EnvConfig):
    """Batched movegen: (B,...) absolute arrays -> (after, n, overflow).
    Uses the doubles-partitioned kernel (core.movegen) so only games
    that actually rolled doubles pay the depth-4 expansion.  ``mirror``
    keeps the move-list order identical to the reference's generation
    order for both players (exact action-index parity, Q14)."""
    vecs = jax.vmap(B.to_canonical)(points, bar, off, turn)
    return legal_afterstates_batch(vecs, dice_, cfg.movegen, mirror=turn == 1)


@partial(jax.jit, static_argnames=("cfg", "batch_size"))
def reset(key, cfg: EnvConfig, batch_size: int) -> EnvState:
    keys = jax.random.split(key, batch_size)
    pts, bar_, off_, turn, dc = jax.vmap(_fresh_game)(keys)
    after, n, ovf = _movegen_batch(pts, bar_, off_, turn, dc, cfg)
    zb = jnp.zeros((batch_size,), bool)
    return EnvState(
        points=pts,
        bar=bar_,
        off=off_,
        turn=turn,
        dice=dc,
        score=jnp.zeros((batch_size, 2), jnp.int32),
        game_over=zb,
        match_over=zb,
        after=after,
        n_moves=n,
        overflow=ovf,
    )


def _step_one(s, action, key, cfg: EnvConfig):
    """Single-game step EXCEPT the legal-move recomputation (done batched
    by ``step`` afterwards); vmapped over the batch."""
    k_fresh, k_roll = jax.random.split(key)

    was_over = s.game_over
    no_moves = jnp.logical_not(was_over) & (s.n_moves == 0)
    action = action.astype(jnp.int32)
    invalid = (
        jnp.logical_not(was_over)
        & jnp.logical_not(no_moves)
        & ((action < 0) | (action >= s.n_moves))
    )
    commit = (
        jnp.logical_not(was_over)
        & jnp.logical_not(no_moves)
        & jnp.logical_not(invalid)
    )

    chosen = s.after[jnp.clip(action, 0, cfg.max_moves - 1)]  # (52,) canonical
    win = commit & (chosen[B.MY_OFF].astype(jnp.int32) >= NUM_CHECKERS)
    # gammon / backgammon in the canonical frame (reference
    # backgammon_env.py:365-405): loser borne off none; backgammon adds
    # loser checkers in the winner's home (canonical 18..23) or on the bar.
    opp_off0 = chosen[B.OPP_OFF].astype(jnp.int32) == 0
    opp_in_home = jnp.sum(chosen[B.OPP][18:24].astype(jnp.int32)) > 0
    opp_on_bar = chosen[B.OPP_BAR].astype(jnp.int32) > 0
    is_backgammon = win & opp_off0 & (opp_in_home | opp_on_bar)
    is_gammon = win & opp_off0 & jnp.logical_not(is_backgammon)
    game_score = jnp.where(
        win, jnp.where(is_backgammon, 3, jnp.where(is_gammon, 2, 1)), 0
    ).astype(jnp.int32)
    reward = (
        jnp.where(invalid, REWARD_INVALID_ACTION, 0.0)
        + jnp.where(
            win,
            jnp.where(
                is_backgammon,
                REWARD_WIN_BACKGAMMON,
                jnp.where(is_gammon, REWARD_WIN_GAMMON, REWARD_WIN_NORMAL),
            ),
            0.0,
        )
    ).astype(jnp.float32)
    done = was_over | win

    # --- next board / turn / dice ------------------------------------------
    c_pts, c_bar, c_off = B.from_canonical(chosen, s.turn)
    f_pts, f_bar, f_off, f_turn, f_dice = _fresh_game(k_fresh)

    def sel(cond, a, b):
        return jnp.where(jnp.reshape(cond, (1,) * a.ndim), a, b)

    # committed-or-unchanged board
    n_pts = sel(commit, c_pts, s.points)
    n_bar = sel(commit, c_bar, s.bar)
    n_off = sel(commit, c_off, s.off)
    # auto-reset overwrites with a fresh game
    n_pts = sel(was_over, f_pts, n_pts)
    n_bar = sel(was_over, f_bar, n_bar)
    n_off = sel(was_over, f_off, n_off)

    flip = (no_moves | (commit & jnp.logical_not(win))).astype(jnp.int8)
    n_turn = jnp.where(was_over, f_turn, (s.turn + flip) % 2).astype(jnp.int8)
    rolled = D.roll(k_roll)
    n_dice = sel(was_over, f_dice, sel(flip.astype(bool), rolled, s.dice))

    # --- scores / flags -----------------------------------------------------
    score = jnp.where(
        jnp.reshape(was_over & s.match_over, (1,)), jnp.zeros(2, jnp.int32), s.score
    )
    win_add = jnp.where(
        win,
        jnp.where(jnp.arange(2) == s.turn.astype(jnp.int32), game_score, 0),
        0,
    ).astype(jnp.int32)
    score = score + win_add
    match_over = jnp.where(
        was_over, False, s.match_over | (win & (jnp.max(score) >= cfg.match_length))
    )
    game_over = jnp.where(was_over, False, s.game_over | win)

    ns = EnvState(
        points=n_pts,
        bar=n_bar,
        off=n_off,
        turn=n_turn,
        dice=n_dice,
        score=score,
        game_over=game_over,
        match_over=match_over,
        after=s.after,       # stale; replaced batched in ``step``
        n_moves=s.n_moves,   # stale; replaced batched in ``step``
        overflow=s.overflow,
    )
    info = StepInfo(
        reward=reward,
        done=done,
        winner=jnp.where(win, s.turn, jnp.int8(-1)).astype(jnp.int8),
        game_score=game_score,
        invalid=invalid,
        passed=no_moves,
    )
    return ns, info


@partial(jax.jit, static_argnames=("cfg",))
def step(state: EnvState, actions, key, cfg: EnvConfig):
    """Advance all B games one half-turn.  Returns (state', StepInfo)."""
    bsz = state.turn.shape[0]
    keys = jax.random.split(key, bsz)
    ns, info = jax.vmap(lambda s, a, k: _step_one(s, a, k, cfg))(
        state, actions, keys
    )
    after, n_mv, ovf = _movegen_batch(
        ns.points, ns.bar, ns.off, ns.turn, ns.dice, cfg
    )
    n_mv = jnp.where(ns.game_over, 0, n_mv)
    ns = ns._replace(after=after, n_moves=n_mv, overflow=ovf)
    return ns, info


@partial(jax.jit, static_argnames=("cfg",))
def make_state(points, bar, off, turn, dice_, cfg: EnvConfig) -> EnvState:
    """Build an EnvState from arbitrary (batched) board arrays — for
    tests, analysis tools, and position setup.  Computes the legal-move
    cache; scores/flags zeroed."""
    bsz = turn.shape[0]
    after, n, ovf = _movegen_batch(points, bar, off, turn, dice_, cfg)
    zb = jnp.zeros((bsz,), bool)
    return EnvState(
        points=points.astype(jnp.int8),
        bar=bar.astype(jnp.int8),
        off=off.astype(jnp.int8),
        turn=turn.astype(jnp.int8),
        dice=dice_.astype(jnp.int8),
        score=jnp.zeros((bsz, 2), jnp.int32),
        game_over=zb,
        match_over=zb,
        after=after,
        n_moves=n,
        overflow=ovf,
    )


# --- observations -----------------------------------------------------------


@jax.jit
def observe(state: EnvState):
    """Current-state features (B, 198) — the reference policy input
    (backgammon_env.py:193-196)."""
    return F.encode(state.points, state.bar, state.off, state.turn)


@jax.jit
def action_mask(state: EnvState):
    """(B, M) prefix mask over the legal-move list (reference
    backgammon_env.py:228-231 builds exactly this prefix)."""
    m = state.after.shape[1]
    return jnp.arange(m)[None, :] < state.n_moves[:, None]


@jax.jit
def afterstate_features(state: EnvState):
    """(B, M, 198) features of every legal afterstate, encoded with the
    mover's one-hot (reference src/ai/batching.py convention, Q1) —
    this is the quantity the reference computed and never used; here it
    feeds 1-ply/2-ply afterstate evaluation."""
    return jax.vmap(F.encode_canonical)(state.after, state.turn)
