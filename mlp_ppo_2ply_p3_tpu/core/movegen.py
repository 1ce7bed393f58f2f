"""Fixed-shape legal-move enumerator (the rules hot path), pure JAX.

Replaces the reference's recursive Python expansion
(/root/reference/src/moves/handle_moves.py:109-341,
get_all_moves.py:10-94) with a masked, shape-static tensor program that
runs under ``jit``/``vmap`` for thousands of games in lockstep:

- A *full move* is represented by its **afterstate board** (canonical
  frame, see ``core.board``): the env commits a move by gathering the
  chosen afterstate, so no submove sequences are materialized.
- Non-doubles: both die orders are expanded as dense
  ``(K1, 25)`` candidate grids; singles are emitted per reference
  semantics (only when that order admits no two-submove sequence), the
  reversed order is skipped iff the first pass yielded exactly one
  unique single (get_all_moves.py:43-53), duplicates are removed by
  first-occurrence-in-generation-order (handle_moves.py:313-341) and the
  max-submove filter is applied (get_all_moves.py:73-94).
- Doubles: breadth-first frontier expansion to depth 4 restricted to
  non-decreasing origin order (a completeness-preserving
  canonicalization: arrivals at an origin only ever come from lower
  origins, opponent blocking is static within a turn, and bear-off
  legality is monotone in clearing lower points), with sort-based
  dedup + width capping between levels.  The final list is the deepest
  non-empty level, matching the reference's record-shorter-sequences +
  max-length-filter behavior.

Output ordering: non-doubles lists are in reference generation order;
doubles lists are in canonical (packed-board-key) order.  Both are
deterministic; parity with the reference is at the afterstate-set level
(see tests/test_movegen.py).

Width caps (empirical maxima measured with the oracle over ~25k
position/roll pairs: non-doubles final 84, doubles L2 43, L3 146, final
396) are configurable; overflow is reported per call.
"""

from __future__ import annotations

import dataclasses
from functools import partial

import jax
import jax.numpy as jnp
from jax import lax

from . import board as B
from .constants import NUM_CHECKERS


@dataclasses.dataclass(frozen=True)
class MovegenConfig:
    """Static width caps.  Empirical maxima over ~35k reachable
    position/roll pairs (oracle playouts): doubles L2 44, L3 161, final
    459; non-doubles final 93.  Overflow is reported per call so
    saturation is observable in production metrics."""

    max_moves: int = 256   # M: final list width (reference env cap: 500)
    k1: int = 16           # first-level frontier (hard bound: 15 origins)
    k2: int = 96           # doubles frontier after 2 submoves
    k3: int = 224          # doubles frontier after 3 submoves


_ORIGINS = jnp.arange(25, dtype=jnp.int32)


# --- building blocks --------------------------------------------------------


def _expand_one_die(boards, valid, die):
    """Expand a (K, 52) frontier by one die: returns
    (after (K*25, 52), valid (K*25,), origin (K*25,)) over the dense
    origin grid."""
    v, d, h = jax.vmap(B.submoves_one_die, (0, None))(boards, die)  # (K,25)
    after = jax.vmap(
        lambda b, dd, hh: jax.vmap(B.apply_submove, (None, 0, 0, 0))(
            b, _ORIGINS, dd, hh
        )
    )(boards, d, h)  # (K,25,52)
    k = boards.shape[0]
    val = (valid[:, None] & v).reshape(k * 25)
    origin = jnp.broadcast_to(_ORIGINS, (k, 25)).reshape(k * 25)
    return after.reshape(k * 25, 52), val, origin


def _compact(payloads, valid, k_out):
    """Stable-compact valid rows to the front of a width-``k_out`` buffer
    (scatter by prefix-sum position; order preserved).  ``payloads`` is a
    tuple of arrays with leading dim N.  Returns (payloads_out, n)."""
    n_in = valid.shape[0]
    pos = jnp.cumsum(valid.astype(jnp.int32)) - 1
    idx = jnp.where(valid, pos, k_out)  # invalid rows -> dropped overflow row
    outs = []
    for p in payloads:
        buf = jnp.zeros((k_out + 1,) + p.shape[1:], dtype=p.dtype)
        outs.append(buf.at[idx].set(p, mode="drop")[:k_out])
    n = jnp.sum(valid.astype(jnp.int32))
    return tuple(outs), n


def _sort_mark_unique(boards, valid, rank):
    """Sort candidates by (validity, board key, rank) and mark the first
    row of each unique valid board.  Returns arrays in SORTED order:
    (boards_s, rank_s, keep_s, orig_index_s)."""
    n = boards.shape[0]
    keys = jax.vmap(B.pack_key)(boards)  # (N,7)
    inv = jnp.logical_not(valid).astype(jnp.int32)
    iota = jnp.arange(n, dtype=jnp.int32)
    ops = (inv,) + tuple(keys[:, i] for i in range(7)) + (
        rank.astype(jnp.int32),
        iota,
    )
    s = lax.sort(ops, num_keys=9)
    s_inv = s[0]
    s_keys = jnp.stack(s[1:8], axis=1)  # (N,7)
    s_rank, s_iota = s[8], s[9]
    same_as_prev = jnp.all(s_keys[1:] == s_keys[:-1], axis=1) & (
        s_inv[1:] == s_inv[:-1]
    )
    uniq = jnp.concatenate([jnp.ones((1,), bool), jnp.logical_not(same_as_prev)])
    keep = (s_inv == 0) & uniq
    boards_s = jnp.take(boards, s_iota, axis=0)
    return boards_s, s_rank, keep, s_iota


def _dedup_compact_frontier(boards, valid, rank, k_out):
    """Doubles frontier step: dedup by board (keeping the minimum
    last-origin rank, which permits the superset of continuations under
    the non-decreasing-origin constraint) and compact to ``k_out``.
    Output is in canonical key order.  Returns (boards, rank, n)."""
    boards_s, rank_s, keep, _ = _sort_mark_unique(boards, valid, rank)
    (b_out, r_out), n = _compact((boards_s, rank_s), keep, k_out)
    return b_out, r_out, n


def _dedup_genorder(boards, valid):
    """First-occurrence dedup flags in ORIGINAL (generation) order:
    keep[i] iff row i is valid and is the minimum-index instance of its
    board (reference add_unique_board semantics,
    handle_moves.py:313-341)."""
    n = boards.shape[0]
    iota_rank = jnp.arange(n, dtype=jnp.int32)
    _, _, keep_s, s_iota = _sort_mark_unique(boards, valid, iota_rank)
    keep = jnp.zeros((n,), bool).at[s_iota].set(keep_s)
    return keep


def _embed(boards, n, m):
    """Place a (K,52) frontier into an (M,52) buffer (truncating if K > M)."""
    k = min(boards.shape[0], m)
    out = jnp.zeros((m, 52), dtype=boards.dtype)
    return out.at[:k].set(boards[:k]), jnp.minimum(n, m)


# --- non-doubles ------------------------------------------------------------


def _one_order(vec, d_first, d_second, k1):
    """One die order (reference handle_moves.py:109-200): returns
    (singles (k1,52), singles_valid, pair_boards (k1*25,52), pair_valid,
    has2)."""
    v1, d1, h1 = B.submoves_one_die(vec, d_first)
    b1 = jax.vmap(B.apply_submove, (None, 0, 0, 0))(vec, _ORIGINS, d1, h1)
    (b1c,), n1 = _compact((b1,), v1, k1)  # <= 15 valid: k1=16 never overflows
    v1c = jnp.arange(k1) < n1
    pair_b, pair_v, _ = _expand_one_die(b1c, v1c, d_second)
    has2 = jnp.any(pair_v)
    return b1c, v1c, pair_b, pair_v, has2


def _count_unique(boards, valid):
    """Number of distinct valid boards (small K; pairwise compare)."""
    keys = jax.vmap(B.pack_key)(boards)  # (K,7)
    eq = jnp.all(keys[:, None, :] == keys[None, :, :], axis=-1)  # (K,K)
    eq = eq & valid[:, None] & valid[None, :]
    k = boards.shape[0]
    earlier = jnp.tril(jnp.ones((k, k), bool), -1)
    dup = jnp.any(eq & earlier, axis=1)
    return jnp.sum((valid & jnp.logical_not(dup)).astype(jnp.int32))


def _nondoubles(vec, d_hi, d_lo, cfg: MovegenConfig):
    k1 = cfg.k1
    a1b, a1v, a2b, a2v, has2_a = _one_order(vec, d_hi, d_lo, k1)
    b1b, b1v, b2b, b2v, has2_b = _one_order(vec, d_lo, d_hi, k1)

    # skip the reversed order iff pass A yielded exactly one unique
    # single-submove move (reference get_all_moves.py:43-53)
    uniq_singles_a = _count_unique(a1b, a1v & jnp.logical_not(has2_a))
    skip_b = jnp.logical_not(has2_a) & (uniq_singles_a == 1)

    run_b = jnp.logical_not(skip_b)
    cand_boards = jnp.concatenate([a2b, a1b, b2b, b1b], axis=0)
    cand_valid = jnp.concatenate(
        [
            a2v & has2_a,
            a1v & jnp.logical_not(has2_a),
            b2v & has2_b & run_b,
            b1v & jnp.logical_not(has2_b) & run_b,
        ]
    )
    npair = k1 * 25
    seqlen = jnp.concatenate(
        [
            jnp.full((npair,), 2, jnp.int32),
            jnp.full((k1,), 1, jnp.int32),
            jnp.full((npair,), 2, jnp.int32),
            jnp.full((k1,), 1, jnp.int32),
        ]
    )
    keep = _dedup_genorder(cand_boards, cand_valid) & cand_valid
    max_len = jnp.max(jnp.where(keep, seqlen, 0))
    final = keep & (seqlen == max_len)
    (out,), n = _compact((cand_boards,), final, cfg.max_moves)
    overflow = n > cfg.max_moves
    return out, jnp.minimum(n, cfg.max_moves), overflow


# --- doubles ----------------------------------------------------------------


def _doubles(vec, die, cfg: MovegenConfig):
    m = cfg.max_moves
    # L1: distinct origins always give distinct boards -> no dedup needed
    v1, d1, h1 = B.submoves_one_die(vec, die)
    b1 = jax.vmap(B.apply_submove, (None, 0, 0, 0))(vec, _ORIGINS, d1, h1)
    rank1 = jnp.where(_ORIGINS == B.ORIGIN_BAR, -1, _ORIGINS)
    (f1b, f1r), n1 = _compact((b1, rank1), v1, cfg.k1)
    f1v = jnp.arange(cfg.k1) < n1
    has1 = n1 > 0

    def level(fb, fr, fv, k_out):
        eb, ev, eo = _expand_one_die(fb, fv, die)
        erank = jnp.where(eo == B.ORIGIN_BAR, -1, eo)
        parent_rank = jnp.repeat(fr, 25)
        ev = ev & (erank >= parent_rank)
        has = jnp.any(ev)
        nb, nr, n = _dedup_compact_frontier(eb, ev, erank, k_out)
        nv = jnp.arange(k_out) < jnp.minimum(n, k_out)
        return nb, nr, nv, n, has

    f2b, f2r, f2v, n2, has2 = level(f1b, f1r, f1v, cfg.k2)
    f3b, f3r, f3v, n3, has3 = level(f2b, f2r, f2v, cfg.k3)
    # final level: dedup straight into the M-wide output
    e4b, e4v, e4o = _expand_one_die(f3b, f3v, die)
    e4rank = jnp.where(e4o == B.ORIGIN_BAR, -1, e4o)
    e4v = e4v & (e4rank >= jnp.repeat(f3r, 25))
    has4 = jnp.any(e4v)
    f4b, _, n4 = _dedup_compact_frontier(e4b, e4v, e4rank, m)

    # deepest non-empty level is the legal move list
    l1b, l1n = _embed(f1b, n1, m)
    l2b, l2n = _embed(f2b, n2, m)
    l3b, l3n = _embed(f3b, n3, m)
    out = jnp.where(has4, f4b, jnp.where(has3, l3b, jnp.where(has2, l2b, l1b)))
    n = jnp.where(has4, n4, jnp.where(has3, l3n, jnp.where(has2, l2n, l1n)))
    overflow = (
        (has2 & (n2 > cfg.k2))
        | (has3 & (n3 > cfg.k3))
        | (has4 & (n4 > m))
        | (jnp.logical_not(has4) & has3 & (n3 > m))
        | (jnp.logical_not(has3) & has2 & (n2 > m))
    )
    return out, jnp.minimum(n, m), overflow


# --- public entry -----------------------------------------------------------


@partial(jax.jit, static_argnames=("cfg",))
def legal_afterstates(vec, dice, cfg: MovegenConfig = MovegenConfig()):
    """All legal afterstates from one canonical board + dice pair.

    Args:
      vec:  (52,) int8 canonical board (current player to move).
      dice: (2,) integer dice.
      cfg:  static width configuration.

    Returns:
      boards:   (M, 52) int8 canonical afterstate boards (padded).
      n_moves:  () int32 number of valid moves (0 -> forced pass).
      overflow: () bool, true if any width cap truncated the true set.
    """
    d0 = dice[0].astype(jnp.int32)
    d1 = dice[1].astype(jnp.int32)
    d_hi, d_lo = jnp.maximum(d0, d1), jnp.minimum(d0, d1)
    nd_out, nd_n, nd_of = _nondoubles(vec, d_hi, d_lo, cfg)
    db_out, db_n, db_of = _doubles(vec, d0, cfg)
    is_double = d0 == d1
    out = jnp.where(is_double, db_out, nd_out)
    n = jnp.where(is_double, db_n, nd_n)
    of = jnp.where(is_double, db_of, nd_of)
    # no moves once the game is over (reference move_logic.py:269-270)
    game_over = vec[B.MY_OFF].astype(jnp.int32) >= NUM_CHECKERS
    n = jnp.where(game_over, 0, n)
    return out, n, of
