"""Pure-JAX board primitives in the canonical (current-player) frame.

A board is a flat ``(52,)`` int8 vector:
``[my points (24), opp points (24), my_bar, opp_bar, my_off, opp_off]``
where the mover always travels in the +1 direction (0 -> 23), home board
is 18..23, bar entry lands on ``die - 1`` and bear-off exits past 23.

This collapses the reference's two per-player code paths
(/root/reference/src/moves/move_logic.py:47-255, conditions.py:7-147)
into one vectorized one: player 1's absolute board maps into this frame
by point reflection ``i -> 23 - i`` and player-channel swap.

All functions are shape-static, jit/vmap-friendly, and operate on a
single board; callers vmap over batch / frontier axes.
"""

from __future__ import annotations

import jax.numpy as jnp

from .constants import NUM_CHECKERS, NUM_POINTS

# slots in the flat canonical vector
MY = slice(0, 24)
OPP = slice(24, 48)
MY_BAR, OPP_BAR, MY_OFF, OPP_OFF = 48, 49, 50, 51
VEC = 52

# submove encoding: origin in 0..24 (24 = bar), dest in 0..24 (24 = off)
ORIGIN_BAR = 24
DEST_OFF = 24

_ARANGE24 = jnp.arange(24, dtype=jnp.int32)


def to_canonical(points, bar_, off_, player):
    """Absolute arrays (points (2,24), bar (2,), off (2,)) + player scalar
    -> canonical (52,) int8 vector."""
    p = player.astype(jnp.int32)
    my_pts = jnp.where(p == 0, points[0], points[1][::-1])
    opp_pts = jnp.where(p == 0, points[1], points[0][::-1])
    my_b = jnp.where(p == 0, bar_[0], bar_[1])
    opp_b = jnp.where(p == 0, bar_[1], bar_[0])
    my_o = jnp.where(p == 0, off_[0], off_[1])
    opp_o = jnp.where(p == 0, off_[1], off_[0])
    return jnp.concatenate(
        [
            my_pts.astype(jnp.int8),
            opp_pts.astype(jnp.int8),
            jnp.stack([my_b, opp_b, my_o, opp_o]).astype(jnp.int8),
        ]
    )


def from_canonical(vec, player):
    """Canonical (52,) vector + player -> absolute (points (2,24), bar (2,),
    off (2,))."""
    p = player.astype(jnp.int32)
    my_pts, opp_pts = vec[MY], vec[OPP]
    p0 = jnp.where(p == 0, my_pts, opp_pts[::-1])
    p1 = jnp.where(p == 0, opp_pts, my_pts[::-1])
    points = jnp.stack([p0, p1])
    bar_ = jnp.where(
        p == 0,
        jnp.stack([vec[MY_BAR], vec[OPP_BAR]]),
        jnp.stack([vec[OPP_BAR], vec[MY_BAR]]),
    )
    off_ = jnp.where(
        p == 0,
        jnp.stack([vec[MY_OFF], vec[OPP_OFF]]),
        jnp.stack([vec[OPP_OFF], vec[MY_OFF]]),
    )
    return points, bar_, off_


def opponent_view(vec):
    """Canonical-frame involution: re-canonicalize a board for the other
    player (swap my/opp halves and reflect the point order)."""
    my, opp = vec[..., 0:24], vec[..., 24:48]
    tail = jnp.stack(
        [vec[..., 49], vec[..., 48], vec[..., 51], vec[..., 50]], axis=-1
    )
    return jnp.concatenate([opp[..., ::-1], my[..., ::-1], tail], axis=-1)


def submoves_one_die(vec, die):
    """All candidate submoves for one die from a canonical board.

    Returns (valid (27,) bool, origin (27,) int32, dest (27,) int32,
    hit (27,) bool) over 27 candidate slots:

    - 0..23: normal point-to-point moves (move_logic.py:47-92) — dest
      in-board and not blocked;
    - 24: the bar-entry submove (move_logic.py:95-137);
    - 25: bear-off from the FARTHEST occupied home point (overshoot or
      exact, move_logic.py:196-245 "standard bear-off");
    - 26: exact bear-off from point ``24-die`` when that differs from
      the farthest point (move_logic.py:223-255 "special bear-off").

    Slots 25/26 sit after the point slots in this fixed order because
    the reference emits normal in-home moves first, then the farthest
    bear-off, then the exact bear-off — for BOTH players — which is what
    exact list-order parity requires (get_moves_bear_off).
    """
    die = die.astype(jnp.int32)
    my = vec[MY].astype(jnp.int32)
    opp = vec[OPP].astype(jnp.int32)
    my_bar = vec[MY_BAR].astype(jnp.int32)
    my_off = vec[MY_OFF].astype(jnp.int32)

    game_over = my_off >= NUM_CHECKERS
    on_bar = my_bar > 0
    live = jnp.logical_not(game_over)

    o = _ARANGE24
    dest_pt = o + die
    in_board = dest_pt < NUM_POINTS
    opp_at = jnp.where(in_board, opp[jnp.clip(dest_pt, 0, 23)], 0)
    open_dest = opp_at <= 1
    occupied = my > 0

    all_home = jnp.logical_not(on_bar) & (jnp.sum(my[:18]) == 0)
    # farthest (lowest-index) occupied home point; sentinel 99 when empty
    home_idx = jnp.where(my[18:24] > 0, jnp.arange(18, 24, dtype=jnp.int32), 99)
    farthest = jnp.min(home_idx)

    valid_normal = (
        jnp.logical_not(on_bar) & occupied & in_board & open_dest & live
    )
    dest_pts = jnp.where(in_board, dest_pt, DEST_OFF)
    hit_pts = valid_normal & (opp_at == 1)

    bar_dest = die - 1
    valid_bar = on_bar & (opp[bar_dest] <= 1) & live
    hit_bar = valid_bar & (opp[bar_dest] == 1)

    # farthest-checker bear-off (exact or overshoot)
    far_valid = all_home & (farthest < 99) & (farthest + die >= NUM_POINTS) & live
    far_origin = jnp.clip(farthest, 18, 23)
    # exact bear-off from 24-die when distinct from the farthest point
    ex_origin = NUM_POINTS - die
    ex_valid = (
        all_home
        & (my[jnp.clip(ex_origin, 0, 23)] > 0)
        & (ex_origin != farthest)
        & live
    )

    false1 = jnp.zeros((1,), bool)
    off1 = jnp.full((1,), DEST_OFF, jnp.int32)
    valid = jnp.concatenate(
        [valid_normal, valid_bar[None], far_valid[None], ex_valid[None]]
    )
    origin = jnp.concatenate(
        [
            o,
            jnp.full((1,), ORIGIN_BAR, jnp.int32),
            far_origin[None],
            ex_origin[None],
        ]
    )
    dest = jnp.concatenate([dest_pts, bar_dest[None], off1, off1])
    hit = jnp.concatenate([hit_pts, hit_bar[None], false1, false1])
    return valid, origin, dest, hit


def apply_submove(vec, origin, dest, hit):
    """Apply one submove to a canonical board (pure, no validity check);
    mirrors reference src/board/immutable_board.py:42-89."""
    origin = origin.astype(jnp.int32)
    dest = dest.astype(jnp.int32)
    hit8 = hit.astype(jnp.int8)
    o_oh = (_ARANGE24 == origin).astype(jnp.int8)
    d_oh = (_ARANGE24 == dest).astype(jnp.int8)
    my = vec[MY] - o_oh + d_oh
    opp = vec[OPP] - d_oh * hit8
    my_bar = vec[MY_BAR] - (origin == ORIGIN_BAR).astype(jnp.int8)
    opp_bar = vec[OPP_BAR] + hit8
    my_off = vec[MY_OFF] + (dest == DEST_OFF).astype(jnp.int8)
    return jnp.concatenate(
        [my, opp, jnp.stack([my_bar, opp_bar, my_off, vec[OPP_OFF]])]
    )


def pack_key(vec):
    """Pack a canonical board into a (7,) int32 exact sort/dedup key.

    Checker counts fit 4 bits (<= 15): 24 points x (my | opp<<4) packed 4
    points per int32 (6 words) + one word of bar/off counters."""
    v = vec.astype(jnp.int32) & 0xF
    my, opp = v[MY], v[OPP]
    byte = my | (opp << 4)  # (24,) values 0..255
    b = byte.reshape(6, 4)
    shifts = jnp.array([0, 8, 16, 24], dtype=jnp.int32)
    words = jnp.sum(b << shifts, axis=1)
    tail = (
        v[MY_BAR] | (v[OPP_BAR] << 8) | (v[MY_OFF] << 16) | (v[OPP_OFF] << 24)
    )
    return jnp.concatenate([words, tail[None]])
