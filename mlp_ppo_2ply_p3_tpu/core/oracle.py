"""Reference-faithful backgammon rules oracle (plain numpy, host-side).

This module is the *behavioral specification* of the rules engine: a
clean-room re-derivation of the reference implementation's semantics
(/root/reference/src/moves/*.py, src/board/immutable_board.py), including
its deliberate quirks (SURVEY.md Q11-Q14):

- non-doubles: larger die tried first, reverse order skipped iff the
  first pass produced exactly one single-submove move
  (get_all_moves.py:43-53);
- "must use both dice": single-submove sequences are only emitted when no
  two-submove sequence exists for that die order (handle_moves.py:141-200);
- doubles: up to 4 submoves, shorter sequences recorded at dead-ends and
  removed by the final max-length filter (handle_moves.py:203-310,
  get_all_moves.py:73-94);
- dedup of full moves by *resulting board*, first occurrence in generation
  order kept (handle_moves.py:313-341);
- bear-off: exact bear-off from point ``24 - die`` plus overshoot bear-off
  from the farthest checker only (move_logic.py:140-255).

It is used as the differential-test fixture for the JAX move enumerator
and env, and as a host-side debugging tool.  It is intentionally simple
and slow (per-board Python loops) — never on the training path.

Board representation (absolute frame): a numpy int8 array of shape (52,):
``[p0 points (24), p1 points (24), bar (2), off (2)]``.
"""

from __future__ import annotations

import numpy as np

from .constants import (
    INITIAL_POINTS_P1,
    INITIAL_POINTS_P2,
    NUM_CHECKERS,
    NUM_POINTS,
)

# -- board helpers -----------------------------------------------------------

P0 = slice(0, 24)
P1 = slice(24, 48)
BAR0, BAR1, OFF0, OFF1 = 48, 49, 50, 51


def initial_board() -> np.ndarray:
    b = np.zeros(52, dtype=np.int8)
    for p, n in INITIAL_POINTS_P1.items():
        b[p] = n
    for p, n in INITIAL_POINTS_P2.items():
        b[24 + p] = n
    return b


def points(board: np.ndarray, player: int) -> np.ndarray:
    return board[P0] if player == 0 else board[P1]


def bar(board: np.ndarray, player: int) -> int:
    return int(board[BAR0 + player])


def off(board: np.ndarray, player: int) -> int:
    return int(board[OFF0 + player])


def board_key(board: np.ndarray) -> bytes:
    return board.tobytes()


def checker_conservation_ok(board: np.ndarray) -> bool:
    for p in (0, 1):
        total = int(points(board, p).sum()) + bar(board, p) + off(board, p)
        if total != NUM_CHECKERS:
            return False
    return True


# -- submoves ----------------------------------------------------------------
# A submove is a tuple (origin, dest, hit) in the ABSOLUTE frame, where
# origin == 24 means "from the bar" and dest == 25 means "bear off"
# (mirrors the reference Position.BAR/BEAR_OFF encoding,
# src/moves/move_types.py:33-34).

SM_BAR = 24
SM_OFF = 25


def apply_submove(board: np.ndarray, player: int, sm) -> np.ndarray:
    """Apply one submove; reference src/board/immutable_board.py:42-89."""
    origin, dest, hit = sm
    b = board.copy()
    opp = 1 - player
    if origin == SM_BAR:
        assert b[BAR0 + player] > 0
        b[BAR0 + player] -= 1
    else:
        assert b[24 * player + origin] > 0
        b[24 * player + origin] -= 1
    if hit:
        assert b[24 * opp + dest] == 1
        b[24 * opp + dest] -= 1
        b[BAR0 + opp] += 1
    if dest == SM_OFF:
        b[OFF0 + player] += 1
    else:
        b[24 * player + dest] += 1
    return b


def _home_range(player: int) -> range:
    return range(18, 24) if player == 0 else range(0, 6)


def _all_checkers_home(board: np.ndarray, player: int) -> bool:
    """Reference src/moves/conditions.py:111-147."""
    if bar(board, player) > 0:
        return False
    pts = points(board, player)
    home = _home_range(player)
    for idx in range(NUM_POINTS):
        if pts[idx] > 0 and idx not in home:
            return False
    return True


def submoves_one_die(board: np.ndarray, player: int, die: int) -> list:
    """All submoves for one die, in reference generation order
    (src/moves/move_logic.py:20-255)."""
    opp_pts = points(board, 1 - player)
    my_pts = points(board, player)
    direction = 1 if player == 0 else -1

    if off(board, player) == NUM_CHECKERS:  # GAME_OVER
        return []

    if bar(board, player) > 0:  # ON_BAR: only bar entry
        dest = die - 1 if player == 0 else 24 - die
        # Entry quadrant: player 0 enters on 0..5, player 1 on 18..23
        # (reference src/moves/move_logic.py:110-123).
        lo, hi = (0, 5) if player == 0 else (18, 23)
        if lo <= dest <= hi and opp_pts[dest] <= 1:
            return [(SM_BAR, dest, bool(opp_pts[dest] == 1))]
        return []

    moves = []
    if _all_checkers_home(board, player):
        # BEAR_OFF state (reference src/moves/move_logic.py:140-255):
        # 1) normal moves within the home board, ascending absolute index
        home = list(_home_range(player))
        for idx in home:
            if my_pts[idx] > 0:
                dest = idx + die * direction
                if 0 <= dest < NUM_POINTS and opp_pts[dest] <= 1:
                    moves.append((idx, dest, bool(opp_pts[dest] == 1)))
        # 2) farthest checker (first occupied scanning from the entry side)
        if player == 0:
            last = 18
            for idx in home:
                if my_pts[idx] > 0:
                    last = idx
                    break
        else:
            last = 5
            for idx in reversed(home):
                if my_pts[idx] > 0:
                    last = idx
                    break
        # 3) bear-off moves: overshoot-from-farthest, then exact
        if player == 0:
            if last + die >= NUM_POINTS:
                moves.append((last, SM_OFF, False))
            exact = NUM_POINTS - die
            if exact != last and exact in home and my_pts[exact] > 0:
                moves.append((exact, SM_OFF, False))
        else:
            if last - die < 0:
                moves.append((last, SM_OFF, False))
            exact = die - 1
            if exact != last and exact in home and my_pts[exact] > 0:
                moves.append((exact, SM_OFF, False))
        return moves

    # NORMAL state (reference src/moves/move_logic.py:47-92): ascending idx
    for idx in range(NUM_POINTS):
        if my_pts[idx] > 0:
            dest = idx + die * direction
            if 0 <= dest < NUM_POINTS and opp_pts[dest] <= 1:
                moves.append((idx, dest, bool(opp_pts[dest] == 1)))
    return moves


# -- full-move enumeration ---------------------------------------------------


def _add_unique(final_board, seq, out, seen):
    """Dedup by resulting board, first occurrence in generation order
    (reference src/moves/handle_moves.py:313-341)."""
    k = board_key(final_board)
    if k not in seen:
        seen.add(k)
        out.append((final_board, tuple(seq)))


def _handle_non_doubles(board, player, d_first, d_second, out, seen):
    """One die order; reference src/moves/handle_moves.py:109-200."""
    first_moves = submoves_one_die(board, player, d_first)
    two_seq_exists = False
    for fm in first_moves:
        b1 = apply_submove(board, player, fm)
        if submoves_one_die(b1, player, d_second):
            two_seq_exists = True
            break
    for fm in first_moves:
        b1 = apply_submove(board, player, fm)
        second_moves = submoves_one_die(b1, player, d_second)
        if two_seq_exists:
            for sm in second_moves:
                b2 = apply_submove(b1, player, sm)
                _add_unique(b2, [fm, sm], out, seen)
        else:
            _add_unique(b1, [fm], out, seen)


def _handle_doubles(board, player, die, out, seen):
    """Reference src/moves/handle_moves.py:203-310, including the
    length-4-possible flag that gates recording of shorter sequences."""
    state = {"len4": False}
    l1 = submoves_one_die(board, player, die)
    for m1 in l1:
        b1 = apply_submove(board, player, m1)
        l2 = submoves_one_die(b1, player, die)
        if not l2 and l1 and not state["len4"]:
            _add_unique(b1, [m1], out, seen)
        for m2 in l2:
            b2 = apply_submove(b1, player, m2)
            l3 = submoves_one_die(b2, player, die)
            if not l3 and l2 and not state["len4"]:
                _add_unique(b2, [m1, m2], out, seen)
            for m3 in l3:
                b3 = apply_submove(b2, player, m3)
                l4 = submoves_one_die(b3, player, die)
                if not l4 and l3 and not state["len4"]:
                    _add_unique(b3, [m1, m2, m3], out, seen)
                for m4 in l4:
                    b4 = apply_submove(b3, player, m4)
                    _add_unique(b4, [m1, m2, m3, m4], out, seen)
                    state["len4"] = True


def full_moves(board: np.ndarray, player: int, dice) -> list:
    """All legal full moves as (final_board, submove_seq) tuples, in
    reference generation/dedup order (src/moves/get_all_moves.py:10-94)."""
    out, seen = [], set()
    d0, d1 = int(dice[0]), int(dice[1])
    if d0 != d1:
        hi, lo = max(d0, d1), min(d0, d1)
        _handle_non_doubles(board, player, hi, lo, out, seen)
        # Skip the reversed order iff pass A yielded exactly one
        # single-submove move (reference get_all_moves.py:43-53).
        if not (len(out) == 1 and len(out[0][1]) == 1):
            _handle_non_doubles(board, player, lo, hi, out, seen)
    else:
        _handle_doubles(board, player, d0, out, seen)
    if not out:
        return []
    max_len = max(len(seq) for _, seq in out)
    return [(b, seq) for b, seq in out if len(seq) == max_len]


def afterstate_set(board: np.ndarray, player: int, dice) -> set:
    """The set of reachable afterstate boards (dedup'd) — the
    order-insensitive quantity the JAX enumerator must match."""
    return {board_key(b) for b, _ in full_moves(board, player, dice)}


# -- random position generator (for differential tests) ----------------------


def random_board(rng: np.random.Generator, stage: str = "any") -> np.ndarray:
    """Generate a random *legal* board (both players 15 checkers, no point
    shared by both players).  ``stage`` biases toward specific phases:
    'any', 'bar' (checkers on the bar), 'bearoff' (race/home positions)."""
    b = np.zeros(52, dtype=np.int8)
    for player in (0, 1):
        remaining = NUM_CHECKERS
        # some checkers off / on bar first
        if stage == "bearoff":
            n_off = int(rng.integers(0, 14))
            allowed = list(_home_range(player))
        else:
            n_off = int(rng.integers(0, 5)) if stage == "any" else 0
            allowed = list(range(NUM_POINTS))
        b[OFF0 + player] = n_off
        remaining -= n_off
        if stage == "bar":
            n_bar = int(rng.integers(1, 3))
            b[BAR0 + player] = n_bar
            remaining -= n_bar
        elif stage == "any":
            n_bar = int(rng.integers(0, 2))
            b[BAR0 + player] = n_bar
            remaining -= n_bar
        # scatter the rest over allowed points not occupied by the opponent
        opp_pts = points(b, 1 - player)
        free = [i for i in allowed if opp_pts[i] == 0]
        rng.shuffle(free)
        my = points(b, player)
        while remaining > 0 and free:
            idx = free[int(rng.integers(0, len(free)))]
            n = int(rng.integers(1, min(remaining, 5) + 1))
            my[idx] += n
            remaining -= n
        if remaining > 0:  # dump leftovers on the bar
            b[BAR0 + player] += remaining
    assert checker_conservation_ok(b)
    return b
