"""Differential test: our numpy rules oracle vs the ACTUAL reference
implementation (torch, loaded read-only from /root/reference).

This pins the oracle to the reference's live behavior — afterstate sets,
move counts, submove-sequence lengths — over openings and thousands of
random positions including bar / bear-off edge cases.  The JAX enumerator
is then tested against the oracle (tests/test_movegen.py), giving
transitive parity with the reference.
"""

import numpy as np
import pytest

from mlp_ppo_2ply_p3_tpu.core import oracle

from .ref_loader import load_reference

REF = load_reference()

pytestmark = pytest.mark.skipif(REF is None, reason="reference unavailable")


def ref_afterstates(board_np, player, dice):
    """Afterstate board set + ordered list via the reference engine."""
    ib = REF.board_from_oracle(board_np)
    pl = REF.Player.PLAYER1 if player == 0 else REF.Player.PLAYER2
    moves = REF.get_all_possible_moves(pl, ib, list(dice))
    out = []
    for fm in moves:
        b = ib
        for sm in fm.sub_move_commands:
            b = b.move_checker(pl, sm)
        out.append((REF.board_to_oracle(b), len(fm.sub_move_commands)))
    return out


def check_position(board_np, player, dice):
    ours = oracle.full_moves(board_np, player, dice)
    theirs = ref_afterstates(board_np, player, dice)
    ours_set = {oracle.board_key(b) for b, _ in ours}
    theirs_set = {b.tobytes() for b, _ in theirs}
    assert ours_set == theirs_set, (
        f"afterstate set mismatch player={player} dice={dice}\n"
        f"board={board_np.tolist()}\n"
        f"ours={len(ours_set)} theirs={len(theirs_set)}"
    )
    assert len(ours) == len(theirs)
    if ours:
        assert max(len(s) for _, s in ours) == max(n for _, n in theirs)
    # order parity too (first-occurrence dedup in generation order)
    for (b_ours, _), (b_ref, _) in zip(ours, theirs):
        assert oracle.board_key(b_ours) == b_ref.tobytes()


ALL_ROLLS = [(d0, d1) for d0 in range(1, 7) for d1 in range(d0, 7)]


def test_opening_all_rolls():
    b = oracle.initial_board()
    for player in (0, 1):
        for dice in ALL_ROLLS:
            check_position(b, player, dice)


@pytest.mark.parametrize("stage", ["any", "bar", "bearoff"])
def test_random_positions(stage):
    rng = np.random.default_rng(0 if stage == "any" else hash(stage) % 2**31)
    n = 150
    for i in range(n):
        b = oracle.random_board(rng, stage=stage)
        player = int(rng.integers(0, 2))
        dice = (int(rng.integers(1, 7)), int(rng.integers(1, 7)))
        check_position(b, player, dice)


def test_deep_random_playouts():
    """Follow actual game trajectories (random moves) so positions are
    *reachable*, covering mid-game and end-game shapes."""
    rng = np.random.default_rng(42)
    for game in range(20):
        b = oracle.initial_board()
        player = int(rng.integers(0, 2))
        for ply in range(400):
            dice = (int(rng.integers(1, 7)), int(rng.integers(1, 7)))
            check_position(b, player, dice)
            moves = oracle.full_moves(b, player, dice)
            if moves:
                b = moves[int(rng.integers(0, len(moves)))][0]
            if oracle.off(b, player) == 15:
                break
            player = 1 - player
