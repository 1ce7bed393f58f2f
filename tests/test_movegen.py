"""Differential tests: JAX legal-move enumerator vs the numpy oracle
(which is itself pinned to the reference in test_oracle_vs_reference).

Parity is at the afterstate-set level (the list ordering is canonical,
not reference generation order — documented in core/movegen.py)."""

import numpy as np
import pytest

from mlp_ppo_2ply_p3_tpu.core import board as Bd
from mlp_ppo_2ply_p3_tpu.core import movegen, oracle

import jax.numpy as jnp

CFG = movegen.MovegenConfig(max_moves=500, k2=128, k3=320)


def abs_to_canonical_np(ob: np.ndarray, player: int) -> np.ndarray:
    """oracle absolute (52,) -> canonical (52,) in numpy."""
    my = ob[24 * player : 24 * player + 24]
    opp = ob[24 * (1 - player) : 24 * (1 - player) + 24]
    if player == 1:
        my, opp = my[::-1], opp[::-1]
    tail = np.array(
        [ob[48 + player], ob[48 + (1 - player)], ob[50 + player], ob[50 + (1 - player)]],
        dtype=np.int8,
    )
    return np.concatenate([my, opp, tail]).astype(np.int8)


def canonical_to_abs_np(vec: np.ndarray, player: int) -> np.ndarray:
    my, opp = vec[0:24], vec[24:48]
    if player == 1:
        my, opp = my[::-1], opp[::-1]
    ob = np.zeros(52, dtype=np.int8)
    ob[24 * player : 24 * player + 24] = my
    ob[24 * (1 - player) : 24 * (1 - player) + 24] = opp
    ob[48 + player], ob[48 + (1 - player)] = vec[48], vec[49]
    ob[50 + player], ob[50 + (1 - player)] = vec[50], vec[51]
    return ob


def jax_afterstate_set(ob, player, dice, cfg=CFG):
    vec = jnp.asarray(abs_to_canonical_np(ob, player))
    boards, n, overflow = movegen.legal_afterstates(
        vec, jnp.asarray(dice, dtype=jnp.int32), cfg
    )
    assert not bool(overflow), f"movegen overflow at dice={dice}"
    boards = np.asarray(boards)
    n = int(n)
    return {
        canonical_to_abs_np(boards[i], player).tobytes() for i in range(n)
    }, n


def check_position(ob, player, dice):
    want = oracle.afterstate_set(ob, player, dice)
    got, n = jax_afterstate_set(ob, player, dice)
    assert n == len(got), "padded duplicates in move list"
    assert got == want, (
        f"afterstate set mismatch player={player} dice={dice} "
        f"got={len(got)} want={len(want)}\nboard={ob.tolist()}"
    )


ALL_ROLLS = [(d0, d1) for d0 in range(1, 7) for d1 in range(d0, 7)]


def test_opening_all_rolls():
    b = oracle.initial_board()
    for player in (0, 1):
        for dice in ALL_ROLLS:
            check_position(b, player, dice)


@pytest.mark.parametrize("stage", ["any", "bar", "bearoff"])
def test_random_positions(stage):
    rng = np.random.default_rng(hash(stage) % 2**31)
    for i in range(120):
        b = oracle.random_board(rng, stage=stage)
        player = int(rng.integers(0, 2))
        dice = (int(rng.integers(1, 7)), int(rng.integers(1, 7)))
        check_position(b, player, dice)


def test_random_playouts():
    rng = np.random.default_rng(7)
    for game in range(8):
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


def test_doubles_deep_positions():
    """Positions engineered to stress the doubles frontier (many spread
    checkers -> widest expansions)."""
    rng = np.random.default_rng(99)
    for i in range(60):
        b = oracle.random_board(rng, stage="any")
        player = int(rng.integers(0, 2))
        d = int(rng.integers(1, 7))
        check_position(b, player, (d, d))


def test_pallas_compaction_path_matches_jnp():
    """use_pallas=True (ops.compaction kernel, interpreter mode on CPU)
    produces bit-identical move lists, counts, and overflow flags to the
    jnp reference path over random boards x assorted rolls."""
    import dataclasses

    rng = np.random.default_rng(21)
    cfg_ref = movegen.MovegenConfig(max_moves=128)
    cfg_pls = [
        dataclasses.replace(cfg_ref, use_pallas=True, pallas_kernel=k)
        for k in ("onehot", "segmented")
    ]

    boards, turns = [], []
    for stage in ("any", "bearoff", "bar"):
        for _ in range(8):
            boards.append(oracle.random_board(rng, stage))
            turns.append(int(rng.integers(0, 2)))
    vecs = jnp.asarray(
        np.stack([
            abs_to_canonical_np(ob, t) for ob, t in zip(boards, turns)
        ])
    )
    for dice in [(3, 3), (6, 6), (1, 1), (6, 5), (2, 1), (4, 2)]:
        dc = jnp.asarray(np.tile(np.asarray(dice, np.int8), (len(boards), 1)))
        out_a, n_a, of_a = movegen.legal_afterstates_batch(vecs, dc, cfg_ref)
        for cfg_pl in cfg_pls:
            out_b, n_b, of_b = movegen.legal_afterstates_batch(
                vecs, dc, cfg_pl
            )
            np.testing.assert_array_equal(np.asarray(n_a), np.asarray(n_b))
            np.testing.assert_array_equal(np.asarray(of_a), np.asarray(of_b))
            np.testing.assert_array_equal(np.asarray(out_a), np.asarray(out_b))
