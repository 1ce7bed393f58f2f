"""Exact-trajectory parity vs the LIVE reference env (BASELINE config #1).

Drives the reference's ``BackgammonEnv``
(/root/reference/src/environment/backgammon_env.py:35-405) and our
batched functional env (``mlp_ppo_2ply_p3_tpu.env.bg_env``) step-for-step
with an identical injected dice stream and identical action choices
(shared seeded RNG over the legal-move index, with occasional
deliberately-invalid actions), asserting at every half-turn:

- observation (198-dim features) matches to 1e-6;
- legal-move count and the FULL ordered afterstate-feature list match
  (this pins movegen output *order* to the live reference, not just the
  set);
- reward, done, winner, game_score match (win / gammon / backgammon,
  auto-pass Q12, invalid-action Q12, auto-reset);
- match scores accumulate identically (match scoring to match_length).

Dice injection: the reference samples via ``env.roll_dice`` -> patched
per-instance to pop from a scripted stream.  Our env samples dice inside
jit; the harness instead re-injects the reference's roll into a mirrored
``EnvState`` after each step (``make_state``), so every *semantic* step
transition (reward, scoring, turn flow, movegen, encoding) is computed
independently by both sides from identical (board, player, dice) inputs.
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from mlp_ppo_2ply_p3_tpu.core import board as B
from mlp_ppo_2ply_p3_tpu.core.movegen import MovegenConfig
from mlp_ppo_2ply_p3_tpu.env import bg_env

from .ref_loader import load_reference_env

REF = load_reference_env()

pytestmark = pytest.mark.skipif(REF is None, reason="reference unavailable")

# The parity preset: exact reference list ORDER (incl. doubles
# replenishment chains), caps above every practical bound, and M = 500
# matching the reference env's max_legal_moves cap — when a pathological
# doubles position exceeds 500 moves BOTH sides keep the first 500 in
# generation order (Q14).
CFG = bg_env.EnvConfig(movegen=MovegenConfig.parity(500))


def _patch_dice(env, rng):
    """Replace the env's np.random dice with a seeded scripted stream."""

    def roll():
        env.roll_result = [int(rng.integers(1, 7)), int(rng.integers(1, 7))]

    env.roll_dice = roll


def _mirror(env):
    """Build our (B=1) EnvState from the reference env's live state."""
    ob = REF.board_to_oracle(env.board)
    points = jnp.asarray(
        np.stack([ob[0:24], ob[24:48]])[None], jnp.int8
    )  # (1,2,24)
    bar = jnp.asarray(ob[48:50][None], jnp.int8)
    off = jnp.asarray(ob[50:52][None], jnp.int8)
    turn = jnp.asarray([env.current_player.value], jnp.int8)
    dice = jnp.asarray([env.roll_result], jnp.int8)
    st = bg_env.make_state(points, bar, off, turn, dice, CFG)
    score = jnp.asarray(
        [[env.player_scores[REF.Player.PLAYER1],
          env.player_scores[REF.Player.PLAYER2]]], jnp.int32
    )
    go = bool(env.game_over)
    st = st._replace(
        score=score,
        game_over=jnp.asarray([go]),
        match_over=jnp.asarray([bool(env.match_over)]),
        n_moves=jnp.where(jnp.asarray([go]), 0, st.n_moves),
    )
    return st


def _ref_scores(env):
    return (
        env.player_scores[REF.Player.PLAYER1],
        env.player_scores[REF.Player.PLAYER2],
    )


@pytest.mark.slow
def test_exact_trajectory_parity():
    env = REF.BackgammonEnv(match_length=3, device=None)
    dice_rng = np.random.default_rng(20260819)
    act_rng = np.random.default_rng(42)
    _patch_dice(env, dice_rng)

    ref_obs = env.reset()
    state = _mirror(env)
    key = jax.random.PRNGKey(0)

    games_done = 0
    outcomes = {1: 0, 2: 0, 3: 0}
    n_pass = n_invalid = 0
    step_idx = 0

    while games_done < 50 and step_idx < 6000:
        step_idx += 1
        game_over_pre = bool(env.game_over)
        n_ref = int(env.action_mask.sum().item())

        # --- pre-step comparisons -------------------------------------------
        ours_obs = np.asarray(bg_env.observe(state)[0])
        np.testing.assert_allclose(
            ours_obs, ref_obs.cpu().numpy(), atol=1e-6,
            err_msg=f"obs mismatch at step {step_idx}",
        )
        if not game_over_pre:
            n_ours = int(state.n_moves[0])
            assert n_ours == n_ref, (
                f"legal-move count mismatch at step {step_idx}: "
                f"{n_ours} vs {n_ref}"
            )
            # overflow may only fire on reference-cap truncation (=500)
            assert not bool(state.overflow[0]) or n_ours == 500
            if n_ref > 0:
                ours_feats = np.asarray(
                    bg_env.afterstate_features(state)[0, :n_ref]
                )
                ref_feats = env.legal_board_features[:n_ref].cpu().numpy()
                np.testing.assert_allclose(
                    ours_feats, ref_feats, atol=1e-6,
                    err_msg=(
                        f"ordered afterstate features mismatch at step "
                        f"{step_idx}"
                    ),
                )

        # --- action choice (shared) -----------------------------------------
        if n_ref == 0 or game_over_pre:
            action = 0
        elif act_rng.random() < 0.04 and n_ref + 3 < 500:
            action = n_ref + 3  # deliberately invalid (Q12)
            n_invalid += 1
        else:
            action = int(act_rng.integers(0, n_ref))

        # --- step both ------------------------------------------------------
        ref_obs, ref_reward, ref_done, ref_info = env.step(action)
        key, k_step = jax.random.split(key)
        ns, sinfo = bg_env.step(
            state, jnp.asarray([action], jnp.int32), k_step, CFG
        )

        # --- post-step comparisons ------------------------------------------
        assert float(sinfo.reward[0]) == pytest.approx(
            float(ref_reward.item()), abs=1e-6
        ), f"reward mismatch at step {step_idx} (action {action})"
        assert bool(sinfo.done[0]) == bool(ref_done), (
            f"done mismatch at step {step_idx}"
        )
        if "winner" in ref_info:
            assert int(sinfo.winner[0]) == ref_info["winner"].value
            assert int(sinfo.game_score[0]) == ref_info["game_score"]
            outcomes[ref_info["game_score"]] += 1
        elif not game_over_pre:
            assert int(sinfo.game_score[0]) == 0
        if not game_over_pre:
            ours_scores = tuple(int(x) for x in np.asarray(ns.score[0]))
            assert ours_scores == _ref_scores(env), (
                f"match-score mismatch at step {step_idx}"
            )
        if n_ref == 0 and not game_over_pre:
            assert bool(sinfo.passed[0])
            n_pass += 1
        if action >= n_ref and n_ref > 0 and not game_over_pre:
            assert bool(sinfo.invalid[0])

        if bool(ref_done):
            games_done += 1

        # --- resync dice/board for the next half-turn -----------------------
        state = _mirror(env)

    assert games_done >= 50, f"only {games_done} games in {step_idx} steps"
    assert n_invalid > 0, "no invalid actions exercised"
    assert outcomes[2] + outcomes[3] > 0, "no gammon/backgammon endings seen"
    print(
        f"parity over {step_idx} steps, {games_done} games "
        f"(normal/gammon/backgammon {outcomes[1]}/{outcomes[2]}/{outcomes[3]}, "
        f"{n_pass} auto-passes, {n_invalid} invalid actions)"
    )
