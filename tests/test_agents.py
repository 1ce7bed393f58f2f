"""Agent tests: greedy 1-ply golden behavior, 2-ply vs a brute-force
oracle expectimax, arena evaluation sanity."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from mlp_ppo_2ply_p3_tpu.agents import arena, basic, pubeval, twoply
from mlp_ppo_2ply_p3_tpu.core import dice as D
from mlp_ppo_2ply_p3_tpu.core import oracle
from mlp_ppo_2ply_p3_tpu.core.movegen import MovegenConfig
from mlp_ppo_2ply_p3_tpu.env import bg_env
from mlp_ppo_2ply_p3_tpu.models import mlp
from mlp_ppo_2ply_p3_tpu.utils.config import SearchConfig

from .test_features import ref_features_np

ENV_CFG = bg_env.EnvConfig(movegen=MovegenConfig(max_moves=128))
MODEL_CFG = mlp.ModelConfig(action_size=128, hidden_size=32)


def np_forward_value(params, feats):
    w1 = np.asarray(params["fc1"]["w"]); b1 = np.asarray(params["fc1"]["b"])
    wv = np.asarray(params["value"]["w"]); bv = np.asarray(params["value"]["b"])
    h = np.maximum(feats @ w1 + b1, 0.0)
    return (h @ wv + bv)[..., 0]


def state_from_oracle(ob, turn, dice):
    points = jnp.asarray(np.stack([ob[0:24], ob[24:48]])[None])
    bar = jnp.asarray(np.stack([ob[48], ob[49]])[None])
    off = jnp.asarray(np.stack([ob[50], ob[51]])[None])
    return bg_env.make_state(
        points, bar, off,
        jnp.asarray([turn]), jnp.asarray([list(dice)]), ENV_CFG,
    )


def test_greedy_1ply_matches_numpy_argmax():
    """Greedy agent must pick the afterstate the (numpy-replicated) value
    net ranks highest."""
    rng = np.random.default_rng(3)
    params = mlp.init_params(jax.random.PRNGKey(0), MODEL_CFG)
    for trial in range(20):
        ob = oracle.random_board(rng, "any")
        turn = int(rng.integers(0, 2))
        dice = (int(rng.integers(1, 7)), int(rng.integers(1, 7)))
        state = state_from_oracle(ob, turn, dice)
        n = int(state.n_moves[0])
        if n == 0:
            continue
        action = int(basic.greedy_1ply(params, state, MODEL_CFG)[0])
        # numpy re-derivation over the SAME afterstate list
        feats = np.asarray(bg_env.afterstate_features(state))[0, :n]
        vals = np_forward_value(params, feats)
        assert vals[action] >= vals.max() - 1e-4


def test_afterstate_features_match_reference_formula():
    """(B,M,198) afterstate features == per-board reference formula."""
    rng = np.random.default_rng(4)
    from .test_movegen import canonical_to_abs_np

    for trial in range(10):
        ob = oracle.random_board(rng, "any")
        turn = int(rng.integers(0, 2))
        dice = (int(rng.integers(1, 7)), int(rng.integers(1, 7)))
        state = state_from_oracle(ob, turn, dice)
        n = int(state.n_moves[0])
        feats = np.asarray(bg_env.afterstate_features(state))[0]
        for j in range(n):
            after_abs = canonical_to_abs_np(np.asarray(state.after[0, j]), turn)
            want = ref_features_np(after_abs, turn)
            np.testing.assert_allclose(feats[j], want, rtol=0, atol=1e-6)


def test_twoply_scores_match_bruteforce():
    """2-ply candidate scores equal a brute-force oracle expectimax with
    the same value function."""
    rng = np.random.default_rng(11)
    params = mlp.init_params(jax.random.PRNGKey(1), MODEL_CFG)
    scfg = SearchConfig(top_k=4, reply_max_moves=128)
    rolls = np.asarray(D.ROLLS_21)
    probs = np.asarray(D.ROLL_PROBS_21)

    checked = 0
    for trial in range(12):
        ob = oracle.random_board(rng, "any")
        turn = int(rng.integers(0, 2))
        dice = (int(rng.integers(1, 7)), int(rng.integers(1, 7)))
        state = state_from_oracle(ob, turn, dice)
        n = int(state.n_moves[0])
        if n == 0:
            continue
        action = int(twoply.twoply_actions(params, state, MODEL_CFG, scfg)[0])
        assert 0 <= action < n

        # brute force in numpy over ALL candidates (top_k >= n not
        # guaranteed; only verify the chosen one beats/ties every other
        # candidate that the jax code considered: recompute full scores)
        from .test_movegen import canonical_to_abs_np

        def our_value(after_abs):
            return float(np_forward_value(params, ref_features_np(after_abs, turn)[None])[0])

        def two_ply_score(after_abs):
            total = 0.0
            opp = 1 - turn
            for r, p in zip(rolls, probs):
                replies = oracle.full_moves(after_abs, opp, tuple(int(x) for x in r))
                if replies:
                    worst = min(our_value(b) for b, _ in replies)
                else:
                    worst = our_value(after_abs)
                total += p * worst
            return total

        feats = np.asarray(bg_env.afterstate_features(state))[0, :n]
        v1 = np_forward_value(params, feats)
        k = min(scfg.top_k, n)
        top_idx = np.argsort(-v1)[:k]
        scores = {
            int(i): two_ply_score(
                canonical_to_abs_np(np.asarray(state.after[0, int(i)]), turn)
            )
            for i in top_idx
        }
        best = max(scores, key=lambda i: scores[i])
        if scores[best] - scores[int(action)] > 1e-4:
            raise AssertionError(
                f"2-ply picked {action} (score {scores.get(int(action))}) "
                f"but best is {best} (score {scores[best]})"
            )
        checked += 1
    assert checked >= 5


def test_arena_pubeval_beats_random():
    """The linear heuristic baseline must clearly beat a uniform-random
    player — sanity that arena scoring and the baseline both work."""
    weights = pubeval.heuristic_weights()

    def pol_a(state, key):
        return pubeval.pubeval_actions(weights, state)

    def pol_b(state, key):
        return basic.random_actions(state, key)

    res = arena.play(pol_a, pol_b, jax.random.PRNGKey(0), ENV_CFG, 32, 300)
    assert int(res.finished) >= 28
    wr = arena.win_rate(res)
    assert wr > 0.75, f"heuristic baseline should crush random, wr={wr}"
