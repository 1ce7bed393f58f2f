"""Unit tests for GAE / MC returns vs hand-computed references."""

import numpy as np
import jax.numpy as jnp

from mlp_ppo_2ply_p3_tpu.ppo import gae


def np_gae(rewards, values, dones, last_value, gamma, lam):
    t, b = rewards.shape
    adv = np.zeros((t, b), np.float32)
    nxt_adv = np.zeros(b, np.float32)
    nxt_v = last_value.copy()
    for i in reversed(range(t)):
        nd = 1.0 - dones[i]
        delta = rewards[i] + gamma * nxt_v * nd - values[i]
        nxt_adv = delta + gamma * lam * nd * nxt_adv
        adv[i] = nxt_adv
        nxt_v = values[i]
    return adv, adv + values


def np_mc_ref(rewards, dones, gamma):
    """Reference compute_returns per column (ppo_agent.py:206-216)."""
    t, b = rewards.shape
    out = np.zeros((t, b), np.float32)
    for j in range(b):
        r_run = 0.0
        for i in reversed(range(t)):
            if dones[i, j]:
                r_run = 0.0
            r_run = rewards[i, j] + gamma * r_run
            out[i, j] = r_run
    return out


def rand_case(rng, t=13, b=5):
    rewards = rng.normal(size=(t, b)).astype(np.float32)
    values = rng.normal(size=(t, b)).astype(np.float32)
    dones = (rng.random((t, b)) < 0.15).astype(np.float32)
    last_value = rng.normal(size=(b,)).astype(np.float32)
    return rewards, values, dones, last_value


def test_gae_matches_numpy():
    rng = np.random.default_rng(0)
    for _ in range(10):
        r, v, d, lv = rand_case(rng)
        adv, ret = gae.gae(
            jnp.asarray(r), jnp.asarray(v), jnp.asarray(d), jnp.asarray(lv),
            0.97, 0.9,
        )
        want_adv, want_ret = np_gae(r, v, d, lv, 0.97, 0.9)
        np.testing.assert_allclose(np.asarray(adv), want_adv, atol=1e-5)
        np.testing.assert_allclose(np.asarray(ret), want_ret, atol=1e-5)


def test_mc_returns_matches_reference_loop():
    rng = np.random.default_rng(1)
    for _ in range(10):
        r, _, d, _ = rand_case(rng)
        got = np.asarray(gae.mc_returns_ref(jnp.asarray(r), jnp.asarray(d), 0.99))
        want = np_mc_ref(r, d, 0.99)
        np.testing.assert_allclose(got, want, atol=1e-5)


def test_columns_independent():
    """Returns must NOT bleed across env columns (reference vectorized bug
    Q6 is fixed, not reproduced)."""
    rng = np.random.default_rng(2)
    r, v, d, lv = rand_case(rng, t=9, b=3)
    adv_all, _ = gae.gae(
        jnp.asarray(r), jnp.asarray(v), jnp.asarray(d), jnp.asarray(lv), 0.99, 0.95
    )
    adv_col, _ = gae.gae(
        jnp.asarray(r[:, 1:2]), jnp.asarray(v[:, 1:2]), jnp.asarray(d[:, 1:2]),
        jnp.asarray(lv[1:2]), 0.99, 0.95,
    )
    np.testing.assert_allclose(
        np.asarray(adv_all[:, 1]), np.asarray(adv_col[:, 0]), atol=1e-6
    )


def test_negamax_gae_hand_case():
    """Mover-perspective GAE vs a hand-computed alternating 3-step game:
    mover A, B, A; A wins at t=2 (+1).  B's move at t=1 must receive
    NEGATIVE credit for allowing the win; A's t=0 move positive."""
    from mlp_ppo_2ply_p3_tpu.ppo.gae import negamax_gae

    gamma, lam = 0.9, 0.8
    r = np.array([[0.0], [0.0], [1.0]], np.float32)
    v = np.array([[0.1], [-0.2], [0.3]], np.float32)
    done = np.array([[False], [False], [True]])
    flips = np.array([[True], [True], [True]])   # alternating movers
    last_v = np.array([0.7], np.float32)

    adv, ret = negamax_gae(
        jnp.asarray(r), jnp.asarray(v), jnp.asarray(done),
        jnp.asarray(flips), jnp.asarray(last_v), gamma, lam,
    )
    # hand computation (reverse):
    d2 = 1.0 - 0.3                      # done: no bootstrap
    a2 = d2
    d1 = 0.0 + gamma * (-0.3) - (-0.2)  # opponent's value negated
    a1 = d1 + gamma * lam * (-1.0) * a2
    d0 = 0.0 + gamma * (-(-0.2)) - 0.1
    a0 = d0 + gamma * lam * (-1.0) * a1
    np.testing.assert_allclose(
        np.asarray(adv)[:, 0], [a0, a1, a2], rtol=1e-6)
    np.testing.assert_allclose(
        np.asarray(ret), np.asarray(adv) + v, rtol=1e-6)
    assert a2 > 0 and a1 < 0, (a1, a2)  # loser's enabling move punished


def test_negamax_gae_no_flip_on_retry():
    """Invalid-action retries keep the same mover: no sign flip."""
    from mlp_ppo_2ply_p3_tpu.ppo.gae import gae, negamax_gae

    t, b = 6, 4
    rng = np.random.default_rng(0)
    r = rng.normal(size=(t, b)).astype(np.float32)
    v = rng.normal(size=(t, b)).astype(np.float32)
    done = np.zeros((t, b), bool)
    flips = np.zeros((t, b), bool)  # same mover throughout
    last_v = rng.normal(size=(b,)).astype(np.float32)
    a_neg, _ = negamax_gae(
        jnp.asarray(r), jnp.asarray(v), jnp.asarray(done),
        jnp.asarray(flips), jnp.asarray(last_v), 0.99, 0.95)
    a_std, _ = gae(
        jnp.asarray(r), jnp.asarray(v), jnp.asarray(done),
        jnp.asarray(last_v), 0.99, 0.95)
    np.testing.assert_allclose(np.asarray(a_neg), np.asarray(a_std), rtol=1e-5)
