"""PPO learner smoke + correctness tests at tiny scale (CPU)."""

import jax
import jax.numpy as jnp
import numpy as np

from mlp_ppo_2ply_p3_tpu.core.movegen import MovegenConfig
from mlp_ppo_2ply_p3_tpu.env import bg_env
from mlp_ppo_2ply_p3_tpu.models.mlp import ModelConfig
from mlp_ppo_2ply_p3_tpu.ppo import learner

ENV_CFG = bg_env.EnvConfig(movegen=MovegenConfig(max_moves=64, k2=64, k3=64))
MODEL_CFG = ModelConfig(action_size=64, hidden_size=32)
PPO_CFG = learner.PPOConfig(num_envs=4, t_horizon=16, num_epochs=2, num_minibatches=2)


def _tree_l2_diff(a, b):
    return sum(
        float(jnp.sum((x - y) ** 2))
        for x, y in zip(jax.tree_util.tree_leaves(a), jax.tree_util.tree_leaves(b))
    )


def test_train_step_runs_and_updates_params():
    ts = learner.init_train_state(jax.random.PRNGKey(0), MODEL_CFG, PPO_CFG)
    env_state = bg_env.reset(jax.random.PRNGKey(1), ENV_CFG, PPO_CFG.num_envs)
    ts2, env_state2, metrics = learner.train_step(
        ts, env_state, ENV_CFG, MODEL_CFG, PPO_CFG
    )
    for k in ("loss", "policy_loss", "value_loss", "entropy"):
        assert np.isfinite(float(metrics[k])), f"{k} not finite"
    assert _tree_l2_diff(ts.params, ts2.params) > 0, "params did not move"
    assert int(ts2.update_idx) * PPO_CFG.num_envs * PPO_CFG.t_horizon == PPO_CFG.num_envs * PPO_CFG.t_horizon
    assert int(ts2.update_idx) == 1
    # env advanced
    assert not np.array_equal(
        np.asarray(env_state.dice), np.asarray(env_state2.dice)
    )


def test_train_step_deterministic():
    ts = learner.init_train_state(jax.random.PRNGKey(0), MODEL_CFG, PPO_CFG)
    env_state = bg_env.reset(jax.random.PRNGKey(1), ENV_CFG, PPO_CFG.num_envs)
    out1 = learner.train_step(ts, env_state, ENV_CFG, MODEL_CFG, PPO_CFG)
    out2 = learner.train_step(ts, env_state, ENV_CFG, MODEL_CFG, PPO_CFG)
    assert float(out1[2]["loss"]) == float(out2[2]["loss"])
    assert _tree_l2_diff(out1[0].params, out2[0].params) == 0.0


def test_entropy_coef_schedule():
    cfg = PPO_CFG
    c0 = float(learner.entropy_coef(cfg, jnp.asarray(0)))
    cm = float(learner.entropy_coef(cfg, jnp.asarray(cfg.entropy_anneal_episodes // 2)))
    c1 = float(learner.entropy_coef(cfg, jnp.asarray(cfg.entropy_anneal_episodes * 2)))
    assert np.isclose(c0, cfg.entropy_coef_start)
    assert np.isclose(c1, cfg.entropy_coef_end)
    assert c1 < cm < c0


def test_afterstate_policy_mode():
    """TD-Gammon-style afterstate policy: rollout stores candidate boards
    and the update recomputes score-head logits from them."""
    cfg = learner.PPOConfig(
        num_envs=4, t_horizon=12, num_epochs=2, num_minibatches=2,
        policy_mode="afterstate",
    )
    ts = learner.init_train_state(jax.random.PRNGKey(0), MODEL_CFG, cfg)
    env_state = bg_env.reset(jax.random.PRNGKey(1), ENV_CFG, cfg.num_envs)
    ts2, _, metrics = learner.train_step(ts, env_state, ENV_CFG, MODEL_CFG, cfg)
    assert np.isfinite(float(metrics["loss"]))
    assert _tree_l2_diff(ts.params, ts2.params) > 0
    # the score head must receive gradient in this mode
    d_score = float(
        jnp.sum((ts.params["score"]["w"] - ts2.params["score"]["w"]) ** 2)
    )
    assert d_score > 0, "score head did not train"


def test_reference_semantics_preset():
    """MC-returns / full-batch / no-clipping mode (parity with reference
    learner quirks Q3/Q4) runs and is finite."""
    cfg = learner.PPOConfig(
        num_envs=4,
        t_horizon=16,
        num_epochs=2,
        num_minibatches=1,
        use_gae=False,
        normalize_returns=True,
        max_grad_norm=0.0,
    )
    ts = learner.init_train_state(jax.random.PRNGKey(0), MODEL_CFG, cfg)
    env_state = bg_env.reset(jax.random.PRNGKey(1), ENV_CFG, cfg.num_envs)
    ts2, _, metrics = learner.train_step(ts, env_state, ENV_CFG, MODEL_CFG, cfg)
    assert np.isfinite(float(metrics["loss"]))
    assert _tree_l2_diff(ts.params, ts2.params) > 0
