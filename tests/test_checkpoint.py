"""Checkpoint round-trip: full train state (params, optimizer, PRNG,
counters, env state) must restore exactly (reference saved weights only —
SURVEY.md §5.4)."""

import os

import jax
import jax.numpy as jnp
import numpy as np

from mlp_ppo_2ply_p3_tpu.core.movegen import MovegenConfig
from mlp_ppo_2ply_p3_tpu.env import bg_env
from mlp_ppo_2ply_p3_tpu.models.mlp import ModelConfig
from mlp_ppo_2ply_p3_tpu.ppo import learner
from mlp_ppo_2ply_p3_tpu.utils import checkpoint as ckpt

ENV_CFG = bg_env.EnvConfig(movegen=MovegenConfig(max_moves=64, k2=64, k3=64))
MODEL_CFG = ModelConfig(action_size=64, hidden_size=32)
CFG = learner.PPOConfig(num_envs=4, t_horizon=8, num_epochs=1, num_minibatches=2)


def test_roundtrip_exact(tmp_path):
    ts = learner.init_train_state(jax.random.PRNGKey(0), MODEL_CFG, CFG)
    env_state = bg_env.reset(jax.random.PRNGKey(1), ENV_CFG, CFG.num_envs)
    ts, env_state, _ = learner.train_step(ts, env_state, ENV_CFG, MODEL_CFG, CFG)

    path = os.path.join(tmp_path, "ckpt_1")
    ckpt.save(path, (ts, env_state))
    like = (
        learner.init_train_state(jax.random.PRNGKey(9), MODEL_CFG, CFG),
        bg_env.reset(jax.random.PRNGKey(8), ENV_CFG, CFG.num_envs),
    )
    ts2, env2 = ckpt.restore(path, like)
    for a, b in zip(jax.tree_util.tree_leaves(ts), jax.tree_util.tree_leaves(ts2)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    for a, b in zip(
        jax.tree_util.tree_leaves(env_state), jax.tree_util.tree_leaves(env2)
    ):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    # resumed training continues bitwise-identically
    out_a = learner.train_step(ts, env_state, ENV_CFG, MODEL_CFG, CFG)
    out_b = learner.train_step(ts2, env2, ENV_CFG, MODEL_CFG, CFG)
    assert float(out_a[2]["loss"]) == float(out_b[2]["loss"])


def test_structure_mismatch_fails_loudly(tmp_path):
    """A pytree evolution between save and restore must raise, not
    silently mis-restore positional arrays (round-2 Weak #8)."""
    import pytest

    path = os.path.join(tmp_path, "ckpt_1")
    ckpt.save(path, {"a": jnp.ones((2, 3)), "b": jnp.zeros((4,), jnp.int32)},
              backend="npz")
    # same leaf count, different shapes/names
    with pytest.raises(ValueError, match="structure mismatch"):
        ckpt.restore(path, {"a": jnp.ones((2, 3)), "c": jnp.zeros((5,), jnp.int32)},
                     backend="npz")
    # different dtype
    with pytest.raises(ValueError, match="structure mismatch"):
        ckpt.restore(path, {"a": jnp.ones((2, 3)), "b": jnp.zeros((4,), jnp.float32)},
                     backend="npz")
    # matching structure still restores
    out = ckpt.restore(path, {"a": jnp.zeros((2, 3)), "b": jnp.ones((4,), jnp.int32)},
                       backend="npz")
    np.testing.assert_array_equal(np.asarray(out["a"]), np.ones((2, 3)))


def test_latest_selection(tmp_path):
    d = str(tmp_path)
    for step in (3, 12, 7):
        ckpt.save(os.path.join(d, f"ckpt_{step}"), {"x": jnp.ones(2) * step})
    path = ckpt.latest(d)
    assert path.endswith("ckpt_12") or path.endswith("ckpt_12.npz")
