"""Movegen width-cap saturation handling: shrinking a cap must set the
per-game overflow flag, and the trainer must apply RunConfig.
overflow_policy (warn completes / abort raises) — the story
core/movegen.py's docstring promises (round-2 Weak #4/#6)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from mlp_ppo_2ply_p3_tpu.core import movegen as MG
from mlp_ppo_2ply_p3_tpu.core.movegen import MovegenConfig
from mlp_ppo_2ply_p3_tpu.env import bg_env
from mlp_ppo_2ply_p3_tpu.models.mlp import ModelConfig
from mlp_ppo_2ply_p3_tpu.ppo import learner
from mlp_ppo_2ply_p3_tpu.ppo import train as train_mod
from mlp_ppo_2ply_p3_tpu.utils.config import RunConfig

# absurdly tight caps: the opening position alone overflows max_moves
TINY = MovegenConfig(max_moves=4, k2=8, k3=8, dedup_width=16)


def test_overflow_flag_reports_saturation():
    state = bg_env.reset(
        jax.random.PRNGKey(0), bg_env.EnvConfig(movegen=TINY), 64
    )
    # opening rolls admit >4 legal moves in every game
    assert bool(jnp.all(state.overflow)), (
        np.asarray(state.overflow).tolist()
    )
    # and sane caps report none
    state2 = bg_env.reset(jax.random.PRNGKey(0), bg_env.EnvConfig(), 64)
    assert not bool(jnp.any(state2.overflow))


def _tiny_cfg(policy: str, tmp_path) -> RunConfig:
    return RunConfig(
        name=f"overflow_{policy}",
        env=bg_env.EnvConfig(movegen=TINY),
        model=ModelConfig(action_size=4, hidden_size=16),
        ppo=learner.PPOConfig(num_envs=8, t_horizon=4, num_epochs=1,
                              num_minibatches=2),
        num_updates=1,
        checkpoint_every=0,
        eval_every=0,
        checkpoint_dir=str(tmp_path),
        overflow_policy=policy,
    )


def test_trainer_abort_policy_raises(tmp_path):
    with pytest.raises(RuntimeError, match="saturation"):
        train_mod.train(_tiny_cfg("abort", tmp_path), resume=False,
                        write_metrics=False, shard=False)


def test_trainer_warn_policy_completes(tmp_path, capsys):
    ts, _, metrics, _ = train_mod.train(
        _tiny_cfg("warn", tmp_path), resume=False, write_metrics=False,
        shard=False,
    )
    assert int(ts.update_idx) == 1
    assert int(metrics["movegen_overflow"]) > 0
    assert "saturation" in capsys.readouterr().out
