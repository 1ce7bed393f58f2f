"""Typed configuration tree + named presets.

Replaces the reference's star-imported constants module
(/root/reference/src/agent/config.py, SURVEY.md §5.6) with frozen
dataclasses.  The five presets mirror the BASELINE.json configs:

- ``parity``     (#1): single-game-scale CPU/debug run with
                 reference-faithful learner semantics (MC returns,
                 return normalization, full batch).
- ``vmap256``    (#2): 256 vmapped games, 1-ply policy, one chip.
- ``train4096``  (#3): 4096-game on-device PPO (GAE, minibatches).
- ``twoply``     (#4): 2-ply expectimax evaluation settings.
- ``pod``        (#5): multi-host sharded training defaults.
"""

from __future__ import annotations

import dataclasses

from ..core.movegen import MovegenConfig
from ..env.bg_env import EnvConfig
from ..models.mlp import ModelConfig
from ..ppo.learner import PPOConfig


@dataclasses.dataclass(frozen=True)
class SearchConfig:
    """2-ply expectimax settings (BASELINE config #4; reference dead code
    src/moves/expect_minmax.py documents the intended capability)."""

    top_k: int = 8            # 1-ply candidates kept for 2-ply expansion
    reply_max_moves: int = 64 # cap on opponent reply list width


@dataclasses.dataclass(frozen=True)
class RunConfig:
    name: str = "default"
    env: EnvConfig = EnvConfig()
    model: ModelConfig = ModelConfig()
    ppo: PPOConfig = PPOConfig()
    search: SearchConfig = SearchConfig()
    num_updates: int = 1000       # reference NUM_UPDATES
    seed: int = 0
    checkpoint_every: int = 10    # updates (reference train.py:116)
    checkpoint_dir: str = "checkpoints"
    metrics_path: str = "metrics.jsonl"
    log_every: int = 1
    eval_every: int = 25          # league eval cadence (0 disables)
    eval_games: int = 256         # arena games vs the fixed baseline


def _env(max_moves: int) -> EnvConfig:
    return EnvConfig(movegen=MovegenConfig(max_moves=max_moves))


PRESETS = {}


def _register(cfg: RunConfig):
    PRESETS[cfg.name] = cfg
    return cfg


_register(
    RunConfig(
        name="parity",
        env=_env(500),
        model=ModelConfig(action_size=500),
        ppo=PPOConfig(
            num_envs=8,
            t_horizon=512,
            num_minibatches=1,
            use_gae=False,
            normalize_returns=True,
            max_grad_norm=0.0,
            reset_each_update=True,  # reference train.py:40
        ),
        num_updates=1000,
    )
)

_register(
    RunConfig(
        name="debug",
        env=_env(128),
        model=ModelConfig(action_size=128),
        ppo=PPOConfig(num_envs=8, t_horizon=64, num_minibatches=2),
        num_updates=5,
        eval_every=3,
        eval_games=16,
    )
)

_register(
    RunConfig(
        name="vmap256",
        env=_env(256),
        model=ModelConfig(action_size=256),
        ppo=PPOConfig(num_envs=256, t_horizon=128),
        num_updates=1000,
    )
)

_register(
    RunConfig(
        name="train4096",
        env=_env(256),
        model=ModelConfig(action_size=256),
        ppo=PPOConfig(
            num_envs=4096,
            t_horizon=128,
            num_minibatches=32,
            normalize_adv=True,
            normalize_returns=False,
        ),
        num_updates=1000,
    )
)

_register(
    RunConfig(
        name="afterstate4096",
        env=_env(128),
        model=ModelConfig(action_size=128),
        ppo=PPOConfig(
            num_envs=4096,
            t_horizon=64,
            num_minibatches=32,
            normalize_adv=True,
            normalize_returns=False,
            policy_mode="afterstate",
        ),
        num_updates=1000,
    )
)

_register(
    RunConfig(
        name="pod",
        env=_env(256),
        model=ModelConfig(action_size=256),
        ppo=PPOConfig(
            num_envs=16384,
            t_horizon=128,
            num_minibatches=32,
            normalize_adv=True,
            normalize_returns=False,
        ),
        num_updates=1000,
    )
)


def get_preset(name: str) -> RunConfig:
    if name not in PRESETS:
        raise KeyError(f"unknown preset {name!r}; have {sorted(PRESETS)}")
    return PRESETS[name]
