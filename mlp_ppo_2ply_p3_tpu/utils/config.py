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
    src/moves/expect_minmax.py documents the intended capability).

    ``reply_max_moves`` defaults ABOVE the measured doubles final maximum
    (459 over ~35k reachable position/roll pairs, core.movegen): the
    default search is exact on the reachable distribution (truncation
    rate < 0.1% over a 10k-position sweep, tests/test_agents.py), and
    any residual truncation is REPORTED per game by
    ``twoply_actions_report`` — a zero-truncation guarantee at fixed
    width is impossible because the true doubles fan-out is
    combinatorial (~3060 on adversarial spreads; the reference env
    itself silently truncates at 500, SURVEY.md Q14)."""

    top_k: int = 8              # 1-ply candidates kept for 2-ply expansion
    reply_max_moves: int = 512  # cap on opponent reply list width
    # Memory chunking (lets B=4096 x top_k x 21 rolls fit one chip's HBM
    # instead of materializing an ~18 GB reply buffer): the flattened
    # (B*top_k) candidate axis is processed in lax.map chunks of
    # ``game_chunk`` games for the 15 non-doubles rolls and
    # ``dbl_game_chunk`` for the 6 doubles rolls (whose depth-4
    # expansion peaks at ~3.5 MB/game inside the level-4 compaction);
    # reply VALUE evaluation walks the reply axis in
    # ``eval_slot_chunk``-wide feature blocks.  Peak reply memory is
    # O(game_chunk * width) per leg, independent of B.
    game_chunk: int = 2048
    dbl_game_chunk: int = 512
    eval_slot_chunk: int = 128


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
    # "{name}" expands to cfg.name at train() startup, so different runs
    # never append to the same stale JSONL stream by default
    metrics_path: str = "metrics/{name}.jsonl"
    # TensorBoard event stream beside the JSONL (the reference's primary
    # observability channel, ppo_agent.py:317-348); "" disables
    tb_logdir: str = ""
    log_every: int = 1
    eval_every: int = 25          # league eval cadence (0 disables)
    eval_games: int = 256         # arena games vs the fixed baseline
    # movegen width-cap saturation handling (the overflow flag every
    # movegen call reports): "none" ignores, "warn" prints once per
    # offending update, "abort" raises — a saturated doubles sub-batch
    # degrades affected games to a forced pass, which silently corrupts
    # training data, so the default is to warn loudly.
    overflow_policy: str = "warn"
    # remote blob store for checkpoints + metrics (utils.remote:
    # file:// | s3:// | gs://; "" disables) — replaces the reference's
    # S3 upload path (ppo_agent.py:406-470); failures never crash
    # training.  When set, a fresh worker with no local checkpoints also
    # RESUMES from the newest remote checkpoint (the reference's
    # load_model_from_s3 startup path, ppo_agent.py:441-470), which is
    # what makes preemption recovery real on a wiped disk.
    remote_url: str = ""
    # debug toggles (SURVEY.md §5.2): jax_debug_nans re-runs any jitted
    # computation that produced a NaN in op-by-op mode and raises at the
    # offending primitive — slow, for debugging only
    debug_nans: bool = False


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
            reward_perspective="absolute",  # reference Q5 credit
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
        # Flagship throughput preset (BASELINE config #3): fast() movegen
        # widths (validated caps: measured maxima + margin; saturation
        # observable via overflow_policy="warn").
        name="train4096",
        env=EnvConfig(movegen=MovegenConfig.fast(256)),
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
        # TD-Gammon-style afterstate policy at scale (the learning-run
        # preset, see LEARNING.md); fast() validated movegen widths.
        # M=256 (round 4; was 128): the round-3 committed run truncated
        # ~0.9% of sampled game-states at M=128 (doubles final max is
        # 459, far above 128); the measured per-rollout truncation rate
        # at 256 is in docs/LEARNING.md.
        name="afterstate4096",
        env=EnvConfig(movegen=MovegenConfig.fast(256)),
        model=ModelConfig(action_size=256),
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
        # BASELINE config #4: 2-ply expectimax evaluation.  Reached from
        # the CLI via the league runner (python -m
        # mlp_ppo_2ply_p3_tpu.agents.league --preset twoply) which pits
        # 2-ply vs 1-ply of the same parameters, and usable as a training
        # preset (the 2-ply agent is an eval/league policy, so training
        # settings mirror train4096 at a smaller batch).
        name="twoply",
        env=_env(256),
        model=ModelConfig(action_size=256),
        ppo=PPOConfig(
            num_envs=256,
            t_horizon=64,
            num_minibatches=8,
            normalize_adv=True,
            normalize_returns=False,
        ),
        search=SearchConfig(top_k=8, reply_max_moves=512),
        num_updates=1000,
        eval_games=64,
    )
)

_register(
    RunConfig(
        # Multi-host scale-out preset (BASELINE config #5).  Validated:
        # the full num_envs=16384 batch executes one real update over
        # the 8-virtual-device mesh in
        # tests/test_sharding.py::test_pod_preset_one_update (slow).
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
