"""Headline benchmark: env-steps/s per chip for full PPO training
(rollout + GAE + minibatched update, all on-device) at 4096 parallel
games.

Prints ONE JSON line:
  {"metric": "env_steps_per_sec_per_chip", "value": N, "unit": "steps/s",
   "vs_baseline": R}

Baseline: the reference design's throughput ceiling is O(10^2-10^3)
env-steps/s total (Python per-board move generation with per-point
device syncs, serial 8-env loop — BASELINE.md); we use 1000 steps/s as
the comparison denominator.

Env knobs: BENCH_ENVS (default 4096), BENCH_T (default 64),
BENCH_UPDATES (default 3 timed), BENCH_MOVEGEN (fast | default | parity
width preset, default fast — validated caps, see
core.movegen.MovegenConfig.fast), BENCH_PRESET (a RunConfig preset name
whose env/model/ppo configs replace the defaults; BENCH_ENVS/BENCH_T
still override sizes).
"""

import json
import os
import sys
import time

_plat = (os.environ.get("JAX_PLATFORMS") or "axon").split(",")[0]
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", f"/root/.cache/jax-{_plat}")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")

import jax

# The image boots every process with the remote-TPU PJRT plugin ("axon")
# regardless of JAX_PLATFORMS; honor an explicit cpu request (see
# tests/conftest.py for the same workaround).
if _plat == "cpu":
    jax.config.update("jax_platforms", "cpu")
    try:
        from jax._src import xla_bridge as _xb

        _xb._backend_factories.pop("axon", None)
    except Exception:
        pass

REFERENCE_BASELINE_STEPS_PER_SEC = 1000.0


def main():
    import dataclasses

    from mlp_ppo_2ply_p3_tpu.core.movegen import MovegenConfig
    from mlp_ppo_2ply_p3_tpu.env import bg_env
    from mlp_ppo_2ply_p3_tpu.models.mlp import ModelConfig
    from mlp_ppo_2ply_p3_tpu.ppo import learner

    num_envs = int(os.environ.get("BENCH_ENVS", 4096))
    t_horizon = int(os.environ.get("BENCH_T", 64))
    timed_updates = int(os.environ.get("BENCH_UPDATES", 3))
    max_moves = int(os.environ.get("BENCH_MAX_MOVES", 256))
    mg_name = os.environ.get("BENCH_MOVEGEN", "fast")
    mg_cfg = {
        "fast": MovegenConfig.fast,
        "default": MovegenConfig,
        "parity": MovegenConfig.parity,
    }[mg_name](max_moves=max_moves)

    preset = os.environ.get("BENCH_PRESET", "")
    if preset:
        from mlp_ppo_2ply_p3_tpu.utils.config import get_preset

        cfg = get_preset(preset)
        env_cfg, model_cfg = cfg.env, cfg.model
        ppo_cfg = dataclasses.replace(
            cfg.ppo,
            num_envs=int(os.environ.get("BENCH_ENVS", cfg.ppo.num_envs)),
            t_horizon=int(os.environ.get("BENCH_T", cfg.ppo.t_horizon)),
        )
        num_envs, t_horizon = ppo_cfg.num_envs, ppo_cfg.t_horizon
    else:
        env_cfg = bg_env.EnvConfig(movegen=mg_cfg)
        model_cfg = ModelConfig(action_size=max_moves)
        ppo_cfg = learner.PPOConfig(
            num_envs=num_envs,
            t_horizon=t_horizon,
            num_minibatches=32,
            normalize_adv=True,
            normalize_returns=False,
        )

    ts = learner.init_train_state(jax.random.PRNGKey(0), model_cfg, ppo_cfg)
    env_state = bg_env.reset(jax.random.PRNGKey(1), env_cfg, num_envs)

    # warmup / compile.  Fences are scalar host readbacks
    # (profiling._hard_sync): under the remote-PJRT tunnel
    # block_until_ready can return before execution finishes
    # (utils/profiling.py), so a device->host transfer is the only
    # reliable completion barrier for the timed region.
    from mlp_ppo_2ply_p3_tpu.utils.profiling import _hard_sync

    ts, env_state, metrics = learner.train_step(
        ts, env_state, env_cfg, model_cfg, ppo_cfg
    )
    _hard_sync(metrics)

    t0 = time.time()
    for _ in range(timed_updates):
        ts, env_state, metrics = learner.train_step(
            ts, env_state, env_cfg, model_cfg, ppo_cfg
        )
    _hard_sync(metrics)
    dt = time.time() - t0

    steps = num_envs * t_horizon * timed_updates
    n_chips = max(1, jax.device_count())
    sps = steps / dt / n_chips
    print(
        json.dumps(
            {
                "metric": "env_steps_per_sec_per_chip",
                "value": round(sps, 1),
                "unit": "steps/s",
                "vs_baseline": round(sps / REFERENCE_BASELINE_STEPS_PER_SEC, 2),
            }
        )
    )


if __name__ == "__main__":
    sys.exit(main())
