"""Ad-hoc perf decomposition on the real chip: movegen / env.step /
rollout-only / full train_step at several batch sizes.

Usage: python scripts/perf_breakdown.py [B ...]
Prints one JSON line per (section, B).
"""

import json
import sys
import time

import jax
import jax.numpy as jnp

from mlp_ppo_2ply_p3_tpu.core.movegen import MovegenConfig, legal_afterstates_batch
from mlp_ppo_2ply_p3_tpu.env import bg_env
from mlp_ppo_2ply_p3_tpu.models.mlp import ModelConfig
from mlp_ppo_2ply_p3_tpu.ppo import learner


def timeit(fn, n=5):
    fn()  # warmup/compile
    t0 = time.time()
    for _ in range(n):
        out = fn()
    jax.block_until_ready(out)
    return (time.time() - t0) / n


def main():
    sizes = [int(a) for a in sys.argv[1:]] or [1024, 4096, 8192]
    mg_cfg = MovegenConfig(max_moves=256)
    env_cfg = bg_env.EnvConfig(movegen=mg_cfg)
    model_cfg = ModelConfig(action_size=256)

    for bsz in sizes:
        key = jax.random.PRNGKey(0)
        es = bg_env.reset(key, env_cfg, bsz)
        jax.block_until_ready(es.after)

        # 1. movegen alone
        vecs = jax.vmap(
            lambda p, b, o, t: __import__(
                "mlp_ppo_2ply_p3_tpu.core.board", fromlist=["x"]
            ).to_canonical(p, b, o, t)
        )(es.points, es.bar, es.off, es.turn)
        vecs = jax.block_until_ready(vecs)
        dice = es.dice
        t_mg = timeit(lambda: legal_afterstates_batch(vecs, dice, mg_cfg))

        # 2. env.step alone (includes movegen)
        acts = jnp.zeros((bsz,), jnp.int32)
        k = jax.random.PRNGKey(1)
        t_step = timeit(lambda: bg_env.step(es, acts, k, env_cfg)[0].after)

        # 3. rollout only (T=64)
        ppo_cfg = learner.PPOConfig(num_envs=bsz, t_horizon=64, num_minibatches=32)
        ts = learner.init_train_state(jax.random.PRNGKey(0), model_cfg, ppo_cfg)

        @jax.jit
        def roll_only(params, es, k):
            es2, traj, lv = learner.rollout(params, es, k, env_cfg, model_cfg, ppo_cfg)
            return traj.reward.sum()

        t_roll = timeit(lambda: roll_only(ts.params, es, k), n=3)

        # 4. full train_step
        def full():
            ts2, es2, m = learner.train_step(ts, es, env_cfg, model_cfg, ppo_cfg)
            return m["loss"]

        t_full = timeit(full, n=3)

        T = 64
        print(json.dumps({
            "B": bsz,
            "movegen_ms": round(t_mg * 1e3, 2),
            "env_step_ms": round(t_step * 1e3, 2),
            "rollout_T64_ms": round(t_roll * 1e3, 2),
            "train_step_T64_ms": round(t_full * 1e3, 2),
            "rollout_sps": round(bsz * T / t_roll),
            "train_sps": round(bsz * T / t_full),
            "update_ms": round((t_full - t_roll) * 1e3, 2),
        }), flush=True)


if __name__ == "__main__":
    main()
