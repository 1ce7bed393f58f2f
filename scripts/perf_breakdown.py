"""Perf decomposition on the real chip: movegen (default + fast widths,
and its internal phases) / env.step / rollout-only / full train_step at
several batch sizes.  Source of docs/PERF.md.

Usage: python scripts/perf_breakdown.py [B ...]
Prints one JSON line per batch size.
"""

import json
import sys

import jax
import jax.numpy as jnp

from mlp_ppo_2ply_p3_tpu.core import board as Bd
from mlp_ppo_2ply_p3_tpu.core import movegen as MG
from mlp_ppo_2ply_p3_tpu.core.movegen import MovegenConfig, legal_afterstates_batch
from mlp_ppo_2ply_p3_tpu.env import bg_env
from mlp_ppo_2ply_p3_tpu.models.mlp import ModelConfig
from mlp_ppo_2ply_p3_tpu.ppo import learner
from mlp_ppo_2ply_p3_tpu.utils.profiling import timed_scan, timeit

T = 64


def movegen_phase_times(vecs, dice, cfg):
    """Time the movegen internals in isolation (remote-safe scan timer):
    the non-doubles kernel over the full batch, the doubles kernel over
    its sub-batch, and the non-doubles dedup block."""
    bsz = vecs.shape[0]
    d0 = dice[:, 0].astype(jnp.int32)
    d_hi = jnp.maximum(d0, dice[:, 1].astype(jnp.int32))
    d_lo = jnp.minimum(d0, dice[:, 1].astype(jnp.int32))

    mir = jnp.zeros((bsz,), bool)
    t_nd = timed_scan(
        lambda v, h, l: MG._nondoubles_batch(v, h, l, cfg, mir),
        vecs, d_hi, d_lo,
    )
    bd = MG.doubles_capacity(bsz, cfg)
    t_db = timed_scan(
        lambda v, d: MG._doubles_batch(v, d, cfg, mir[:bd]),
        vecs[:bd], d0[:bd],
    )
    boards = jnp.zeros((bsz, cfg.dedup_width, 52), jnp.int8)
    valid = jnp.ones((bsz, cfg.dedup_width), bool)
    t_dedup = timed_scan(
        lambda b, v: jax.vmap(MG._dedup_pairwise)(b, v), boards, valid
    )
    return t_nd, t_db, t_dedup


def main():
    sizes = [int(a) for a in sys.argv[1:]] or [4096, 8192, 16384]
    results = []
    for bsz in sizes:
        row = {"B": bsz, "T": T}
        for name, mg_cfg in (
            ("default", MovegenConfig(max_moves=256)),
            ("fast", MovegenConfig.fast(256)),
        ):
            env_cfg = bg_env.EnvConfig(movegen=mg_cfg)
            model_cfg = ModelConfig(action_size=256)
            key = jax.random.PRNGKey(0)
            es = bg_env.reset(key, env_cfg, bsz)
            jax.block_until_ready(es.after)

            vecs = jax.vmap(Bd.to_canonical)(es.points, es.bar, es.off, es.turn)
            vecs = jax.block_until_ready(vecs)
            t_mg = timed_scan(
                lambda v, d: legal_afterstates_batch(v, d, mg_cfg),
                vecs, es.dice,
            )
            t_nd, t_db, t_dedup = movegen_phase_times(vecs, es.dice, mg_cfg)

            acts = jnp.zeros((bsz,), jnp.int32)
            k = jax.random.PRNGKey(1)
            t_step = timeit(lambda: bg_env.step(es, acts, k, env_cfg)[0].after)

            ppo_cfg = learner.PPOConfig(
                num_envs=bsz, t_horizon=T, num_minibatches=32,
                normalize_adv=True, normalize_returns=False,
            )
            ts = learner.init_train_state(jax.random.PRNGKey(0), model_cfg, ppo_cfg)

            @jax.jit
            def roll_only(params, es, k):
                _, traj, _, _ = learner.rollout(
                    params, es, k, env_cfg, model_cfg, ppo_cfg
                )
                return traj.reward.sum()

            t_roll = timeit(lambda: roll_only(ts.params, es, k), n=3)

            def full():
                _, _, m = learner.train_step(ts, es, env_cfg, model_cfg, ppo_cfg)
                return m["loss"]

            t_full = timeit(full, n=3)

            row[name] = {
                "movegen_ms": round(t_mg * 1e3, 2),
                "movegen_nondoubles_ms": round(t_nd * 1e3, 2),
                "movegen_doubles_subbatch_ms": round(t_db * 1e3, 2),
                "movegen_dedup_ms": round(t_dedup * 1e3, 2),
                "env_step_ms": round(t_step * 1e3, 2),
                "rollout_ms": round(t_roll * 1e3, 2),
                "train_step_ms": round(t_full * 1e3, 2),
                "update_ms": round((t_full - t_roll) * 1e3, 2),
                "rollout_sps": round(bsz * T / t_roll),
                "train_sps": round(bsz * T / t_full),
                "movegen_share_of_step": round(t_mg / t_step, 3),
            }
        results.append(row)
        print(json.dumps(row), flush=True)
    return results


if __name__ == "__main__":
    main()
