"""2-ply expectimax throughput on the chip (BASELINE config #4 at its
stated scale): time ``twoply_actions_report`` on realistic mid-game
positions at the requested batch size and report ms per batched decision
plus decisions/s.

The workload per decision batch is B * top_k candidate boards x 21
chance rolls of full reply movegen + value evaluation — the round-3
design could not run B=4096 on one chip at all (an ~18 GB reply buffer,
VERDICT Missing #1); the round-4 chunked sweep runs it in O(chunk)
memory (agents/twoply.py).

Usage:
    python scripts/perf_twoply.py [B ...]       # default: 256 1024 4096
"""

import json
import sys
import time

import jax

from mlp_ppo_2ply_p3_tpu.agents import basic, twoply
from mlp_ppo_2ply_p3_tpu.env import bg_env
from mlp_ppo_2ply_p3_tpu.models import mlp
from mlp_ppo_2ply_p3_tpu.ppo import learner
from mlp_ppo_2ply_p3_tpu.utils.config import get_preset
from mlp_ppo_2ply_p3_tpu.utils.profiling import _hard_sync


def realistic_state(env_cfg, b: int, warm_steps: int = 12):
    """Batch of reachable mid-game positions: random playout prefix."""
    state = bg_env.reset(jax.random.PRNGKey(0), env_cfg, b)
    key = jax.random.PRNGKey(1)

    @jax.jit
    def step(state, k):
        k_act, k_env = jax.random.split(k)
        acts = basic.random_actions(state, k_act)
        state, _ = bg_env.step(state, acts, k_env, env_cfg)
        return state

    for _ in range(warm_steps):
        key, k = jax.random.split(key)
        state = step(state, k)
    return state


def main():
    sizes = [int(a) for a in sys.argv[1:]] or [256, 1024, 4096]
    cfg = get_preset("twoply")
    params = learner.init_train_state(
        jax.random.PRNGKey(0), cfg.model, cfg.ppo
    ).params

    for b in sizes:
        state = realistic_state(cfg.env, b)
        fn = lambda: twoply.twoply_actions_report(
            params, state, cfg.model, cfg.search
        )
        out = fn()  # compile
        _hard_sync(out)
        n = 3
        t0 = time.perf_counter()
        for _ in range(n):
            out = fn()
        _hard_sync(out)
        dt = (time.perf_counter() - t0) / n
        k = cfg.search.top_k
        print(json.dumps({
            "metric": "twoply_decisions_per_sec",
            "batch": b,
            "top_k": k,
            "reply_max_moves": cfg.search.reply_max_moves,
            "ms_per_batched_decision": round(dt * 1e3, 1),
            "decisions_per_sec": round(b / dt, 1),
            "reply_movegen_rows_per_sec": round(b * k * 21 / dt, 1),
            "overflow_games": int(jax.device_get(out[1]).sum()),
        }))


if __name__ == "__main__":
    main()
