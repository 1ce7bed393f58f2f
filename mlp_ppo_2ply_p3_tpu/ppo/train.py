"""Host training driver: the only Python loop in the system.

Each iteration launches one fully-on-device ``train_step`` (rollout +
GAE + minibatched PPO), then logs scalars and periodically checkpoints
full train state.  Compare the reference's per-step host loop with
device syncs every move (/root/reference/src/agent/train.py:30-160,
SURVEY.md §3.1 — the .item() storm this design eliminates).

Usage:
    python -m mlp_ppo_2ply_p3_tpu.ppo.train --preset train4096 --updates 100
"""

from __future__ import annotations

import argparse
import os
import time

import jax

from ..agents import arena, basic, pubeval
from ..env import bg_env
from ..utils import checkpoint as ckpt
from ..utils.config import get_preset
from ..utils.metrics import MetricsWriter
from . import learner


def league_eval(cfg, params, key):
    """Honest quality metric (fixes SURVEY.md Q8): win rate of the
    current policy (argmax mode) vs the fixed linear baseline."""
    weights = pubeval.default_weights()

    if cfg.ppo.policy_mode == "afterstate":
        def pol(state, k):
            return basic.afterstate_policy(params, state, k, cfg.model, sample=False)
    else:
        def pol(state, k):
            return basic.index_policy(params, state, k, cfg.model, sample=False)

    def base(state, k):
        return pubeval.pubeval_actions(weights, state)

    res = arena.play(pol, base, key, cfg.env, cfg.eval_games, max_plies=400)
    return {
        "league/win_rate_vs_baseline": arena.win_rate(res),
        "league/finished": int(res.finished),
        "league/points_per_game": float(res.points_a)
        / max(1, int(res.finished)),
    }


def train(cfg, resume: bool = True, updates: int | None = None,
          write_metrics: bool = True):
    num_updates = updates if updates is not None else cfg.num_updates
    key = jax.random.PRNGKey(cfg.seed)
    k_init, k_env = jax.random.split(key)
    ts = learner.init_train_state(k_init, cfg.model, cfg.ppo)
    env_state = bg_env.reset(k_env, cfg.env, cfg.ppo.num_envs)

    ckpt_dir = os.path.join(cfg.checkpoint_dir, cfg.name)
    if resume:
        path = ckpt.latest(ckpt_dir)
        if path:
            ts, env_state = ckpt.restore(path, (ts, env_state))
            print(f"resumed from {path} at update {int(ts.update_idx)}")

    writer = MetricsWriter(cfg.metrics_path if write_metrics else None)
    steps_per_update = cfg.ppo.num_envs * cfg.ppo.t_horizon
    last_metrics = {}
    t_start = time.time()
    start_update = int(ts.update_idx)

    for update in range(start_update, num_updates):
        if cfg.ppo.reset_each_update:  # reference train.py:40
            k_env = jax.random.fold_in(jax.random.PRNGKey(cfg.seed), update)
            env_state = bg_env.reset(k_env, cfg.env, cfg.ppo.num_envs)
        t0 = time.time()
        ts, env_state, metrics = learner.train_step(
            ts, env_state, cfg.env, cfg.model, cfg.ppo
        )
        metrics = jax.device_get(metrics)
        dt = time.time() - t0
        metrics["steps_per_sec"] = steps_per_update / dt
        metrics["update_time_s"] = dt
        last_metrics = metrics
        if cfg.eval_every and (update + 1) % cfg.eval_every == 0:
            k_eval = jax.random.fold_in(jax.random.PRNGKey(cfg.seed + 7), update)
            ev = league_eval(cfg, ts.params, k_eval)
            metrics.update(ev)
            print(
                f"  league: win_rate={ev['league/win_rate_vs_baseline']:.3f} "
                f"({ev['league/finished']} games)"
            )
        if update % cfg.log_every == 0:
            writer.write(update, metrics)
            print(
                f"update {update}: loss={metrics['loss']:.4f} "
                f"pi={metrics['policy_loss']:.4f} v={metrics['value_loss']:.4f} "
                f"ent={metrics['entropy']:.3f} "
                f"eps={int(metrics['episodes_finished'])} "
                f"sps={metrics['steps_per_sec']:.0f}"
            )
        if cfg.checkpoint_every and (update + 1) % cfg.checkpoint_every == 0:
            ckpt.save(os.path.join(ckpt_dir, f"ckpt_{update + 1}"), (ts, env_state))

    total = time.time() - t_start
    writer.close()
    return ts, env_state, last_metrics, total


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--preset", default="debug")
    ap.add_argument("--updates", type=int, default=None)
    ap.add_argument("--no-resume", action="store_true")
    args = ap.parse_args()
    cfg = get_preset(args.preset)
    ts, _, metrics, total = train(
        cfg, resume=not args.no_resume, updates=args.updates
    )
    print(f"done: {int(ts.update_idx)} updates in {total:.1f}s")


if __name__ == "__main__":
    main()
