"""Host training driver: the only Python loop in the system.

Each iteration launches one fully-on-device ``train_step`` (rollout +
GAE + minibatched PPO), then logs scalars and periodically checkpoints
full train state.  Compare the reference's per-step host loop with
device syncs every move (/root/reference/src/agent/train.py:30-160,
SURVEY.md §3.1 — the .item() storm this design eliminates).

Scale-out (SURVEY.md §5.8, replacing the reference's abandoned
multiprocessing fan-out /root/reference/src/environment/vec_bg_env.py:
74-153): whenever more than one device is visible, the driver builds a
1-D ``Mesh`` over all chips, shards the game batch (env state) over its
``dp`` axis and replicates train state; GSPMD then partitions the
jitted ``train_step`` — env stepping is embarrassingly parallel over
ICI and the gradient all-reduce is inserted automatically where the
sharded batch meets replicated params.  Multi-host pods run the same
code after ``initialize_distributed`` (the ``--num-processes /
--coordinator / --process-id`` flags).

Usage:
    python -m mlp_ppo_2ply_p3_tpu.ppo.train --preset train4096 --updates 100
"""

from __future__ import annotations

import argparse
import functools
import os
import time

import jax

from ..agents import arena, basic, pubeval
from ..env import bg_env
from ..utils import checkpoint as ckpt
from ..utils import profiling
from ..utils.remote import maybe_store
from ..utils.config import get_preset
from ..utils.metrics import MetricsWriter
from . import learner


@functools.lru_cache(maxsize=None)
def _league_policies(model_cfg, policy_mode: str):
    """Stable-identity (memoized) policy callables for the jitted arena:
    a fresh closure per call would defeat ``arena.play_jit``'s
    compilation cache."""
    if policy_mode == "afterstate":
        def pol(params, state, key):
            return basic.afterstate_policy(params, state, key, model_cfg,
                                           sample=False)
    else:
        def pol(params, state, key):
            return basic.index_policy(params, state, key, model_cfg,
                                      sample=False)

    def base(weights, state, key):
        return pubeval.pubeval_actions(weights, state)

    return pol, base


@functools.lru_cache(maxsize=1)
def _league_weights():
    return pubeval.default_weights()


@functools.lru_cache(maxsize=None)
def _frozen_opponent(frozen_model_cfg):
    """Stable-identity greedy-1-ply policy closure for a frozen net."""
    def pol(params, state, key):
        return basic.greedy_1ply(params, state, frozen_model_cfg)

    return pol


@functools.lru_cache(maxsize=1)
def _frozen_asset():
    from ..agents import frozen

    return frozen.load_frozen()


def _arena_stats(res, n_games: int, tag: str) -> dict:
    finished = max(1, int(res.finished))
    return {
        f"league/win_rate_vs_{tag}": arena.win_rate(res),
        f"league/finished_vs_{tag}": int(res.finished),
        f"league/points_a_vs_{tag}": int(res.points_a),
        f"league/points_b_vs_{tag}": int(res.points_b),
        # signed points margin per finished game (gammons 2, bg 3)
        f"league/point_margin_vs_{tag}": (
            float(res.points_a) - float(res.points_b)
        ) / finished,
        f"league/avg_plies_vs_{tag}": float(res.plies) / max(1, n_games),
    }


def league_eval(cfg, params, key):
    """Honest quality metrics (fixes SURVEY.md Q8): win rate of the
    current policy (argmax mode) vs the fixed opponents — the linear
    heuristic over the exact pubeval encoding, and (when the committed
    asset exists) the frozen benchmark net ``frozen_v1`` — fully jitted
    (one compilation per config; opponents built once)."""
    pol, base = _league_policies(cfg.model, cfg.ppo.policy_mode)
    k_heur, k_frozen = jax.random.split(key)
    res = arena.play_jit(
        pol, params, base, _league_weights(), k_heur, cfg.env,
        cfg.eval_games, 400,
    )
    out = _arena_stats(res, cfg.eval_games, "heuristic")
    # back-compat alias for round-3 curves/plots
    out["league/win_rate_vs_baseline"] = out["league/win_rate_vs_heuristic"]
    frozen_asset = _frozen_asset()
    if frozen_asset is not None:
        f_params, f_cfg = frozen_asset
        fres = arena.play_jit(
            pol, params, _frozen_opponent(f_cfg), f_params, k_frozen,
            cfg.env, cfg.eval_games, 400,
        )
        out.update(_arena_stats(fres, cfg.eval_games, "frozen_v1"))
    return out


def _make_placer(cfg):
    """(place_env, place_ts): device placement for env/train state — the
    dp-sharded mesh layout when >1 device is visible, identity otherwise."""
    devices = jax.devices()
    if len(devices) > 1 and cfg.ppo.num_envs % len(devices) == 0:
        from ..parallel import mesh as pmesh

        mesh = pmesh.make_mesh(devices)
        return (
            lambda tree: pmesh.shard_batch_tree(tree, mesh),
            lambda tree: pmesh.replicate_tree(tree, mesh),
            mesh,
        )
    return (lambda tree: tree), (lambda tree: tree), None


def _handle_overflow(cfg, update: int, metrics: dict, warned: list):
    n_over = int(metrics.get("movegen_overflow", 0))
    if n_over == 0 or cfg.overflow_policy == "none":
        return
    total = cfg.ppo.num_envs * cfg.ppo.t_horizon
    msg = (
        f"movegen width-cap saturation in update {update}: {n_over} of "
        f"{total} rollout game-steps truncated (affected games degrade "
        f"toward forced pass). Widen MovegenConfig caps or lower num_envs."
    )
    if cfg.overflow_policy == "abort":
        raise RuntimeError(msg)
    if not warned:
        print(f"WARNING: {msg} (warning once; see movegen_overflow metric)")
        warned.append(True)


def _pull_remote_latest(store, cfg, ckpt_dir):
    """Download the newest remote checkpoint for this run into the local
    checkpoint dir and return its local path (None if the store holds
    none).  This is the preemption-recovery path the reference implements
    as load_model_from_s3 at trainer startup
    (/root/reference/src/agent/ppo_agent.py:441-470, used by
    train_single.py:124): a worker restarted on a wiped disk resumes from
    the store it has been uploading to."""
    names = store.list(cfg.name)
    steps = set()
    for n in names:
        head = n[len(cfg.name) + 1:].split("/", 1)[0]
        stem = head[len("ckpt_"):] if head.startswith("ckpt_") else ""
        stem = stem[:-4] if stem.endswith(".npz") else stem
        try:
            steps.add(int(stem))
        except ValueError:
            continue
    if not steps:
        return None
    best = max(steps)
    heads = {f"ckpt_{best}", f"ckpt_{best}.npz"}
    for n in names:
        if n[len(cfg.name) + 1:].split("/", 1)[0] in heads:
            store.get(n, os.path.join(cfg.checkpoint_dir, n))
    path = ckpt.latest(ckpt_dir)
    if path:
        print(f"pulled remote checkpoint {cfg.name}/ckpt_{best} from "
              f"{cfg.remote_url}")
    return path


def train(cfg, resume: bool = True, updates: int | None = None,
          write_metrics: bool = True, profile: bool = False,
          shard: bool = True):
    if cfg.debug_nans:  # SURVEY.md §5.2 debug toggle
        jax.config.update("jax_debug_nans", True)
    num_updates = updates if updates is not None else cfg.num_updates
    key = jax.random.PRNGKey(cfg.seed)
    k_init, k_env = jax.random.split(key)
    ts = learner.init_train_state(k_init, cfg.model, cfg.ppo)
    env_state = bg_env.reset(k_env, cfg.env, cfg.ppo.num_envs)

    ckpt_dir = os.path.join(cfg.checkpoint_dir, cfg.name)
    store = maybe_store(cfg.remote_url)
    if resume:
        path = ckpt.latest(ckpt_dir)
        if path is None and store is not None:
            path = _pull_remote_latest(store, cfg, ckpt_dir)
        if path:
            ts, env_state = ckpt.restore(path, (ts, env_state))
            print(f"resumed from {path} at update {int(ts.update_idx)}")

    if shard:
        place_env, place_ts, mesh = _make_placer(cfg)
    else:
        place_env, place_ts, mesh = (lambda t: t), (lambda t: t), None
    ts = place_ts(ts)
    env_state = place_env(env_state)
    if mesh is not None:
        print(f"sharded: {cfg.ppo.num_envs} games over {mesh.devices.size} "
              f"devices (axis '{mesh.axis_names[0]}')")

    metrics_path = cfg.metrics_path.format(name=cfg.name)
    writer = MetricsWriter(
        metrics_path if write_metrics else None,
        tb_logdir=cfg.tb_logdir.format(name=cfg.name) or None,
    )
    steps_per_update = cfg.ppo.num_envs * cfg.ppo.t_horizon
    last_metrics = {}
    t_start = time.time()
    start_update = int(ts.update_idx)
    overflow_warned: list = []

    for update in range(start_update, num_updates):
        if cfg.ppo.reset_each_update:  # reference train.py:40
            k_env = jax.random.fold_in(jax.random.PRNGKey(cfg.seed), update)
            env_state = place_env(bg_env.reset(k_env, cfg.env, cfg.ppo.num_envs))
        t0 = time.time()
        with profiling.section("train_step", sync=profile):
            ts, env_state, metrics = learner.train_step(
                ts, env_state, cfg.env, cfg.model, cfg.ppo
            )
            metrics = jax.device_get(metrics)
        dt = time.time() - t0
        metrics["steps_per_sec"] = steps_per_update / dt
        metrics["update_time_s"] = dt
        _handle_overflow(cfg, update, metrics, overflow_warned)
        last_metrics = metrics
        ran_eval = cfg.eval_every and (update + 1) % cfg.eval_every == 0
        if ran_eval:
            k_eval = jax.random.fold_in(jax.random.PRNGKey(cfg.seed + 7), update)
            with profiling.section("league_eval", sync=profile):
                ev = league_eval(cfg, ts.params, k_eval)
            metrics.update(ev)
            frozen_part = (
                f" vs_frozen_v1={ev['league/win_rate_vs_frozen_v1']:.3f}"
                if "league/win_rate_vs_frozen_v1" in ev
                else ""
            )
            print(
                f"  league: vs_heuristic="
                f"{ev['league/win_rate_vs_heuristic']:.3f}"
                f"{frozen_part} "
                f"({ev['league/finished_vs_heuristic']} games)"
            )
        # eval updates are always persisted, whatever the log cadence
        if ran_eval or update % cfg.log_every == 0:
            writer.write(update, metrics)
            print(
                f"update {update}: loss={metrics['loss']:.4f} "
                f"pi={metrics['policy_loss']:.4f} v={metrics['value_loss']:.4f} "
                f"ent={metrics['entropy']:.3f} "
                f"eps={int(metrics['episodes_finished'])} "
                f"sps={metrics['steps_per_sec']:.0f}"
            )
        if cfg.checkpoint_every and (update + 1) % cfg.checkpoint_every == 0:
            with profiling.section("checkpoint", sync=profile):
                path = os.path.join(ckpt_dir, f"ckpt_{update + 1}")
                ckpt.save(path, (ts, env_state))
                if store is not None:
                    local = path if os.path.exists(path) else path + ".npz"
                    store.put(local, os.path.relpath(local, cfg.checkpoint_dir))

    total = time.time() - t_start
    if profile:
        print("profile sections:\n" + profiling.report())
    writer.close()
    if store is not None and write_metrics and os.path.exists(metrics_path):
        store.put(metrics_path, f"{cfg.name}/metrics.jsonl")
    return ts, env_state, last_metrics, total


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--preset", default="debug")
    ap.add_argument("--updates", type=int, default=None)
    ap.add_argument("--no-resume", action="store_true")
    ap.add_argument("--profile", action="store_true",
                    help="per-section host timers (+ set PROFILE_TRACE_DIR "
                         "for a jax.profiler trace of the first updates)")
    # multi-host process-group flags (no-ops single-host; SURVEY.md §5.8)
    ap.add_argument("--num-processes", type=int, default=None)
    ap.add_argument("--coordinator", default=None)
    ap.add_argument("--process-id", type=int, default=None)
    args = ap.parse_args()

    from ..parallel.mesh import initialize_distributed

    initialize_distributed(
        coordinator=args.coordinator,
        num_processes=args.num_processes,
        process_id=args.process_id,
    )

    cfg = get_preset(args.preset)
    trace_dir = os.environ.get("PROFILE_TRACE_DIR") if args.profile else None
    if trace_dir:
        with profiling.device_trace(trace_dir):
            out = train(cfg, resume=not args.no_resume,
                        updates=args.updates, profile=True)
    else:
        out = train(cfg, resume=not args.no_resume, updates=args.updates,
                    profile=args.profile)
    ts, _, metrics, total = out
    print(f"done: {int(ts.update_idx)} updates in {total:.1f}s")


if __name__ == "__main__":
    main()
