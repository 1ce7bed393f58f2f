"""2-ply-assisted learning (expert iteration): distill the 2-ply
expectimax backup into the 1-ply nets.

The repo's namesake capability (2-ply expectimax — dead code in the
reference at /root/reference/src/moves/expect_minmax.py) has so far only
been used for EVALUATION (league rows, docs/LEARNING.md).  This script
uses it for TRAINING: self-play games are driven by the 2-ply agent
(argmax; diversity comes from the dice), and each visited state
contributes two supervised targets —

- policy: cross-entropy of the afterstate score head toward the 2-ply
  CHOSEN action (policy distillation of the lookahead);
- value: MSE of the value head toward the 2-ply BACKUP score
  ``sum_r p_r min_reply V`` (the classic expectimax-backup target —
  a strictly better-informed value estimate than the net's own 1-ply).

Because the 2-ply expert reads the CURRENT value net, improving the net
improves the expert next iteration (expert iteration proper).  Starting
point: the committed ``frozen_v1`` net.  Success metric: the distilled
net played 1-ply-greedy (no search at play time) beating its own
starting point — ideally recovering part of the fixed +9-point edge
that full 2-ply holds over 1-ply with the same net (docs/LEARNING.md).

The 2-ply decision batch is too heavy to put inside a jitted rollout
scan (compare agents/league.py's host-loop arena), so collection is a
host loop of jitted per-ply calls — the same pattern the reference's
trainer used for ALL stepping, here reserved for the one agent that
warrants it.

Usage:
    python scripts/run_distill.py [--iters 8] [--plies 48] [--envs 256]
"""

import argparse
import dataclasses
import json
import os
import time

import jax
import jax.numpy as jnp
import numpy as np
import optax

from mlp_ppo_2ply_p3_tpu.agents import arena, basic, frozen, twoply
from mlp_ppo_2ply_p3_tpu.core.movegen import MovegenConfig
from mlp_ppo_2ply_p3_tpu.env import bg_env
from mlp_ppo_2ply_p3_tpu.models import mlp
from mlp_ppo_2ply_p3_tpu.ppo.learner import _afterstate_logits
from mlp_ppo_2ply_p3_tpu.utils.config import SearchConfig


def collect(params, env_state, key, env_cfg, mcfg, scfg, plies):
    """Host loop: ``plies`` half-turns of 2-ply self-play.  Returns the
    stacked buffers (host numpy) and the advanced env state."""
    bufs = {k: [] for k in ("obs", "after", "n_moves", "turn", "action",
                            "target_v")}
    for _ in range(plies):
        key, k_env = jax.random.split(key)
        action, backup, _ = twoply.twoply_actions_values(
            params, env_state, mcfg, scfg
        )
        bufs["obs"].append(np.asarray(bg_env.observe(env_state)))
        bufs["after"].append(np.asarray(env_state.after))
        bufs["n_moves"].append(np.asarray(env_state.n_moves))
        bufs["turn"].append(np.asarray(env_state.turn))
        bufs["action"].append(np.asarray(action))
        bufs["target_v"].append(np.asarray(backup))
        env_state, _ = bg_env.step(env_state, action, k_env, env_cfg)
    out = {k: np.concatenate(v, axis=0) for k, v in bufs.items()}
    return out, env_state, key


# win reward by match points (1/2/3 -> the env's win/gammon/backgammon
# reward scale the value head was trained on)
_SCORE_REWARD = {1: 1.0, 2: 1.5, 3: 2.0}


def collect_outcomes(params, env_state, key, env_cfg, mcfg, scfg, plies,
                     gamma=0.99):
    """2-ply self-play collection with OUTCOME-anchored value targets:
    each state's target is the actual game result from its mover's
    perspective, discounted by distance to the end (+-gamma^k r — the
    quantity mover-perspective GAE converges to), instead of the net's
    own 2-ply backup.  This is the anchored variant the pure-backup
    negative result motivates (docs/LEARNING.md): the backup drifts
    pessimistic because nothing in its loss touches the environment;
    real outcomes cannot drift.  States of games unfinished at window
    end are dropped (reported)."""
    b = env_state.turn.shape[0]
    bufs = {k: [] for k in ("obs", "after", "n_moves", "turn", "action")}
    pending = [[] for _ in range(b)]  # flat state indices awaiting result
    targets = np.zeros(plies * b, np.float32)
    resolved = np.zeros(plies * b, bool)
    turn_flat = np.zeros(plies * b, np.int8)
    t_flat = np.zeros(plies * b, np.int32)
    for t in range(plies):
        key, k_env = jax.random.split(key)
        action, _, _ = twoply.twoply_actions_values(
            params, env_state, mcfg, scfg
        )
        turn_np = np.asarray(env_state.turn)
        bufs["obs"].append(np.asarray(bg_env.observe(env_state)))
        bufs["after"].append(np.asarray(env_state.after))
        bufs["n_moves"].append(np.asarray(env_state.n_moves))
        bufs["turn"].append(turn_np)
        bufs["action"].append(np.asarray(action))
        idx0 = t * b
        turn_flat[idx0:idx0 + b] = turn_np
        t_flat[idx0:idx0 + b] = t
        for e in range(b):
            pending[e].append(idx0 + e)
        env_state, info = bg_env.step(env_state, action, k_env, env_cfg)
        winner = np.asarray(info.winner)
        score = np.asarray(info.game_score)
        for e in np.nonzero(winner >= 0)[0]:
            r = _SCORE_REWARD.get(int(score[e]), 1.0)
            for i in pending[e]:
                sign = 1.0 if turn_flat[i] == winner[e] else -1.0
                targets[i] = sign * r * gamma ** (t - t_flat[i])
                resolved[i] = True
            pending[e] = []
    # flatten time-major to match targets' idx0 + e layout
    flat = {}
    for k, v in bufs.items():
        arr = np.stack(v, axis=0)  # (plies, B, ...)
        flat[k] = arr.reshape(plies * b, *arr.shape[2:])
    flat["target_v"] = targets
    keep = resolved
    flat = {k: v[keep] for k, v in flat.items()}
    return flat, env_state, key, int(keep.sum()), plies * b


def make_update(mcfg, m, optimizer, value_coef, policy_coef):
    """Jitted minibatch distillation step."""

    def loss_fn(params, mb):
        obs, after, n_moves, turn, action, target_v = mb
        valid = n_moves > 0  # auto-pass states carry no action signal
        nvalid = jnp.maximum(jnp.sum(valid), 1)
        logits = _afterstate_logits(params, after, turn, n_moves, m, mcfg)
        logp = jax.nn.log_softmax(logits, axis=-1)
        ce = -jnp.take_along_axis(logp, action[:, None], axis=1)[:, 0]
        ce = jnp.sum(jnp.where(valid, ce, 0.0)) / nvalid
        v = mlp.value(params, obs, mcfg)
        vloss = jnp.sum(
            jnp.where(valid, (v - target_v) ** 2, 0.0)
        ) / nvalid
        return policy_coef * ce + value_coef * vloss, (ce, vloss)

    @jax.jit
    def update(params, opt_state, mb):
        (loss, (ce, vl)), grads = jax.value_and_grad(
            loss_fn, has_aux=True
        )(params, mb)
        updates, opt_state = optimizer.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, loss, ce, vl

    return update


def make_league_eval(mcfg, env_cfg, games):
    """Evaluator closure with STABLE policy identities (play_jit treats
    policies as static args — fresh closures per call would recompile)."""
    f_params, f_cfg = frozen.load_frozen()

    def pol(p, s, k):
        return basic.greedy_1ply(p, s, mcfg)

    def opp(p, s, k):
        return basic.greedy_1ply(p, s, f_cfg)

    def run(params, key):
        res = arena.play_jit(pol, params, opp, f_params, key, env_cfg,
                             games, 400)
        return arena.win_rate(res), int(res.finished)

    return run


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=8)
    ap.add_argument("--plies", type=int, default=48)
    ap.add_argument("--envs", type=int, default=256)
    ap.add_argument("--epochs", type=int, default=2)
    ap.add_argument("--minibatch", type=int, default=1024)
    ap.add_argument("--lr", type=float, default=3e-4)
    ap.add_argument("--value-coef", type=float, default=1.0)
    # policy-coef 0 = value-only distillation (train V toward the 2-ply
    # backup, leave the policy heads alone): isolates the
    # "expectimax backup improves the value net" question from
    # shared-trunk CE interference
    ap.add_argument("--policy-coef", type=float, default=1.0)
    ap.add_argument("--eval-games", type=int, default=512)
    # "backup": value targets = the net's own 2-ply expectimax backup
    # (drifts pessimistic — the committed negative).  "outcome": real
    # discounted game results from 2-ply self-play (anchored variant).
    ap.add_argument("--targets", default="backup",
                    choices=("backup", "outcome"))
    ap.add_argument("--out", default="docs/distill_twoply.jsonl")
    args = ap.parse_args()

    asset = frozen.load_frozen()
    assert asset is not None, "needs the committed frozen_v1 asset"
    params, mcfg = asset
    params = jax.tree_util.tree_map(jnp.asarray, params)
    env_cfg = bg_env.EnvConfig(
        movegen=MovegenConfig.fast(mcfg.action_size)
    )
    scfg = SearchConfig()
    m = env_cfg.max_moves

    optimizer = optax.adam(args.lr)
    opt_state = optimizer.init(params)
    update = make_update(mcfg, m, optimizer, args.value_coef,
                         args.policy_coef)

    key = jax.random.PRNGKey(17)
    key, k_env = jax.random.split(key)
    env_state = bg_env.reset(k_env, env_cfg, args.envs)

    os.makedirs(os.path.dirname(args.out) or ".", exist_ok=True)
    log = open(args.out, "a", buffering=1)
    league_eval = make_league_eval(mcfg, env_cfg, args.eval_games)

    key, k_ev = jax.random.split(key)
    wr0, fin0 = league_eval(params, k_ev)
    print(f"iter 0 (baseline = frozen_v1 vs itself): "
          f"win-rate {wr0:.3f} ({fin0} games)", flush=True)
    log.write(json.dumps({"iter": 0, "win_rate_vs_frozen": wr0,
                          "finished": fin0}) + "\n")

    for it in range(1, args.iters + 1):
        t0 = time.time()
        if args.targets == "outcome":
            buf, env_state, key, n_res, n_tot = collect_outcomes(
                params, env_state, key, env_cfg, mcfg, scfg, args.plies
            )
            print(f"  resolved {n_res}/{n_tot} states", flush=True)
        else:
            buf, env_state, key = collect(
                params, env_state, key, env_cfg, mcfg, scfg, args.plies
            )
        t_collect = time.time() - t0
        n = buf["obs"].shape[0]
        t0 = time.time()
        losses = []
        for ep in range(args.epochs):
            key, k_perm = jax.random.split(key)
            perm = np.asarray(jax.random.permutation(k_perm, n))
            for lo in range(0, n - args.minibatch + 1, args.minibatch):
                idx = perm[lo:lo + args.minibatch]
                mb = (
                    jnp.asarray(buf["obs"][idx]),
                    jnp.asarray(buf["after"][idx]),
                    jnp.asarray(buf["n_moves"][idx]),
                    jnp.asarray(buf["turn"][idx]),
                    jnp.asarray(buf["action"][idx]),
                    jnp.asarray(buf["target_v"][idx]),
                )
                params, opt_state, loss, ce, vl = update(
                    params, opt_state, mb
                )
                losses.append((float(loss), float(ce), float(vl)))
        t_train = time.time() - t0
        loss, ce, vl = (float(np.mean([x[i] for x in losses]))
                        for i in range(3))
        key, k_ev = jax.random.split(key)
        wr, fin = league_eval(params, k_ev)
        rec = {
            "iter": it, "states": n, "loss": round(loss, 4),
            "ce": round(ce, 4), "value_mse": round(vl, 4),
            "win_rate_vs_frozen": wr, "finished": fin,
            "collect_s": round(t_collect, 1),
            "train_s": round(t_train, 1),
        }
        print(json.dumps(rec), flush=True)
        log.write(json.dumps(rec) + "\n")

    log.close()


if __name__ == "__main__":
    main()
