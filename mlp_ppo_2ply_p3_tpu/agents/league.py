"""League runner CLI: pit any two agents over a batch of lockstep games.

Makes every agent — including the 2-ply expectimax search (BASELINE
config #4, the "2PLY" in the repo name, dead code in the reference at
/root/reference/src/moves/expect_minmax.py) — reachable from the command
line:

    python -m mlp_ppo_2ply_p3_tpu.agents.league --preset twoply \
        --pair twoply:oneply --games 64

Agents (params loaded from the preset's latest checkpoint when one
exists, fresh-init otherwise):

- ``random``:   uniform over the legal prefix
- ``pubeval``:  fixed linear baseline (agents.pubeval; true weights via
                the PUBEVAL_WEIGHTS env var)
- ``oneply``:   greedy argmax of the value head over afterstates
- ``index``:    reference-style blind-index policy head (argmax)
- ``afterstate``: score-head afterstate policy (argmax)
- ``twoply``:   2-ply expectimax over the same value head as ``oneply``
                (so twoply-vs-oneply isolates the value of lookahead)
- ``frozen``:   the committed ``frozen_v1`` benchmark net (agents.frozen)
                played greedy 1-ply — the second fixed opponent

``--params-from frozen`` evaluates the checkpoint-param agents (oneply /
twoply / ...) with the committed frozen_v1 weights instead of a local
checkpoint, so absolute-quality rows (e.g. twoply vs pubeval) are
reproducible from the repo alone."""

from __future__ import annotations

import argparse
import json
import os
import time

import jax

from ..env import bg_env
from ..models import mlp
from ..ppo import learner
from ..utils import checkpoint as ckpt
from ..utils.config import get_preset
from . import arena, basic, pubeval, twoply


def _agent_fn(name: str, cfg):
    """Returns (policy(params, state, key), params) for an agent name."""
    if name == "random":
        return (lambda p, s, k: basic.random_actions(s, k)), None
    if name == "pubeval":
        return (lambda w, s, k: pubeval.pubeval_actions(w, s)), (
            pubeval.default_weights()
        )
    if name == "oneply":
        return (lambda p, s, k: basic.greedy_1ply(p, s, cfg.model)), "params"
    if name == "index":
        return (
            lambda p, s, k: basic.index_policy(p, s, k, cfg.model, sample=False)
        ), "params"
    if name == "afterstate":
        return (
            lambda p, s, k: basic.afterstate_policy(
                p, s, k, cfg.model, sample=False
            )
        ), "params"
    if name == "twoply":
        return (
            lambda p, s, k: twoply.twoply_actions(p, s, cfg.model, cfg.search)
        ), "params"
    if name == "frozen":
        from . import frozen as frozen_mod

        asset = frozen_mod.load_frozen()
        if asset is None:
            raise SystemExit("no frozen benchmark asset committed "
                             "(agents/assets/frozen_benchmark_v1.npz)")
        f_params, f_cfg = asset
        return (lambda p, s, k: basic.greedy_1ply(p, s, f_cfg)), f_params
    raise SystemExit(f"unknown agent {name!r}")


def run_pair(cfg, pair: str, games: int, max_plies: int, seed: int,
             params=None, params_from: str = "ckpt") -> dict:
    name_a, name_b = pair.split(":")
    if params is None and params_from == "frozen":
        from . import frozen as frozen_mod

        asset = frozen_mod.load_frozen()
        if asset is None:
            raise SystemExit("--params-from frozen: no committed asset")
        params, f_cfg = asset
        if f_cfg != cfg.model:
            raise SystemExit(
                f"--params-from frozen: asset model {f_cfg} != preset "
                f"model {cfg.model}; pick a matching --preset"
            )
        print("params from the committed frozen_v1 asset")
    if params is None:
        ckpt_dir = os.path.join(cfg.checkpoint_dir, cfg.name)
        path = ckpt.latest(ckpt_dir)
        ts = learner.init_train_state(jax.random.PRNGKey(seed), cfg.model,
                                      cfg.ppo)
        env0 = bg_env.reset(jax.random.PRNGKey(1), cfg.env, cfg.ppo.num_envs)
        if path:
            ts, _ = ckpt.restore(path, (ts, env0))
            print(f"params from {path} (update {int(ts.update_idx)})")
        else:
            print("no checkpoint found; fresh-initialized params")
        params = ts.params

    pol_a, par_a = _agent_fn(name_a, cfg)
    pol_b, par_b = _agent_fn(name_b, cfg)
    par_a = params if par_a == "params" else par_a
    par_b = params if par_b == "params" else par_b

    t0 = time.time()
    # heavyweight search agents run the ply loop on the host: scanning
    # the full 2-ply program max_plies deep crashes the TPU worker
    # (arena.play_hostloop)
    runner = (
        arena.play_hostloop
        if "twoply" in (name_a, name_b) else arena.play
    )
    res = runner(pol_a, par_a, pol_b, par_b, jax.random.PRNGKey(seed),
                 cfg.env, games, max_plies)
    jax.block_until_ready(res.wins_a)
    dt = time.time() - t0
    out = {
        "pair": pair,
        "games": games,
        "finished": int(res.finished),
        "wins_a": int(res.wins_a),
        "wins_b": int(res.wins_b),
        "win_rate_a": arena.win_rate(res),
        "points_a": int(res.points_a),
        "points_b": int(res.points_b),
        "seconds": round(dt, 2),
    }
    return out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--preset", default="twoply")
    ap.add_argument("--pair", default="twoply:oneply",
                    help="agentA:agentB (random|pubeval|oneply|index|"
                         "afterstate|twoply)")
    ap.add_argument("--games", type=int, default=64)
    ap.add_argument("--max-plies", type=int, default=400)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--params-from", default="ckpt",
                    choices=("ckpt", "frozen"),
                    help="weights for checkpoint-param agents: latest "
                         "preset checkpoint, or the committed frozen_v1 "
                         "asset")
    args = ap.parse_args()
    cfg = get_preset(args.preset)
    out = run_pair(cfg, args.pair, args.games, args.max_plies, args.seed,
                   params_from=args.params_from)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
