"""The committed learning-at-scale runs (docs/LEARNING.md): the
afterstate4096 preset on one chip for hundreds of updates with periodic
league evaluation vs the fixed opponents (linear heuristic + the frozen
benchmark net when the asset exists).  Each run streams metrics to its
own file, docs/learning_<name>.jsonl.

Usage:
    python scripts/run_learning.py [updates] [--hidden H] [--tag TAG]

--hidden 256 runs the capacity experiment (LEARNING.md's plateau
hypothesis); --tag distinguishes repeat runs of the same config.
"""

import argparse
import dataclasses

from mlp_ppo_2ply_p3_tpu.ppo.train import train
from mlp_ppo_2ply_p3_tpu.utils.config import get_preset


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("updates", nargs="?", type=int, default=500)
    ap.add_argument("--hidden", type=int, default=128)
    ap.add_argument("--tag", default="r4")
    args = ap.parse_args()

    cfg = get_preset("afterstate4096")
    name = cfg.name
    if args.hidden != cfg.model.hidden_size:
        cfg = dataclasses.replace(
            cfg, model=dataclasses.replace(cfg.model,
                                           hidden_size=args.hidden)
        )
        name = f"{name}_h{args.hidden}"
    if args.tag:
        name = f"{name}_{args.tag}"
    cfg = dataclasses.replace(
        cfg,
        name=name,
        metrics_path=f"docs/learning_{name}.jsonl",
        checkpoint_dir="checkpoints",
        checkpoint_every=50,
        eval_every=20,
        eval_games=1024,  # +/-1.5% at 1 sigma (256 gave +/-3%: the
        #                   round-3 curve's wiggles were mostly noise)
        log_every=5,
        num_updates=args.updates,
    )
    ts, _, metrics, total = train(cfg, resume=True, updates=args.updates)
    steps = cfg.ppo.num_envs * cfg.ppo.t_horizon * args.updates
    print(
        f"learning run {name} done: {int(ts.update_idx)} updates, "
        f"{steps / 1e6:.1f}M env-steps, {total:.0f}s wall "
        f"({steps / max(total, 1e-9) / 1e3:.0f}k steps/s incl. eval)"
    )


if __name__ == "__main__":
    main()
