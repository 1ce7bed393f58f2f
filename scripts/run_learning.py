"""The committed learning-at-scale run (LEARNING.md): afterstate4096 on
one chip for hundreds of updates with periodic league evaluation vs the
fixed linear baseline.  Metrics stream to docs/learning_afterstate4096.jsonl.

Usage: python scripts/run_learning.py [updates]
"""

import dataclasses
import sys

from mlp_ppo_2ply_p3_tpu.ppo.train import train
from mlp_ppo_2ply_p3_tpu.utils.config import get_preset


def main():
    updates = int(sys.argv[1]) if len(sys.argv) > 1 else 500
    cfg = dataclasses.replace(
        get_preset("afterstate4096"),
        metrics_path="docs/learning_afterstate4096.jsonl",
        checkpoint_dir="checkpoints",
        checkpoint_every=50,
        eval_every=20,
        eval_games=1024,  # +/-1.5% at 1 sigma (256 gave +/-3%: the
        #                   round-3 curve's wiggles were mostly noise)
        log_every=5,
        num_updates=updates,
    )
    ts, _, metrics, total = train(cfg, resume=True, updates=updates)
    steps = cfg.ppo.num_envs * cfg.ppo.t_horizon * updates
    print(
        f"learning run done: {int(ts.update_idx)} updates, "
        f"{steps / 1e6:.1f}M env-steps, {total:.0f}s wall "
        f"({steps / max(total, 1e-9) / 1e3:.0f}k steps/s incl. eval)"
    )


if __name__ == "__main__":
    main()
