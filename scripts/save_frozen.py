"""Commit the frozen benchmark opponent asset (agents/frozen.py) from
the latest checkpoint of a learning run.

Usage: python scripts/save_frozen.py [preset_run_name]
"""

import sys

import jax

from mlp_ppo_2ply_p3_tpu.agents import frozen
from mlp_ppo_2ply_p3_tpu.env import bg_env
from mlp_ppo_2ply_p3_tpu.ppo import learner
from mlp_ppo_2ply_p3_tpu.utils import checkpoint as ckpt
from mlp_ppo_2ply_p3_tpu.utils.config import get_preset


def main():
    import dataclasses
    import os

    name = sys.argv[1] if len(sys.argv) > 1 else "afterstate4096_r4"
    cfg = dataclasses.replace(get_preset("afterstate4096"), name=name)
    path = ckpt.latest(os.path.join(cfg.checkpoint_dir, cfg.name))
    if not path:
        raise SystemExit(f"no checkpoint under {cfg.checkpoint_dir}/{cfg.name}")
    ts = learner.init_train_state(jax.random.PRNGKey(0), cfg.model, cfg.ppo)
    env0 = bg_env.reset(jax.random.PRNGKey(1), cfg.env, cfg.ppo.num_envs)
    ts, _ = ckpt.restore(path, (ts, env0))
    frozen.save_frozen(frozen.FROZEN_V1_PATH, ts.params, cfg.model)
    print(f"saved {frozen.FROZEN_V1_PATH} from {path} "
          f"(update {int(ts.update_idx)}, hidden {cfg.model.hidden_size})")


if __name__ == "__main__":
    main()
