"""Subprocess worker for tests/test_multiprocess.py: one process of a
2-process ``jax.distributed`` CPU group (4 virtual devices each), running
the REAL trainer entry (ppo.train.train) over the resulting 8-device
global mesh.  Process 0 prints the final loss for the parent test to
compare against a single-process 8-device run of the same config.

Invoked as:  python tests/_dist_worker.py <process_id> <num_processes>
             <coordinator_port> <num_updates>
"""

import os
import sys


def main() -> None:
    pid = int(sys.argv[1])
    nproc = int(sys.argv[2])
    port = sys.argv[3]
    updates = int(sys.argv[4])

    # Force the local CPU platform BEFORE the first backend touch (the
    # image boots every process with the remote-TPU "axon" plugin; see
    # tests/conftest.py for the identical workaround).
    flags = os.environ.get("XLA_FLAGS", "")
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=4"
    ).strip()
    import jax

    jax.config.update("jax_platforms", "cpu")
    try:
        from jax._src import xla_bridge as _xb

        _xb._backend_factories.pop("axon", None)
    except Exception:
        pass

    from mlp_ppo_2ply_p3_tpu.parallel.mesh import initialize_distributed

    initialize_distributed(
        coordinator=f"localhost:{port}", num_processes=nproc, process_id=pid
    )
    assert jax.process_count() == nproc, jax.process_count()
    assert jax.device_count() == 4 * nproc, jax.device_count()
    assert len(jax.local_devices()) == 4

    from mlp_ppo_2ply_p3_tpu.core.movegen import MovegenConfig
    from mlp_ppo_2ply_p3_tpu.env import bg_env
    from mlp_ppo_2ply_p3_tpu.models.mlp import ModelConfig
    from mlp_ppo_2ply_p3_tpu.ppo import learner
    from mlp_ppo_2ply_p3_tpu.ppo.train import train
    from mlp_ppo_2ply_p3_tpu.utils.config import RunConfig

    cfg = RunConfig(
        name="mptest",
        env=bg_env.EnvConfig(movegen=MovegenConfig(max_moves=64, k2=64, k3=64)),
        model=ModelConfig(action_size=64, hidden_size=32),
        ppo=learner.PPOConfig(
            num_envs=16, t_horizon=8, num_epochs=1, num_minibatches=2
        ),
        num_updates=updates,
        checkpoint_every=0,
        eval_every=0,
    )
    ts, _, metrics, _ = train(cfg, resume=False, write_metrics=False)
    if jax.process_index() == 0:
        print(
            f"MP_FINAL update={int(ts.update_idx)} "
            f"loss={float(metrics['loss']):.8f}",
            flush=True,
        )


if __name__ == "__main__":
    main()
