"""Multi-host process-group path (SURVEY.md §4.5/§5.8, BASELINE config
#5): a real 2-process ``jax.distributed`` group on CPU — the standard
way to exercise multi-host collectives without hardware — running the
REAL trainer (ppo.train.train) over the global 8-device mesh, with loss
parity against a single-process 8-device run of the identical config.

The reference's multi-process attempt deadlocked and was abandoned
(/root/reference/src/environment/vec_bg_env.py:74-153, SURVEY.md Q9);
here inter-process comms are XLA collectives over the process group.

Also covers the pod-launch autodetect contract of
``parallel.mesh.initialize_distributed`` (no-flag path).
"""

import os
import socket
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
UPDATES = 2


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("localhost", 0))
        return s.getsockname()[1]


def _clean_env() -> dict:
    """Worker env: no ambient JAX platform/flag leakage (the workers pick
    cpu + 4 virtual devices themselves), package importable from the
    repo root."""
    env = dict(os.environ)
    env.pop("JAX_PLATFORMS", None)
    env.pop("XLA_FLAGS", None)
    env["PYTHONPATH"] = REPO + os.pathsep + env.get("PYTHONPATH", "")
    env.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.cache/jax-cpu")
    return env


@pytest.mark.slow
def test_two_process_train_matches_single_process():
    """2 processes x 4 virtual CPU devices run train() over the global
    8-device mesh; the final loss must match a single-process 8-device
    run of the same config (the in-process suite already proves THAT
    equals the fully unsharded run, tests/test_sharding.py)."""
    port = _free_port()
    env = _clean_env()
    worker = os.path.join(REPO, "tests", "_dist_worker.py")
    procs = [
        subprocess.Popen(
            [sys.executable, worker, str(i), "2", str(port), str(UPDATES)],
            stdout=subprocess.PIPE,
            stderr=subprocess.STDOUT,
            text=True,
            env=env,
            cwd=REPO,
        )
        for i in range(2)
    ]
    outs = []
    for p in procs:
        out, _ = p.communicate(timeout=600)
        outs.append(out)
    for i, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"worker {i} failed:\n{out}"
    final = [ln for ln in outs[0].splitlines() if ln.startswith("MP_FINAL")]
    assert final, f"no MP_FINAL line from process 0:\n{outs[0]}"
    mp_loss = float(final[0].split("loss=")[1])

    # single-process reference over 8 virtual devices (this pytest
    # process IS that platform, tests/conftest.py)
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
        num_updates=UPDATES,
        checkpoint_every=0,
        eval_every=0,
    )
    ts, _, metrics, _ = train(cfg, resume=False, write_metrics=False)
    assert int(ts.update_idx) == UPDATES
    assert abs(float(metrics["loss"]) - mp_loss) < 2e-5, (
        f"2-process loss {mp_loss} != single-process {float(metrics['loss'])}"
    )


def test_autodetect_gating(monkeypatch):
    """No flags + no pod topology in the environment must be a strict
    no-op (jax.distributed.initialize never called); a multi-worker
    topology triggers the autodetect path; the opt-out kills it."""
    import jax

    from mlp_ppo_2ply_p3_tpu.parallel import mesh as pmesh

    calls = []

    def fake_init(*a, **kw):
        calls.append((a, kw))

    monkeypatch.setattr(jax.distributed, "initialize", fake_init)
    monkeypatch.delenv("TPU_WORKER_HOSTNAMES", raising=False)
    monkeypatch.delenv("MEGASCALE_COORDINATOR_ADDRESS", raising=False)
    monkeypatch.delenv("BG_NO_DIST_AUTODETECT", raising=False)

    pmesh.initialize_distributed()
    assert calls == []  # single host: strict no-op

    monkeypatch.setenv("TPU_WORKER_HOSTNAMES", "host0")
    pmesh.initialize_distributed()
    assert calls == []  # one worker is still single-host

    monkeypatch.setenv("TPU_WORKER_HOSTNAMES", "host0,host1,host2,host3")
    pmesh.initialize_distributed()
    assert calls == [((), {})]  # pod: autodetect handoff

    monkeypatch.setenv("BG_NO_DIST_AUTODETECT", "1")
    pmesh.initialize_distributed()
    assert calls == [((), {})]  # opt-out respected

    # explicit flags always win and pass through verbatim
    monkeypatch.delenv("BG_NO_DIST_AUTODETECT")
    pmesh.initialize_distributed("localhost:1234", 2, 1)
    assert calls[-1] == (
        (),
        {
            "coordinator_address": "localhost:1234",
            "num_processes": 2,
            "process_id": 1,
        },
    )
