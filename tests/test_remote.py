"""Remote blob store (utils.remote): file:// backend round-trips files
and directories; the trainer uploads checkpoints + metrics when
``remote_url`` is set (reference S3 path equivalent,
/root/reference/src/agent/ppo_agent.py:406-470)."""

import os

import numpy as np
import pytest

from mlp_ppo_2ply_p3_tpu.utils.remote import RemoteStore, maybe_store


def test_put_get_list_file_backend(tmp_path):
    remote = tmp_path / "bucket"
    local = tmp_path / "local"
    local.mkdir()
    store = RemoteStore(f"file://{remote}")

    # single file
    f = local / "metrics.jsonl"
    f.write_text('{"a": 1}\n')
    assert store.put(str(f), "run1/metrics.jsonl")
    out = tmp_path / "down.jsonl"
    assert store.get("run1/metrics.jsonl", str(out))
    assert out.read_text() == '{"a": 1}\n'

    # directory (orbax-style checkpoint) uploads recursively
    d = local / "ckpt_10"
    (d / "sub").mkdir(parents=True)
    (d / "meta.json").write_text("{}")
    (d / "sub" / "arr.bin").write_bytes(b"\x00\x01")
    assert store.put(str(d), "run1/ckpt_10")
    names = store.list("run1")
    assert "run1/metrics.jsonl" in names
    assert "run1/ckpt_10/meta.json" in names
    assert "run1/ckpt_10/sub/arr.bin" in names


def test_put_failure_is_graceful(tmp_path):
    store = RemoteStore(f"file://{tmp_path}/bucket")
    assert store.put(str(tmp_path / "missing.bin"), "x") is False
    assert store.get("nope", str(tmp_path / "out")) is False
    assert maybe_store("") is None
    with pytest.raises(ValueError):
        RemoteStore("ftp://nope")


def test_train_uploads_checkpoints_and_metrics(tmp_path):
    from mlp_ppo_2ply_p3_tpu.core.movegen import MovegenConfig
    from mlp_ppo_2ply_p3_tpu.env import bg_env
    from mlp_ppo_2ply_p3_tpu.models.mlp import ModelConfig
    from mlp_ppo_2ply_p3_tpu.ppo import learner
    from mlp_ppo_2ply_p3_tpu.ppo import train as train_mod
    from mlp_ppo_2ply_p3_tpu.utils.config import RunConfig

    remote = tmp_path / "bucket"
    cfg = RunConfig(
        name="remotetest",
        env=bg_env.EnvConfig(movegen=MovegenConfig(max_moves=64, k2=64, k3=64)),
        model=ModelConfig(action_size=64, hidden_size=32),
        ppo=learner.PPOConfig(num_envs=8, t_horizon=4, num_epochs=1,
                              num_minibatches=2),
        num_updates=2,
        checkpoint_every=1,
        eval_every=0,
        checkpoint_dir=str(tmp_path / "ckpts"),
        metrics_path=str(tmp_path / "metrics.jsonl"),
        remote_url=f"file://{remote}",
    )
    train_mod.train(cfg, resume=False, shard=False)
    names = RemoteStore(cfg.remote_url).list("")
    assert any(n.startswith("remotetest/ckpt_1") for n in names), names
    assert any(n.startswith("remotetest/ckpt_2") for n in names), names
    assert "remotetest/metrics.jsonl" in names, names


def _tiny_cfg(tmp_path, **kw):
    from mlp_ppo_2ply_p3_tpu.core.movegen import MovegenConfig
    from mlp_ppo_2ply_p3_tpu.env import bg_env
    from mlp_ppo_2ply_p3_tpu.models.mlp import ModelConfig
    from mlp_ppo_2ply_p3_tpu.ppo import learner
    from mlp_ppo_2ply_p3_tpu.utils.config import RunConfig

    return RunConfig(
        name="remotetest",
        env=bg_env.EnvConfig(movegen=MovegenConfig(max_moves=64, k2=64, k3=64)),
        model=ModelConfig(action_size=64, hidden_size=32),
        ppo=learner.PPOConfig(num_envs=8, t_horizon=4, num_epochs=1,
                              num_minibatches=2),
        num_updates=2,
        checkpoint_every=1,
        eval_every=0,
        overflow_policy="none",
        checkpoint_dir=str(tmp_path / "ckpts"),
        metrics_path=str(tmp_path / "metrics.jsonl"),
        **kw,
    )


def test_remote_resume_after_local_disk_wipe(tmp_path):
    """Preemption recovery (reference load_model_from_s3 startup path,
    ppo_agent.py:441-470): a worker whose local checkpoint dir is GONE
    resumes from the newest checkpoint in the remote store it uploaded
    to, at the right update index."""
    import shutil

    import dataclasses

    from mlp_ppo_2ply_p3_tpu.ppo import train as train_mod

    cfg = _tiny_cfg(tmp_path, remote_url=f"file://{tmp_path}/bucket")
    ts, _, _, _ = train_mod.train(cfg, resume=False, shard=False)
    assert int(ts.update_idx) == 2

    # simulate preemption onto a fresh machine: wipe local checkpoints
    shutil.rmtree(tmp_path / "ckpts")
    cfg = dataclasses.replace(cfg, num_updates=3)
    ts2, _, _, _ = train_mod.train(cfg, resume=True, shard=False)
    # resumed from remote ckpt_2 (not from scratch) and ran exactly one
    # more update
    assert int(ts2.update_idx) == 3
    # ...and the pulled checkpoint landed back on local disk
    assert (tmp_path / "ckpts" / "remotetest").is_dir()


def test_remote_resume_without_store_starts_fresh(tmp_path):
    """No local checkpoint and no remote store: resume=True silently
    starts from scratch (no crash, update counter from 0)."""
    from mlp_ppo_2ply_p3_tpu.ppo import train as train_mod

    cfg = _tiny_cfg(tmp_path)
    ts, _, _, _ = train_mod.train(cfg, resume=True, shard=False)
    assert int(ts.update_idx) == 2


def test_tb_logdir_writes_event_files(tmp_path):
    """RunConfig.tb_logdir wires a TensorBoard event stream through the
    trainer (the reference's primary observability channel,
    ppo_agent.py:317-348)."""
    from mlp_ppo_2ply_p3_tpu.ppo import train as train_mod

    tb = tmp_path / "tb" / "{name}"
    cfg = _tiny_cfg(tmp_path, tb_logdir=str(tb))
    train_mod.train(cfg, resume=False, shard=False)
    run_dir = tmp_path / "tb" / "remotetest"
    events = list(run_dir.glob("events.out.tfevents.*"))
    assert events and events[0].stat().st_size > 0, list(run_dir.iterdir())
