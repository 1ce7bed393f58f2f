"""Headline benchmark: env-steps/s per chip for full PPO training
(rollout + GAE + minibatched update, all on-device) at 4096 parallel
games.

Prints JSON lines of the form
  {"metric": "env_steps_per_sec_per_chip", "value": N, "unit": "steps/s",
   "vs_baseline": R}
on stdout — one after EVERY timed update (each refining the estimate
with one more sample), so a run that is killed mid-way still leaves the
best number measured so far as its last stdout line (the driver parses
the last line).  Progress (backend acquisition, compile time, per-update
timings) streams to stderr so a hung run shows WHERE it hung.

Robustness contract (round-4 lesson: BENCH_r04 was rc=124 with no
output at all):
  - every stage logs to stderr before it starts, flushed;
  - the JSON line is emitted after the FIRST timed update, not at the end;
  - SIGTERM/SIGINT re-emit the last JSON line before exiting, so
    `timeout`-style kills still leave a parseable result;
  - BENCH_TIME_BUDGET (seconds, default 480) stops the timed loop early
    rather than overrunning an external timeout;
  - the persistent compile cache (JAX_COMPILATION_CACHE_DIR) makes the
    second run's compile seconds instead of minutes — stderr reports the
    measured compile time so cache hits are verifiable.

Baseline: the reference design's throughput ceiling is O(10^2-10^3)
env-steps/s total (Python per-board move generation with per-point
device syncs, serial 8-env loop — BASELINE.md); we use 1000 steps/s as
the comparison denominator.

Env knobs: BENCH_ENVS (default 4096), BENCH_T (default 64),
BENCH_UPDATES (default 3 timed), BENCH_TIME_BUDGET (default 480 s),
BENCH_MOVEGEN (fast | default | parity width preset, default fast —
validated caps, see core.movegen.MovegenConfig.fast), BENCH_PRESET (a
RunConfig preset name whose env/model/ppo configs replace the defaults;
BENCH_ENVS/BENCH_T still override sizes).
"""

import json
import os
import signal
import sys
import time

_plat = (os.environ.get("JAX_PLATFORMS") or "axon").split(",")[0]
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", f"/root/.cache/jax-{_plat}")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")

T_START = time.time()


def log(msg: str) -> None:
    print(f"[bench +{time.time() - T_START:6.1f}s] {msg}",
          file=sys.stderr, flush=True)


log(f"starting; platform={_plat} "
    f"cache={os.environ['JAX_COMPILATION_CACHE_DIR']} "
    f"(exists={os.path.isdir(os.environ['JAX_COMPILATION_CACHE_DIR'])})")

import jax  # noqa: E402

# The image boots every process with the remote-TPU PJRT plugin ("axon")
# regardless of JAX_PLATFORMS; honor an explicit cpu request (see
# tests/conftest.py for the same workaround).
if _plat == "cpu":
    jax.config.update("jax_platforms", "cpu")
    try:
        from jax._src import xla_bridge as _xb

        _xb._backend_factories.pop("axon", None)
    except Exception:
        pass

REFERENCE_BASELINE_STEPS_PER_SEC = 1000.0

# Last emitted result line; re-emitted by the signal handler so an
# external `timeout -s TERM` kill still ends stdout with parseable JSON.
_last_line: list = []


def emit(sps: float) -> None:
    line = json.dumps(
        {
            "metric": "env_steps_per_sec_per_chip",
            "value": round(sps, 1),
            "unit": "steps/s",
            "vs_baseline": round(sps / REFERENCE_BASELINE_STEPS_PER_SEC, 2),
        }
    )
    _last_line[:] = [line]
    print(line, flush=True)


def _on_signal(signum, frame):
    log(f"received signal {signum}")
    if _last_line:
        print(_last_line[0], flush=True)
    sys.exit(0 if _last_line else 1)


_stage = ["startup"]


def _watchdog(budget: float) -> None:
    """Daemon thread: heartbeat to stderr while the main thread may be
    stuck inside an uninterruptible PJRT call (the remote-TPU tunnel can
    hang backend acquisition indefinitely — round-4's bench died with NO
    output at all), and a hard exit once the budget is blown so the
    artifact tail names the stage that hung instead of showing a bare
    rc=124."""
    import threading

    def run():
        while True:
            time.sleep(30)
            elapsed = time.time() - T_START
            log(f"watchdog: stage={_stage[0]} elapsed={elapsed:.0f}s")
            if budget > 0 and elapsed > budget:
                log(f"watchdog: budget {budget:.0f}s exceeded during "
                    f"stage '{_stage[0]}' — likely a hung TPU tunnel; "
                    "exiting")
                if _last_line:
                    print(_last_line[0], flush=True)
                os._exit(0 if _last_line else 1)

    threading.Thread(target=run, daemon=True).start()


def main():
    import dataclasses

    signal.signal(signal.SIGTERM, _on_signal)
    signal.signal(signal.SIGINT, _on_signal)
    _watchdog(float(os.environ.get("BENCH_TIME_BUDGET", 480)))

    from mlp_ppo_2ply_p3_tpu.core.movegen import MovegenConfig
    from mlp_ppo_2ply_p3_tpu.env import bg_env
    from mlp_ppo_2ply_p3_tpu.models.mlp import ModelConfig
    from mlp_ppo_2ply_p3_tpu.ppo import learner

    num_envs = int(os.environ.get("BENCH_ENVS", 4096))
    t_horizon = int(os.environ.get("BENCH_T", 64))
    timed_updates = int(os.environ.get("BENCH_UPDATES", 3))
    budget = float(os.environ.get("BENCH_TIME_BUDGET", 480))
    max_moves = int(os.environ.get("BENCH_MAX_MOVES", 256))
    mg_name = os.environ.get("BENCH_MOVEGEN", "fast")
    mg_cfg = {
        "fast": MovegenConfig.fast,
        "default": MovegenConfig,
        "parity": MovegenConfig.parity,
    }[mg_name](max_moves=max_moves)

    preset = os.environ.get("BENCH_PRESET", "")
    if preset:
        from mlp_ppo_2ply_p3_tpu.utils.config import get_preset

        cfg = get_preset(preset)
        env_cfg, model_cfg = cfg.env, cfg.model
        ppo_cfg = dataclasses.replace(
            cfg.ppo,
            num_envs=int(os.environ.get("BENCH_ENVS", cfg.ppo.num_envs)),
            t_horizon=int(os.environ.get("BENCH_T", cfg.ppo.t_horizon)),
        )
        num_envs, t_horizon = ppo_cfg.num_envs, ppo_cfg.t_horizon
    else:
        env_cfg = bg_env.EnvConfig(movegen=mg_cfg)
        model_cfg = ModelConfig(action_size=max_moves)
        ppo_cfg = learner.PPOConfig(
            num_envs=num_envs,
            t_horizon=t_horizon,
            num_minibatches=32,
            normalize_adv=True,
            normalize_returns=False,
        )

    _stage[0] = "backend-acquisition"
    t0 = time.time()
    devices = jax.devices()
    log(f"backend acquired: {len(devices)} x {devices[0].platform} "
        f"in {time.time() - t0:.1f}s")

    _stage[0] = "init-and-reset-compile"
    ts = learner.init_train_state(jax.random.PRNGKey(0), model_cfg, ppo_cfg)
    env_state = bg_env.reset(jax.random.PRNGKey(1), env_cfg, num_envs)

    # warmup / compile.  Fences are scalar host readbacks
    # (profiling._hard_sync): under the remote-PJRT tunnel
    # block_until_ready can return before execution finishes
    # (utils/profiling.py), so a device->host transfer is the only
    # reliable completion barrier for the timed region.
    from mlp_ppo_2ply_p3_tpu.utils.profiling import _hard_sync

    _stage[0] = "compile"
    log(f"compiling train_step (B={num_envs}, T={t_horizon}, "
        f"M={mg_cfg.max_moves}) ...")
    t0 = time.time()
    ts, env_state, metrics = learner.train_step(
        ts, env_state, env_cfg, model_cfg, ppo_cfg
    )
    _hard_sync(metrics)
    compile_s = time.time() - t0
    # cold compile of this graph through the remote tunnel is minutes;
    # a persistent-cache hit replays in well under a minute
    log(f"compile+warmup done in {compile_s:.1f}s "
        f"({'cache hit' if compile_s < 60 else 'cache miss/cold'})")

    # Measure the pure fence round-trip (device already idle) so the
    # per-update sync that makes incremental emission possible doesn't
    # count against throughput.
    t0 = time.time()
    _hard_sync(metrics)
    sync_overhead = time.time() - t0
    log(f"fence round-trip: {sync_overhead * 1e3:.1f}ms "
        "(subtracted per timed update)")

    steps_per_update = num_envs * t_horizon
    n_chips = max(1, jax.device_count())
    total_dt = 0.0
    total_steps = 0
    for i in range(timed_updates):
        elapsed = time.time() - T_START
        if i > 0 and budget > 0:
            est_next = total_dt / (i or 1) + sync_overhead
            if elapsed + est_next > budget * 0.9:
                log(f"time budget {budget:.0f}s: stopping after {i} "
                    f"update(s) at +{elapsed:.1f}s")
                break
        _stage[0] = f"update-{i + 1}"
        t0 = time.time()
        ts, env_state, metrics = learner.train_step(
            ts, env_state, env_cfg, model_cfg, ppo_cfg
        )
        _hard_sync(metrics)
        dt = max(1e-9, time.time() - t0 - sync_overhead)
        total_dt += dt
        total_steps += steps_per_update
        log(f"update {i + 1}/{timed_updates}: {dt:.3f}s "
            f"({steps_per_update / dt / n_chips:.0f} steps/s/chip)")
        emit(total_steps / total_dt / n_chips)


if __name__ == "__main__":
    sys.exit(main())
