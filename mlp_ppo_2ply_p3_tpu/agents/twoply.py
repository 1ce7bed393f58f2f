"""2-ply expectimax move selection as a batched tensor contraction.

The "2PLY" capability of the reference exists only as fully
commented-out recursive tree search (/root/reference/src/moves/
expect_minmax.py:35-206, SURVEY.md Q2).  Here it is real, and shaped for
the MXU: for each game, the top-k 1-ply candidates are expanded over the
21-roll chance axis; the opponent's replies are enumerated with the same
fixed-shape movegen kernel at a second batch rank, every reply afterstate
is scored by the value net *from the mover's perspective* (the
reference's dead code evaluates min-nodes with the current player's
eval, expect_minmax.py:107-143 — same convention), and

    score(a) = sum_r p_r * min_{reply in legal(a, r)} V(reply board)

with the min over an empty reply set defined as V(a) (opponent dances).
The whole thing is one jit: (B, k, 21, M') feature tensor -> one MLP
matmul -> masked min -> probability-weighted sum.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from ..core import dice as D
from ..core import features as F
from ..core import movegen as MG
from ..env import bg_env
from ..models import mlp
from ..utils.config import SearchConfig

NEG_INF = -1e9
POS_INF = 1e9


def opponent_view(vec):
    """Canonical-frame involution: re-canonicalize a board for the other
    player (swap my/opp halves and reflect the point order)."""
    my, opp = vec[..., 0:24], vec[..., 24:48]
    tail = jnp.stack(
        [vec[..., 49], vec[..., 48], vec[..., 51], vec[..., 50]], axis=-1
    )
    return jnp.concatenate([opp[..., ::-1], my[..., ::-1], tail], axis=-1)


def _reply_cfg(scfg: SearchConfig) -> MG.MovegenConfig:
    m = scfg.reply_max_moves
    return MG.MovegenConfig(max_moves=m, k2=max(m, 64), k3=max(m, 64))


@partial(jax.jit, static_argnames=("mcfg", "scfg"))
def twoply_actions(params, state: bg_env.EnvState, mcfg: mlp.ModelConfig,
                   scfg: SearchConfig = SearchConfig()):
    """(B,) actions by 2-ply expectimax over the current legal moves."""
    k = scfg.top_k
    mask = bg_env.action_mask(state)  # (B, M)

    # ---- 1-ply scores and top-k pruning -----------------------------------
    feats1 = bg_env.afterstate_features(state)          # (B, M, 198)
    v1 = mlp.value(params, feats1, mcfg)                # (B, M)
    v1 = jnp.where(mask, v1, NEG_INF)
    top_v, top_idx = jax.lax.top_k(v1, k)               # (B, k)
    top_valid = top_v > NEG_INF / 2

    cand = jnp.take_along_axis(
        state.after, top_idx[:, :, None], axis=1
    )  # (B, k, 52) canonical (we moved)

    # our evaluation of candidate boards when it is OUR turn again
    # (opponent dance case): encode with mover = us
    v_dance = jax.vmap(
        lambda vecs, p: mlp.value(
            params, F.encode_canonical(vecs, p), mcfg
        )
    )(cand, state.turn)  # (B, k)

    # ---- opponent chance/reply expansion ----------------------------------
    opp_vec = opponent_view(cand)                       # (B, k, 52)
    rcfg = _reply_cfg(scfg)
    rolls = D.ROLLS_21.astype(jnp.int32)                # (21, 2)

    def per_candidate(vec, us, opp):
        def per_roll(r):
            boards, n, _ = MG.legal_afterstates(vec, r, rcfg)  # (M',52) opp frame
            # evaluate from OUR perspective: absolute board, our one-hot.
            # boards are in the OPPONENT's canonical frame; flipping back
            # to ours lets us reuse encode_canonical with mover = us.
            ours = opponent_view(boards)
            feats = F.encode_canonical(ours, us)        # (M',198)
            vals = mlp.value(params, feats, mcfg)       # (M',)
            valid = jnp.arange(rcfg.max_moves) < n
            worst = jnp.min(jnp.where(valid, vals, POS_INF))
            return jnp.where(n > 0, worst, jnp.nan), n
        worst21, _ = jax.vmap(per_roll)(rolls)          # (21,)
        return worst21

    # vmap over batch then candidates
    worst = jax.vmap(
        lambda vecs, us, opp: jax.vmap(
            lambda v: per_candidate(v, us, opp)
        )(vecs)
    )(opp_vec, state.turn, (1 - state.turn).astype(jnp.int8))  # (B, k, 21)

    worst = jnp.where(jnp.isnan(worst), v_dance[:, :, None], worst)
    score2 = jnp.sum(worst * D.ROLL_PROBS_21[None, None, :], axis=-1)  # (B,k)
    score2 = jnp.where(top_valid, score2, NEG_INF)

    best_k = jnp.argmax(score2, axis=-1)                # (B,)
    action = jnp.take_along_axis(top_idx, best_k[:, None], axis=1)[:, 0]
    return action.astype(jnp.int32)
