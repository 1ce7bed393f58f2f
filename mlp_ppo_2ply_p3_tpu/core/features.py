"""TD-Gammon 198-dim feature encoding, fully vectorized.

Exact formula parity with the reference encoders
(/root/reference/src/board/immutable_board.py:171-212 and
src/ai/batching.py:79-147): per player x 24 points the 4-tuple
``[n>=1, n>=2, n>=3, max(n-3,0)/2]`` (player-major, point-minor), then
per player ``bar/2`` and ``off/15``, then the current-player one-hot.
Layout: ``[P0 96 | P0 bar | P0 off | P1 96 | P1 bar | P1 off | cur0 | cur1]``.

One fused jnp expression; broadcasts over arbitrary leading batch axes
(games, candidate moves, dice branches) so afterstate features for all
legal moves are computed in a single op.
"""

from __future__ import annotations

import jax.numpy as jnp

from .constants import FEATURE_DIM, NUM_CHECKERS


def encode(points, bar, off, turn, dtype=jnp.float32):
    """Encode absolute-frame boards.

    Args:
      points: (..., 2, 24) integer per-player point counts.
      bar:    (..., 2) integer bar counts.
      off:    (..., 2) integer borne-off counts.
      turn:   (...,)  integer current player (0/1).  Note: the reference
              encodes *afterstates* with the mover's one-hot
              (src/ai/batching.py:136-142) — pass the mover here.

    Returns: (..., 198) features.
    """
    n = points.astype(dtype)
    ge1 = (n >= 1).astype(dtype)
    ge2 = (n >= 2).astype(dtype)
    ge3 = (n >= 3).astype(dtype)
    extra = jnp.maximum(n - 3.0, 0.0) / 2.0
    pts = jnp.stack([ge1, ge2, ge3, extra], axis=-1)  # (...,2,24,4)
    pts = pts.reshape(pts.shape[:-3] + (2, 96))
    barf = bar.astype(dtype)[..., None] / 2.0  # (...,2,1)
    offf = off.astype(dtype)[..., None] / NUM_CHECKERS
    per_player = jnp.concatenate([pts, barf, offf], axis=-1)  # (...,2,98)
    flat = per_player.reshape(per_player.shape[:-2] + (196,))
    t = turn.astype(jnp.int32)
    cur = jnp.stack(
        [(t == 0).astype(dtype), (t == 1).astype(dtype)], axis=-1
    )  # (...,2)
    out = jnp.concatenate([flat, cur], axis=-1)
    assert out.shape[-1] == FEATURE_DIM
    return out


def encode_canonical(vecs, player, dtype=jnp.float32):
    """Encode canonical (..., 52) board vectors for the given mover.

    Converts the canonical frame back to absolute inline (cheap selects)
    and encodes with the mover's one-hot (reference afterstate
    convention)."""
    my = vecs[..., 0:24]
    opp = vecs[..., 24:48]
    p = player.astype(jnp.int32)
    is_p0 = (p == 0)[..., None]
    p0 = jnp.where(is_p0, my, opp[..., ::-1])
    p1 = jnp.where(is_p0, opp, my[..., ::-1])
    points = jnp.stack([p0, p1], axis=-2)  # (...,2,24)
    is_p0s = p == 0
    bar = jnp.stack(
        [
            jnp.where(is_p0s, vecs[..., 48], vecs[..., 49]),
            jnp.where(is_p0s, vecs[..., 49], vecs[..., 48]),
        ],
        axis=-1,
    )
    off = jnp.stack(
        [
            jnp.where(is_p0s, vecs[..., 50], vecs[..., 51]),
            jnp.where(is_p0s, vecs[..., 51], vecs[..., 50]),
        ],
        axis=-1,
    )
    turn = jnp.broadcast_to(p, vecs.shape[:-1])
    return encode(points, bar, off, turn, dtype=dtype)
