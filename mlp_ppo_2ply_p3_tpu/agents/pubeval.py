"""pubeval linear baseline opponent for league evaluation.

Tesauro's public-domain ``pubeval`` scores single afterstates with a
linear function over a 122-dim input encoding of the mover-relative
position, with separate weight vectors for race vs contact positions.
This module implements the EXACT public encoding (the ``setx`` routine
of the released C source) as a vectorized JAX function:

pubeval board convention (``pos[0..27]``, mover = "computer"):
  - pos[n] for n = 1..24: signed checker count at the computer's point
    ``n`` (+ mover, - opponent); the mover walks from high points to low
    and bears off past point 1.
  - pos[0]  = opponent checkers on the bar (NEGATIVE count)
  - pos[25] = mover checkers on the bar (positive; NOT read by setx —
    a documented quirk of pubeval: its own bar count enters only through
    the absence of board/off contributions)
  - pos[26] = mover checkers borne off (positive)
  - pos[27] = opponent borne off (negative; not read by setx)

setx layout (122 dims):
  for j in 1..24, with jm1 = j-1 and n = pos[25-j]:
    x[5*jm1+0] = 1        if n == -1   (single opponent blot)
    x[5*jm1+1] = 1        if n == 1    (mover blot)
    x[5*jm1+2] = 1        if n >= 2    (made point)
    x[5*jm1+3] = 1        if n == 3    (exactly one spare)
    x[5*jm1+4] = (n-3)/2  if n >= 4    (deep stacking)
  x[120] = -pos[0] / 2    (opponent men on bar)
  x[121] = pos[26] / 15   (mover men off)
and the evaluation short-circuits to a huge positive value when the
mover has all 15 off (``pos[26] == 15``).

The canonical weight VALUES (wc[122] / wr[122], public domain) are not
bundled: this build environment has no network egress to fetch them and
244 floats cannot be reproduced reliably from memory.  Load them with
``load_weights(path)`` / the ``PUBEVAL_WEIGHTS`` env var when available;
the encoding above is exactly what they expect.  Until then,
``heuristic_weights()`` provides a deterministic hand-tuned weight pair
over the SAME 122 layout (pip progress, borne-off men, made points,
blot/stack penalties) which serves as the fixed league opponent the
reference lacked (SURVEY.md Q8: the reference measured "win rate"
against itself, which is tautologically 1).

Our canonical frame (core.board: mover walks 0 -> 23 and bears off past
23) maps onto pubeval's by point reversal: our point i is pubeval point
24 - i, so ``pos[25-j]`` for j = 1..24 is our point ``j - 1``.
"""

from __future__ import annotations

import os

import jax.numpy as jnp
import numpy as np

WIN_SCORE = 99999999.0  # pubeval's pos[26]==15 short-circuit value


def encode_pubeval(vec):
    """Canonical (..., 52) board -> (..., 122) exact pubeval x[] encoding.

    ``vec`` is the mover's canonical frame (core.board); the mover of
    ``vec`` is pubeval's "computer".
    """
    my = vec[..., 0:24].astype(jnp.float32)
    opp = vec[..., 24:48].astype(jnp.float32)
    # pubeval block jm1 = j-1 reads pos[25-j] = our point j-1 (see module
    # docstring), so the 24 blocks are simply our points 0..23 in order.
    n = my - opp  # signed mover-relative count per point (disjoint occupancy)
    x0 = (n == -1).astype(jnp.float32)
    x1 = (n == 1).astype(jnp.float32)
    x2 = (n >= 2).astype(jnp.float32)
    x3 = (n == 3).astype(jnp.float32)
    x4 = jnp.where(n >= 4, (n - 3.0) / 2.0, 0.0)
    pts = jnp.stack([x0, x1, x2, x3, x4], axis=-1)  # (..., 24, 5)
    pts = pts.reshape(pts.shape[:-2] + (120,))
    opp_bar = vec[..., 49].astype(jnp.float32)   # pos[0] = -opp_bar
    my_off = vec[..., 50].astype(jnp.float32)    # pos[26]
    tail = jnp.stack([opp_bar / 2.0, my_off / 15.0], axis=-1)
    return jnp.concatenate([pts, tail], axis=-1)


def is_race(vec):
    """Race (no contact): the mover's rearmost checker has passed every
    opponent checker.  In the canonical frame the mover walks 0 -> 23;
    contact iff some mover checker sits at an index <= some opponent
    checker's index (bar counts as rearmost for either side)."""
    my = vec[..., 0:24].astype(jnp.int32)
    opp = vec[..., 24:48].astype(jnp.int32)
    idx = jnp.arange(24)
    my_min = jnp.min(jnp.where(my > 0, idx, 99), axis=-1)
    my_min = jnp.where(vec[..., 48] > 0, -1, my_min)  # on bar = rearmost
    opp_max = jnp.max(jnp.where(opp > 0, idx, -99), axis=-1)
    opp_max = jnp.where(vec[..., 49] > 0, 99, opp_max)
    return my_min > opp_max


def heuristic_weights() -> dict:
    """Deterministic hand-tuned weights over the exact setx layout.

    Values pip progress (a checker in block jm1 sits at pubeval point
    24 - jm1, i.e. ``24 - jm1`` pips from bear-off -> progress
    (jm1+1)/25 per checker), borne-off men, and made points; penalizes
    blots and deep stacks in contact positions.  Block count recovery
    from x: n==1 -> x1; n>=2 -> 2*x2; n==3 -> +x3; n>=4 -> +2*x4
    (approximate for n>=4 — heuristic only)."""
    contact = np.zeros(122, np.float32)
    race = np.zeros(122, np.float32)
    for w, blot_pen, point_bonus, opp_blot_bonus, stack_pen in (
        (contact, -0.30, 0.15, 0.05, -0.04),
        (race, 0.0, 0.0, 0.0, -0.02),
    ):
        for jm1 in range(24):
            progress = (jm1 + 1) / 25.0  # per-checker progress toward off
            w[5 * jm1 + 0] = opp_blot_bonus
            w[5 * jm1 + 1] = progress + blot_pen
            w[5 * jm1 + 2] = 2.0 * progress + point_bonus
            w[5 * jm1 + 3] = progress
            w[5 * jm1 + 4] = 2.0 * progress + stack_pen
        w[120] = 0.5   # opponent men on bar (x[120] is already +opp_bar/2)
        w[121] = 15.0  # mover men off (x[121] = off/15 -> 1.0 per checker)
    return {"contact": jnp.asarray(contact), "race": jnp.asarray(race)}


def load_weights(path: str) -> dict:
    """Load true pubeval weights from an .npz with arrays ``contact``
    (wc) and ``race`` (wr), each (122,) in setx order."""
    data = np.load(path)
    wc = np.asarray(data["contact"], np.float32)
    wr = np.asarray(data["race"], np.float32)
    assert wc.shape == (122,) and wr.shape == (122,), (wc.shape, wr.shape)
    return {"contact": jnp.asarray(wc), "race": jnp.asarray(wr)}


def default_weights() -> dict:
    path = os.environ.get("PUBEVAL_WEIGHTS", "")
    if path and os.path.exists(path):
        return load_weights(path)
    return heuristic_weights()


def evaluate(weights: dict, vec):
    """Score canonical afterstate boards (higher = better for mover),
    exactly pubeval's driver: race/contact weight dispatch + the
    pos[26]==15 already-won short-circuit."""
    x = encode_pubeval(vec)
    race = is_race(vec)
    w = jnp.where(race[..., None], weights["race"], weights["contact"])
    score = jnp.sum(x * w, axis=-1)
    won = vec[..., 50].astype(jnp.int32) >= 15
    return jnp.where(won, WIN_SCORE, score)


def pubeval_actions(weights: dict, state):
    """League-opponent policy: argmax linear score over legal afterstates."""
    from ..env import bg_env

    vals = evaluate(weights, state.after)  # (B, M)
    mask = bg_env.action_mask(state)
    return jnp.argmax(jnp.where(mask, vals, -1e9), axis=-1).astype(jnp.int32)
