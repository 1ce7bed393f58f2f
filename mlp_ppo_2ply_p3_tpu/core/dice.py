"""Dice distributions and counter-based rolling.

Replaces the reference's host-side ``np.random.randint`` rolls
(/root/reference/src/environment/backgammon_env.py:245-246) and its
roll-until-non-doubles reset protocol (:93-107) with JAX PRNG sampling:

- normal rolls: uniform ordered pair from 36 outcomes;
- opening rolls: sampled *directly* from the 30 ordered non-double
  outcomes (distributionally identical to rejection re-rolling, but a
  fixed amount of work under ``jit``).

Also exposes the 21 unique sorted rolls + probabilities used by the
2-ply expectimax chance nodes (reference
src/moves/get_all_dice_rolls.py:5-34, consumed only by dead code there;
live here).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


def _rolls_table():
    rolls, probs = [], []
    for d0 in range(1, 7):
        for d1 in range(d0, 7):
            rolls.append((d0, d1))
            probs.append(1.0 if d0 == d1 else 2.0)
    return (
        np.array(rolls, dtype=np.int8),
        np.array(probs, dtype=np.float32) / 36.0,
    )


_R, _P = _rolls_table()
ROLLS_21_NP, ROLL_PROBS_21_NP = _R, _P  # host copies (static index math)
ROLLS_21 = jnp.asarray(_R)        # (21, 2) unique sorted rolls
ROLL_PROBS_21 = jnp.asarray(_P)   # (21,)


def roll(key, shape=()):
    """Uniform ordered dice pair(s): (..., 2) int8 in 1..6."""
    return jax.random.randint(key, shape + (2,), 1, 7, dtype=jnp.int8)


def roll_nondouble(key, shape=()):
    """Uniform ordered NON-double pair(s): (..., 2) int8, d0 != d1.

    Index i in [0, 30): d0 = i // 5, r = i % 5, d1 = r + (r >= d0)."""
    i = jax.random.randint(key, shape, 0, 30, dtype=jnp.int32)
    d0 = i // 5
    r = i % 5
    d1 = r + (r >= d0).astype(jnp.int32)
    return jnp.stack([d0 + 1, d1 + 1], axis=-1).astype(jnp.int8)
