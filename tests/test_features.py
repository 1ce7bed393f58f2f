"""Feature-encoder parity: the fused jnp encoder must reproduce the
reference 198-dim formula exactly (scalar re-derivation below, from
/root/reference/src/board/immutable_board.py:171-212), including on
canonical-frame afterstates."""

import numpy as np
import jax.numpy as jnp

from mlp_ppo_2ply_p3_tpu.core import features, oracle
import jax

_encode = jax.jit(features.encode)
_encode_canonical = jax.jit(features.encode_canonical)
from .test_movegen import abs_to_canonical_np


def ref_features_np(ob: np.ndarray, current_player: int) -> np.ndarray:
    f = np.zeros(198, dtype=np.float32)
    i = 0
    for player in (0, 1):
        pts = ob[24 * player : 24 * player + 24]
        for p in range(24):
            n = int(pts[p])
            if n == 1:
                f[i] = 1.0
            elif n == 2:
                f[i], f[i + 1] = 1.0, 1.0
            elif n >= 3:
                f[i : i + 3] = 1.0
                f[i + 3] = (n - 3) / 2.0
            i += 4
        f[i] = float(ob[48 + player]) / 2.0
        f[i + 1] = float(ob[50 + player]) / 15.0
        i += 2
    f[i + current_player] = 1.0
    return f


def as_batch(ob):
    points = np.stack([ob[0:24], ob[24:48]])
    bar = np.array([ob[48], ob[49]])
    off = np.array([ob[50], ob[51]])
    return points, bar, off


def test_encode_matches_reference_formula():
    rng = np.random.default_rng(5)
    boards = [oracle.initial_board()] + [
        oracle.random_board(rng, stage=s)
        for s in ("any", "bar", "bearoff")
        for _ in range(30)
    ]
    for ob in boards:
        for player in (0, 1):
            points, bar, off = as_batch(ob)
            got = np.asarray(
                _encode(
                    jnp.asarray(points), jnp.asarray(bar), jnp.asarray(off),
                    jnp.asarray(player),
                )
            )
            want = ref_features_np(ob, player)
            np.testing.assert_allclose(got, want, rtol=0, atol=1e-7)


def test_encode_canonical_matches():
    rng = np.random.default_rng(6)
    for _ in range(50):
        ob = oracle.random_board(rng, "any")
        for player in (0, 1):
            vec = jnp.asarray(abs_to_canonical_np(ob, player))
            got = np.asarray(
                _encode_canonical(vec, jnp.asarray(player))
            )
            want = ref_features_np(ob, player)
            np.testing.assert_allclose(got, want, rtol=0, atol=1e-7)


def test_encode_batched_shapes():
    rng = np.random.default_rng(8)
    obs = [oracle.random_board(rng, "any") for _ in range(4)]
    pts = jnp.asarray(np.stack([as_batch(o)[0] for o in obs]))
    bar = jnp.asarray(np.stack([as_batch(o)[1] for o in obs]))
    off = jnp.asarray(np.stack([as_batch(o)[2] for o in obs]))
    turn = jnp.asarray(np.array([0, 1, 0, 1]))
    out = _encode(pts, bar, off, turn)
    assert out.shape == (4, 198)
    for i, ob in enumerate(obs):
        np.testing.assert_allclose(
            np.asarray(out[i]), ref_features_np(ob, int(turn[i])), rtol=0, atol=1e-7
        )
