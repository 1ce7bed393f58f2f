"""Microbench movegen sub-pieces on the chip.

Methodology (remote-TPU safe): each piece runs ITERS times inside one
jitted lax.scan whose carry is genuinely value-perturbed by the previous
output (tag & 1 added to an input), so XLA cannot hoist (LICM), slice
(DCE), or algebraically fold the body; the timer syncs with a scalar
host readback (.item()), because block_until_ready returns early under
the remote PJRT tunnel.

Usage: python scripts/perf_movegen.py [B] [section,section,...]
"""

import json
import sys

import jax
import jax.numpy as jnp

from mlp_ppo_2ply_p3_tpu.core import board as B
from mlp_ppo_2ply_p3_tpu.core import movegen as MG
from mlp_ppo_2ply_p3_tpu.env import bg_env
from mlp_ppo_2ply_p3_tpu.utils.profiling import timed_scan


def main():
    bsz = int(sys.argv[1]) if len(sys.argv) > 1 else 4096
    only = set(sys.argv[2].split(",")) if len(sys.argv) > 2 else None

    def want(name):
        return only is None or name in only

    cfg = MG.MovegenConfig(max_moves=256)
    env_cfg = bg_env.EnvConfig(movegen=cfg)
    es = bg_env.reset(jax.random.PRNGKey(0), env_cfg, bsz)
    vecs = jax.vmap(B.to_canonical)(es.points, es.bar, es.off, es.turn)
    dice = es.dice
    d0 = dice[:, 0].astype(jnp.int32)
    d1 = dice[:, 1].astype(jnp.int32)
    d_hi, d_lo = jnp.maximum(d0, d1), jnp.minimum(d0, d1)
    key = jax.random.PRNGKey(7)

    res = {"B": bsz}

    if want("full"):
        res["full_ms"] = timed_scan(
            lambda v, d: MG.legal_afterstates_batch(v, d, cfg), vecs, dice
        ) * 1e3

    mir = jnp.zeros((bsz,), bool)
    if want("nd"):
        res["nondoubles_ms"] = timed_scan(
            lambda v, h, l: MG._nondoubles_batch(v, h, l, cfg, mir),
            vecs, d_hi, d_lo,
        ) * 1e3

    bd = MG.doubles_capacity(bsz)
    if want("dbl"):
        res["doubles_ms"] = timed_scan(
            lambda v, d: MG._doubles_batch(v[:bd], d[:bd], cfg, mir[:bd]),
            vecs, d0,
        ) * 1e3

    if want("ndoo"):
        res["nd_one_order_ms"] = timed_scan(
            lambda v, h, l: jax.vmap(
                lambda a, b, c: MG._one_order(a, b, c, cfg.k1, False)
            )(v, h, l),
            vecs, d_hi, d_lo,
        ) * 1e3

    n_raw = 2 * (cfg.k1 * 25 + cfg.k1)
    cand = jax.random.randint(key, (bsz, n_raw, 52), 0, 15, jnp.int8)
    val = jax.random.bernoulli(key, 0.15, (bsz, n_raw))
    if want("c832"):
        res["compact832to384_ms"] = timed_scan(
            lambda c, v: jax.vmap(
                lambda a, b: MG._compact((a,), b, cfg.dedup_width)
            )(c, v),
            cand, val,
        ) * 1e3

    cand2 = jax.random.randint(key, (bsz, cfg.dedup_width, 52), 0, 15, jnp.int8)
    val2 = jax.random.bernoulli(key, 0.2, (bsz, cfg.dedup_width))
    if want("dedup"):
        res["dedup384_ms"] = timed_scan(
            lambda c, v: jax.vmap(MG._dedup_pairwise)(c, v), cand2, val2
        ) * 1e3

    if want("c384"):
        res["compact384to256_ms"] = timed_scan(
            lambda c, v: jax.vmap(
                lambda a, b: MG._compact((a,), b, cfg.max_moves)
            )(c, v),
            cand2, val2,
        ) * 1e3

    n4 = cfg.k3 * 25
    cand3 = jax.random.randint(key, (bd, n4, 52), 0, 15, jnp.int8)
    val3 = jax.random.bernoulli(key, 0.05, (bd, n4))
    if want("c5600"):
        res["dbl_compact5600to256_ms"] = timed_scan(
            lambda c, v: jax.vmap(
                lambda a, b: MG._compact((a,), b, cfg.max_moves)
            )(c, v),
            cand3, val3,
        ) * 1e3

    f3 = jax.random.randint(key, (bd, cfg.k3, 52), 0, 15, jnp.int8)
    f3v = jax.random.bernoulli(key, 0.5, (bd, cfg.k3))
    die = jnp.full((bd,), 3, jnp.int32)
    if want("exp4"):
        res["dbl_expand_L4_ms"] = timed_scan(
            lambda f, v, d: jax.vmap(MG._expand_one_die)(f, v, d), f3, f3v, die
        ) * 1e3

    if want("kernels"):
        # jnp one-hot vs Pallas global-one-hot vs Pallas segmented on the
        # three compaction shapes that dominate movegen (docs/PERF.md)
        from mlp_ppo_2ply_p3_tpu.ops import compaction as OC

        fast = MG.MovegenConfig.fast()
        shapes = {
            "ndblock": (bsz, 2 * (cfg.k1 * 25 + cfg.k1), fast.dedup_width, 0.15),
            "ndfinal": (bsz, fast.dedup_width, cfg.max_moves, 0.2),
            "dblL3": (bd, fast.k2 * 27, fast.k3, 0.1),
            "dblL4": (bd, fast.k3 * 27, cfg.max_moves, 0.05),
        }
        for name, (b_, n_, k_, dens) in shapes.items():
            pay = jax.random.randint(key, (b_, n_, 52), 0, 15, jnp.int8)
            va = jax.random.bernoulli(key, dens, (b_, n_))
            res[f"{name}_jnp_ms"] = timed_scan(
                lambda c, v, kk=k_: jax.vmap(
                    lambda a, b2: MG._compact((a,), b2, kk)
                )(c, v),
                pay, va,
            ) * 1e3
            res[f"{name}_onehot_ms"] = timed_scan(
                lambda c, v, kk=k_: OC.compact_rows(c, v, kk), pay, va
            ) * 1e3
            res[f"{name}_seg_ms"] = timed_scan(
                lambda c, v, kk=k_: OC.compact_rows_segmented(c, v, kk),
                pay, va,
            ) * 1e3

    for k, v in res.items():
        if k != "B":
            res[k] = round(v, 2)
    print(json.dumps(res), flush=True)


if __name__ == "__main__":
    main()
