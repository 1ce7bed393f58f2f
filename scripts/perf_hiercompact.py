"""Microbench: single-stage vs hierarchical (two-level) compaction.

The round-4/5 measurements say movegen compaction cost is the COMPARE
count of the one-hot (k_out x N per level), not payload width or
materialization (docs/PERF.md).  The expansion grid has structure the
global compare ignores: N = K_parents x NSLOT(27) slots, and any single
board has at most 15 valid submoves for one die (<= 15 occupied origins
when not on bar; bar is exclusive; all-home bear-off has <= 6 occupied
+ 2 bear-off slots), so a per-parent local compaction 27 -> 16 is
PROVABLY lossless.  Two-stage then costs
  local:  K x (16 x 27)   compares  (tiny)
  global: k_out x (K x 16) compares  (= 16/27 of the single-stage N)
vs single-stage k_out x (K x 27) — a ~1.7x compare reduction on the
dominant levels IF the batched tiny matmuls of the local stage lower
well on the MXU.  This script measures exactly that trade on the chip.

Usage: PYTHONPATH=. python scripts/perf_hiercompact.py
"""

import json

import jax
import jax.numpy as jnp

from mlp_ppo_2ply_p3_tpu.core import movegen as MG
from mlp_ppo_2ply_p3_tpu.utils.profiling import timed_scan

NSLOT = 27
LOCAL = 16


def single(pay, val, k_out):
    return jax.vmap(lambda p, v: MG._compact((p,), v, k_out))(pay, val)


def hier(pay, val, k_out):
    """Per-parent 27->16 local compact, then global (K*16 -> k_out)."""
    b, n, c = pay.shape
    k = n // NSLOT
    pg = pay.reshape(b * k, NSLOT, c)
    vg = val.reshape(b * k, NSLOT)
    (lp,), ln = jax.vmap(lambda p, v: MG._compact((p,), v, LOCAL))(pg, vg)
    lv = jnp.arange(LOCAL)[None, :] < ln[:, None]
    gp = lp.reshape(b, k * LOCAL, c)
    gv = lv.reshape(b, k * LOCAL)
    return jax.vmap(lambda p, v: MG._compact((p,), v, k_out))(gp, gv)


def main():
    key = jax.random.PRNGKey(0)
    res = {}
    # (B, K_parents, k_out, valid density) for the dominant levels at
    # fast widths: nd pair block (per order), doubles L3, doubles L4
    shapes = {
        "nd_block": (4096, 32, 288, 0.15),
        "dbl_L3": (896, 80, 192, 0.10),
        "dbl_L4": (896, 192, 256, 0.05),
    }
    for name, (b, k, k_out, dens) in shapes.items():
        n = k * NSLOT
        key, kp, kv = jax.random.split(key, 3)
        pay = jax.random.randint(kp, (b, n, 52), 0, 15, jnp.int8)
        # <= 15 valid per 27-slot parent group by construction
        val = jax.random.bernoulli(kv, dens, (b, n))
        t_single = timed_scan(
            lambda p, v, ko=k_out: single(p, v, ko), pay, val
        ) * 1e3
        t_hier = timed_scan(
            lambda p, v, ko=k_out: hier(p, v, ko), pay, val
        ) * 1e3
        res[f"{name}_single_ms"] = round(t_single, 2)
        res[f"{name}_hier_ms"] = round(t_hier, 2)
        res[f"{name}_speedup"] = round(t_single / t_hier, 2)
    print(json.dumps(res), flush=True)


if __name__ == "__main__":
    main()
