"""On-hardware sanity check for the Pallas compaction kernels.

The CPU test suite exercises both kernels only in interpreter mode
(`tests/test_movegen.py::test_pallas_compaction_path_matches_jnp`),
which does NOT catch Mosaic lowering regressions — round 4 found the
segmented kernel had never actually lowered on v5e (SMEM vector loads,
int8/int16 vector compares).  Run this on a real chip after touching
`ops/compaction.py`:

    PYTHONPATH=. python scripts/check_pallas_tpu.py

Exercises both kernels at the two extreme movegen compaction shapes and
asserts bit-identical outputs against each other (both are separately
jnp-verified by the CPU suite).
"""

import jax
import jax.numpy as jnp

from mlp_ppo_2ply_p3_tpu.ops import compaction as OC


def main():
    assert jax.default_backend() == "tpu", (
        f"needs a real TPU (got {jax.default_backend()}); the CPU parity "
        "test already covers interpreter mode")
    key = jax.random.PRNGKey(0)
    for (b, n, k) in [(256, 896, 288), (256, 5184, 256)]:
        key, k_pay, k_va = jax.random.split(key, 3)
        pay = jax.random.randint(k_pay, (b, n, 52), 0, 15, jnp.int8)
        va = jax.random.bernoulli(k_va, 0.15, (b, n))
        out_s, n_s = OC.compact_rows_segmented(pay, va, k)
        out_g, n_g = OC.compact_rows(pay, va, k)
        assert bool(jnp.all(out_s == out_g)) and bool(jnp.all(n_s == n_g)), (
            f"kernel mismatch at {(b, n, k)}")
        print(f"({b}, {n} -> {k}): segmented == global one-hot", flush=True)
    print("TPU lowering + cross-kernel parity OK")


if __name__ == "__main__":
    main()
