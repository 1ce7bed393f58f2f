"""Pallas TPU kernel: fused stable-compaction (the movegen hot op).

``core.movegen._compact`` compacts valid rows to the front of a fixed
buffer with a one-hot int8 matmul: output slot j picks the row whose
running valid-count equals j+1.  Under XLA the (k_out, N) one-hot
operand is MATERIALIZED in HBM per game (XLA does not fuse elementwise
producers into dot operands), which costs more HBM traffic than the
payload itself — e.g. the non-doubles block at (B=4096, N=896,
k_out=288) writes+reads a 258 KB int8 one-hot per game (~2 GB per
movegen call) to move a 46 KB payload, and the doubles final level at
(875, 5184 -> 256) a 1.33 MB one-hot per game.

This kernel fuses one-hot construction into the matmul inside VMEM.
Grid layout: (games/G, N/TN) with G games per program (TPU tile rule:
second-to-last block dim % 8 == 0) and the candidate axis tiled by TN so
wide levels fit VMEM; partial products accumulate in an int32 VMEM
scratch across the sequential inner grid dimension (the standard Pallas
reduction pattern) and the int8 result is written on the last tile.
HBM traffic drops to payload-in + result-out.

The masked position vector is computed by the CALLER with a plain XLA
cumsum (``masked_pos = where(valid, cumsum(valid), 0)``) — cheap, and it
keeps associative-scan lowering out of Mosaic.

Used by ``core.movegen`` when ``MovegenConfig.use_pallas`` is enabled
(real TPU; elsewhere the kernel runs in interpreter mode and the jnp
formulation remains the portable fallback and differential-test
reference).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

GAMES_PER_PROGRAM = 8  # TPU tile rule: 2nd-to-last block dim % 8 == 0
MAX_TILE_N = 2048      # candidate-axis tile cap (VMEM budget)


def _kernel(k_out: int, pos_ref, pay_ref, out_ref, acc_ref):
    from jax.experimental import pallas as pl

    g, tn = pos_ref.shape
    j = pl.program_id(1)

    @pl.when(j == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    targets = (
        jax.lax.broadcasted_iota(jnp.int32, (g, k_out, tn), 1) + 1
    )  # output slot k selects global running-count == k+1
    onehot = (pos_ref[:][:, None, :] == targets).astype(jnp.int8)
    acc_ref[:] += jax.lax.dot_general(
        onehot,
        pay_ref[:],
        (((2,), (1,)), ((0,), (0,))),  # batched (G,K,TN) @ (G,TN,C)
        preferred_element_type=jnp.int32,
    )

    @pl.when(j == pl.num_programs(1) - 1)
    def _():
        out_ref[:] = acc_ref[:].astype(jnp.int8)


def _tile_n(n: int) -> int:
    """Candidate-axis tile: <= MAX_TILE_N and a multiple of 128 (TPU
    lane-dim rule); the caller pads N up to a multiple of the tile."""
    if n <= MAX_TILE_N:
        return n
    tiles = -(-n // MAX_TILE_N)
    return -(-(-(-n // tiles)) // 128) * 128


@functools.partial(jax.jit, static_argnames=("k_out", "interpret"))
def compact_rows(payload, valid, k_out: int, interpret: bool | None = None):
    """Batched stable compaction: move valid rows to the front.

    Args:
      payload:   (B, N, C) int8 rows.
      valid:     (B, N) bool.
      k_out:     static output width.
      interpret: run the kernel in the Pallas interpreter (for CPU tests);
                 None = auto (interpret anywhere but real TPU).

    Returns: (out (B, k_out, C) int8, n (B,) int32 valid counts).
    """
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    if interpret is None:
        interpret = jax.default_backend() != "tpu"

    b, n, c = payload.shape
    pos = jnp.cumsum(valid.astype(jnp.int32), axis=1)
    count = pos[:, -1]
    masked_pos = jnp.where(valid, pos, 0)

    g = GAMES_PER_PROGRAM
    pad_b = (-b) % g
    tn = _tile_n(n)
    pad_n = (-n) % tn
    if pad_b or pad_n:
        masked_pos = jnp.pad(masked_pos, ((0, pad_b), (0, pad_n)))
        payload = jnp.pad(payload, ((0, pad_b), (0, pad_n), (0, 0)))
    bp, np_ = b + pad_b, n + pad_n

    out = pl.pallas_call(
        functools.partial(_kernel, k_out),
        grid=(bp // g, np_ // tn),
        in_specs=[
            pl.BlockSpec((g, tn), lambda i, j: (i, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((g, tn, c), lambda i, j: (i, j, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((g, k_out, c), lambda i, j: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((bp, k_out, c), jnp.int8),
        scratch_shapes=[pltpu.VMEM((g, k_out, c), jnp.int32)],
        interpret=interpret,
    )(masked_pos, payload)
    return out[:b], count
