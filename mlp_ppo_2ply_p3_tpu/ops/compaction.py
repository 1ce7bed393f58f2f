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


SEG_W = 128  # segment width = TPU lane dim


def _seg_kernel(k_out: int, s_total: int, games: int,
                base_ref, lpos_ref, pay_ref, out_ref, acc_ref):
    """Segmented stable compaction: the (k_out, N) one-hot never exists.
    The candidate axis is cut into SEG_W-wide segments; each segment
    builds a LOCAL (SEG_W+8, SEG_W) int8 one-hot against its local
    0-based positions (int32 compares — v5e Mosaic supports neither int8
    nor int16 vector compares — but only ~(SEG_W+8)/k_out of the global
    compare count),
    matmuls it with the segment payload on the MXU, and accumulates the
    result slab into the output at the segment's 8-aligned base offset
    (a VMEM dynamic-offset add; slabs overlap only where one side is
    zero, since a segment's rows beyond its valid count have no matching
    one-hot column).

    Mosaic constraints shape this kernel: dynamic sublane store offsets
    must be provably 8-aligned (hence the base/residue split — the 0-7
    residue is folded into ``lpos`` by the CALLER, growing the slab to
    SEG_W+8 rows: slab row r selects shifted local position r), and SMEM
    only supports SCALAR loads (hence ``base_ref[g, s]`` per game in an
    unrolled loop; never ``base_ref[:, s]``)."""
    from jax.experimental import pallas as pl

    acc_ref[:] = jnp.zeros_like(acc_ref)  # scratch persists across grid

    rows = jax.lax.broadcasted_iota(
        jnp.int32, (games, SEG_W + 8, SEG_W), 1
    )  # int32: the only vector-compare dtype v5e Mosaic lowers
    for s in range(s_total):
        # shifted local position = lpos + base-residue in 0..134, int32;
        # the invalid sentinel -100 matches no slab row (0..135).
        lp = lpos_ref[:, s * SEG_W:(s + 1) * SEG_W]          # (G, W) i32
        onehot = (lp[:, None, :] == rows).astype(jnp.int8)
        seg = jax.lax.dot_general(
            onehot,
            pay_ref[:, s * SEG_W:(s + 1) * SEG_W, :],
            (((2,), (1,)), ((0,), (0,))),   # (G,W+8,W) @ (G,W,C)
            preferred_element_type=jnp.int32,
        ).astype(jnp.int16)  # Mosaic vector adds support i16/i32, not i8
        for g in range(games):
            base = pl.multiple_of(base_ref[g, s], 8)
            acc_ref[g, pl.ds(base, SEG_W + 8), :] += seg[g]

    out_ref[:] = acc_ref[:, :k_out, :].astype(jnp.int8)


@functools.partial(jax.jit, static_argnames=("k_out", "interpret"))
def compact_rows_segmented(payload, valid, k_out: int,
                           interpret: bool | None = None):
    """Batched stable compaction via per-segment local one-hots (see
    ``_seg_kernel``).  Same contract as ``compact_rows``."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    if interpret is None:
        interpret = jax.default_backend() != "tpu"

    b, n, c = payload.shape
    pos = jnp.cumsum(valid.astype(jnp.int32), axis=1)
    count = pos[:, -1]

    g = GAMES_PER_PROGRAM
    pad_b = (-b) % g
    pad_n = (-n) % SEG_W
    if pad_n:
        pos = jnp.pad(pos, ((0, 0), (0, pad_n)))
        valid = jnp.pad(valid, ((0, 0), (0, pad_n)))
        payload = jnp.pad(payload, ((0, 0), (0, pad_n), (0, 0)))
    n_p = n + pad_n
    s_total = n_p // SEG_W

    # exclusive running count at each segment start; local 0-based
    # positions within the segment (sentinel -100 for invalid rows:
    # under int32 comparison it matches no slab row, which live in
    # 0..k_out+SEG_W+7 — see _seg_kernel)
    seg_of = jnp.arange(n_p) // SEG_W                        # (Np,)
    off = jnp.concatenate(
        [jnp.zeros((b, 1), jnp.int32),
         pos[:, SEG_W - 1:n_p - 1:SEG_W]], axis=1
    )  # (B, S) exclusive offsets: count strictly before each segment
    # a segment whose offset exceeds k_out holds only rows that the
    # k_out cap truncates anyway; clamping keeps its (overlap-added,
    # discarded) slab inside the (k_out + SEG_W + 8)-row scratch
    off = jnp.minimum(off, k_out)
    # Mosaic: dynamic sublane store offsets must be 8-aligned and SMEM
    # loads must be scalar — split off into an aligned base (SMEM, read
    # per (g, s) scalar in the kernel) and a 0-7 residue folded into the
    # local positions here, in plain XLA (slab row r selects lpos+mod==r)
    base = (off // 8) * 8
    lpos = jnp.where(
        valid, pos - 1 - base[:, seg_of], -100
    )  # int32 = local pos + (off - base) residue, 0..134

    if pad_b:
        lpos = jnp.pad(lpos, ((0, pad_b), (0, 0)), constant_values=-100)
        payload = jnp.pad(payload, ((0, pad_b), (0, 0), (0, 0)))
        base = jnp.pad(base, ((0, pad_b), (0, 0)))
    bp = b + pad_b

    out = pl.pallas_call(
        functools.partial(_seg_kernel, k_out, s_total, g),
        grid=(bp // g,),
        in_specs=[
            pl.BlockSpec((g, s_total), lambda i: (i, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((g, n_p), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((g, n_p, c), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((g, k_out, c), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((bp, k_out, c), jnp.int8),
        scratch_shapes=[pltpu.VMEM((g, k_out + SEG_W + 8, c), jnp.int16)],
        interpret=interpret,
    )(base, lpos, payload)
    return out[:b], count


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
