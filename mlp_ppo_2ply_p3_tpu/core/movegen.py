"""Fixed-shape legal-move enumerator (the rules hot path), pure JAX.

Replaces the reference's recursive Python expansion
(/root/reference/src/moves/handle_moves.py:109-341,
get_all_moves.py:10-94) with a masked, shape-static tensor program that
runs under ``jit``/``vmap`` for thousands of games in lockstep:

- A *full move* is represented by its **afterstate board** (canonical
  frame, see ``core.board``): the env commits a move by gathering the
  chosen afterstate, so no submove sequences are materialized.
- Non-doubles: both die orders are expanded as dense
  ``(K1, 25)`` candidate grids; singles are emitted per reference
  semantics (only when that order admits no two-submove sequence), the
  reversed order is skipped iff the first pass yielded exactly one
  unique single (get_all_moves.py:43-53), duplicates are removed by
  first-occurrence-in-generation-order (handle_moves.py:313-341) and the
  max-submove filter is applied (get_all_moves.py:73-94).
- Doubles: breadth-first frontier expansion to depth 4 restricted to
  non-decreasing origin order (a completeness-preserving
  canonicalization: arrivals at an origin only ever come from lower
  origins, opponent blocking is static within a turn, and bear-off
  legality is monotone in clearing lower points).  The canonicalization
  also makes every level duplicate-free (see ``_doubles``), so levels
  are plain stable compactions — no sorting anywhere on the doubles
  path.  The final list is the deepest non-empty level, matching the
  reference's record-shorter-sequences + max-length-filter behavior.

All compactions use a cumsum + binary-search + gather formulation
(``_compact``) rather than scatters, which XLA:TPU would serialize.

Output ordering: both lists are in deterministic generation order
(non-doubles: reference generation order); parity with the reference is
at the afterstate-set level (see tests/test_movegen.py).

Width caps (empirical maxima measured with the oracle over ~25k
position/roll pairs: non-doubles final 84, doubles L2 43, L3 146, final
396) are configurable; overflow is reported per call.
"""

from __future__ import annotations

import dataclasses
from functools import partial

import jax
import jax.numpy as jnp

from . import board as B
from .constants import NUM_CHECKERS


@dataclasses.dataclass(frozen=True)
class MovegenConfig:
    """Static width caps.  Empirical maxima over ~35k reachable
    position/roll pairs (oracle playouts): doubles L2 44, L3 161, final
    459; non-doubles final 93.  Overflow is reported per call so
    saturation is observable in production metrics; the trainer applies
    ``RunConfig.overflow_policy`` ("none"/"warn"/"abort", handled in
    ppo.train) to the per-update overflow count."""

    max_moves: int = 256    # M: final list width (reference env cap: 500)
    k1: int = 16            # first-level frontier (hard bound: 15 origins)
    k2: int = 96            # doubles frontier after 2 submoves
    k3: int = 224           # doubles frontier after 3 submoves
    dedup_width: int = 384  # non-doubles raw-candidate block fed to dedup
                            # (max raw count seen over 100k random
                            # board-steps: 251; theoretical cap 482)
    # doubles sub-batch capacity = B // dbl_div + dbl_add for B >= 512
    # (see doubles_capacity)
    dbl_div: int = 4
    dbl_add: int = 64
    # exact_order=True switches the doubles path from canonical multiset
    # enumeration to reference-order permutation enumeration with
    # levelwise board dedup (see _doubles_exact): identical afterstate
    # SET either way, but exact_order also reproduces the reference's
    # list ORDER for doubles replenishment chains, at ~2-4x the doubles
    # cost.  k4 is the pre-dedup width of the final permutation level
    # (exact_order only).
    exact_order: bool = False
    k4: int = 1920
    # The non-doubles partition reserves max(0, B//6 - 8 sigma) rows as
    # presumed doubles (nondoubles_capacity).  That sizing assumes the
    # batch's dice are ~uniform (Binomial(B, 1/6) doubles).  Batches
    # with INJECTED non-uniform dice (same-roll sweeps in tests or
    # analysis tools) must set full_nondoubles=True to give the
    # non-doubles sub-batch the full batch width.
    full_nondoubles: bool = False
    # Fused Pallas compaction kernels (ops.compaction): builds the
    # (k_out, N) one-hot selector in VMEM instead of materializing it in
    # HBM (XLA does not fuse elementwise producers into dot operands).
    # TPU only — CPU/tests run the kernel in interpreter mode; the jnp
    # path stays the portable reference.  pallas_kernel selects the
    # formulation: "onehot" = global one-hot built in VMEM (round-3
    # study: ~neutral vs XLA), "segmented" = per-128-wide-segment local
    # one-hots + dynamic-offset VMEM merge — int32 compares only (v5e
    # Mosaic lowers no int8/int16 vector compares, so there is no
    # lane-width win), ~(SEG_W+8)/k_out of the compare count, measured
    # SLOWER than the jnp path on v5e (docs/PERF.md round 4); both
    # kernels stay off by default.
    use_pallas: bool = False
    pallas_kernel: str = "segmented"
    # dedup=False skips the non-doubles first-occurrence board dedup and
    # compacts the raw candidate block straight into the M-wide output
    # (duplicate afterstates remain).  Only valid for consumers that are
    # insensitive to duplicates — the 2-ply reply evaluation's min over
    # reply values (agents.twoply) — never for the env's action list.
    # Bonus: with M >= 482 (the theoretical raw non-doubles maximum:
    # 2 orders x (15 origins x 16 one-die continuations + 1 single)) the
    # non-doubles path becomes provably overflow-free, a stronger
    # guarantee than the deduped path's measured-maximum sizing.
    dedup: bool = True

    @classmethod
    def parity(cls, max_moves: int = 500) -> "MovegenConfig":
        """Strict reference-parity preset: exact list order for both
        players incl. doubles (exact_order), caps above every practical
        bound (non-doubles raw 482 < 512; doubles L3 perms <= 3*161,
        L4 perms < 1920), and M = 500 = the reference env's own
        max_legal_moves cap — both sides keep the FIRST 500 moves in
        generation order (backgammon_env.py:219-223, Q14), so truncation
        itself is parity-exact."""
        return cls(
            max_moves=max_moves, k2=128, k3=512, dedup_width=512,
            exact_order=True, k4=1920,
        )

    @classmethod
    def fast(cls, max_moves: int = 256) -> "MovegenConfig":
        """Throughput preset: width caps tightened to the measured maxima
        plus margin (L2 44 -> 80, L3 161 -> 192, non-doubles raw 251 ->
        288) and the doubles sub-batch at mean + 8 sigma of Binomial(B,
        1/6) instead of +17 sigma.  Saturation remains observable via the
        overflow flag; pair with a warn/abort overflow policy in the
        trainer."""
        return cls(
            max_moves=max_moves, k2=80, k3=192, dedup_width=288,
            dbl_div=5, dbl_add=56,
        )


# Candidate-slot grid per die: 24 point origins + bar + farthest
# bear-off + exact bear-off (see board.submoves_one_die).
NSLOT = 27


def _perm_scan(x, mirror):
    """Reorder a (..., 27) per-slot array into the game's scan order.

    The reference enumerates point origins in ABSOLUTE ascending order
    for both players (move_logic.py:47-92 scans range(24)); our
    canonical frame reflects player 2 (i -> 23-i), so matching the
    reference's generation order (exact action-index parity, Q14) flips
    the first 25 slots (points + bar) for player-2 games.  Bar placement
    is irrelevant (bar moves are exclusive, move_logic.py:35-44); the
    two bear-off slots stay last in both orders because the reference
    emits them after the in-home normal moves (move_logic.py:173-255)."""
    flipped = jnp.concatenate(
        [jnp.flip(x[..., :25], axis=-1), x[..., 25:]], axis=-1
    )
    return jnp.where(mirror, flipped, x)


# --- building blocks --------------------------------------------------------


def _expand_one_die(boards, valid, die, mirror):
    """Expand a (K, 52) frontier by one die: returns
    (after (K*NSLOT, 52), valid (K*NSLOT,), origin (K*NSLOT,)) over the
    dense candidate grid, iterated in scan order (``_perm_scan``)."""
    v, o, d, h = jax.vmap(B.submoves_one_die, (0, None))(boards, die)
    v, o, d, h = (_perm_scan(a, mirror) for a in (v, o, d, h))
    after = jax.vmap(
        lambda b, oo, dd, hh: jax.vmap(B.apply_submove, (None, 0, 0, 0))(
            b, oo, dd, hh
        )
    )(boards, o, d, h)  # (K,NSLOT,52)
    k = boards.shape[0]
    val = (valid[:, None] & v).reshape(k * NSLOT)
    return after.reshape(k * NSLOT, 52), val, o.reshape(k * NSLOT)


def _compact(payloads, valid, k_out):
    """Stable-compact valid rows to the front of a width-``k_out`` buffer;
    order preserved.  ``payloads`` is a tuple of arrays with leading dim N
    whose values must fit int8 (|v| <= 127 — board counts <= 15, origin
    ranks <= 24, dice <= 6).  Returns (payloads_out, n).

    The gather is a one-hot int8 matmul with int32 accumulation: output
    slot j picks the row whose running valid-count equals j+1, so each
    output element is a single 0/1 x int8 product — exact — and the
    whole compaction rides the MXU (TPU int8 matmul is native and runs
    at 2x bf16 rate with half the one-hot + payload memory traffic).
    Row-gather / sort+gather / scatter alternatives measured 6-10x
    slower on TPU v5e at (4096, 832, 52): XLA lowers small-row
    gathers/scatters poorly.  The one-hot COMPARE runs in int16 (counts
    <= N <= 32767 always): the VPU packs 2 int16 lanes per register, a
    measured 1.48x on the widest level (5184 -> 256: 7.3 -> 5.0 ms at
    the 896-game doubles sub-batch)."""
    ctype = jnp.int16 if valid.shape[0] <= 32767 else jnp.int32
    pos = jnp.cumsum(valid.astype(ctype))  # running count, 1-indexed
    n = pos[-1].astype(jnp.int32)
    mpos = jnp.where(valid, pos, 0)  # 0 never matches a 1-based target
    targets = jnp.arange(1, k_out + 1, dtype=ctype)
    oh = (mpos[None, :] == targets[:, None]).astype(jnp.int8)
    # (k_out, N); <=1 nonzero per row
    outs = []
    for p in payloads:
        squeeze = p.ndim == 1
        mat = p[:, None] if squeeze else p
        sel = jax.lax.dot_general(
            oh,
            mat.astype(jnp.int8),
            (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32,
        )
        sel = sel[:, 0] if squeeze else sel
        outs.append(sel.astype(p.dtype))
    return tuple(outs), n


def _compact_batch(payloads, valid, k_out: int, use_pallas):
    """Batch-level stable compaction over (B, N[, C]) payloads: either a
    fused Pallas kernel (ops.compaction; ``use_pallas`` truthy = the
    MovegenConfig.pallas_kernel name) or a vmap of the jnp ``_compact``
    reference formulation.  Returns (payloads_out, n (B,))."""
    if use_pallas:
        from ..ops import compaction

        name = use_pallas if isinstance(use_pallas, str) else "onehot"
        kernel = {
            "onehot": compaction.compact_rows,
            "segmented": compaction.compact_rows_segmented,
        }[name]

        cols, widths = [], []
        for p in payloads:
            m = p[:, :, None] if p.ndim == 2 else p
            widths.append(m.shape[2])
            cols.append(m.astype(jnp.int8))
        cat = jnp.concatenate(cols, axis=2) if len(cols) > 1 else cols[0]
        out, n = kernel(cat, valid, k_out)
        outs, off = [], 0
        for p, w in zip(payloads, widths):
            sel = out[:, :, off:off + w]
            off += w
            sel = sel[:, :, 0] if p.ndim == 2 else sel
            outs.append(sel.astype(p.dtype))
        return tuple(outs), n

    def per_game(v, *ps):
        return _compact(ps, v, k_out)

    return jax.vmap(per_game)(valid, *payloads)


def _dedup_pairwise(boards, valid):
    """First-occurrence dedup flags in ORIGINAL (generation) order:
    keep[i] iff row i is valid and no earlier valid row holds the same
    board (reference add_unique_board semantics,
    handle_moves.py:313-341).

    Dense (K, K) packed-key comparison — pure vector ops.  Measured on
    v5e at (4096, 384, 52) this beats both a multi-key sort and an
    int8/bf16 Gram-matrix (squared-distance == 0) MXU formulation
    (2.7 ms vs 5-16 ms): the Gram matrix materializes a (K, K) int32
    block per game while the 7-word key compare fuses into a bool."""
    keys = jax.vmap(B.pack_key)(boards)  # (K,7)
    eq = jnp.all(keys[:, None, :] == keys[None, :, :], axis=-1)
    eq = eq & valid[:, None] & valid[None, :]
    k = boards.shape[0]
    earlier = jnp.tril(jnp.ones((k, k), bool), -1)
    dup = jnp.any(eq & earlier, axis=1)
    return valid & jnp.logical_not(dup)


def _embed(boards, n, m):
    """Place a (K,52) frontier into an (M,52) buffer (truncating if K > M)."""
    k = min(boards.shape[0], m)
    out = jnp.zeros((m, 52), dtype=boards.dtype)
    return out.at[:k].set(boards[:k]), jnp.minimum(n, m)


# --- non-doubles ------------------------------------------------------------


def _one_order(vec, d_first, d_second, k1, mirror):
    """One die order (reference handle_moves.py:109-200): returns
    (singles (k1,52), singles_valid, pair_boards (k1*25,52), pair_valid,
    has2)."""
    v1, o1, d1, h1 = (
        _perm_scan(a, mirror) for a in B.submoves_one_die(vec, d_first)
    )
    b1 = jax.vmap(B.apply_submove, (None, 0, 0, 0))(vec, o1, d1, h1)
    (b1c,), n1 = _compact((b1,), v1, k1)  # <= 15 valid: k1=16 never overflows
    v1c = jnp.arange(k1) < n1
    pair_b, pair_v, _ = _expand_one_die(b1c, v1c, d_second, mirror)
    has2 = jnp.any(pair_v)
    return b1c, v1c, pair_b, pair_v, has2


def _nondoubles_candidates(vec, d_hi, d_lo, cfg: MovegenConfig, mirror):
    """Per-game candidate block: all (board, valid) raw candidates of
    both die orders with reference emission semantics and the
    max-submove filter applied.  Compaction/dedup happen at batch level
    (``_nondoubles_batch``)."""
    k1 = cfg.k1
    a1b, a1v, a2b, a2v, has2_a = _one_order(vec, d_hi, d_lo, k1, mirror)
    b1b, b1v, b2b, b2v, has2_b = _one_order(vec, d_lo, d_hi, k1, mirror)

    # skip the reversed order iff pass A yielded exactly one unique
    # single-submove move (reference get_all_moves.py:43-53).  Distinct
    # origins with the same die always produce distinct boards (the
    # source-point delta differs; a swap o1=o2+die & o2=o1+die is
    # impossible for die > 0), so the unique count is a plain popcount.
    uniq_singles_a = jnp.sum((a1v & jnp.logical_not(has2_a)).astype(jnp.int32))
    skip_b = jnp.logical_not(has2_a) & (uniq_singles_a == 1)

    run_b = jnp.logical_not(skip_b)
    cand_boards = jnp.concatenate([a2b, a1b, b2b, b1b], axis=0)
    cand_valid = jnp.concatenate(
        [
            a2v & has2_a,
            a1v & jnp.logical_not(has2_a),
            b2v & has2_b & run_b,
            b1v & jnp.logical_not(has2_b) & run_b,
        ]
    )
    npair = k1 * NSLOT
    seqlen = jnp.concatenate(
        [
            jnp.full((npair,), 2, jnp.int32),
            jnp.full((k1,), 1, jnp.int32),
            jnp.full((npair,), 2, jnp.int32),
            jnp.full((k1,), 1, jnp.int32),
        ]
    )
    # Max-submove filter FIRST (reference get_all_moves.py:73-94 runs it
    # after dedup, but equal boards always have equal submove counts —
    # the pip delta of a 1-submove move differs from any 2-submove
    # move's — so filtering before dedup keeps identical semantics and
    # drops the seqlen payload from the compaction).
    max_len = jnp.max(jnp.where(cand_valid, seqlen, 0))
    keep0 = cand_valid & (seqlen == max_len)
    return cand_boards, keep0


def _nondoubles_batch(vecs, d_hi, d_lo, cfg: MovegenConfig, mirror):
    """(B,)-batched non-doubles enumeration: vmapped candidate blocks,
    then batch-level stable compaction -> per-game dedup -> batch-level
    compaction into the M-wide output."""
    cand, keep0 = jax.vmap(
        lambda v, h, l, mi: _nondoubles_candidates(v, h, l, cfg, mi)
    )(vecs, d_hi, d_lo, mirror)
    if not cfg.dedup:
        # duplicate-insensitive consumers (2-ply reply min): compact the
        # raw block straight into the output — no dedup_width bottleneck
        (out,), n = _compact_batch((cand,), keep0, cfg.max_moves,
                                   cfg.use_pallas and cfg.pallas_kernel)
        return out, jnp.minimum(n, cfg.max_moves), n > cfg.max_moves
    kd = cfg.dedup_width
    (cb,), n_raw = _compact_batch((cand,), keep0, kd, cfg.use_pallas and cfg.pallas_kernel)
    kv = jnp.arange(kd)[None, :] < jnp.minimum(n_raw, kd)[:, None]
    keep = jax.vmap(_dedup_pairwise)(cb, kv)
    (out,), n = _compact_batch((cb,), keep, cfg.max_moves, cfg.use_pallas and cfg.pallas_kernel)
    overflow = (n_raw > kd) | (n > cfg.max_moves)
    return out, jnp.minimum(n, cfg.max_moves), overflow


# --- doubles ----------------------------------------------------------------


def _rank_of(origin):
    """Movement-direction rank of an origin (bar first): the
    non-decreasing-rank canonicalization is only completeness-preserving
    in the CANONICAL direction (arrivals at an origin come from the
    lower origin o-die, so replenishment chains are non-decreasing).
    This is independent of the scan (emission) order: each origin
    multiset still appears exactly once."""
    return jnp.where(origin == B.ORIGIN_BAR, -1, origin)


def _doubles_batch(vecs, die, cfg: MovegenConfig, mirror):
    """(B,)-batched depth-4 frontier expansion with non-decreasing-origin
    canonicalization and NO dedup: none is needed.  Distinct
    non-decreasing origin sequences are exactly the origin multisets,
    and an origin multiset is recoverable from the board delta (induct
    from the lowest point: checkers leaving point o equal arrivals from
    o-die (and the bar for o = die-1) minus the observed delta), so two
    different frontier rows can never hold the same board.  Each level
    is therefore a plain stable compaction (batch-level, Pallas-fusable)
    of the valid expansions."""
    m = cfg.max_moves
    up = cfg.use_pallas and cfg.pallas_kernel

    def first(vec, d, mi):
        v1, o1, d1, h1 = (
            _perm_scan(a, mi) for a in B.submoves_one_die(vec, d)
        )
        b1 = jax.vmap(B.apply_submove, (None, 0, 0, 0))(vec, o1, d1, h1)
        return b1, _rank_of(o1).astype(jnp.int8), v1

    b1, r1, v1 = jax.vmap(first)(vecs, die, mirror)
    (f1b, f1r), n1 = _compact_batch((b1, r1), v1, cfg.k1, up)
    f1v = jnp.arange(cfg.k1)[None, :] < n1[:, None]

    def level(fb, fr, fv, k_out):
        eb, ev, eo = jax.vmap(
            lambda b_, v_, d_, m_: _expand_one_die(b_, v_, d_, m_)
        )(fb, fv, die, mirror)
        erank = _rank_of(eo).astype(jnp.int8)
        parent = jnp.repeat(fr.astype(jnp.int32), NSLOT, axis=1)
        ev = ev & (erank.astype(jnp.int32) >= parent)
        has = jnp.any(ev, axis=1)
        (nb, nr), n = _compact_batch((eb, erank), ev, k_out, up)
        nv = jnp.arange(k_out)[None, :] < jnp.minimum(n, k_out)[:, None]
        return nb, nr, nv, n, has

    f2b, f2r, f2v, n2, has2 = level(f1b, f1r, f1v, cfg.k2)
    f3b, f3r, f3v, n3, has3 = level(f2b, f2r, f2v, cfg.k3)
    f4b, _, _, n4, has4 = level(f3b, f3r, f3v, m)

    # deepest non-empty level is the legal move list
    embed = jax.vmap(lambda b_, n_: _embed(b_, n_, m))
    l1b, l1n = embed(f1b, n1)
    l2b, l2n = embed(f2b, n2)
    l3b, l3n = embed(f3b, n3)
    w4, w3, w2 = (h[:, None, None] for h in (has4, has3, has2))
    out = jnp.where(w4, f4b, jnp.where(w3, l3b, jnp.where(w2, l2b, l1b)))
    n = jnp.where(
        has4, n4, jnp.where(has3, l3n, jnp.where(has2, l2n, l1n))
    )
    overflow = (
        (has2 & (n2 > cfg.k2))
        | (has3 & (n3 > cfg.k3))
        | (has4 & (n4 > m))
        | (jnp.logical_not(has4) & has3 & (n3 > m))
        | (jnp.logical_not(has3) & has2 & (n2 > m))
    )
    return out, jnp.minimum(n, m), overflow


def _doubles_exact(vec, die, cfg: MovegenConfig, mirror):
    """Reference-ORDER doubles enumeration (exact_order mode).

    The reference's nested scan (handle_moves.py:203-310) enumerates all
    valid origin *permutations* in lex scan order and add_unique_board
    keeps the first occurrence; a multiset's representative is therefore
    its lex-first valid permutation (which, for replenishment chains —
    re-moving a checker that just arrived — is NOT the sorted sequence,
    so the canonical multiset enumeration in ``_doubles`` yields the same
    set in a different order).  This path replays the permutation scan
    with a first-occurrence board dedup at every level.  Levelwise dedup
    is exact: equal boards have identical continuation sets, so the
    lex-first final sequence always extends the lex-first prefix of its
    board class.  Costs ~2-4x ``_doubles``; used by the parity preset.
    """
    m = cfg.max_moves
    v1, o1, d1, h1 = (
        _perm_scan(a, mirror) for a in B.submoves_one_die(vec, die)
    )
    b1 = jax.vmap(B.apply_submove, (None, 0, 0, 0))(vec, o1, d1, h1)
    # L1 singles can coincide only via the two bear-off slots (same
    # origin forbidden by construction), which target distinct origins,
    # so boards are distinct: no L1 dedup
    (f1b,), n1 = _compact((b1,), v1, cfg.k1)
    f1v = jnp.arange(cfg.k1) < n1

    def level(fb, fkeep, k_out):
        eb, ev, _ = _expand_one_die(fb, fkeep, die, mirror)
        has = jnp.any(ev)
        n_pre = jnp.sum(ev.astype(jnp.int32))
        (nb,), _ = _compact((eb,), ev, k_out)
        nv = jnp.arange(k_out) < jnp.minimum(n_pre, k_out)
        keep = _dedup_pairwise(nb, nv)
        return nb, keep, n_pre, has

    f2b, f2k, n2, has2 = level(f1b, f1v, cfg.k2)
    f3b, f3k, n3, has3 = level(f2b, f2k, cfg.k3)
    f4b, f4k, n4, has4 = level(f3b, f3k, cfg.k4)

    c2 = jnp.sum(f2k.astype(jnp.int32))
    c3 = jnp.sum(f3k.astype(jnp.int32))
    c4 = jnp.sum(f4k.astype(jnp.int32))
    (o4,), _ = _compact((f4b,), f4k, m)
    (o3,), _ = _compact((f3b,), f3k, m)
    (o2,), _ = _compact((f2b,), f2k, m)
    l1b, l1n = _embed(f1b, n1, m)
    out = jnp.where(has4, o4, jnp.where(has3, o3, jnp.where(has2, o2, l1b)))
    n = jnp.where(has4, c4, jnp.where(has3, c3, jnp.where(has2, c2, l1n)))
    overflow = (
        (has2 & (n2 > cfg.k2))
        | (has3 & (n3 > cfg.k3))
        | (has4 & (n4 > cfg.k4))
        | (n > m)
    )
    return out, jnp.minimum(n, m), overflow


def _doubles_dispatch_batch(vecs, die, cfg: MovegenConfig, mirror):
    if cfg.exact_order:
        # parity mode: per-game permutation replay (CPU-oriented)
        return jax.vmap(
            lambda v, d, mi: _doubles_exact(v, d, cfg, mi)
        )(vecs, die, mirror)
    return _doubles_batch(vecs, die, cfg, mirror)


# --- public entry -----------------------------------------------------------


def doubles_capacity(
    batch_size: int, cfg: MovegenConfig = MovegenConfig()
) -> int:
    """Static width of the doubles sub-batch in
    ``legal_afterstates_batch``.  Doubles are Binomial(B, 1/6): the
    default ``B//4 + 64`` sits >12 sigma above the mean for every
    B >= 512 and the ``fast()`` preset's ``B//5 + 56`` still sits at
    +8 sigma, so saturation is practically impossible (and is reported
    via the overflow flag if it ever happens)."""
    if batch_size < 512:
        return batch_size
    return batch_size // cfg.dbl_div + cfg.dbl_add


def nondoubles_capacity(
    batch_size: int, cfg: MovegenConfig = MovegenConfig()
) -> int:
    """Static width of the NON-doubles sub-batch: the ~1/6 of games that
    rolled doubles shouldn't pay the non-doubles kernel either, so
    non-doubles rows are compacted symmetrically.  Reserve = the +8-sigma
    lower tail of the Binomial(B, 1/6) doubles count, so saturation is as
    unlikely as the doubles side's (and equally reported).  Batches with
    injected non-uniform dice must set ``cfg.full_nondoubles`` (see
    MovegenConfig)."""
    if batch_size < 512 or cfg.full_nondoubles:
        return batch_size
    import math

    margin = int(8 * math.sqrt(batch_size * 5 / 36))
    reserve = max(0, batch_size // 6 - margin)
    return batch_size - reserve


@partial(jax.jit, static_argnames=("cfg",))
def legal_afterstates_batch(
    vecs, dice, cfg: MovegenConfig = MovegenConfig(), mirror=None
):
    """Batched legal-move enumeration with doubles partitioning.

    Only ~1/6 of games roll doubles, but the doubles kernel (depth-4
    frontier expansion) costs several times the non-doubles one.  Running
    it on all B games in lockstep wastes >4x the work: instead the
    doubles games are stable-compacted into a ``doubles_capacity(B)``
    sub-batch, expanded there, and gathered back.  All shapes static.

    Args:
      vecs:   (B, 52) int8 canonical boards (current player to move).
      dice:   (B, 2) integer dice.
      cfg:    static width configuration.
      mirror: (B,) bool — True for games whose mover is player 2, so the
              output list follows the reference's absolute-ascending
              generation order (None = all False, canonical order).

    Returns: (boards (B, M, 52), n_moves (B,), overflow (B,)).
    """
    bsz = vecs.shape[0]
    if mirror is None:
        mirror = jnp.zeros((bsz,), bool)
    d0 = dice[:, 0].astype(jnp.int32)
    d1 = dice[:, 1].astype(jnp.int32)
    is_double = d0 == d1
    not_double = jnp.logical_not(is_double)
    d_hi, d_lo = jnp.maximum(d0, d1), jnp.minimum(d0, d1)

    # non-doubles sub-batch (the symmetric partition: doubles rows don't
    # pay the non-doubles kernel)
    bn = nondoubles_capacity(bsz, cfg)
    (nvecs, nhi, nlo, nmir), _ = _compact(
        (vecs, d_hi, d_lo, mirror.astype(jnp.int8)), not_double, bn
    )
    nd_out, nd_n, nd_of = _nondoubles_batch(
        nvecs, nhi.astype(jnp.int32), nlo.astype(jnp.int32), cfg, nmir > 0
    )

    bd = doubles_capacity(bsz, cfg)
    (dvecs, ddie, dmir), _ = _compact(
        (vecs, d0, mirror.astype(jnp.int8)), is_double, bd
    )
    db_out, db_n, db_of = _doubles_dispatch_batch(
        dvecs, ddie.astype(jnp.int32), cfg, dmir > 0
    )

    pos_d = jnp.cumsum(is_double.astype(jnp.int32))   # 1-indexed slots
    slot_d = jnp.clip(pos_d - 1, 0, bd - 1)
    fits_d = is_double & (pos_d <= bd)
    pos_n = jnp.cumsum(not_double.astype(jnp.int32))
    slot_n = jnp.clip(pos_n - 1, 0, bn - 1)
    fits_n = not_double & (pos_n <= bn)

    out = jnp.where(is_double[:, None, None], db_out[slot_d], nd_out[slot_n])
    n = jnp.where(
        is_double,
        jnp.where(fits_d, db_n[slot_d], 0),
        jnp.where(fits_n, nd_n[slot_n], 0),
    )
    of = jnp.where(
        is_double,
        db_of[slot_d] | jnp.logical_not(fits_d),
        nd_of[slot_n] | jnp.logical_not(fits_n),
    )

    game_over = vecs[:, B.MY_OFF].astype(jnp.int32) >= NUM_CHECKERS
    n = jnp.where(game_over, 0, n)
    return out, n, of


def nondoubles_afterstates_batch(
    vecs, d_hi, d_lo, cfg: MovegenConfig = MovegenConfig(), mirror=None
):
    """Non-doubles enumeration WITHOUT the doubles partition: every game
    in ``vecs`` uses the (d_hi, d_lo) dice directly.  For callers whose
    dice split is static — the 2-ply reply sweep evaluates each of the
    15 non-doubles rolls as its own broadcast batch (agents.twoply), so
    routing games into sub-batches (``legal_afterstates_batch``) would
    be pure overhead.  Same output contract as the public entry,
    including the game-over rule (reference move_logic.py:269-270)."""
    bsz = vecs.shape[0]
    if mirror is None:
        mirror = jnp.zeros((bsz,), bool)
    out, n, of = _nondoubles_batch(
        vecs, d_hi.astype(jnp.int32), d_lo.astype(jnp.int32), cfg, mirror
    )
    game_over = vecs[:, B.MY_OFF].astype(jnp.int32) >= NUM_CHECKERS
    return out, jnp.where(game_over, 0, n), of


def doubles_afterstates_batch(
    vecs, die, cfg: MovegenConfig = MovegenConfig(), mirror=None
):
    """Doubles enumeration without the partition (see
    ``nondoubles_afterstates_batch``): every game uses ``die`` 4x."""
    bsz = vecs.shape[0]
    if mirror is None:
        mirror = jnp.zeros((bsz,), bool)
    out, n, of = _doubles_dispatch_batch(
        vecs, die.astype(jnp.int32), cfg, mirror
    )
    game_over = vecs[:, B.MY_OFF].astype(jnp.int32) >= NUM_CHECKERS
    return out, jnp.where(game_over, 0, n), of


@partial(jax.jit, static_argnames=("cfg",))
def legal_afterstates(
    vec, dice, cfg: MovegenConfig = MovegenConfig(), mirror=False
):
    """All legal afterstates from one canonical board + dice pair.

    Args:
      vec:    (52,) int8 canonical board (current player to move).
      dice:   (2,) integer dice.
      cfg:    static width configuration.
      mirror: bool scalar — True when the mover is player 2 (reference
              generation-order parity, see legal_afterstates_batch).

    Returns:
      boards:   (M, 52) int8 canonical afterstate boards (padded).
      n_moves:  () int32 number of valid moves (0 -> forced pass).
      overflow: () bool, true if any width cap truncated the true set.
    """
    mirror = jnp.asarray(mirror, bool)
    d0 = dice[0].astype(jnp.int32)
    d1 = dice[1].astype(jnp.int32)
    d_hi, d_lo = jnp.maximum(d0, d1), jnp.minimum(d0, d1)
    nd_out, nd_n, nd_of = _nondoubles_batch(
        vec[None], d_hi[None], d_lo[None], cfg, mirror[None]
    )
    db_out, db_n, db_of = _doubles_dispatch_batch(
        vec[None], d0[None], cfg, mirror[None]
    )
    is_double = d0 == d1
    out = jnp.where(is_double, db_out[0], nd_out[0])
    n = jnp.where(is_double, db_n[0], nd_n[0])
    of = jnp.where(is_double, db_of[0], nd_of[0])
    # no moves once the game is over (reference move_logic.py:269-270)
    game_over = vec[B.MY_OFF].astype(jnp.int32) >= NUM_CHECKERS
    n = jnp.where(game_over, 0, n)
    return out, n, of
