"""Batched affine-gap local alignment on TPU — traceback-free.

This replaces both SPOA (consensus, reference: BMEAN submodule via
src/correctionMSA.cpp:32) and the striped Smith-Waterman library
(stitching, reference: src/correctionAlignment.cpp:48-93) with one
TPU-native primitive: a batched Smith-Waterman whose per-row horizontal
dependency is resolved with an associative prefix-max scan, so each DP
row is one vectorized step — no scalar inner loop, no traceback.

Instead of a traceback, we compute the *match posterior*: a cell (i, j)
is marked iff some optimal local alignment matches query base i to
reference base j.  This needs one forward and one backward fill:

    on_path(i,j)  <=>  fwd_match(i,j) + bwd_cont(i+1,j+1) == opt

where fwd_match is the best score of a local path ending with (i~j)
aligned, and bwd_cont is the best continuation starting at (i+1, j+1)
(possibly empty).  Affine gaps cannot straddle a matched pair, so the
split is exact.  Everything downstream (consensus votes, alignment
begin/end coordinates, indel counts) derives from this boolean tensor
with vectorized column reductions — the TPU never chases pointers.

Gap cost model: a gap of length g costs open + (g-1)*ext, matching the
SSW library's semantics used by the reference stitcher.

Within-row recurrence (the standard two-pass trick): with
  Ht[i][j] = max(0, H[i-1][j-1] + sub(i,j), F[i][j])     (no E term)
the horizontal state is exactly
  E[i][j]  = max_{k<j} (Ht[i][k] - open - (j-1-k)*ext)
because a horizontal gap run must start from a non-E cell (re-opening
from an E cell is never better since open >= ext > 0).  E is an
exclusive prefix-max of (Ht[i][k] + k*ext), one associative scan per row.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

NEG = -(2 ** 20)  # effectively -inf for int32 scores


class Scoring(NamedTuple):
    match: int = 2
    mismatch: int = -4
    gap_open: int = 4     # cost of the first base of a gap
    gap_extend: int = 2   # cost of each further base


class PosteriorResult(NamedTuple):
    """All [N, ...] per-lane outputs of the posterior alignment."""

    opt: jnp.ndarray          # [N] optimal local score
    match_mask: jnp.ndarray   # [N, Lq, Lr] bool: (i,j) matched on an optimal path


def _prefix_max_exclusive(x: jnp.ndarray, axis: int) -> jnp.ndarray:
    """Exclusive running max along `axis` (identity NEG)."""
    inc = jax.lax.associative_scan(jnp.maximum, x, axis=axis)
    pad = [(0, 0)] * x.ndim
    pad[axis] = (1, 0)
    shifted = jnp.pad(inc, pad, constant_values=NEG)
    index = [slice(None)] * x.ndim
    index[axis] = slice(0, x.shape[axis])
    return shifted[tuple(index)]


def _row_scores(q_col: jnp.ndarray, ref: jnp.ndarray, valid_row: jnp.ndarray,
                ref_mask: jnp.ndarray, sc: Scoring) -> jnp.ndarray:
    """Substitution scores for one query row: [N, Lr]; invalid -> NEG."""
    sub = jnp.where(q_col[:, None] == ref, sc.match, sc.mismatch)
    ok = valid_row[:, None] & ref_mask
    return jnp.where(ok, sub, NEG)


@functools.partial(jax.jit, static_argnames=("sc",))
def posterior_align(
    q: jnp.ndarray,       # [N, Lq] uint8 codes
    q_len: jnp.ndarray,   # [N] int32
    r: jnp.ndarray,       # [N, Lr] uint8 codes
    r_len: jnp.ndarray,   # [N] int32
    sc: Scoring = Scoring(),
) -> PosteriorResult:
    """Forward + backward local-alignment fill, match posterior out.

    Pure JAX (jit-friendly, static shapes); the Pallas banded kernel in
    ops/pallas_align.py accelerates the same contract.
    """
    N, Lq = q.shape
    Lr = r.shape[1]
    q = q.astype(jnp.int32)
    r = r.astype(jnp.int32)
    ref_mask = jnp.arange(Lr)[None, :] < r_len[:, None]           # [N, Lr]
    open_, ext = sc.gap_open, sc.gap_extend
    jcost = jnp.arange(Lr, dtype=jnp.int32) * ext                 # j*ext

    # ---------------- forward fill ----------------
    def fwd_step(carry, xs):
        h_prev, f_prev = carry            # [N, Lr] H and F of row i-1
        q_col, i = xs
        valid = i < q_len                                        # [N]
        sub = _row_scores(q_col, r, valid, ref_mask, sc)         # [N, Lr]
        h_diag = jnp.pad(h_prev[:, :-1], ((0, 0), (1, 0)))       # H[i-1][j-1]
        hm = h_diag + sub                                        # match-entering
        f = jnp.maximum(h_prev - open_, f_prev - ext)            # vertical
        ht = jnp.maximum(jnp.maximum(hm, f), 0)
        # horizontal via exclusive prefix max of (ht + j*ext)
        e = _prefix_max_exclusive(ht + jcost, axis=1) - jcost - (open_ - ext)
        h = jnp.maximum(ht, e)
        h = jnp.where(valid[:, None], h, h_prev)
        f = jnp.where(valid[:, None], f, f_prev)
        return (h, f), hm.astype(jnp.int32)

    h0 = jnp.zeros((N, Lr), jnp.int32)
    f0 = jnp.full((N, Lr), NEG, jnp.int32)
    (_, _), hm_all = jax.lax.scan(
        fwd_step, (h0, f0), (q.T, jnp.arange(Lq)), length=Lq
    )
    # hm_all: [Lq, N, Lr] best score of local path ending with (i ~ j)
    opt = jnp.maximum(jnp.max(hm_all, axis=(0, 2)), 0)           # [N]

    # ---------------- backward fill + posterior ----------------
    # bh[i][j] = best local continuation of suffixes q[i:], r[j:] that may
    # be empty (>= 0); diag entry at (i,j) uses sub(i,j) + bh[i+1][j+1].
    def bwd_step(carry, xs):
        bh_next, bf_next = carry          # rows i+1
        q_col, hm_row, i = xs
        valid = i < q_len
        sub = _row_scores(q_col, r, valid, ref_mask, sc)
        bh_diag = jnp.pad(bh_next[:, 1:], ((0, 0), (0, 1)))      # bh[i+1][j+1]
        bm = sub + bh_diag                                       # match at (i,j)
        bf = jnp.maximum(bh_next - open_, bf_next - ext)
        bt = jnp.maximum(jnp.maximum(bm, bf), 0)
        # horizontal (consuming ref rightward): suffix-max scan
        be = (
            _prefix_max_exclusive((bt - jcost)[:, ::-1], axis=1)[:, ::-1]
            + jcost - (open_ - ext)
        )
        bh = jnp.maximum(bt, be)
        bh = jnp.where(valid[:, None], bh, bh_next)
        bf = jnp.where(valid[:, None], bf, bf_next)
        # posterior: matched (i,j) on an optimal path
        on_path = (hm_row + bh_diag) == opt[:, None]
        on_path = on_path & (hm_row > NEG // 2) & (opt > 0)[:, None]
        return (bh, bf), on_path

    bh0 = jnp.zeros((N, Lr), jnp.int32)
    bf0 = jnp.full((N, Lr), NEG, jnp.int32)
    (_, _), on_path_rev = jax.lax.scan(
        bwd_step,
        (bh0, bf0),
        (q.T[::-1], hm_all[::-1], jnp.arange(Lq - 1, -1, -1)),
        length=Lq,
    )
    match_mask = on_path_rev[::-1].transpose(1, 0, 2)            # [N, Lq, Lr]
    return PosteriorResult(opt=opt, match_mask=match_mask)


class SpanResult(NamedTuple):
    """Begin/end coordinates of one optimal local alignment per lane —
    the data the reference reads off SSW's Alignment struct
    (ref_begin/ref_end/query_begin/query_end,
    src/correctionAlignment.cpp:91-93)."""

    opt: jnp.ndarray        # [N]
    q_begin: jnp.ndarray    # [N] first matched query index (or 0)
    q_end: jnp.ndarray      # [N] last matched query index (or -1)
    r_begin: jnp.ndarray    # [N]
    r_end: jnp.ndarray      # [N]
    valid: jnp.ndarray      # [N] bool: opt > 0


def alignment_spans(res: PosteriorResult) -> SpanResult:
    """Extract begin/end coords from the match posterior.

    A local alignment starts and ends with matched pairs, so the span is
    the bounding box of the earliest/latest matched cells.  When several
    optimal paths exist we take the union's bounding box (the reference's
    SSW picks one arbitrary optimum; tie behavior is unspecified there).
    """
    m = res.match_mask
    N, Lq, Lr = m.shape
    any_match = m.any(axis=(1, 2))
    qi = jnp.arange(Lq)[None, :, None]
    rj = jnp.arange(Lr)[None, None, :]
    big = Lq + Lr + 10
    q_begin = jnp.min(jnp.where(m, qi, big), axis=(1, 2))
    q_end = jnp.max(jnp.where(m, qi, -1), axis=(1, 2))
    r_begin = jnp.min(jnp.where(m, rj, big), axis=(1, 2))
    r_end = jnp.max(jnp.where(m, rj, -1), axis=(1, 2))
    return SpanResult(
        opt=res.opt,
        q_begin=jnp.where(any_match, q_begin, 0),
        q_end=jnp.where(any_match, q_end, -1),
        r_begin=jnp.where(any_match, r_begin, 0),
        r_end=jnp.where(any_match, r_end, -1),
        valid=any_match,
    )
