"""Fused Pallas TPU kernel for the posterior alignment.

Same contract as ops/align.py:posterior_summary, the whole
forward + backward DP in ONE kernel per lane-tile:

  * per-row DP states (H, F / BH, BF) live in VMEM,
  * the match-entering score rows (hm) stream to an HBM scratch with
    double-buffered async DMA — freeing VMEM lets one program carry a
    64-lane tile, which is what keeps the VPU pipelines full (an
    8-lane tile leaves them mostly idle on [8, W] operands),
  * the within-row affine-gap dependency is a shift-max prefix scan on
    the VPU (log2(max_hgap or W) steps),
  * the backward pass folds the match posterior into per-column
    summaries (matched / i_first / i_last / aligned base / 2-bit-packed
    insertion window) written straight to the output block — the vote
    glue downstream needs no gathers.

Grid: (N / TILE_N,) — programs run sequentially on the core; each
handles TILE_N query/ref lane pairs.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from consent_tpu.ops.align import INS_PACK, NEG, PosteriorSummary, Scoring

# Lanes per program.  Swept on-chip at the consensus shapes
# [N=1024, Lq=W=512, BW=128] (chain-slope, median of 3):
#   TILE_N  64: 13.11 ms   128: 7.72 ms   256: 5.73 ms   512: 5.62 ms
# 256 takes the 26% win over 128 (fewer per-row loop/DMA overheads per
# lane, fuller VPU); 512 adds <2% for 2x the VMEM and 2x the padding
# floor on small batches.
TILE_LANES = 256

# DP-state element type.  Scores fit int16 by construction (NEG =
# -2^14, max score ~1K; the XLA fallback in ops/align.py runs int16),
# but Mosaic's vector rotate — which the per-row prefix-max scans and
# diagonal shifts lower to — only supports 32-bit elements on this
# toolchain ("not implemented: Rotate with non-32-bit data"), so the
# on-chip DP state stays int32.  The hm score rows that round-trip
# through HBM are staged as int16 (STAGE_DT): values fit by
# construction and the cast halves the DMA bytes of the only O(Lq*W)
# memory stream in the kernel.
DP = jnp.int32
STAGE_DT = jnp.int16

# Posterior-fold strategy for the banded kernel (experiment knob):
#   'row'   = per-row full-width accumulators (default),
#   'group' = band-coordinate group-amortized accumulators,
#   'none'  = skip the fold entirely (timing ceiling; wrong results).
# Measured on the chip at [N=1024, Lq=W=512, BW=128] (chain-slope,
# same process): none 6.85 ms, row 7.98 ms, group 8.14 ms — the whole
# fold costs ~1.1 ms and the group variant loses ~2% despite touching
# 4x less data per row (Mosaic schedules the per-row full-width
# selects well; the group path's partial-width stores + per-group
# dynamic rolls eat the saving).  Kept for future toolchains.
import os as _os  # noqa: E402  (knob read at import)
FOLD_MODE = _os.environ.get("CONSENT_TPU_FOLD", "row")
if FOLD_MODE == "none":  # pragma: no cover - experiment knob
    import warnings as _warnings

    _warnings.warn(
        "CONSENT_TPU_FOLD=none skips the posterior fold: banded "
        "kernel results are WRONG (timing-ceiling experiment only)",
        stacklevel=1,
    )


def _kernel(qlen_ref, rlen_ref, q_ref, r_ref,
            opt_ref, matched_ref, ifirst_ref, ilast_ref,
            base_ref, inspack_ref, hm_hbm,
            row_buf, dma_sem, h_ref, f_ref, optv_ref,
            *, Lq: int, W: int, sc: Scoring):
    match, mismatch = sc.match, sc.mismatch
    open_, ext = sc.gap_open, sc.gap_extend
    TILE_N = q_ref.shape[0]

    col = jax.lax.broadcasted_iota(jnp.int32, (TILE_N, W), 1)
    jcost = (col * ext).astype(DP)
    rvec = r_ref[:]
    rmask = col < rlen_ref[:]          # [TILE_N, 1] -> broadcast
    qlen = qlen_ref[:]                 # [TILE_N, 1]
    gap_span = sc.max_hgap if sc.max_hgap else W
    log_steps = max(1, int(np.ceil(np.log2(min(gap_span, W)))))

    def prefix_max_incl(x):
        for s in (2 ** p for p in range(log_steps)):
            sh = jnp.where(col >= s, pltpu.roll(x, s, axis=1), NEG)
            x = jnp.maximum(x, sh)
        return x

    def suffix_max_incl(x):
        for s in (2 ** p for p in range(log_steps)):
            sh = jnp.where(col < W - s, pltpu.roll(x, W - s, axis=1), NEG)
            x = jnp.maximum(x, sh)
        return x

    kins = jax.lax.broadcasted_iota(jnp.int32, (TILE_N, INS_PACK), 1)
    pack_w = (1 << (2 * kins))

    def sub_row(i):
        # Mosaic can't load one dynamic lane directly; rotate row i to
        # lane 0 (dynamic rotates are supported) and slice statically.
        qrot = pltpu.roll(q_ref[:], jnp.remainder(Lq - i, Lq), axis=1)
        qcol = qrot[:, 0:1]                        # [TILE_N, 1]
        valid = i < qlen                           # [TILE_N, 1]
        sub = jnp.where(qcol == rvec, match, mismatch)
        return jnp.where(valid & rmask, sub, NEG).astype(DP), valid, qcol, qrot

    def hm_dma(i, slot):
        return pltpu.make_async_copy(
            row_buf.at[slot], hm_hbm.at[i], dma_sem.at[slot]
        )

    def hm_fetch(i, slot):
        return pltpu.make_async_copy(
            hm_hbm.at[i], row_buf.at[slot], dma_sem.at[slot]
        )

    # ---------------- forward ----------------
    h_ref[:] = jnp.zeros((TILE_N, W), DP)
    f_ref[:] = jnp.full((TILE_N, W), NEG, DP)
    optv_ref[:] = jnp.zeros((TILE_N, W), DP)

    def fwd_body(i, _):
        slot = jax.lax.rem(i, 2)
        # the copy issued two rows ago reused this slot — wait for it
        @pl.when(i >= 2)
        def _():
            hm_dma(i - 2, slot).wait()

        sub, valid, _, _ = sub_row(i)
        h_prev = h_ref[:]
        f_prev = f_ref[:]
        h_diag = jnp.where(col >= 1, pltpu.roll(h_prev, 1, axis=1), 0)
        hm = h_diag + sub
        f = jnp.maximum(h_prev - open_, f_prev - ext)
        ht = jnp.maximum(jnp.maximum(hm, f), 0)
        p = prefix_max_incl(ht + jcost)
        pe = jnp.where(col >= 1, pltpu.roll(p, 1, axis=1), NEG)
        e = pe - jcost - (open_ - ext)
        h = jnp.maximum(ht, e)
        h_ref[:] = jnp.where(valid, h, h_prev)
        f_ref[:] = jnp.where(valid, f, f_prev)
        row_buf[slot] = hm.astype(STAGE_DT)
        hm_dma(i, slot).start()
        optv_ref[:] = jnp.maximum(optv_ref[:], hm)
        return 0

    jax.lax.fori_loop(0, Lq, fwd_body, 0)
    # drain the last two stores
    hm_dma(Lq - 2, jax.lax.rem(Lq - 2, 2)).wait()
    hm_dma(Lq - 1, jax.lax.rem(Lq - 1, 2)).wait()

    # Mosaic can't reduce int16 — widen for the row max only
    opt = jnp.maximum(
        jnp.max(optv_ref[:].astype(jnp.int32), axis=1, keepdims=True), 0
    )                                                   # [TILE_N, 1] int32
    opt_ref[:] = opt

    # ---------------- backward + posterior ----------------
    # reuse h/f scratches as BH/BF
    h_ref[:] = jnp.zeros((TILE_N, W), DP)
    f_ref[:] = jnp.full((TILE_N, W), NEG, DP)
    matched_ref[:] = jnp.zeros((TILE_N, W), jnp.int32)
    ifirst_ref[:] = jnp.full((TILE_N, W), Lq, jnp.int32)
    ilast_ref[:] = jnp.full((TILE_N, W), -1, jnp.int32)
    base_ref[:] = jnp.zeros((TILE_N, W), jnp.int32)
    inspack_ref[:] = jnp.zeros((TILE_N, W), jnp.int32)
    pos_opt = opt > 0

    # prefetch the last row
    hm_fetch(Lq - 1, jax.lax.rem(Lq - 1, 2)).start()

    def bwd_body(t, _):
        i = Lq - 1 - t
        slot = jax.lax.rem(i, 2)
        hm_fetch(i, slot).wait()
        hm_row = row_buf[slot].astype(DP)
        # prefetch the next (lower) row into the other slot
        @pl.when(i >= 1)
        def _():
            hm_fetch(i - 1, 1 - slot).start()

        sub, valid, qcol, qrot = sub_row(i)
        bh_next = h_ref[:]
        bf_next = f_ref[:]
        bh_diag = jnp.where(
            col <= W - 2, pltpu.roll(bh_next, W - 1, axis=1), 0
        )
        bf = jnp.maximum(bh_next - open_, bf_next - ext)
        bt = jnp.maximum(jnp.maximum(sub + bh_diag, bf), 0)
        s = suffix_max_incl(bt - jcost)
        se = jnp.where(col <= W - 2, pltpu.roll(s, W - 1, axis=1), NEG)
        be = se + jcost - (open_ - ext)
        bh = jnp.maximum(bt, be)
        h_ref[:] = jnp.where(valid, bh, bh_next)
        f_ref[:] = jnp.where(valid, bf, bf_next)

        on_path = (
            (hm_row + bh_diag == opt)
            & (hm_row > NEG // 2)
            & pos_opt
        )
        first_seen = on_path & (matched_ref[:] == 0)
        ifirst_ref[:] = jnp.where(on_path, i, ifirst_ref[:])
        ilast_ref[:] = jnp.where(first_seen, i, ilast_ref[:])
        # capture the aligned base and q[i+1..i+INS_PACK] (already in
        # the rotated register) packed 2 bits/base — saves XLA gathers.
        # offsets past q_len pack as 0 (parity with the XLA fallback).
        k_in_len = (i + 1 + kins) < qlen           # [TILE_N, INS_PACK]
        qslice = jnp.where(k_in_len, qrot[:, 1 : 1 + INS_PACK], 0)
        pack = jnp.sum(qslice * pack_w, axis=1, keepdims=True)
        base_ref[:] = jnp.where(first_seen, qcol, base_ref[:])
        inspack_ref[:] = jnp.where(first_seen, pack, inspack_ref[:])
        matched_ref[:] = jnp.where(on_path, 1, matched_ref[:])
        return 0

    jax.lax.fori_loop(0, Lq, bwd_body, 0)


def _kernel_banded(qlen_ref, jlo_ref, jhi_ref, q_ref, rhat_ref,
                   opt_ref, matched_ref, ifirst_ref, ilast_ref,
                   base_ref, inspack_ref, hm_hbm,
                   rr_ref, qrot_ref, row_buf, dma_sem,
                   h_ref, f_ref, optv_ref,
                   # group-fold accumulators, allocated only when
                   # FOLD_MODE == 'group' (the default 'row' path
                   # passes 5 fewer scratch refs)
                   gany_ref=None, gif_ref=None, gil_ref=None,
                   gb_ref=None, gp_ref=None,
                   *, Lq: int, W: int, BW: int, sc: Scoring):
    """Banded variant: DP states live in band coordinates
    (slot b of row i = kernel column chat = i + b - OFF), so

      * the diagonal predecessor (i-1, chat-1) is the SAME slot of the
        previous row — no shift at all,
      * the vertical predecessor (i-1, chat) is slot b+1 / b-1 (one
        static roll),
      * all per-row DP vectors are [TILE_N, BW] instead of [TILE_N, W].

    The caller pre-gathers rhat[n, c] = r[n, c + d0[n]] so every lane's
    expected diagonal starts at kernel column 0; posterior outputs are
    in kernel columns and un-shifted by the caller.  rr/qrot are
    rotating copies of rhat/q advanced by ONE static roll per UNROLL
    rows; within the group, row u reads a static slice at offset u —
    full-width data movement is amortized 8x (per-row rolls of the
    [TILE_N, W] buffers dominated the kernel before this).

    The posterior fold accumulates in GROUP band coordinates: a row at
    group offset p covers group slots [p, p + BW), so its on_path band
    lands with one STATIC roll by p, and the per-row accumulator
    updates run at GW = BW + 128 width instead of W.  One dynamic
    full-width roll per accumulator per GROUP (amortized 8x, like
    rr/qrot) merges the group into the true-kernel-column outputs —
    this removes the full-width per-row fold that held the kernel at
    ~45% of its op-bound roofline (PARITY.md ledger)."""
    match, mismatch = sc.match, sc.mismatch
    open_, ext = sc.gap_open, sc.gap_extend
    TILE_N = q_ref.shape[0]
    OFF = BW // 2

    cb = jax.lax.broadcasted_iota(jnp.int32, (TILE_N, BW), 1)
    jcost = (cb * ext).astype(DP)
    qlen = qlen_ref[:]                 # [TILE_N, 1]
    jlo = jlo_ref[:]
    jhi = jhi_ref[:]
    gap_span = sc.max_hgap if sc.max_hgap else BW
    log_steps = max(1, int(np.ceil(np.log2(min(gap_span, BW)))))

    def prefix_max_incl(x):
        for s in (2 ** p for p in range(log_steps)):
            sh = jnp.where(cb >= s, pltpu.roll(x, s, axis=1), NEG)
            x = jnp.maximum(x, sh)
        return x

    def suffix_max_incl(x):
        for s in (2 ** p for p in range(log_steps)):
            sh = jnp.where(cb < BW - s, pltpu.roll(x, BW - s, axis=1), NEG)
            x = jnp.maximum(x, sh)
        return x

    kins = jax.lax.broadcasted_iota(jnp.int32, (TILE_N, INS_PACK), 1)
    pack_w = (1 << (2 * kins))

    # group size: rows per full-width buffer roll.  Static slice
    # offsets up to UNROLL-1 must fit the rr (W - BW slack) and qrot
    # (insertion window) buffers.
    UNROLL = (
        8 if (Lq % 8 == 0 and W - BW >= 7 and Lq >= 8 + INS_PACK) else 1
    )
    # group-coordinate posterior fold: rows of a group cover group
    # slots [0, BW + UNROLL - 1); GW pads that to a lane multiple.
    # Needs GW <= W (the group scratches are [TILE_N, W]).
    GW = BW + 128
    GROUPED_FOLD = (
        UNROLL > 1 and GW <= W and FOLD_MODE == "group"
    )
    NO_FOLD = FOLD_MODE == "none"  # experiment only: skip the fold

    def sub_row(i, p):
        # p = static slot offset of row i in the group-aligned buffers
        chat = i + cb - OFF
        valid = (chat >= jlo) & (chat < jhi) & (i < qlen)
        qcol = qrot_ref[:, p : p + 1]              # q[i]
        rband = rr_ref[:, p : p + BW]              # rhat[i + b - OFF]
        sub = jnp.where(qcol == rband, match, mismatch)
        return jnp.where(valid, sub, NEG).astype(DP), qcol

    def hm_dma(i, slot):
        return pltpu.make_async_copy(
            row_buf.at[slot], hm_hbm.at[i], dma_sem.at[slot]
        )

    def hm_fetch(i, slot):
        return pltpu.make_async_copy(
            hm_hbm.at[i], row_buf.at[slot], dma_sem.at[slot]
        )

    # ---------------- forward ----------------
    h_ref[:] = jnp.zeros((TILE_N, BW), DP)
    f_ref[:] = jnp.full((TILE_N, BW), NEG, DP)
    optv_ref[:] = jnp.zeros((TILE_N, BW), DP)
    # rr slot b reads rhat[(b - OFF + i0 + u) mod W] at offset u for
    # the group's rows i0..i0+UNROLL-1; advanced UNROLL per group
    rr_ref[:] = pltpu.roll(rhat_ref[:], OFF, axis=1)
    qrot_ref[:] = q_ref[:]

    def fwd_row(i, u):
        slot = jax.lax.rem(i, 2)
        @pl.when(i >= 2)
        def _():
            hm_dma(i - 2, slot).wait()

        sub, _ = sub_row(i, u)
        h_prev = h_ref[:]
        f_prev = f_ref[:]
        hm = h_prev + sub                    # diagonal = same slot
        vt = jnp.maximum(h_prev - open_, f_prev - ext)
        f = jnp.where(cb <= BW - 2, pltpu.roll(vt, BW - 1, axis=1), NEG)
        ht = jnp.maximum(jnp.maximum(hm, f), 0)
        p = prefix_max_incl(ht + jcost)
        pe = jnp.where(cb >= 1, pltpu.roll(p, 1, axis=1), NEG)
        e = pe - jcost - (open_ - ext)
        h = jnp.maximum(ht, e)
        valid_q = i < qlen
        h_ref[:] = jnp.where(valid_q, h, h_prev)
        f_ref[:] = jnp.where(valid_q, f, f_prev)
        row_buf[slot] = hm.astype(STAGE_DT)
        hm_dma(i, slot).start()
        optv_ref[:] = jnp.maximum(optv_ref[:], hm)

    def fwd_group(g, _):
        i0 = g * UNROLL
        for u in range(UNROLL):
            fwd_row(i0 + u, u)
        rr_ref[:] = pltpu.roll(rr_ref[:], W - UNROLL, axis=1)
        qrot_ref[:] = pltpu.roll(qrot_ref[:], Lq - UNROLL, axis=1)
        return 0

    jax.lax.fori_loop(0, Lq // UNROLL, fwd_group, 0)
    hm_dma(Lq - 2, jax.lax.rem(Lq - 2, 2)).wait()
    hm_dma(Lq - 1, jax.lax.rem(Lq - 1, 2)).wait()

    # Mosaic can't reduce int16 — widen for the row max only
    opt = jnp.maximum(
        jnp.max(optv_ref[:].astype(jnp.int32), axis=1, keepdims=True), 0
    )                                                   # [TILE_N, 1] int32
    opt_ref[:] = opt

    # ---------------- backward + posterior ----------------
    h_ref[:] = jnp.zeros((TILE_N, BW), DP)
    f_ref[:] = jnp.full((TILE_N, BW), NEG, DP)
    matched_ref[:] = jnp.zeros((TILE_N, W), jnp.int32)
    ifirst_ref[:] = jnp.full((TILE_N, W), Lq, jnp.int32)
    ilast_ref[:] = jnp.full((TILE_N, W), -1, jnp.int32)
    base_ref[:] = jnp.zeros((TILE_N, W), jnp.int32)
    inspack_ref[:] = jnp.zeros((TILE_N, W), jnp.int32)
    pos_opt = opt > 0
    # re-align the rotating views to the bwd group's LOWEST row
    # (Lq - UNROLL): within a group, row i = i0 - u reads offset
    # p = UNROLL-1-u; one +UNROLL roll advances to the next group
    rr_ref[:] = pltpu.roll(rhat_ref[:], (OFF - (Lq - UNROLL)) % W, axis=1)
    qrot_ref[:] = pltpu.roll(q_ref[:], (-(Lq - UNROLL)) % Lq, axis=1)

    hm_fetch(Lq - 1, jax.lax.rem(Lq - 1, 2)).start()
    zpad = jnp.zeros((TILE_N, W - BW), jnp.int32) if W > BW else None
    gpad = (
        jnp.zeros((TILE_N, GW - BW), jnp.int32) if GROUPED_FOLD else None
    )
    if GROUPED_FOLD:
        gany_ref[:] = jnp.zeros((TILE_N, W), jnp.int32)

    def bwd_row(i, p):
        slot = jax.lax.rem(i, 2)
        hm_fetch(i, slot).wait()
        hm_row = row_buf[slot].astype(DP)
        @pl.when(i >= 1)
        def _():
            hm_fetch(i - 1, 1 - slot).start()

        sub, qcol = sub_row(i, p)
        bh_next = h_ref[:]
        bf_next = f_ref[:]
        bh_diag = bh_next                    # (i+1, chat+1) = same slot
        vt = jnp.maximum(bh_next - open_, bf_next - ext)
        bf = jnp.where(cb >= 1, pltpu.roll(vt, 1, axis=1), NEG)
        bt = jnp.maximum(jnp.maximum(sub + bh_diag, bf), 0)
        s = suffix_max_incl(bt - jcost)
        se = jnp.where(cb <= BW - 2, pltpu.roll(s, BW - 1, axis=1), NEG)
        be = se + jcost - (open_ - ext)
        bh = jnp.maximum(bt, be)
        valid_q = i < qlen
        h_ref[:] = jnp.where(valid_q, bh, bh_next)
        f_ref[:] = jnp.where(valid_q, bf, bf_next)

        on_path = (
            (hm_row + bh_diag == opt)
            & (hm_row > NEG // 2)
            & pos_opt
        )
        k_in_len = (i + 1 + kins) < qlen           # [TILE_N, INS_PACK]
        qslice = jnp.where(
            k_in_len, qrot_ref[:, p + 1 : p + 1 + INS_PACK], 0
        )
        pack = jnp.sum(qslice * pack_w, axis=1, keepdims=True)

        if NO_FOLD:
            matched_ref[:, :BW] = jnp.where(
                on_path, 1, matched_ref[:, :BW]
            )  # keep on_path live; no full fold
        elif GROUPED_FOLD:
            # group fold: row at offset p covers group slots [p, p+BW)
            # — one STATIC roll, GW-wide updates
            opg = jnp.concatenate(
                [on_path.astype(jnp.int32), gpad], axis=1
            )
            if p:
                opg = pltpu.roll(opg, p, axis=1)
            og = opg != 0
            ga = gany_ref[:, :GW]
            fs = og & (ga == 0)
            gif_ref[:, :GW] = jnp.where(og, i, gif_ref[:, :GW])
            gil_ref[:, :GW] = jnp.where(fs, i, gil_ref[:, :GW])
            gb_ref[:, :GW] = jnp.where(fs, qcol, gb_ref[:, :GW])
            gp_ref[:, :GW] = jnp.where(fs, pack, gp_ref[:, :GW])
            gany_ref[:, :GW] = ga | opg
        else:
            # position the band row at kernel columns [i-OFF, i+BW-OFF)
            opb = on_path.astype(jnp.int32)
            if zpad is not None:
                opb = jnp.concatenate([opb, zpad], axis=1)
            opf = (
                pltpu.roll(opb, jax.lax.rem(i - OFF + W, W), axis=1) != 0
            )
            first_seen = opf & (matched_ref[:] == 0)
            ifirst_ref[:] = jnp.where(opf, i, ifirst_ref[:])
            ilast_ref[:] = jnp.where(first_seen, i, ilast_ref[:])
            base_ref[:] = jnp.where(first_seen, qcol, base_ref[:])
            inspack_ref[:] = jnp.where(first_seen, pack, inspack_ref[:])
            matched_ref[:] = jnp.where(opf, 1, matched_ref[:])

    def bwd_group(g, _):
        i0 = Lq - 1 - g * UNROLL
        for u in range(UNROLL):
            bwd_row(i0 - u, UNROLL - 1 - u)
        if GROUPED_FOLD:
            # merge the group's band-coordinate accumulators into the
            # kernel-column outputs: slot b of the group = kernel
            # column iL - OFF + b — ONE dynamic roll per accumulator
            # per group.  Wrapped columns (chat >= W) carry gany == 0
            # (on_path is false outside [jlo, jhi)), so the rolls are
            # wrap-safe.
            iL = i0 - (UNROLL - 1)
            sh = jax.lax.rem(iL - OFF + 2 * W, W)
            anyf = pltpu.roll(gany_ref[:], sh, axis=1) != 0
            first_seen = anyf & (matched_ref[:] == 0)
            ifirst_ref[:] = jnp.where(
                anyf, pltpu.roll(gif_ref[:], sh, axis=1), ifirst_ref[:]
            )
            ilast_ref[:] = jnp.where(
                first_seen, pltpu.roll(gil_ref[:], sh, axis=1),
                ilast_ref[:],
            )
            base_ref[:] = jnp.where(
                first_seen, pltpu.roll(gb_ref[:], sh, axis=1),
                base_ref[:],
            )
            inspack_ref[:] = jnp.where(
                first_seen, pltpu.roll(gp_ref[:], sh, axis=1),
                inspack_ref[:],
            )
            matched_ref[:] = jnp.where(anyf, 1, matched_ref[:])
            gany_ref[:] = jnp.zeros((TILE_N, W), jnp.int32)
        rr_ref[:] = pltpu.roll(rr_ref[:], UNROLL, axis=1)
        qrot_ref[:] = pltpu.roll(qrot_ref[:], UNROLL, axis=1)
        return 0

    jax.lax.fori_loop(0, Lq // UNROLL, bwd_group, 0)


@functools.partial(
    jax.jit, static_argnames=("sc", "interpret", "tile_lanes")
)
def pallas_banded_posterior_summary(
    q: jnp.ndarray,       # [N, Lq] uint8/int32 codes
    q_len: jnp.ndarray,   # [N] int32
    r: jnp.ndarray,       # [N, W] uint8/int32 codes
    r_len: jnp.ndarray,   # [N] int32
    d0: jnp.ndarray,      # [N] int32 expected ref column of q[0]
    sc: Scoring,
    interpret: bool = False,
    tile_lanes: int = TILE_LANES,
) -> PosteriorSummary:
    """Banded posterior alignment: pre-gathers each lane's ref so its
    expected diagonal starts at kernel column 0, runs _kernel_banded,
    and un-shifts the per-column outputs back to true ref columns.
    Matches ops/align.py:posterior_summary(sc, d0) exactly."""
    N, Lq = q.shape
    W = r.shape[1]
    BW = sc.band
    assert BW and BW % 128 == 0 and BW <= W, (BW, W)
    assert W % 128 == 0, f"ref length {W} must be a multiple of 128"

    d0 = d0.astype(jnp.int32)
    colW = jnp.arange(W)[None, :]
    # Per-lane rotation via log2(W) conditional static rolls — a
    # take_along_axis lane-gather costs ~7 ms on [1024, 512] (TPU
    # gathers serialize over lanes); this is pure slice/select.
    # out[:, j] = x[:, (j - shift[n]) mod W]
    def lane_roll(x, shift):
        sh = jnp.remainder(shift, W)[:, None]
        k = 1
        while k < W:
            x = jnp.where(
                (sh & k) != 0, jnp.roll(x, k, axis=1), x
            )
            k *= 2
        return x

    # r_hat[n, c] = r[n, (c + d0[n]) mod W]; wrapped columns are never
    # valid (masked by [j_lo, j_hi) in the kernel)
    r_hat = lane_roll(jnp.asarray(r).astype(jnp.int32), -d0)
    j_hi = jnp.clip(r_len.astype(jnp.int32) - d0, 0, W)
    j_lo = jnp.clip(-d0, 0, W)

    TILE_N = tile_lanes
    n_pad = (-N) % TILE_N
    if n_pad:
        q = jnp.pad(q, ((0, n_pad), (0, 0)))
        r_hat = jnp.pad(r_hat, ((0, n_pad), (0, 0)))
        q_len = jnp.pad(q_len, (0, n_pad))
        j_lo = jnp.pad(j_lo, (0, n_pad))
        j_hi = jnp.pad(j_hi, (0, n_pad))
    Np = N + n_pad
    grid = (Np // TILE_N,)

    lane_spec = lambda: pl.BlockSpec(
        (TILE_N, 1), lambda t: (t, 0), memory_space=pltpu.VMEM
    )
    seq_spec = lambda L: pl.BlockSpec(
        (TILE_N, L), lambda t: (t, 0), memory_space=pltpu.VMEM
    )

    kernel = functools.partial(_kernel_banded, Lq=Lq, W=W, BW=BW, sc=sc)
    opt, matched, i_first, i_last, base, ins_pack, _hm = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            lane_spec(),            # q_len
            lane_spec(),            # j_lo
            lane_spec(),            # j_hi
            seq_spec(Lq),           # q
            seq_spec(W),            # r_hat
        ],
        out_specs=[
            seq_spec(1),            # opt
            seq_spec(W),            # matched
            seq_spec(W),            # i_first
            seq_spec(W),            # i_last
            seq_spec(W),            # base
            seq_spec(W),            # ins_pack
            pl.BlockSpec(memory_space=pltpu.MemorySpace.ANY),   # hm staging
        ],
        out_shape=[
            jax.ShapeDtypeStruct((Np, 1), jnp.int32),
            jax.ShapeDtypeStruct((Np, W), jnp.int32),
            jax.ShapeDtypeStruct((Np, W), jnp.int32),
            jax.ShapeDtypeStruct((Np, W), jnp.int32),
            jax.ShapeDtypeStruct((Np, W), jnp.int32),
            jax.ShapeDtypeStruct((Np, W), jnp.int32),
            jax.ShapeDtypeStruct((Lq, TILE_N, BW), STAGE_DT),
        ],
        scratch_shapes=[
            pltpu.VMEM((TILE_N, W), jnp.int32),                 # rr
            pltpu.VMEM((TILE_N, Lq), jnp.int32),                # qrot
            pltpu.VMEM((2, TILE_N, BW), STAGE_DT),              # row buf
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.VMEM((TILE_N, BW), DP),                       # h / bh
            pltpu.VMEM((TILE_N, BW), DP),                       # f / bf
            pltpu.VMEM((TILE_N, BW), DP),                       # optv
        ] + (
            # band-coordinate group-fold accumulators — only the
            # experimental FOLD_MODE='group' path reads them (~2.6 MB
            # of VMEM at TILE_N=256/W=512 otherwise left dead)
            [pltpu.VMEM((TILE_N, W), jnp.int32) for _ in range(5)]
            if FOLD_MODE == "group" else []
        ),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=int(
                ((11 if FOLD_MODE == "group" else 6) * TILE_N * W
                 + 2 * TILE_N * Lq + 5 * TILE_N * BW) * 4
                + 8 * 2 ** 20
            ),
        ),
        interpret=interpret,
    )(
        q_len.astype(jnp.int32)[:, None],
        j_lo[:, None],
        j_hi[:, None],
        q.astype(jnp.int32),
        r_hat,
    )

    # un-shift kernel columns back to true ref columns:
    # out[n, j] = kout[n, (j - d0[n]) mod W], masked where out of range
    idx = colW - d0[:, None]                   # true col j -> kernel chat
    ok = (idx >= 0) & (idx < W)

    def unshift(x, fill):
        return jnp.where(ok, lane_roll(x[:N], d0), fill)

    return PosteriorSummary(
        opt=opt[:N, 0],
        matched=unshift(matched, 0).astype(jnp.bool_),
        i_first=unshift(i_first, Lq),
        i_last=unshift(i_last, -1),
        base=unshift(base, 0),
        ins_pack=unshift(ins_pack, 0),
    )


@functools.partial(
    jax.jit, static_argnames=("sc", "interpret", "tile_lanes")
)
def pallas_posterior_summary(
    q: jnp.ndarray,       # [N, Lq] uint8/int32 codes
    q_len: jnp.ndarray,   # [N] int32
    r: jnp.ndarray,       # [N, Lr] uint8/int32 codes
    r_len: jnp.ndarray,   # [N] int32
    sc: Scoring = Scoring(),
    interpret: bool = False,
    tile_lanes: int = TILE_LANES,
) -> PosteriorSummary:
    N, Lq = q.shape
    W = r.shape[1]
    assert W % 128 == 0, f"ref length {W} must be a multiple of 128"
    TILE_N = tile_lanes
    n_pad = (-N) % TILE_N
    if n_pad:
        q = jnp.pad(q, ((0, n_pad), (0, 0)))
        r = jnp.pad(r, ((0, n_pad), (0, 0)))
        q_len = jnp.pad(q_len, (0, n_pad))
        r_len = jnp.pad(r_len, (0, n_pad))
    Np = N + n_pad
    grid = (Np // TILE_N,)

    lane_spec = lambda: pl.BlockSpec(
        (TILE_N, 1), lambda t: (t, 0), memory_space=pltpu.VMEM
    )
    seq_spec = lambda L: pl.BlockSpec(
        (TILE_N, L), lambda t: (t, 0), memory_space=pltpu.VMEM
    )

    kernel = functools.partial(_kernel, Lq=Lq, W=W, sc=sc)
    opt, matched, i_first, i_last, base, ins_pack, _hm = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            lane_spec(),            # q_len
            lane_spec(),            # r_len
            seq_spec(Lq),           # q
            seq_spec(W),            # r
        ],
        out_specs=[
            seq_spec(1),            # opt
            seq_spec(W),            # matched
            seq_spec(W),            # i_first
            seq_spec(W),            # i_last
            seq_spec(W),            # base
            seq_spec(W),            # ins_pack
            # hm staging buffer: unblocked, HBM-resident, reused by the
            # (sequential) grid programs; contents are scratch, the
            # caller discards it (Mosaic has no HBM scratch_shapes)
            pl.BlockSpec(memory_space=pltpu.MemorySpace.ANY),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((Np, 1), jnp.int32),
            jax.ShapeDtypeStruct((Np, W), jnp.int32),
            jax.ShapeDtypeStruct((Np, W), jnp.int32),
            jax.ShapeDtypeStruct((Np, W), jnp.int32),
            jax.ShapeDtypeStruct((Np, W), jnp.int32),
            jax.ShapeDtypeStruct((Np, W), jnp.int32),
            jax.ShapeDtypeStruct((Lq, TILE_N, W), STAGE_DT),
        ],
        scratch_shapes=[
            pltpu.VMEM((2, TILE_N, W), STAGE_DT),               # row buf
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.VMEM((TILE_N, W), DP),                        # h / bh
            pltpu.VMEM((TILE_N, W), DP),                        # f / bf
            pltpu.VMEM((TILE_N, W), DP),                        # optv
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=int(
                (6 * TILE_N * W + 2 * TILE_N * W + TILE_N * Lq) * 4
                + 8 * 2 ** 20
            ),
        ),
        interpret=interpret,
    )(
        q_len.astype(jnp.int32)[:, None],
        r_len.astype(jnp.int32)[:, None],
        q.astype(jnp.int32),
        r.astype(jnp.int32),
    )

    return PosteriorSummary(
        opt=opt[:N, 0],
        matched=matched[:N].astype(jnp.bool_),
        i_first=i_first[:N],
        i_last=i_last[:N],
        base=base[:N],
        ins_pack=ins_pack[:N],
    )
