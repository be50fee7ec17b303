"""Stitch per-window consensuses back onto the raw read/contig.

Faithful reimplementation of the reference's alignConsensus
(src/correctionAlignment.cpp:47-140): the raw sequence starts all-weak
(lowercase); window consensuses are locally aligned, in window order,
against a slab of the *evolving* sequence around the expected position;
overlaps with the previously spliced window are arbitrated by solid
k-mer counts; the winning bases are spliced in as solid (uppercase).

The window-to-window dependency makes one read's stitch inherently
sequential (the slab includes previously spliced bases), so the TPU
batching axis is *across reads*: a StitchScheduler runs many reads in
lockstep, collecting each read's next (consensus, slab) pair into one
batched device alignment per round (SURVEY.md §3.2).

Alignment scoring mirrors the reference's SSW defaults
(match=2, mismatch=-2, gap_open=3, gap_extend=1;
StripedSmithWaterman::Aligner's default constructor,
src/correctionAlignment.cpp:48).
"""

from __future__ import annotations

import dataclasses
from typing import Callable, List, Optional, Sequence, Tuple

import numpy as np

from consent_tpu.config import ConsentConfig
from consent_tpu.core import npalign
from consent_tpu.core.sparse_counts import SparseCounts
from consent_tpu.io import seqs

STITCH_SCORING = dict(match=2, mismatch=-2, gap_open=3, gap_extend=1)


@dataclasses.dataclass
class AlignSpan:
    """What the stitcher needs from one consensus-vs-slab alignment."""

    q_begin: int
    q_end: int     # inclusive; -1 when no alignment
    r_begin: int
    r_end: int
    valid: bool


def host_align_span(q: np.ndarray, r: np.ndarray) -> AlignSpan:
    """NumPy fallback aligner (oracle-grade, used for tests and tiny
    inputs)."""
    a = npalign.local_align(q, r, **STITCH_SCORING)
    return AlignSpan(a.q_begin, a.q_end, a.r_begin, a.r_end, a.q_end >= 0)


class StitchJob:
    """Sequential stitch state of one read/contig.

    consensuses: list of (codes, solid) per window (post DBG polish);
    templates: list of raw template fragments (window's pile[0]);
    counts: list of SparseCounts per window.
    """

    def __init__(
        self,
        name: str,
        raw_codes: np.ndarray,
        piles_pos: Sequence[Tuple[int, int]],
        consensuses: Sequence[Tuple[np.ndarray, np.ndarray]],
        templates: Sequence[np.ndarray],
        counts: Sequence[SparseCounts],
        cfg: ConsentConfig,
    ):
        self.name = name
        self.cfg = cfg
        self.piles_pos = list(piles_pos)
        self.consensuses = list(consensuses)
        self.templates = list(templates)
        self.counts = list(counts)

        self.out_c = np.asarray(raw_codes, dtype=np.uint8).copy()
        self.out_s = np.zeros(len(self.out_c), dtype=bool)  # all-lowercase
        self.i = 0
        self.cur_pos = int(piles_pos[0][0]) if piles_pos else 0
        self.old_end = 0
        self.old_cons: Optional[Tuple[np.ndarray, np.ndarray]] = None
        self.old_mers: Optional[SparseCounts] = None
        # per-window transients between request and apply
        self._cur_cons: Optional[Tuple[np.ndarray, np.ndarray]] = None
        self._al_pos = 0

    @property
    def done(self) -> bool:
        return self.i >= len(self.consensuses)

    def next_request(self) -> Optional[Tuple[np.ndarray, np.ndarray]]:
        """(query, ref) for this read's next window alignment."""
        if self.done:
            return None
        cfg = self.cfg
        cons_c, cons_s = self.consensuses[self.i]
        if len(cons_c) < cfg.mer_size:
            # fall back to the raw template fragment, all-solid (the
            # reference's templates[] strings are uppercase,
            # correctionAlignment.cpp:75-77)
            tpl = self.templates[self.i]
            cons_c, cons_s = tpl, np.ones(len(tpl), dtype=bool)
        self._cur_cons = (cons_c, cons_s)

        al_pos = max(0, self.cur_pos - cfg.window_overlap)
        size_al = cfg.window_size + 2 * cfg.window_overlap
        if al_pos + size_al >= len(self.out_c):
            size_al = len(self.out_c) - al_pos
        self._al_pos = al_pos
        return cons_c, self.out_c[al_pos : al_pos + size_al]

    def apply(self, span: AlignSpan) -> None:
        """Consume the alignment of the current window and advance."""
        cfg = self.cfg
        k = cfg.mer_size
        i = self.i
        cons_c, cons_s = self._cur_cons
        raw_cons_len = len(self.consensuses[i][0])

        if not span.valid:
            # no local alignment at all: skip this window entirely
            # (SSW can't return an empty alignment for our inputs in
            # practice; guard anyway)
            self.i += 1
            return

        if self._apply_native(span, cons_c, cons_s, raw_cons_len):
            return

        beg = span.r_begin + self._al_pos
        end = span.r_end + self._al_pos
        cur_c = cons_c[span.q_begin : span.q_end + 1]
        cur_s = cons_s[span.q_begin : span.q_end + 1]

        # ---- overlap arbitration with the previous window ----
        if i != 0 and self.old_end >= beg and self.old_cons is not None:
            overlap = self.old_end - beg + 1
            old_c, old_s = self.old_cons
            if (
                raw_cons_len >= k
                and len(old_c) >= overlap
                and len(cur_c) >= overlap
            ):
                seq1_c = old_c[len(old_c) - overlap :]
                seq1_s = old_s[len(old_s) - overlap :]
                seq2_c = cur_c[:overlap]
                seq2_s = cur_s[:overlap]
                if not np.array_equal(seq1_c, seq2_c):
                    if overlap >= k:
                        sm1 = self.old_mers.n_solid(
                            seqs.kmer_codes(seq1_c, k), cfg.solid_thresh
                        )
                        sm2 = self.counts[i].n_solid(
                            seqs.kmer_codes(seq2_c, k), cfg.solid_thresh
                        )
                    else:
                        sm1 = int(np.count_nonzero(seq1_s))
                        sm2 = int(np.count_nonzero(seq2_s))
                    if sm1 > sm2:
                        # keep the previous window's version of the
                        # overlap; the reference clamps the ref side of
                        # this sub-alignment to min(len1, len2)
                        # (correctionAlignment.cpp:110) — both are
                        # `overlap` long here, but mirror it exactly
                        from consent_tpu import native

                        ref_len = min(len(seq1_c), len(seq2_c))
                        sub = native.local_align_native(
                            seq1_c, seq2_c[:ref_len], **STITCH_SCORING
                        )
                        if sub is None:
                            sub = npalign.local_align(
                                seq1_c, seq2_c[:ref_len], **STITCH_SCORING
                            )
                        cut = overlap - sub.n_ins + sub.n_del
                        if cut < len(cur_c):
                            cur_c = np.concatenate([seq1_c, cur_c[cut:]])
                            cur_s = np.concatenate([seq1_s, cur_s[cut:]])
                        else:
                            cur_c = cur_c[:0]
                            cur_s = cur_s[:0]

        # ---- splice ----
        if len(cur_c) != 0:
            if raw_cons_len >= k:
                self.out_c = np.concatenate(
                    [self.out_c[:beg], cur_c, self.out_c[end + 1 :]]
                )
                self.out_s = np.concatenate(
                    [
                        self.out_s[:beg],
                        np.ones(len(cur_c), dtype=bool),
                        self.out_s[end + 1 :],
                    ]
                )
            if i < len(self.consensuses) - 1:
                self.cur_pos = (
                    self.cur_pos
                    + self.piles_pos[i + 1][0]
                    - self.piles_pos[i][0]
                    - (end - beg + 1)
                    + len(cur_c)
                )
                self.old_cons = (cur_c, cur_s)
                self.old_mers = self.counts[i]
                self.old_end = beg + len(cur_c) - 1

        self.i += 1

    def _apply_native(self, span, cons_c, cons_s, raw_cons_len) -> bool:
        """Native fast path for apply (host.cpp stitch_apply_step):
        arbitration + splice in one call.  Returns False to fall back
        to the Python path (library unavailable)."""
        from consent_tpu import native

        cfg = self.cfg
        i = self.i
        counts = self.counts[i]
        old = self.old_cons
        use_old = i != 0 and old is not None
        res = native.stitch_apply_native(
            np.ascontiguousarray(self.out_c),
            np.ascontiguousarray(self.out_s).view(np.uint8),
            np.ascontiguousarray(cons_c),
            np.ascontiguousarray(cons_s).view(np.uint8),
            raw_cons_len,
            (span.q_begin, span.q_end, span.r_begin, span.r_end),
            self._al_pos, i, self.old_end if use_old else -(1 << 40),
            np.ascontiguousarray(old[0]) if use_old else None,
            np.ascontiguousarray(old[1]).view(np.uint8)
            if use_old else None,
            self.old_mers.kmers if use_old else None,
            self.old_mers.counts if use_old else None,
            counts.kmers, counts.counts,
            cfg.mer_size, cfg.solid_thresh,
            STITCH_SCORING, i < len(self.consensuses) - 1,
        )
        if res is None:
            return False
        new_c, new_s, cur_c, cur_s, new_old_end, tracked, spliced = res
        if new_c is not None:
            self.out_c = new_c
            self.out_s = new_s.view(bool)
        if spliced and tracked:
            beg = span.r_begin + self._al_pos
            end = span.r_end + self._al_pos
            self.cur_pos = (
                self.cur_pos
                + self.piles_pos[i + 1][0]
                - self.piles_pos[i][0]
                - (end - beg + 1)
                + spliced
            )
            self.old_cons = (cur_c, cur_s.view(bool))
            self.old_mers = counts
            self.old_end = new_old_end
        self.i += 1
        return True

    def result(self) -> Tuple[np.ndarray, np.ndarray]:
        return self.out_c, self.out_s


BatchAlignFn = Callable[
    [List[np.ndarray], List[np.ndarray]], List[AlignSpan]
]


def host_batch_align(qs: List[np.ndarray], rs: List[np.ndarray]
                     ) -> List[AlignSpan]:
    return [host_align_span(q, r) for q, r in zip(qs, rs)]


def _ptr_of(a) -> int:
    return 0 if a is None else a.ctypes.data


def _contig(a):
    return a if a.flags["C_CONTIGUOUS"] else np.ascontiguousarray(a)


def _apply_round_native(jobs: List[StitchJob],
                        spans: List[AlignSpan]) -> bool:
    """Apply one window for EVERY job in one native call
    (host.cpp stitch_apply_round) — the per-window ctypes glue of
    stitch_apply_native was ~85% of the apply stage.  Returns False
    when the library is unavailable (callers fall back per-job)."""
    from consent_tpu import native

    lib = native.get_lib()
    if lib is None or not jobs:
        return lib is not None
    cfg = jobs[0].cfg
    k = cfg.mer_size
    n = len(jobs)
    scal = np.empty((n, 15), dtype=np.int64)
    ptrs = np.zeros((10, n), dtype=np.uintp)
    out_cap = np.empty(n + 1, dtype=np.int64)
    cur_cap = np.empty(n + 1, dtype=np.int64)
    keep = []   # (cons_c, cons_s, old refs) keep-alive for the call
    for j, (job, sp) in enumerate(zip(jobs, spans)):
        i = job.i
        cons_c, cons_s = job._cur_cons
        cons_c = _contig(cons_c)
        cons_s = _contig(cons_s)
        use_old = i != 0 and job.old_cons is not None
        old_c = old_s = None
        n_old = 0
        if use_old:
            old_c, old_s = job.old_cons
            old_c = _contig(old_c)
            old_s = _contig(old_s)
            n_old = len(job.old_mers.kmers)
        counts = job.counts[i]
        scal[j] = (
            len(job.out_c), len(cons_c),
            len(job.consensuses[i][0]),
            sp.q_begin, sp.q_end, sp.r_begin, sp.r_end,
            job._al_pos, i,
            job.old_end if use_old else -(1 << 40),
            1 if use_old else 0,
            len(old_c) if use_old else 0,
            n_old, len(counts.kmers),
            1 if i < len(job.consensuses) - 1 else 0,
        )
        ptrs[0, j] = job.out_c.ctypes.data
        ptrs[1, j] = job.out_s.ctypes.data
        ptrs[2, j] = cons_c.ctypes.data
        ptrs[3, j] = cons_s.ctypes.data
        ptrs[4, j] = _ptr_of(old_c)
        ptrs[5, j] = _ptr_of(old_s)
        ptrs[6, j] = _ptr_of(job.old_mers.kmers if use_old else None)
        ptrs[7, j] = _ptr_of(job.old_mers.counts if use_old else None)
        ptrs[8, j] = counts.kmers.ctypes.data
        ptrs[9, j] = counts.counts.ctypes.data
        out_cap[j] = len(job.out_c) + len(cons_c) + 16
        cur_cap[j] = len(cons_c) + (len(old_c) if use_old else 0) + 16
        keep.append((cons_c, cons_s, old_c, old_s))
    out_off = np.zeros(n + 1, dtype=np.int64)
    np.cumsum(out_cap[:n], out=out_off[1:])
    cur_off = np.zeros(n + 1, dtype=np.int64)
    np.cumsum(cur_cap[:n], out=cur_off[1:])
    out_arena = np.empty(int(out_off[n]), dtype=np.uint8)
    outs_arena = np.empty(int(out_off[n]), dtype=np.uint8)
    cur_arena = np.empty(int(cur_off[n]), dtype=np.uint8)
    curs_arena = np.empty(int(cur_off[n]), dtype=np.uint8)
    meta = np.empty((n, 5), dtype=np.int64)
    lib.stitch_apply_round(
        n, *(np.ascontiguousarray(ptrs[r]) for r in range(10)),
        scal.reshape(-1),
        cfg.mer_size, cfg.solid_thresh,
        STITCH_SCORING["match"], STITCH_SCORING["mismatch"],
        STITCH_SCORING["gap_open"], STITCH_SCORING["gap_extend"],
        out_arena, outs_arena, out_off,
        cur_arena, curs_arena, cur_off, meta.reshape(-1),
    )
    for j, (job, sp) in enumerate(zip(jobs, spans)):
        new_len, spliced, new_old_end, tracked, modified = meta[j]
        if new_len == -1:       # capacity overflow: per-job fallback
            job.apply(sp)
            continue
        if modified:
            o0 = int(out_off[j])
            job.out_c = out_arena[o0 : o0 + new_len].copy()
            job.out_s = outs_arena[o0 : o0 + new_len].copy().view(bool)
        if spliced and tracked:
            i = job.i
            beg = sp.r_begin + job._al_pos
            end = sp.r_end + job._al_pos
            job.cur_pos = (
                job.cur_pos
                + job.piles_pos[i + 1][0]
                - job.piles_pos[i][0]
                - (end - beg + 1)
                + spliced
            )
            c0 = int(cur_off[j])
            job.old_cons = (
                cur_arena[c0 : c0 + spliced].copy(),
                curs_arena[c0 : c0 + spliced].copy().view(bool),
            )
            job.old_mers = job.counts[i]
            job.old_end = int(new_old_end)
        job.i += 1
    return True


def _apply_spans(live, spans, pool, STATS) -> List[StitchJob]:
    from consent_tpu import native

    with STATS.timer("stitch.apply", len(live)):
        valid_jobs, valid_spans = [], []
        if native.get_lib() is not None:
            for j, s in zip(live, spans):
                if s.valid:
                    valid_jobs.append(j)
                    valid_spans.append(s)
                else:
                    j.apply(s)      # skip-advance, no native work
            if pool is not None and len(valid_jobs) >= 64:
                # slice the round over the host pool: each worker
                # makes ONE GIL-free native call for its slice
                nw = pool._max_workers
                step = max(1, -(-len(valid_jobs) // nw))
                list(pool.map(
                    lambda lo: _apply_round_native(
                        valid_jobs[lo : lo + step],
                        valid_spans[lo : lo + step]),
                    range(0, len(valid_jobs), step)))
            elif not _apply_round_native(valid_jobs, valid_spans):
                for j, s in zip(valid_jobs, valid_spans):
                    j.apply(s)
        elif pool is not None and len(live) >= 8:
            list(pool.map(lambda js: js[0].apply(js[1]),
                          zip(live, spans)))
        else:
            for j, s in zip(live, spans):
                j.apply(s)
    return [j for j in live if not j.done]


def run_stitch(jobs: List[StitchJob],
               batch_align: BatchAlignFn = host_batch_align) -> None:
    """Drive many stitch jobs in lockstep rounds: one batched
    alignment per round, one window advanced per live job per round.
    The per-job apply step (independent numpy splices) fans out over
    the shared --nproc host pool.

    When the aligner exposes the async dispatch/collect protocol
    (pipeline.device_align.FixedAligner), jobs split into interleaved
    GROUPS whose rounds overlap: while one group's spans fetch back
    over the latency-bound device link, the other groups' batches are
    in flight and their applies run — the fix for small-population
    stitches (assembly polishing has ~86 contigs, so lockstep rounds
    ran nearly-empty device calls that were pure tunnel latency;
    VERDICT r4 #1)."""
    from consent_tpu.utils.hostpool import host_pool
    from consent_tpu.utils.observe import GLOBAL_STATS as STATS

    pool = host_pool(jobs[0].cfg.n_workers) if jobs else None
    live = [j for j in jobs if not j.done]
    dispatch = getattr(batch_align, "dispatch", None)
    collect = getattr(batch_align, "collect", None)

    if dispatch is None or len(live) < 8:
        while live:
            qs, rs = [], []
            for j in live:
                q, r = j.next_request()
                qs.append(q)
                rs.append(r)
            with STATS.timer("stitch.align", len(live)):
                spans = batch_align(qs, rs)
            live = _apply_spans(live, spans, pool, STATS)
        return

    from consent_tpu.pipeline.device_align import MAX_LANES_PER_CALL

    # group count: enough to hide the round trip, small enough that
    # per-group batches stay meaty; cap so groups never exceed the
    # per-call lane budget
    G = max(2, min(4, len(live) // 8))
    G = max(G, -(-len(live) // MAX_LANES_PER_CALL))
    groups = [live[g::G] for g in range(G)]

    def requests(members):
        qs, rs = [], []
        for j in members:
            q, r = j.next_request()
            qs.append(q)
            rs.append(r)
        return qs, rs

    # lane counts are billed at COLLECT only (dispatch timers pass 0)
    # so stages["counts"]["stitch.align"] stays one-per-window
    handles: List[Optional[tuple]] = []
    for g in range(G):
        if groups[g]:
            with STATS.timer("stitch.align", 0):
                handles.append(dispatch(*requests(groups[g])))
        else:
            handles.append(None)
    n_open = sum(h is not None for h in handles)
    while n_open:
        for g in range(G):
            if handles[g] is None:
                continue
            with STATS.timer("stitch.align", len(groups[g])):
                spans = collect(handles[g])
            groups[g] = _apply_spans(groups[g], spans, pool, STATS)
            if groups[g]:
                with STATS.timer("stitch.align", 0):
                    handles[g] = dispatch(*requests(groups[g]))
            else:
                handles[g] = None
                n_open -= 1
