"""Native minimizer-based all-vs-all overlapper (vectorized NumPy).

The reference shells out to minimap2 for both self-overlaps and
read-to-contig mapping (CONSENT-correct:185-187, CONSENT-polish:189).
This module provides a built-in replacement with the same output
contract (PAF-shaped records, inclusive-end Overlap rows) for
environments without minimap2 and as the default overlap source.

Algorithm (minimap-style, simplified):
  1. canonical (w, k)-minimizers per sequence with an invertible
     64-bit mixer,
  2. hash join of minimizer tables (over-frequent seeds dropped),
  3. per (query, target, relative-strand) diagonal clustering,
  4. cluster -> overlap span + minimizer-count score.

Defaults approximate minimap2's PacBio preset (-k15 -w5 ~ the
reference's PB invocation uses minimap2 defaults k=15 w=10 with -w5
override; CONSENT-correct:185).
"""

from __future__ import annotations

import dataclasses
from typing import Dict, Iterator, List, Sequence, Tuple

import numpy as np

from consent_tpu.io import seqs
from consent_tpu.io.paf import OVERLAP_DTYPE, Pile


@dataclasses.dataclass(frozen=True)
class OverlapParams:
    k: int = 15
    w: int = 5
    max_occ: int = 200          # drop minimizers occurring more often
    min_span: int = 100         # minimum overlap span (bases)
    min_count: int = 4          # minimum shared minimizers per overlap
    diag_tolerance: int = 500   # diagonal clustering width
    chain_gap: int = 1000       # split chains at larger position jumps


def _mix64(x: np.ndarray) -> np.ndarray:
    """Invertible 64-bit mixer (splitmix64 finalizer) — decorrelates
    lexicographic k-mer order so window minima are pseudo-random."""
    x = x.astype(np.uint64, copy=True)
    x ^= x >> np.uint64(30)
    x *= np.uint64(0xBF58476D1CE4E5B9)
    x ^= x >> np.uint64(27)
    x *= np.uint64(0x94D049BB133111EB)
    x ^= x >> np.uint64(31)
    return x


def _kmers_u64(codes: np.ndarray, k: int) -> np.ndarray:
    n = len(codes) - k + 1
    if n <= 0:
        return np.empty(0, dtype=np.uint64)
    out = np.zeros(n, dtype=np.uint64)
    acc = np.zeros(len(codes), dtype=np.uint64)
    # rolling via cumulative shifts: kmer[i] = sum codes[i+j] << 2(k-1-j)
    for j in range(k):
        out = (out << np.uint64(2)) | codes[j : j + n].astype(np.uint64)
    return out


def minimizers(codes: np.ndarray, params: OverlapParams
               ) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    """(hash, pos, strand) canonical minimizers of one sequence.

    strand False = forward k-mer is canonical."""
    k, w = params.k, params.w
    n = len(codes) - k + 1
    if n < w:
        return (np.empty(0, np.uint64), np.empty(0, np.int64),
                np.empty(0, np.bool_))
    fwd = _kmers_u64(codes, k)
    rc = _kmers_u64(seqs.revcomp(codes), k)[::-1]
    strand = rc < fwd
    canon = np.where(strand, rc, fwd)
    h = _mix64(canon)
    # sliding window minimum over w positions
    win = np.lib.stride_tricks.sliding_window_view(h, w)
    arg = win.argmin(axis=1)
    pos = np.arange(len(arg)) + arg
    # dedupe consecutive duplicates
    keep = np.empty(len(pos), dtype=bool)
    keep[0] = True
    keep[1:] = pos[1:] != pos[:-1]
    pos = pos[keep]
    return h[pos], pos.astype(np.int64), strand[pos]


class MinimizerIndex:
    """Minimizer table over a set of target sequences."""

    def __init__(self, params: OverlapParams = OverlapParams()):
        self.params = params
        self._names: List[str] = []
        self._lens: List[int] = []
        self._h: List[np.ndarray] = []
        self._pos: List[np.ndarray] = []
        self._str: List[np.ndarray] = []

    def add(self, name: str, codes: np.ndarray) -> None:
        h, pos, st = minimizers(codes, self.params)
        self._names.append(name)
        self._lens.append(len(codes))
        self._h.append(h)
        self._pos.append(pos)
        self._str.append(st)

    def build(self) -> None:
        sizes = [len(h) for h in self._h]
        self.t_id = np.repeat(np.arange(len(sizes)), sizes)
        self.h = np.concatenate(self._h) if sizes else np.empty(0, np.uint64)
        self.pos = (np.concatenate(self._pos) if sizes
                    else np.empty(0, np.int64))
        self.strand = (np.concatenate(self._str) if sizes
                       else np.empty(0, np.bool_))
        order = np.argsort(self.h, kind="stable")
        self.t_id = self.t_id[order]
        self.h = self.h[order]
        self.pos = self.pos[order]
        self.strand = self.strand[order]
        # frequency filter
        uniq, start, count = np.unique(
            self.h, return_index=True, return_counts=True
        )
        ok = count <= self.params.max_occ
        keep = np.zeros(len(self.h), dtype=bool)
        for s, c in zip(start[ok], count[ok]):
            keep[s : s + c] = True
        self.t_id = self.t_id[keep]
        self.h = self.h[keep]
        self.pos = self.pos[keep]
        self.strand = self.strand[keep]

    def names(self) -> List[str]:
        return self._names

    def length(self, tid: int) -> int:
        return self._lens[tid]


def map_query(
    index: MinimizerIndex,
    q_name: str,
    q_codes: np.ndarray,
    skip_self: bool = True,
) -> List[tuple]:
    """Map one query against the index; returns PAF-equivalent rows
    (q_name, t_name, numeric tuple matching OVERLAP_DTYPE order)."""
    p = index.params
    qh, qpos, qstr = minimizers(q_codes, p)
    if len(qh) == 0 or len(index.h) == 0:
        return []
    # join on hash
    lo = np.searchsorted(index.h, qh, side="left")
    hi = np.searchsorted(index.h, qh, side="right")
    n_hits = hi - lo
    if n_hits.sum() == 0:
        return []
    q_idx = np.repeat(np.arange(len(qh)), n_hits)
    t_rows = np.concatenate(
        [np.arange(l, h) for l, h in zip(lo, hi) if h > l]
    ) if n_hits.sum() else np.empty(0, np.int64)

    tid = index.t_id[t_rows]
    tpos = index.pos[t_rows]
    tstr = index.strand[t_rows]
    qq = qpos[q_idx]
    rel_strand = (qstr[q_idx] != tstr)          # True = '-'

    if skip_self:
        self_name_id = (
            index.names().index(q_name) if q_name in index._names else -1
        )
        keep = tid != self_name_id
        tid, tpos, qq, rel_strand = (
            tid[keep], tpos[keep], qq[keep], rel_strand[keep]
        )
    if len(tid) == 0:
        return []

    # diagonal per relative strand: '+': q - t ; '-': q + t
    diag = np.where(rel_strand, qq + tpos, qq - tpos)
    key_strand = rel_strand.astype(np.int64)
    order = np.lexsort((diag, key_strand, tid))
    tid, tpos, qq, rel_strand, diag = (
        tid[order], tpos[order], qq[order], rel_strand[order], diag[order]
    )

    # cluster breaks: new target/strand or diagonal jump
    brk = np.empty(len(tid), dtype=bool)
    brk[0] = True
    brk[1:] = (
        (tid[1:] != tid[:-1])
        | (rel_strand[1:] != rel_strand[:-1])
        | (np.abs(diag[1:] - diag[:-1]) > p.diag_tolerance)
    )
    cluster = np.cumsum(brk) - 1
    n_clusters = cluster[-1] + 1

    rows: List[tuple] = []
    q_len = len(q_codes)
    starts = np.flatnonzero(brk)
    ends = np.append(starts[1:], len(tid))
    for s, e in zip(starts, ends):
        count = e - s
        if count < p.min_count:
            continue
        t = int(tid[s])
        qs, qe = int(qq[s:e].min()), int(qq[s:e].max()) + p.k - 1
        ts, te = int(tpos[s:e].min()), int(tpos[s:e].max()) + p.k - 1
        # dovetail end-extension: seeds stop at the last shared
        # minimizer; extend the span along the diagonal until one
        # sequence runs out (what aligner-backed overlappers report)
        t_len = index.length(t)
        rev = bool(rel_strand[s])
        if not rev:
            ext = min(qs, ts)
            qs -= ext
            ts -= ext
            ext = min(q_len - 1 - qe, t_len - 1 - te)
            qe += ext
            te += ext
        else:
            ext = min(qs, t_len - 1 - te)
            qs -= ext
            te += ext
            ext = min(q_len - 1 - qe, ts)
            qe += ext
            ts -= ext
        if qe - qs + 1 < p.min_span or te - ts + 1 < p.min_span:
            continue
        matches = int(count * p.k * 0.6)
        span = max(qe - qs + 1, te - ts + 1)
        matches = min(matches, span)
        rows.append(
            (
                q_name,
                index.names()[t],
                (
                    q_len, qs, qe, bool(rel_strand[s]),
                    index.length(t), ts, te,
                    matches, span, 255,
                ),
            )
        )
    # deterministic target order: by first appearance position in PAF
    return rows


def all_vs_all_piles(
    reads: Sequence[Tuple[str, np.ndarray]],
    params: OverlapParams = OverlapParams(),
    max_support: int = 150,
    n_workers: int | None = None,
) -> Iterator[Pile]:
    """Self-overlap piles for (name, codes) reads, query order =
    input order (the reference's PAF streaming order).

    Queries map in parallel on a thread pool (the numpy joins release
    the GIL) with a bounded in-flight window, so emission stays
    streaming-ordered — the host-side analogue of minimap2's -t
    (the reference's overlap stage is multithreaded too,
    CONSENT-correct:185)."""
    import os
    from concurrent.futures import ThreadPoolExecutor

    index = MinimizerIndex(params)
    for name, codes in reads:
        index.add(name, codes)
    index.build()

    def pile_of(item):
        name, codes = item
        rows = map_query(index, name, codes, skip_self=True)
        if not rows:
            return None
        names = [t for _, t, _ in rows]
        ov = np.array([r for _, _, r in rows], dtype=OVERLAP_DTYPE)
        order = np.argsort(-ov["matches"], kind="stable")[:max_support]
        return Pile(
            q_name=name,
            t_names=[names[i] for i in order],
            ov=ov[order],
        )

    nw = n_workers or os.cpu_count() or 1
    if nw <= 1 or len(reads) < 8:
        for item in reads:
            p = pile_of(item)
            if p is not None:
                yield p
        return
    import collections

    with ThreadPoolExecutor(max_workers=nw) as pool:
        # bounded in-flight window: order-preserving AND memory-
        # bounded (an eager pool.map would buffer every pile when the
        # consumer lags).  The window is deep (~2 pipeline chunks of
        # piles, ~300 MB peak) so overlap mapping keeps running in
        # the pool while the downstream pipeline chews on a chunk —
        # overlap and correction overlap end-to-end in the CLI.
        it = iter(reads)
        futs: collections.deque = collections.deque()
        for item in list(__import__("itertools").islice(it, 2048)):
            futs.append(pool.submit(pile_of, item))
        while futs:
            p = futs.popleft().result()
            nxt = next(it, None)
            if nxt is not None:
                futs.append(pool.submit(pile_of, nxt))
            if p is not None:
                yield p


def map_to_targets_piles(
    targets: Sequence[Tuple[str, np.ndarray]],
    reads: Sequence[Tuple[str, np.ndarray]],
    params: OverlapParams = OverlapParams(),
    max_support: int = 20000,
    tmpdir: str | None = None,
) -> Iterator[Pile]:
    """Polishing-shaped piles: for each *target* (contig), the overlaps
    of all reads mapped onto it, with the contig as the pile query —
    the role of minimap2 + sort + reformatPAF in the reference
    (CONSENT-polish:189-193).

    Streaming: emitted rows spill to a temp PAF tagged with the
    contig's input ordinal, an external stable sort(1) groups them
    (the same discipline as the reference's `sort -k6,6`,
    CONSENT-polish:192, and io/paf.py's query grouping), and piles
    stream back — memory stays constant in the number of overlap rows
    instead of holding every read x contig row at once (maxSupport for
    polishing is 20000-deep)."""
    import os
    import tempfile

    from consent_tpu.io import paf as paf_mod

    index = MinimizerIndex(params)
    ordinal: Dict[str, int] = {}
    for name, codes in targets:
        index.add(name, codes)
        ordinal.setdefault(name, len(ordinal))
    index.build()

    tagged = tempfile.NamedTemporaryFile(
        "w", suffix=".paf.tag", delete=False, dir=tmpdir
    )
    sorted_path = tagged.name + ".sorted"

    def mapped(item):
        name, codes = item
        return map_query(index, name, codes, skip_self=False)

    def all_mapped():
        """Per-read mapping fanned over a thread pool, order kept
        (the numpy joins release the GIL — minimap2's -t analogue,
        like all_vs_all_piles)."""
        nw = os.cpu_count() or 1
        if nw <= 1 or len(reads) < 8:
            for item in reads:
                yield mapped(item)
            return
        import collections
        import itertools
        from concurrent.futures import ThreadPoolExecutor

        with ThreadPoolExecutor(max_workers=nw) as pool:
            it = iter(reads)
            futs: collections.deque = collections.deque()
            for item in list(itertools.islice(it, nw * 8)):
                futs.append(pool.submit(mapped, item))
            while futs:
                rows = futs.popleft().result()
                nxt = next(it, None)
                if nxt is not None:
                    futs.append(pool.submit(mapped, nxt))
                yield rows

    try:
        with tagged as out:
            for read_rows in all_mapped():
                for q_name, t_name, row in read_rows:
                    # swap query<->target so the contig becomes the
                    # query; ends exclusive in PAF text (parse_line
                    # re-derives the inclusive convention)
                    (q_len, qs, qe, strand,
                     t_len, ts, te, m, span, mq) = row
                    out.write(
                        f"{ordinal[t_name]}\t{t_name}\t{t_len}\t{ts}\t"
                        f"{te + 1}\t{'-' if strand else '+'}\t{q_name}"
                        f"\t{q_len}\t{qs}\t{qe + 1}\t{m}\t{span}\t"
                        f"{mq}\n"
                    )
        if not paf_mod._external_sort(
            tagged.name, sorted_path, ["-k1,1n"], tmpdir=tmpdir
        ):
            # no sort(1): one in-RAM stable pass
            with open(tagged.name) as f:
                lines = sorted(
                    (ln for ln in f if ln.strip()),
                    key=lambda ln: int(ln.split("\t", 1)[0]),
                )
            with open(sorted_path, "w") as f:
                f.writelines(lines)
        os.unlink(tagged.name)
        with open(sorted_path) as f:
            yield from paf_mod.iter_piles(
                (line.split("\t", 1)[1] for line in f), max_support
            )
    finally:
        for p in (tagged.name, sorted_path):
            if os.path.exists(p):
                os.unlink(p)
