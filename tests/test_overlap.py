import numpy as np
import pytest

from consent_tpu.io import seqs
from consent_tpu.overlap import minimizer as mz
from consent_tpu.testing import simulate


def test_minimizers_deterministic_and_within_range():
    rng = np.random.default_rng(0)
    codes = rng.integers(0, 4, 300).astype(np.uint8)
    p = mz.OverlapParams()
    h1, pos1, s1 = mz.minimizers(codes, p)
    h2, pos2, s2 = mz.minimizers(codes, p)
    assert np.array_equal(pos1, pos2)
    assert (pos1 >= 0).all() and (pos1 <= len(codes) - p.k).all()
    # density ~ 2/(w+1)
    assert len(pos1) > (len(codes) - p.k) / (p.w * 2)


def test_minimizers_strand_symmetric():
    rng = np.random.default_rng(1)
    codes = rng.integers(0, 4, 400).astype(np.uint8)
    p = mz.OverlapParams()
    h_f, _, _ = mz.minimizers(codes, p)
    h_r, _, _ = mz.minimizers(seqs.revcomp(codes), p)
    # canonical hashing: same minimizer hash sets on both strands
    assert set(h_f.tolist()) == set(h_r.tolist())


def test_all_vs_all_finds_true_overlaps():
    genome, reads = simulate.simulate(
        genome_len=6000, coverage=8.0, read_len=1500,
        error_rate=0.08, seed=3,
    )
    named = [(r.name, r.codes) for r in reads]
    piles = {p.q_name: p for p in mz.all_vs_all_piles(named)}

    # ground truth pairs with >=500bp genomic overlap
    found, missed = 0, 0
    by_name = {r.name: r for r in reads}
    for a in reads:
        for b in reads:
            if a.name >= b.name:
                continue
            o = min(a.g_end, b.g_end) - max(a.g_beg, b.g_beg)
            if o < 500:
                continue
            hit = (
                a.name in piles and b.name in piles[a.name].t_names
            ) or (
                b.name in piles and a.name in piles[b.name].t_names
            )
            if hit:
                found += 1
            else:
                missed += 1
    assert found / max(1, found + missed) > 0.9, (found, missed)


def test_overlap_coords_roughly_correct():
    genome, reads = simulate.simulate(
        genome_len=5000, coverage=6.0, read_len=1800,
        error_rate=0.06, seed=7, with_reverse=False,
    )
    named = [(r.name, r.codes) for r in reads]
    by_name = {r.name: r for r in reads}
    for pile in mz.all_vs_all_piles(named):
        a = by_name[pile.q_name]
        for i, t_name in enumerate(pile.t_names):
            b = by_name[t_name]
            g0 = max(a.g_beg, b.g_beg)
            g1 = min(a.g_end, b.g_end)
            if g1 - g0 < 300:
                continue
            # query span should roughly cover the genomic intersection
            true_qs = simulate._project(a, g0)
            true_qe = simulate._project(a, g1 - 1)
            qs = int(pile.ov["q_start"][i])
            qe = int(pile.ov["q_end"][i])
            assert abs(qs - true_qs) < 250, (qs, true_qs)
            assert abs(qe - true_qe) < 250, (qe, true_qe)


def test_map_to_targets_contig_is_query():
    genome, reads = simulate.simulate(
        genome_len=4000, coverage=6.0, read_len=1200,
        error_rate=0.06, seed=11,
    )
    contig = ("contig1", genome)
    named = [(r.name, r.codes) for r in reads]
    piles = list(mz.map_to_targets_piles([contig], named))
    assert len(piles) == 1
    p = piles[0]
    assert p.q_name == "contig1"
    assert p.q_len == len(genome)
    assert len(p) > len(reads) * 0.7
