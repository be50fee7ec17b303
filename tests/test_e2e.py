"""End-to-end pipeline test on simulated ground-truthed data —
the framework's equivalent of the reference's golden example run
(README.md:49-63), but with known truth so accuracy is measurable."""

import numpy as np
import pytest

from consent_tpu.config import correct_preset
from consent_tpu.io import seqs
from consent_tpu.io.fasta import ReadIndex
from consent_tpu.pipeline import engine
from consent_tpu.pipeline.stitch import host_batch_align
from consent_tpu.testing import metrics, simulate


@pytest.fixture(scope="module")
def sim():
    genome, reads = simulate.simulate(
        genome_len=3000, coverage=14.0, read_len=900,
        error_rate=0.10, seed=42,
    )
    return genome, reads


def run_pipeline(genome, reads, cfg):
    index = ReadIndex()
    for r in reads:
        index.add(r.name, r.codes)
    piles = simulate.piles_from_sim(reads, cfg.max_support)
    results = list(
        engine.process_piles(iter(piles), index, cfg,
                             batch_align=host_batch_align)
    )
    return piles, results


def truth_of(read, genome):
    seg = genome[read.g_beg : read.g_end]
    return seqs.revcomp(seg) if read.reverse else seg


def test_correction_improves_identity(sim):
    genome, reads = sim
    cfg = correct_preset(
        window_size=200, window_overlap=20, min_support=3,
    )
    piles, results = run_pipeline(genome, reads, cfg)
    by_name = {r.name: r for r in reads}

    raw_ids, cor_ids = [], []
    n_out = 0
    for (name, codes, solid) in results:
        if len(codes) == 0:
            continue
        n_out += 1
        read = by_name[name]
        truth = truth_of(read, genome)
        raw_ids.append(metrics.identity(read.codes, truth))
        # trim-aware: the corrector intentionally trims weak read ends;
        # truth overhangs there are not correction errors
        cor_ids.append(
            metrics.error_profile(codes, truth,
                                  free_truth_ends=True)["identity"]
        )

    assert n_out >= len(results) * 0.7, "too many reads dropped"
    raw_mean = float(np.mean(raw_ids))
    cor_mean = float(np.mean(cor_ids))
    print(f"raw identity {raw_mean:.4f} -> corrected {cor_mean:.4f} "
          f"({n_out} reads)")
    assert cor_mean > raw_mean + 0.06
    # paper-regime gate: ~99%+ post-correction at CLR error rates
    assert cor_mean > 0.985


def test_pipeline_deterministic(sim):
    genome, reads = sim
    cfg = correct_preset(
        window_size=200, window_overlap=20, min_support=3,
        consensus_rounds=1,
    )
    _, res1 = run_pipeline(genome, reads[:8], cfg)
    _, res2 = run_pipeline(genome, reads[:8], cfg)
    assert len(res1) == len(res2)
    for (n1, c1, s1), (n2, c2, s2) in zip(res1, res2):
        assert n1 == n2
        assert np.array_equal(c1, c2)
        assert np.array_equal(s1, s2)


def test_correction_ont_profile():
    """ONT-like error profile: higher error rate, indel-heavy (the
    reference's --type ONT regime; its engine is profile-agnostic past
    the overlapper and so is ours — this pins accuracy there too)."""
    genome, reads = simulate.simulate(
        genome_len=3000, coverage=14.0, read_len=900,
        error_rate=0.12, seed=9, frac_sub=0.2, frac_ins=0.4,
    )
    cfg = correct_preset(
        window_size=200, window_overlap=20, min_support=3,
    )
    piles, results = run_pipeline(genome, reads, cfg)
    by_name = {r.name: r for r in reads}
    raw_ids, cor_ids = [], []
    for (name, codes, solid) in results:
        if len(codes) == 0:
            continue
        read = by_name[name]
        truth = truth_of(read, genome)
        raw_ids.append(metrics.identity(read.codes, truth))
        cor_ids.append(
            metrics.error_profile(codes, truth,
                                  free_truth_ends=True)["identity"]
        )
    raw_mean = float(np.mean(raw_ids))
    cor_mean = float(np.mean(cor_ids))
    print(f"ONT raw {raw_mean:.4f} -> corrected {cor_mean:.4f}")
    assert cor_mean > raw_mean + 0.06
    assert cor_mean > 0.97


# ---------------------------------------------------------------------------
# reference operating point: the reference's own defaults
# (windowSize=500, windowOverlap=50 — CONSENT-correct:45,50).
# Full-scale measurements (42 reads, genome 6 kb, scratch/acc_refpoint.py,
# 2026-08): PB 10% raw 0.9056 -> 0.9958 (sub .0011/ins .0017/del .0014),
# ONT 12% indel-heavy raw 0.8883 -> 0.9898 (sub .0021/ins .0044/del
# .0039).  The gates below run a deterministic subset of that workload
# to keep the suite fast.


def _refpoint_run(error_rate, frac_sub, frac_ins, n_piles):
    genome, reads = simulate.simulate(
        genome_len=6000, coverage=14.0, read_len=2000,
        error_rate=error_rate, seed=42, frac_sub=frac_sub,
        frac_ins=frac_ins,
    )
    cfg = correct_preset()  # the reference's 500/50 defaults
    index = ReadIndex()
    for r in reads:
        index.add(r.name, r.codes)
    piles = simulate.piles_from_sim(reads, cfg.max_support)[:n_piles]
    results = list(
        engine.process_piles(iter(piles), index, cfg,
                             batch_align=host_batch_align)
    )
    by_name = {r.name: r for r in reads}
    raw_ids, cor_ids = [], []
    for (name, codes, solid) in results:
        if len(codes) == 0:
            continue
        read = by_name[name]
        truth = truth_of(read, genome)
        raw_ids.append(metrics.identity(read.codes, truth))
        cor_ids.append(
            metrics.error_profile(codes, truth,
                                  free_truth_ends=True)["identity"]
        )
    return float(np.mean(raw_ids)), float(np.mean(cor_ids)), len(cor_ids)


def test_refpoint_pb_paper_regime():
    """PB 10% CLR at the reference's default windowing must reach the
    paper's ~99%+ post-correction regime (README.md:121)."""
    raw, cor, n = _refpoint_run(0.10, 1 / 3, 1 / 3, n_piles=12)
    print(f"refpoint PB raw {raw:.4f} -> corrected {cor:.4f} ({n})")
    assert n >= 10
    assert cor > 0.99


def test_refpoint_ont_indel_heavy():
    """ONT 12%, indel-heavy profile, at the reference's defaults —
    held to near-parity (the reference treats ONT as first-class,
    CONSENT-correct:187)."""
    raw, cor, n = _refpoint_run(0.12, 0.2, 0.4, n_piles=12)
    print(f"refpoint ONT raw {raw:.4f} -> corrected {cor:.4f} ({n})")
    assert n >= 10
    assert cor > 0.985
