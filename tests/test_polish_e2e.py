"""Assembly-polishing pipeline end-to-end on simulated data."""

import numpy as np
import pytest

from consent_tpu.config import polish_preset
from consent_tpu.io import seqs
from consent_tpu.io.fasta import ReadIndex
from consent_tpu.overlap import minimizer as mz
from consent_tpu.pipeline import engine
from consent_tpu.pipeline.stitch import host_batch_align
from consent_tpu.testing import metrics, simulate


def test_polishing_improves_assembly():
    rng = np.random.default_rng(5)
    genome, reads = simulate.simulate(
        genome_len=3000, coverage=14.0, read_len=900,
        error_rate=0.08, seed=5,
    )
    # draft assembly = genome with 1.5% errors
    draft, _ = simulate.mutate(genome, rng, 0.015)

    cfg = polish_preset(
        window_size=200, window_overlap=20,
        consensus_rounds=1,
    )
    index = ReadIndex()
    index.add("contig1", draft)
    for r in reads:
        index.add(r.name, r.codes)

    piles = list(
        mz.map_to_targets_piles(
            [("contig1", draft)],
            [(r.name, r.codes) for r in reads],
            mz.OverlapParams(),
            cfg.max_support,
        )
    )
    assert len(piles) == 1

    results = list(
        engine.process_piles(iter(piles), index, cfg,
                             batch_align=host_batch_align)
    )
    assert len(results) == 1
    name, codes, solid = results[0]
    assert name == "contig1"
    assert len(codes) > 0, "contig must not be dropped (no trimming)"

    draft_id = metrics.identity(draft, genome)
    polished_id = metrics.identity(codes, genome)
    print(f"draft {draft_id:.4f} -> polished {polished_id:.4f}")
    assert polished_id > draft_id
    assert polished_id > 0.99
