#!/usr/bin/env python
"""End-to-end correction benchmark at the reference example's scale.

The reference corrects its bundled example — ~33.5 Mb of 10x simulated
PacBio CLR reads over a 3.35 Mb genome — in ~2 min on 4 CPU cores
(reference README.md:55), i.e. ~620 windows/s and ~0.28 Mb/s
end-to-end (BASELINE.md).  This benchmark reproduces that workload
shape with the built-in simulator (the upstream example reads are
LFS-missing), runs the FULL pipeline wall-to-wall on this host's
devices, and reports reads/s, windows/s, Mb/s, accuracy, and the
per-stage breakdown.

Stages timed separately:
  * overlap   — the native minimizer overlapper (the reference uses
                minimap2 here; its ~2 min envelope includes it)
  * pipeline  — windows -> device consensus -> k-mer/DBG -> stitch ->
                trim/drop (engine.process_piles, the framework proper)

Usage: python benchmarks/e2e_bench.py [--genome 3350000] [--coverage 10]
       [--out BENCH_E2E.json]
"""

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(genome_len, coverage, read_len, error_rate, out_path):
    from consent_tpu.utils.jaxcache import enable
    enable()
    import jax

    from consent_tpu.config import correct_preset
    from consent_tpu.io import seqs
    from consent_tpu.io.fasta import ReadIndex
    from consent_tpu.overlap import minimizer as mz
    from consent_tpu.pipeline import engine
    from consent_tpu.testing import metrics, simulate
    from consent_tpu.utils.observe import GLOBAL_STATS

    cfg = correct_preset()

    t0 = time.perf_counter()
    genome, reads = simulate.simulate(
        genome_len=genome_len, coverage=coverage, read_len=read_len,
        error_rate=error_rate, seed=7,
    )
    total_bases = int(sum(len(r.codes) for r in reads))
    index = ReadIndex()
    for r in reads:
        index.add(r.name, r.codes)
    t_sim = time.perf_counter() - t0
    print(f"[sim] {len(reads)} reads, {total_bases/1e6:.1f} Mb "
          f"({t_sim:.1f}s, excluded)", file=sys.stderr)

    # ---- overlap stage (materialized so the pipeline timing is pure)
    t0 = time.perf_counter()
    named = [(r.name, r.codes) for r in reads]
    piles = list(mz.all_vs_all_piles(named, mz.OverlapParams(),
                                     cfg.max_support))
    t_overlap = time.perf_counter() - t0
    print(f"[overlap] {len(piles)} piles ({t_overlap:.1f}s)",
          file=sys.stderr)

    # ---- warmup: compile the steady-state executables (first
    # execution per shape costs minutes through the compile tunnel;
    # production runs amortize it, a benchmark run must not time it).
    # Two passes: a full chunk (the max_b executables per bucket) and
    # a tiny one (the per-bucket tail shape) — the engine's batch
    # sizes come from exactly that two-point set per bucket.
    warm = min(len(piles), 520)
    tw = time.perf_counter()
    for _ in engine.process_piles(iter(piles[:warm]), index, cfg):
        pass
    for _ in engine.process_piles(iter(piles[:3]), index, cfg):
        pass
    print(f"[warmup] {warm}+3 piles ({time.perf_counter()-tw:.1f}s, "
          f"excluded)", file=sys.stderr)
    GLOBAL_STATS.seconds.clear()
    GLOBAL_STATS.counts.clear()

    # ---- pipeline stage (wall-to-wall, output kept for accuracy)
    by_name = {r.name: r for r in reads}
    t0 = time.perf_counter()
    n_out = 0
    results = []
    for name, codes, solid in engine.process_piles(
        iter(piles), index, cfg
    ):
        if len(codes):
            n_out += 1
            results.append((name, codes))
    t_pipe = time.perf_counter() - t0

    stages = GLOBAL_STATS.snapshot()
    n_windows = stages["counts"].get("windows.total", 0)
    print(json.dumps({"pipeline_wall_s": round(t_pipe, 2),
                      "windows_per_s": round(n_windows / t_pipe, 2)}),
          file=sys.stderr, flush=True)

    # ---- streamed wall-to-wall: overlap generator feeding the
    # pipeline directly, as the CLI runs it (the overlapper's bounded
    # prefetch window maps piles concurrently with correction) —
    # THE number to hold against the reference's ~2-min envelope,
    # which includes minimap2
    t0 = time.perf_counter()
    n_stream = 0
    for name, codes, solid in engine.process_piles(
        mz.all_vs_all_piles(named, mz.OverlapParams(),
                            cfg.max_support),
        index, cfg,
    ):
        n_stream += len(codes) > 0
    t_stream = time.perf_counter() - t0
    print(json.dumps({"stream_total_wall_s": round(t_stream, 2)}),
          file=sys.stderr, flush=True)

    # ---- accuracy on a deterministic sample (the banded edit
    # distance costs ~0.15 s/read in numpy; scoring all 8k reads
    # would dwarf the benchmark itself and adds no precision)
    n_sample = 600
    sample = results
    if len(results) > n_sample:
        sel = np.random.default_rng(0).choice(
            len(results), n_sample, replace=False
        )
        sample = [results[i] for i in sorted(sel)]
    raw_ids, cor_ids = [], []
    for name, codes in sample:
        r = by_name[name]
        t = genome[r.g_beg : r.g_end]
        if r.reverse:
            t = seqs.revcomp(t)
        cor_ids.append(metrics.identity(codes, t))
        raw_ids.append(metrics.identity(r.codes, t))

    ref_windows_per_s = 620.0       # BASELINE.md (README.md:55 derived)
    ref_mb_per_s = 33.5 / 120.0
    ref_total_s = 120.0             # incl. minimap2 (README.md:55)
    report = {
        "workload": {
            "genome_mb": genome_len / 1e6,
            "coverage": coverage,
            "read_bases_mb": total_bases / 1e6,
            "n_reads": len(reads),
            "n_windows": n_windows,
        },
        "pipeline_wall_s": round(t_pipe, 2),
        "overlap_wall_s": round(t_overlap, 2),
        "stream_total_wall_s": round(t_stream, 2),
        "vs_baseline_total": round(ref_total_s / t_stream, 3),
        "reads_per_s": round(len(reads) / t_pipe, 2),
        "windows_per_s": round(n_windows / t_pipe, 2),
        "mb_per_s": round(total_bases / 1e6 / t_pipe, 3),
        "vs_baseline_windows": round(n_windows / t_pipe / ref_windows_per_s, 3),
        "vs_baseline_mb": round(total_bases / 1e6 / t_pipe / ref_mb_per_s, 3),
        "accuracy": {
            "raw_identity": round(float(np.mean(raw_ids)), 4),
            "corrected_identity": round(float(np.mean(cor_ids)), 4),
            "n_corrected": n_out,
            "n_scored": len(cor_ids),
        },
        "stages": stages,
        "reference_envelope": "~2 min / 4 cores for the same workload "
                              "shape incl. minimap2 (README.md:55)",
        "host_cores": os.cpu_count(),
        "notes": "stage seconds are thread-seconds (host stages fan "
                 "out over --nproc pools and overlap); "
                 "consensus.device_votes is dominated by the dev-host "
                 "fetch round trip of the access tunnel, not device "
                 "throughput (bench.py measures the device hot path "
                 "at 10x baseline)",
    }
    with open(out_path, "w") as f:
        json.dump(report, f, indent=1)
    print(json.dumps({k: report[k] for k in (
        "pipeline_wall_s", "reads_per_s", "windows_per_s", "mb_per_s",
        "vs_baseline_windows")}))
    return 0


if __name__ == "__main__":
    p = argparse.ArgumentParser()
    p.add_argument("--genome", type=int, default=3_350_000)
    p.add_argument("--coverage", type=float, default=10.0)
    p.add_argument("--read-len", type=int, default=4000)
    p.add_argument("--error-rate", type=float, default=0.10)
    p.add_argument("--out", default="BENCH_E2E.json")
    a = p.parse_args()
    sys.exit(main(a.genome, a.coverage, a.read_len, a.error_rate, a.out))
