"""Small evaluation / comparison utilities (consent-eval)."""

from __future__ import annotations

import argparse
import sys

import numpy as np

from consent_tpu.io import seqs
from consent_tpu.io.fasta import iter_fastx
from consent_tpu.testing import metrics


def main_eval(argv=None) -> int:
    """Compare two FASTA files record-by-record (names matched):
    reports per-record and mean identity — the framework's stand-in for
    the reference's external ELECTOR-style evaluation."""
    p = argparse.ArgumentParser(prog="consent-eval")
    p.add_argument("--test", required=True, help="corrected/polished FASTA")
    p.add_argument("--truth", required=True, help="ground truth FASTA")
    p.add_argument("--band", type=int, default=512)
    p.add_argument("--per-record", action="store_true")
    args = p.parse_args(argv)

    truth = {n: seqs.encode(s) for n, s in iter_fastx(args.truth)}
    ids = []
    n_missing = 0
    for name, s in iter_fastx(args.test):
        if name not in truth:
            n_missing += 1
            continue
        ident = metrics.identity(seqs.encode(s), truth[name], args.band)
        ids.append(ident)
        if args.per_record:
            print(f"{name}\t{ident:.5f}")
    mean = float(np.mean(ids)) if ids else 0.0
    print(
        f"records={len(ids)} unmatched={n_missing} "
        f"mean_identity={mean:.5f} "
        f"q{int(-10 * np.log10(max(1e-9, 1 - mean)))}",
        file=sys.stderr,
    )
    return 0
