import numpy as np
import pytest

import jax.numpy as jnp

from consent_tpu.core import npalign
from consent_tpu.io import seqs
from consent_tpu.ops import align as align_ops


def pad_to(x, L):
    out = np.zeros(L, dtype=np.uint8)
    out[: len(x)] = x
    return out


def run_posterior(qs, rs, Lq, Lr, sc=align_ops.Scoring()):
    q = jnp.array([pad_to(x, Lq) for x in qs])
    ql = jnp.array([len(x) for x in qs], jnp.int32)
    r = jnp.array([pad_to(x, Lr) for x in rs])
    rl = jnp.array([len(x) for x in rs], jnp.int32)
    return align_ops.posterior_align(q, ql, r, rl, sc)


def random_pair(rng, n=40, mut=0.15):
    true = rng.integers(0, 4, n).astype(np.uint8)
    q = []
    for b in true:
        p = rng.random()
        if p < mut / 3:
            continue  # deletion
        elif p < 2 * mut / 3:
            q.append(rng.integers(0, 4))  # substitution
        elif p < mut:
            q.extend([b, rng.integers(0, 4)])  # insertion
        else:
            q.append(b)
    return np.array(q, dtype=np.uint8), true


@pytest.mark.parametrize("seed", range(15))
def test_opt_score_matches_numpy_oracle(seed):
    rng = np.random.default_rng(seed)
    q, r = random_pair(rng, n=int(rng.integers(10, 60)))
    res = run_posterior([q], [r], 90, 70)
    oracle = npalign.local_align(q, r)
    assert int(res.opt[0]) == oracle.opt


@pytest.mark.parametrize("seed", range(10))
def test_oracle_path_cells_in_posterior(seed):
    """Every matched cell of one optimal traceback must be flagged by
    the posterior (the posterior marks the union of optimal paths)."""
    rng = np.random.default_rng(100 + seed)
    q, r = random_pair(rng, n=int(rng.integers(10, 50)))
    res = run_posterior([q], [r], 80, 60)
    oracle = npalign.local_align(q, r)
    m = np.asarray(res.match_mask[0])
    for (i, j) in oracle.pairs:
        assert m[i, j], f"cell {(i, j)} missing from posterior"


def test_posterior_cells_are_matches_consistent():
    """Posterior-flagged cells must at least have q[i]==r[j] whenever the
    scoring makes mismatch on-path impossible for a perfect repeat-free
    pair."""
    q = seqs.encode("ACGTACGGTTCA")
    res = run_posterior([q], [q], 20, 20)
    m = np.asarray(res.match_mask[0])
    # identical sequences: the main diagonal must be fully matched
    assert all(m[i, i] for i in range(len(q)))


def test_empty_lane():
    q = seqs.encode("ACGT")
    res = run_posterior([q, np.empty(0, np.uint8)], [q, q], 10, 10)
    assert int(res.opt[1]) == 0
    assert not np.asarray(res.match_mask[1]).any()


def test_no_alignment_all_mismatch():
    q = seqs.encode("AAAA")
    r = seqs.encode("CCCC")
    res = run_posterior([q], [r], 8, 8)
    assert int(res.opt[0]) == 0
    assert not np.asarray(res.match_mask[0]).any()


def test_spans_simple():
    #      0123456789
    r = seqs.encode("TTTTACGTACGTTTTT")
    q = seqs.encode("ACGTACG")
    res = run_posterior([q], [r], 10, 20)
    spans = align_ops.alignment_spans(res)
    assert bool(spans.valid[0])
    assert int(spans.q_begin[0]) == 0
    assert int(spans.q_end[0]) == 6
    assert int(spans.r_begin[0]) == 4
    assert int(spans.r_end[0]) == 10


@pytest.mark.parametrize("seed", range(8))
def test_batch_matches_individual(seed):
    rng = np.random.default_rng(200 + seed)
    pairs = [random_pair(rng, n=30) for _ in range(5)]
    res = run_posterior([p[0] for p in pairs], [p[1] for p in pairs], 60, 40)
    for lane, (q, r) in enumerate(pairs):
        oracle = npalign.local_align(q, r)
        assert int(res.opt[lane]) == oracle.opt


def test_gap_cost_model():
    # one deletion of length 2: score = 8 matches*2 - (open + ext) = 16 - 6 = 10
    r = seqs.encode("ACGTAACGT")   # 9 bases
    q = seqs.encode("ACGTCGT")     # missing the AA?  ACGT + [del AA is len2?]
    # q aligns ACGT....CGT: matches 7*2=14, gap len 2 costs 4+2=6 -> 8
    res = run_posterior([q], [r], 12, 12)
    assert int(res.opt[0]) == 8
