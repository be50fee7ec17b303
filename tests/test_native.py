"""Native C++ host library vs Python implementations — must agree."""

import numpy as np
import pytest

from consent_tpu import native
from consent_tpu.core import dbg
from consent_tpu.io import seqs
from consent_tpu.ops import kmer as kmer_ops


pytestmark = pytest.mark.skipif(
    native.get_lib() is None, reason="native library unavailable"
)


def test_count_kmers_native_matches_host():
    rng = np.random.default_rng(0)
    frags = [rng.integers(0, 4, rng.integers(3, 60)).astype(np.uint8)
             for _ in range(12)]
    k = 5
    want = kmer_ops.count_kmers_host(frags, k)
    got = native.count_kmers_native(frags, k)
    assert np.array_equal(want, got)


def _random_case(seed, n=120, k=5):
    """Build a consensus with weak corrupted patches + counts from the
    true sequence."""
    rng = np.random.default_rng(seed)
    true = rng.integers(0, 4, n).astype(np.uint8)
    counts = np.zeros(4 ** k, dtype=np.int32)
    for km in seqs.kmer_codes(true, k):
        counts[km] += 10
    codes = true.copy()
    solid = np.ones(n, dtype=bool)
    for _ in range(rng.integers(0, 3)):
        a = int(rng.integers(0, n - 20))
        b = a + int(rng.integers(8, 18))
        codes[a:b] = rng.integers(0, 4, b - a)
        solid[max(0, a - 2) : min(n, b + 2)] = False
    return codes, solid, counts


@pytest.mark.parametrize("seed", range(25))
def test_polish_native_matches_python(seed):
    k = 5
    codes, solid, counts = _random_case(seed, k=k)
    py_c, py_s = dbg.polish_correction(codes, solid, counts, k, 4)
    res = native.polish_correction_native(codes, solid, counts, k, 4)
    assert res is not None
    na_c, na_s = res
    assert np.array_equal(py_c, na_c), seed
    assert np.array_equal(py_s, na_s), seed


def test_polish_native_head_tail():
    k = 5
    rng = np.random.default_rng(99)
    true = rng.integers(0, 4, 60).astype(np.uint8)
    counts = np.zeros(4 ** k, dtype=np.int32)
    for km in seqs.kmer_codes(true, k):
        counts[km] += 10
    codes = true.copy()
    codes[:4] = (codes[:4] + 1) % 4
    codes[-4:] = (codes[-4:] + 1) % 4
    solid = np.ones(60, dtype=bool)
    solid[:4] = False
    solid[-4:] = False
    py = dbg.polish_correction(codes, solid, counts, k, 4)
    na = native.polish_correction_native(codes, solid, counts, k, 4)
    assert np.array_equal(py[0], na[0])
    assert np.array_equal(py[1], na[1])
