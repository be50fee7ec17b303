"""Pallas kernel vs XLA-scan posterior: must agree exactly.

Runs in interpret mode on CPU (the driver/bench exercise the compiled
path on TPU)."""

import numpy as np
import pytest

import jax.numpy as jnp

from consent_tpu.ops import align as align_ops
from consent_tpu.ops import pallas_align


def pad_to(x, L):
    out = np.zeros(L, dtype=np.uint8)
    out[: len(x)] = x
    return out


def both(qs, rs, Lq, Lr, sc=align_ops.Scoring()):
    q = jnp.array([pad_to(x, Lq) for x in qs])
    ql = jnp.array([len(x) for x in qs], jnp.int32)
    r = jnp.array([pad_to(x, Lr) for x in rs])
    rl = jnp.array([len(x) for x in rs], jnp.int32)
    a = align_ops.posterior_summary(q, ql, r, rl, sc)
    b = pallas_align.pallas_posterior_summary(q, ql, r, rl, sc,
                                              interpret=True)
    return a, b


def random_pair(rng, n=40, mut=0.15):
    true = rng.integers(0, 4, n).astype(np.uint8)
    q = []
    for bse in true:
        p = rng.random()
        if p < mut / 3:
            continue
        elif p < 2 * mut / 3:
            q.append(rng.integers(0, 4))
        elif p < mut:
            q.extend([bse, rng.integers(0, 4)])
        else:
            q.append(bse)
    return np.array(q, dtype=np.uint8), true


@pytest.mark.parametrize("seed", range(6))
def test_pallas_matches_xla_summary(seed):
    rng = np.random.default_rng(seed)
    pairs = [random_pair(rng, n=int(rng.integers(20, 100))) for _ in range(5)]
    a, b = both([p[0] for p in pairs], [p[1] for p in pairs], 160, 128)
    np.testing.assert_array_equal(np.asarray(a.opt), np.asarray(b.opt))
    np.testing.assert_array_equal(np.asarray(a.matched), np.asarray(b.matched))
    # i_first/i_last/base/ins_pack only meaningful where matched
    m = np.asarray(a.matched)
    for field in ("i_first", "i_last", "base", "ins_pack"):
        np.testing.assert_array_equal(
            np.asarray(getattr(a, field))[m],
            np.asarray(getattr(b, field))[m],
            err_msg=field,
        )


def test_pallas_empty_and_degenerate_lanes():
    qs = [np.empty(0, np.uint8), np.array([0, 1, 2, 3], np.uint8)]
    rs = [np.array([0, 1], np.uint8), np.array([0, 1, 2, 3], np.uint8)]
    a, b = both(qs, rs, 128, 128)
    np.testing.assert_array_equal(np.asarray(a.opt), np.asarray(b.opt))
    np.testing.assert_array_equal(np.asarray(a.matched), np.asarray(b.matched))


def test_pallas_lane_padding():
    # N=3 not a multiple of the tile: padding path
    rng = np.random.default_rng(42)
    pairs = [random_pair(rng, n=60) for _ in range(3)]
    a, b = both([p[0] for p in pairs], [p[1] for p in pairs], 128, 128)
    np.testing.assert_array_equal(np.asarray(a.opt), np.asarray(b.opt))
    np.testing.assert_array_equal(np.asarray(a.matched), np.asarray(b.matched))


def banded_both(qs, rs, d0s, Lq, Lr, sc):
    q = jnp.array([pad_to(x, Lq) for x in qs])
    ql = jnp.array([len(x) for x in qs], jnp.int32)
    r = jnp.array([pad_to(x, Lr) for x in rs])
    rl = jnp.array([len(x) for x in rs], jnp.int32)
    d0 = jnp.array(d0s, jnp.int32)
    a = align_ops.posterior_summary(q, ql, r, rl, sc, d0=d0)
    b = pallas_align.pallas_banded_posterior_summary(
        q, ql, r, rl, d0, sc, interpret=True
    )
    return a, b


def assert_summaries_equal(a, b):
    for field in a._fields:
        np.testing.assert_array_equal(
            np.asarray(getattr(a, field)),
            np.asarray(getattr(b, field)),
            err_msg=field,
        )


@pytest.mark.parametrize("seed", range(4))
@pytest.mark.parametrize("band", [128, 256])
def test_banded_kernel_matches_banded_xla(seed, band):
    """Banded Pallas kernel == banded XLA fallback, bit for bit,
    including negative / large diagonal offsets and ragged lengths."""
    rng = np.random.default_rng(seed)
    Lq, Lr = 192, 256
    qs, rs, d0s = [], [], []
    for k in range(5):
        ref = rng.integers(0, 4, Lr).astype(np.uint8)
        d0 = int(rng.integers(-40, 100))
        L = int(rng.integers(30, Lq))
        src = np.clip(np.arange(L) + d0, 0, Lr - 1)
        frag = ref[src].copy()
        pos = rng.integers(0, L, max(1, L // 8))
        frag[pos] = (frag[pos] + 1 + rng.integers(0, 3, len(pos))) % 4
        qs.append(frag)
        rs.append(ref[: int(rng.integers(Lr // 2, Lr + 1))])
        d0s.append(d0)
    sc = align_ops.Scoring(max_hgap=16, band=band)
    a, b = banded_both(qs, rs, d0s, Lq, Lr, sc)
    assert_summaries_equal(a, b)


def test_banded_kernel_degenerate_lanes():
    qs = [np.empty(0, np.uint8), np.array([0, 1, 2, 3], np.uint8),
          np.array([1, 2, 3, 0, 1, 2, 3, 1, 2], np.uint8)]
    rs = [np.array([0, 1], np.uint8), np.array([0, 1, 2, 3], np.uint8),
          np.array([2, 2], np.uint8)]
    sc = align_ops.Scoring(band=128)
    a, b = banded_both(qs, rs, [0, -3, 200], 128, 128, sc)
    assert_summaries_equal(a, b)


def test_banded_equals_full_on_near_diagonal_data():
    """With fragments whose true offset is inside the band, the banded
    DP finds the same optimum as the full DP (matched sets may differ
    only on tied off-band paths)."""
    rng = np.random.default_rng(11)
    Lq = Lr = 256
    qs, rs, d0s = [], [], []
    for k in range(8):
        ref = rng.integers(0, 4, Lr).astype(np.uint8)
        d0 = int(rng.integers(-16, 48))
        L = Lq - 40
        src = np.clip(np.arange(L) + d0, 0, Lr - 1)
        frag = ref[src].copy()
        pos = rng.integers(0, L, L // 10)
        frag[pos] = (frag[pos] + 1 + rng.integers(0, 3, len(pos))) % 4
        qs.append(frag)
        rs.append(ref)
        d0s.append(d0)
    q = jnp.array([pad_to(x, Lq) for x in qs])
    ql = jnp.array([len(x) for x in qs], jnp.int32)
    r = jnp.array([pad_to(x, Lr) for x in rs])
    rl = jnp.array([len(x) for x in rs], jnp.int32)
    full = align_ops.posterior_summary(
        q, ql, r, rl, align_ops.Scoring(max_hgap=16)
    )
    band = align_ops.posterior_summary(
        q, ql, r, rl, align_ops.Scoring(max_hgap=16, band=128),
        d0=jnp.array(d0s, jnp.int32),
    )
    np.testing.assert_array_equal(np.asarray(full.opt), np.asarray(band.opt))
    agree = (np.asarray(full.matched) == np.asarray(band.matched)).mean()
    assert agree > 0.99
