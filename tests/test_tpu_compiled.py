"""Compiled-Pallas regression tests — run on the REAL TPU chip.

A Mosaic lowering bug would otherwise surface only as silently wrong
bench output (VERDICT round 1, missing item 7).  These assert
compiled == XLA fallback bit-for-bit on the full and banded kernels.

Run with:  CONSENT_TPU_TESTS=1 python -m pytest tests/test_tpu_compiled.py
(conftest.py then keeps the real backend instead of forcing CPU).
bench.py additionally runs the same equality check before every timed
round, so the driver's bench run doubles as this regression gate.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

pytestmark = pytest.mark.skipif(
    jax.default_backend() != "tpu",
    reason="needs the real TPU backend (CONSENT_TPU_TESTS=1)",
)


def _case(seed, N, Lq, W):
    rng = np.random.default_rng(seed)
    q = rng.integers(0, 4, (N, Lq)).astype(np.int32)
    ql = rng.integers(Lq // 2, Lq + 1, N).astype(np.int32)
    r = rng.integers(0, 4, (N, W)).astype(np.int32)
    rl = rng.integers(W // 2, W + 1, N).astype(np.int32)
    d0 = rng.integers(-16, 17, N).astype(np.int32)
    return tuple(jnp.asarray(x) for x in (q, ql, r, rl, d0))


def _assert_equal(a, b):
    for name in a._fields:
        np.testing.assert_array_equal(
            np.asarray(getattr(a, name)), np.asarray(getattr(b, name)),
            err_msg=name,
        )


@pytest.mark.parametrize("seed", [0, 1])
def test_compiled_full_kernel_matches_xla(seed):
    from consent_tpu.ops import align as align_ops
    from consent_tpu.ops import pallas_align as pa

    q, ql, r, rl, _ = _case(seed, 256, 384, 256)
    sc = align_ops.Scoring(max_hgap=16)
    compiled = pa.pallas_posterior_summary(q, ql, r, rl, sc)
    xla = align_ops.posterior_summary(q, ql, r, rl, sc)
    _assert_equal(compiled, xla)


@pytest.mark.parametrize("seed", [0, 1])
def test_compiled_banded_kernel_matches_xla(seed):
    from consent_tpu.ops import align as align_ops
    from consent_tpu.ops import pallas_align as pa

    q, ql, r, rl, d0 = _case(seed, 256, 512, 512)
    sc = align_ops.Scoring(max_hgap=16, band=128)
    compiled = pa.pallas_banded_posterior_summary(q, ql, r, rl, d0, sc)
    xla = align_ops.posterior_summary(q, ql, r, rl, sc, d0=d0)
    _assert_equal(compiled, xla)
