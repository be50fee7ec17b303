"""Batched device aligner for the stitcher.

Pads ragged (query, ref) pair lists into fixed-shape buckets (lane
count = power of two, lengths = multiples of 128) so jit caches stay
small, runs the posterior aligner, and returns host AlignSpans.
"""

from __future__ import annotations

import functools
from typing import List

import jax
import jax.numpy as jnp
import numpy as np

from consent_tpu.ops import align as align_ops
from consent_tpu.pipeline.stitch import STITCH_SCORING, AlignSpan

MAX_LANES_PER_CALL = 256

_SCORING = align_ops.Scoring(
    match=STITCH_SCORING["match"],
    mismatch=STITCH_SCORING["mismatch"],
    gap_open=STITCH_SCORING["gap_open"],
    gap_extend=STITCH_SCORING["gap_extend"],
)


@jax.jit
def _spans_jit(q, ql, r, rl):
    from consent_tpu.ops.consensus import _summary_dispatch

    res = _summary_dispatch(q, ql, r, rl, _SCORING)
    s = align_ops.summary_spans(res)
    return s.q_begin, s.q_end, s.r_begin, s.r_end, s.valid


def _round_up(x: int, m: int) -> int:
    return max(m, (x + m - 1) // m * m)


def _next_pow2(x: int) -> int:
    n = 8
    while n < x:
        n *= 2
    return n


def device_batch_align(qs: List[np.ndarray], rs: List[np.ndarray],
                       fixed_len: int | None = None) -> List[AlignSpan]:
    """Align each (qs[i], rs[i]) pair locally on device; returns spans.

    fixed_len pins the padded sequence length so every call hits a
    cached executable (tunnel compiles are minutes); without it the
    lengths round up to the batch maxima."""
    out: List[AlignSpan] = []
    for lo in range(0, len(qs), MAX_LANES_PER_CALL):
        out.extend(_one_call(qs[lo : lo + MAX_LANES_PER_CALL],
                             rs[lo : lo + MAX_LANES_PER_CALL], fixed_len))
    return out


def make_fixed_aligner(cfg) -> "BatchAlignFn":
    """Aligner with shapes pinned for one pipeline config."""
    import functools

    L = _round_up(
        max(cfg.window_size + 2 * cfg.window_overlap,
            cfg.window_size + cfg.frag_slack),
        128,
    )
    return functools.partial(device_batch_align, fixed_len=L)


def _one_call(qs, rs, fixed_len=None):
    n = len(qs)
    lanes = _next_pow2(n)
    Lq = _round_up(max(len(q) for q in qs), 128)
    Lr = _round_up(max(len(r) for r in rs), 128)
    if fixed_len is not None:
        Lq = max(Lq, fixed_len)
        Lr = max(Lr, fixed_len)
    q = np.zeros((lanes, Lq), dtype=np.uint8)
    r = np.zeros((lanes, Lr), dtype=np.uint8)
    ql = np.zeros(lanes, dtype=np.int32)
    rl = np.zeros(lanes, dtype=np.int32)
    for i, (a, b) in enumerate(zip(qs, rs)):
        q[i, : len(a)] = a
        r[i, : len(b)] = b
        ql[i] = len(a)
        rl[i] = len(b)
    qb, qe, rb, re, valid = jax.device_get(
        _spans_jit(jnp.array(q), jnp.array(ql), jnp.array(r), jnp.array(rl))
    )
    return [
        AlignSpan(int(qb[i]), int(qe[i]), int(rb[i]), int(re[i]), bool(valid[i]))
        for i in range(n)
    ]
