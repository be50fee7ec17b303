"""Sequence identity metrics (banded Levenshtein, vectorized NumPy)."""

from __future__ import annotations

import numpy as np


def edit_distance_banded(a: np.ndarray, b: np.ndarray,
                         band: int = 256) -> int:
    """Levenshtein distance within a diagonal band (exact when the true
    distance fits in the band; an upper bound otherwise)."""
    la, lb = len(a), len(b)
    if la == 0:
        return lb
    if lb == 0:
        return la
    band = max(band, abs(la - lb) + 2)
    INF = la + lb + 10
    # row i: dp over j in [i - band, i + band]
    width = 2 * band + 1
    prev = np.full(width, INF, dtype=np.int64)
    # row 0: dp[0][j] = j for j in [max(0, -band) .. band]
    offs = np.arange(-band, band + 1)
    j0 = offs  # j values at row 0
    valid0 = (j0 >= 0) & (j0 <= lb)
    prev[valid0] = j0[valid0]
    for i in range(1, la + 1):
        j = i + offs
        valid = (j >= 0) & (j <= lb)
        cur = np.full(width, INF, dtype=np.int64)
        # diag: dp[i-1][j-1] is at same offset in prev
        jm1 = j - 1
        okd = valid & (jm1 >= 0)
        sub = np.ones(width, dtype=np.int64)
        jj = np.clip(jm1, 0, lb - 1)
        sub[okd] = (a[i - 1] != b[jj[okd]]).astype(np.int64)
        diag = np.where(okd, prev + sub, INF)
        # up: dp[i-1][j] at offset+1 in prev
        up = np.full(width, INF, dtype=np.int64)
        up[:-1] = prev[1:] + 1
        up = np.where(valid, up, INF)
        # left: dp[i][j-1] at offset-1 in cur — sequential; resolve with
        # a prefix-min scan: left[j] = min_k<j (cur_nl[k] + (j-k))
        cur_nl = np.minimum(diag, up)
        m = np.minimum.accumulate(cur_nl - j)
        left = np.empty(width, dtype=np.int64)
        left[0] = INF
        left[1:] = m[:-1] + j[1:]
        cur = np.minimum(cur_nl, np.where(valid, left, INF))
        cur[~valid] = INF
        prev = cur
    off_end = lb - la + band
    return int(prev[off_end])


def identity(a: np.ndarray, b: np.ndarray, band: int = 256) -> float:
    """1 - edits / max(len) — alignment identity proxy."""
    if len(a) == 0 or len(b) == 0:
        return 0.0
    d = edit_distance_banded(a, b, band)
    return 1.0 - d / max(len(a), len(b))
