"""Property tests for the wavefront builders (pure numpy — no kernels).

The enumerated tiles + per-tile thresholds ARE the kernel's masking: these
tests reconstruct the implied (row, col) visibility from the meta arrays
and compare it against a brute-force mask over many random geometries —
causal offsets (positive and negative), ragged tails, sliding windows —
plus the structural flags the kernels' predicated write-through relies on
(every q row has exactly one FIRST and one LAST step; the fused builder's
KJ-first column marks exactly the first touch of every enumerated kv tile).
"""

import numpy as np
import pytest

from flashattn_tpu.ops.flash_fwd import (
    _BIG,
    META_CTHRESH,
    META_FIRST,
    META_KJ,
    META_LAST,
    META_LTHRESH,
    META_QI,
    META_RTHRESH,
    build_wavefront,
)
from flashattn_tpu.ops.flash_bwd_fused import (
    FUSED_G,
    FUSED_KJ_FIRST,
    build_fused_wavefront,
)


def brute_mask(s_q, s_k, causal_offset, window):
    r = np.arange(s_q)[:, None]
    c = np.arange(s_k)[None, :]
    m = np.ones((s_q, s_k), bool)
    if causal_offset is not None:
        m &= c <= r + causal_offset
        if window is not None:
            m &= c >= r + causal_offset - window + 1
    return m


def mask_from_meta(meta, bq, bkv, s_q, s_k):
    m = np.zeros((s_q, s_k), bool)
    for row in meta:
        qi, kj = row[META_QI], row[META_KJ]
        rth, cth, lth = row[META_RTHRESH], row[META_CTHRESH], row[META_LTHRESH]
        for rr in range(min(bq, s_q - qi * bq)):
            lo = max(0, rr + lth)
            hi = min(min(rr + rth, cth), bkv - 1)
            for cc in range(lo, hi + 1):
                col = kj * bkv + cc
                if col < s_k:
                    m[qi * bq + rr, col] = True
    return m


GEOMETRIES = [
    # (s_q, s_k, bq, bkv, causal_offset, window)
    (16, 16, 4, 4, 0, None),
    (16, 16, 4, 4, None, None),
    (12, 20, 4, 4, 8, None),       # s_q != s_k, bottom-right
    (20, 12, 4, 4, -8, None),      # negative offset: empty top rows
    (16, 16, 4, 4, 0, 6),          # window
    (24, 24, 4, 8, 0, 9),          # mixed blocks + window
    (18, 18, 4, 4, 0, None),       # ragged tail (s % b != 0)
    (18, 14, 4, 4, -4, 5),         # ragged + negative offset + window
    (16, 32, 8, 4, 16, 4),         # tiny window far right
]


@pytest.mark.parametrize("s_q,s_k,bq,bkv,off,window", GEOMETRIES)
def test_wavefront_matches_brute_force(s_q, s_k, bq, bkv, off, window):
    import math

    nq = math.ceil(s_q / bq)
    nk = math.ceil(s_k / bkv)
    meta = build_wavefront(nq, nk, bq, bkv, s_k, off, window=window)
    got = mask_from_meta(meta, bq, bkv, nq * bq, nk * bkv)[:s_q, :s_k]
    want = brute_mask(s_q, s_k, off, window)
    np.testing.assert_array_equal(got, want)


@pytest.mark.parametrize("s_q,s_k,bq,bkv,off,window", GEOMETRIES)
def test_wavefront_row_flags(s_q, s_k, bq, bkv, off, window):
    import math

    nq = math.ceil(s_q / bq)
    nk = math.ceil(s_k / bkv)
    meta = build_wavefront(nq, nk, bq, bkv, s_k, off, window=window)
    # Every q tile appears (even fully-masked rows get a sentinel step so
    # the output block is written), with exactly one FIRST and one LAST,
    # FIRST at its first step and LAST at its final step.
    for qi in range(nq):
        steps = np.flatnonzero(meta[:, META_QI] == qi)
        assert len(steps) >= 1
        firsts = meta[steps, META_FIRST]
        lasts = meta[steps, META_LAST]
        assert firsts.sum() == 1 and lasts.sum() == 1
        assert firsts[0] == 1 and lasts[-1] == 1


@pytest.mark.parametrize("q_per_kv", [1, 2])
@pytest.mark.parametrize("s_q,s_k,bq,bkv,off,window", GEOMETRIES)
def test_dkv_wavefront_matches_brute_force(s_q, s_k, bq, bkv, off, window,
                                           q_per_kv):
    """The dKV wavefront's (kj, qi) tiles + thresholds must imply the same
    visibility as the forward mask (transposed layout: q rows are LANES),
    with padded q rows masked via DKV_ROWTHRESH, and each kv tile must get
    exactly one FIRST (write-through init) and one LAST (finalize)."""
    import math

    from flashattn_tpu.ops.flash_bwd import (
        DKV_FIRST,
        DKV_KJ,
        DKV_LAST,
        DKV_LTHRESH,
        DKV_QI,
        DKV_ROWTHRESH,
        DKV_RTHRESH,
        build_dkv_wavefront,
    )

    if window is not None and off is None:
        pytest.skip("window requires causal")
    nq = math.ceil(s_q / bq)
    nk = math.ceil(s_k / bkv)
    meta = build_dkv_wavefront(nq, nk, bq, bkv, s_q, q_per_kv, off,
                               window=window)
    got = np.zeros((nq * bq, nk * bkv), bool)
    for row in meta[meta[:, 1] == 0]:  # group 0 only (groups repeat)
        kj, qi = row[DKV_KJ], row[DKV_QI]
        rth, rowth, lth = (row[DKV_RTHRESH], row[DKV_ROWTHRESH],
                           row[DKV_LTHRESH])
        for rr in range(bq):
            if rr > rowth:
                continue  # padded q row
            for cc in range(bkv):
                # Thresholds are in block-local coords: visible iff
                # lth <= (cc - rr) <= rth.
                if lth <= cc - rr <= rth:
                    col = kj * bkv + cc
                    got[qi * bq + rr, col] = True
    want_full = brute_mask(nq * bq, nk * bkv, off, window)
    # Rows beyond s_q are masked by ROWTHRESH; cols beyond s_k do not exist
    # in the dKV output we compare (dead kv rows produce ~0 grads via p=0,
    # so the builder may legally enumerate them).
    np.testing.assert_array_equal(got[:s_q, :s_k], want_full[:s_q, :s_k])
    assert not got[s_q:].any()
    for kj in range(nk):
        steps = np.flatnonzero(meta[:, DKV_KJ] == kj)
        assert len(steps) >= 1
        assert meta[steps, DKV_FIRST].sum() == 1
        assert meta[steps, DKV_LAST].sum() == 1
        assert meta[steps[0], DKV_FIRST] == 1
        assert meta[steps[-1], DKV_LAST] == 1


@pytest.mark.parametrize("q_per_kv", [1, 2])
@pytest.mark.parametrize("s_q,s_k,bq,bkv,off,window", GEOMETRIES)
def test_fused_wavefront_kj_first(s_q, s_k, bq, bkv, off, window, q_per_kv):
    import math

    nq = math.ceil(s_q / bq)
    nk = math.ceil(s_k / bkv)
    meta = build_fused_wavefront(nq, nk, bq, bkv, s_k, q_per_kv, off,
                                 window=window)
    # The group column repeats the base wavefront per GQA member.
    assert set(meta[:, FUSED_G].tolist()) == set(range(q_per_kv))
    # KJ_FIRST marks exactly the first occurrence of every enumerated kj
    # (the kernel's write-through init relies on this).
    seen = set()
    for row in meta:
        kj, flag = int(row[META_KJ]), int(row[FUSED_KJ_FIRST])
        assert flag == (kj not in seen)
        seen.add(kj)
    assert seen == set(meta[:, META_KJ].tolist())
