"""Device banded-SW extension must agree exactly with the host kernel."""

import numpy as np
import pytest

pytestmark = pytest.mark.slow  # ~minutes of DP sweeps; -m 'not slow' skips

import jax.numpy as jnp

from bioseqdb_tpu.cpu.ksw import fill_scmat, ksw_extend
from bioseqdb_tpu.kernels.sw import sw_extend_batch

MAT = fill_scmat(1, 4)


def run_batch(cases, w=100, end_bonus=5, zdrop=100, max_qlen=64, max_tlen=128):
    B = len(cases)
    q = np.full((B, max_qlen), 4, np.int32)
    t = np.full((B, max_tlen), 4, np.int32)
    qlen = np.zeros(B, np.int32)
    tlen = np.zeros(B, np.int32)
    h0 = np.zeros(B, np.int32)
    for i, (qq, tt, hh) in enumerate(cases):
        q[i, : len(qq)] = qq
        t[i, : len(tt)] = tt
        qlen[i], tlen[i], h0[i] = len(qq), len(tt), hh
    out = sw_extend_batch(
        jnp.asarray(q), jnp.asarray(qlen), jnp.asarray(t), jnp.asarray(tlen),
        jnp.asarray(MAT.astype(np.int32)), 6, 1, 6, 1,
        jnp.full(B, w, jnp.int32), end_bonus, zdrop,
        jnp.asarray(h0), max_qlen,
    )
    return {k: np.asarray(v) for k, v in out.items()}


def host(qq, tt, hh, w=100, end_bonus=5, zdrop=100):
    return ksw_extend(
        np.asarray(qq, np.uint8), np.asarray(tt, np.uint8), MAT,
        6, 1, 6, 1, w, end_bonus, zdrop, hh,
    )


def check(cases, **kw):
    got = run_batch(cases, **kw)
    for i, (qq, tt, hh) in enumerate(cases):
        want = host(qq, tt, hh, **{k: v for k, v in kw.items()
                                   if k in ("w", "end_bonus", "zdrop")})
        for f in ("score", "qle", "tle", "gtle", "gscore", "max_off"):
            assert got[f][i] == getattr(want, f), (
                i, f, got[f][i], getattr(want, f), list(qq), list(tt), hh)


def test_perfect_match_batch():
    rng = np.random.default_rng(0)
    cases = []
    for _ in range(8):
        n = int(rng.integers(1, 40))
        s = rng.integers(0, 4, n)
        cases.append((s, s, int(rng.integers(1, 80))))
    check(cases)


def test_random_pairs_agree():
    rng = np.random.default_rng(1)
    cases = []
    for _ in range(48):
        ql = int(rng.integers(1, 50))
        tl = int(rng.integers(1, 90))
        qq = rng.integers(0, 4, ql)
        tt = rng.integers(0, 4, tl)
        if rng.random() < 0.6 and tl >= ql:
            tt[:ql] = qq  # plant similarity
            k = int(rng.integers(0, 4))
            for _ in range(k):  # sprinkle mutations
                tt[int(rng.integers(0, ql))] = rng.integers(0, 4)
        cases.append((qq, tt, int(rng.integers(1, 60))))
    check(cases)


def test_narrow_band_agrees():
    rng = np.random.default_rng(2)
    cases = []
    for _ in range(24):
        ql = int(rng.integers(5, 40))
        tl = int(rng.integers(5, 60))
        cases.append((rng.integers(0, 4, ql), rng.integers(0, 4, tl),
                      int(rng.integers(10, 50))))
    check(cases, w=3)


def test_zdrop_tight_agrees():
    rng = np.random.default_rng(3)
    cases = []
    for _ in range(24):
        ql, tl = int(rng.integers(10, 60)), int(rng.integers(10, 100))
        qq = rng.integers(0, 4, ql)
        tt = rng.integers(0, 4, tl)
        m = min(ql, tl) // 2
        tt[:m] = qq[:m]
        cases.append((qq, tt, int(rng.integers(5, 40))))
    check(cases, zdrop=5)


def test_with_ambiguous_bases():
    rng = np.random.default_rng(4)
    cases = []
    for _ in range(12):
        ql, tl = int(rng.integers(5, 30)), int(rng.integers(5, 40))
        qq = rng.integers(0, 5, ql)  # include code 4
        tt = rng.integers(0, 5, tl)
        cases.append((qq, tt, int(rng.integers(10, 40))))
    check(cases)


def test_indel_cases_agree():
    rng = np.random.default_rng(5)
    cases = []
    for _ in range(16):
        tl = int(rng.integers(30, 60))
        tt = rng.integers(0, 4, tl)
        # deletion in query
        d = int(rng.integers(1, 5))
        p = int(rng.integers(5, tl - d - 5))
        qq = np.concatenate([tt[:p], tt[p + d :]])
        cases.append((qq, tt, int(rng.integers(20, 60))))
        # insertion in query
        ins = rng.integers(0, 4, int(rng.integers(1, 5)))
        qq2 = np.concatenate([tt[:p], ins, tt[p:]])
        cases.append((qq2[:60], tt, int(rng.integers(20, 60))))
    check(cases)


def test_large_batch_realistic_shapes():
    rng = np.random.default_rng(6)
    cases = []
    for _ in range(64):
        ql = int(rng.integers(20, 64))
        tl = min(int(rng.integers(ql, 128)), 128)
        qq = rng.integers(0, 4, ql)
        tt = rng.integers(0, 4, tl)
        tt[:ql] = qq
        nmut = int(rng.integers(0, 6))
        for _ in range(nmut):
            i = int(rng.integers(0, ql))
            tt[i] = (tt[i] + rng.integers(1, 4)) % 4
        cases.append((qq, tt, ql))
    check(cases)
