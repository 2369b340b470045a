"""DP kernel tests: ksw_extend / ksw_global vs independent brute force."""

import numpy as np
import pytest

from bioseqdb_tpu.cpu.ksw import (
    cigar_nm_md,
    cigar_to_string,
    fill_scmat,
    ksw_extend,
    ksw_global,
)

MAT = fill_scmat(1, 4)
O_DEL = O_INS = 6
E_DEL = E_INS = 1


def brute_extend(query, target, mat, o_del, e_del, o_ins, e_ins, h0):
    """Independent unbanded implementation of the extension recurrence
    (same zero-floor semantics, straightforward 3-matrix form)."""
    ql, tl = len(query), len(target)
    H = np.zeros((tl + 1, ql + 1), dtype=np.int64)
    E = np.zeros((tl + 1, ql + 1), dtype=np.int64)  # gap consuming target
    F = np.zeros((tl + 1, ql + 1), dtype=np.int64)  # gap consuming query
    H[0, 0] = h0
    for j in range(1, ql + 1):
        H[0, j] = max(0, h0 - o_ins - e_ins * j)
    for i in range(1, tl + 1):
        H[i, 0] = max(0, h0 - o_del - e_del * i)
    best, bi, bj = h0, 0, 0
    gscore, gtle = -1, -1
    for i in range(1, tl + 1):
        for j in range(1, ql + 1):
            M = H[i - 1, j - 1]
            M = M + mat[target[i - 1], query[j - 1]] if M else 0
            # the kernel opens gaps from the M-value of a cell, not its H
            E[i, j] = max(_m_of(H, mat, target, query, i - 1, j) - o_del - e_del,
                          E[i - 1, j] - e_del, 0)
            F[i, j] = max(_m_of(H, mat, target, query, i, j - 1) - o_ins - e_ins,
                          F[i, j - 1] - e_ins, 0)
            H[i, j] = max(M, E[i, j], F[i, j])
            if H[i, j] > best:
                best, bi, bj = H[i, j], i, j
        if H[i, ql] > gscore:
            gscore, gtle = H[i, ql], i
    return int(best), bi, bj, int(gscore), gtle


def _m_of(H, mat, target, query, i, j):
    # the kernel computes E/F open from M(i,j) (the diagonal-entry value),
    # not from H(i,j); reproduce that
    if i == 0 or j == 0:
        return 0
    M = H[i - 1, j - 1]
    return M + mat[target[i - 1], query[j - 1]] if M else 0


def brute_global(query, target, mat, o_del, e_del, o_ins, e_ins):
    """Unbanded full-matrix version of the same recurrence ksw_global
    uses: gaps open from the diagonal value M, not H (forbids adjacent
    I/D runs, per the documented ksw semantics)."""
    NEG = -(10**9)
    ql, tl = len(query), len(target)
    H = np.full((tl + 1, ql + 1), NEG, dtype=np.int64)
    M = np.full((tl + 1, ql + 1), NEG, dtype=np.int64)
    E = np.full((tl + 1, ql + 1), NEG, dtype=np.int64)
    F = np.full((tl + 1, ql + 1), NEG, dtype=np.int64)
    H[0, 0] = 0
    for j in range(1, ql + 1):
        H[0, j] = -(o_ins + e_ins * j)
    for i in range(1, tl + 1):
        H[i, 0] = -(o_del + e_del * i)
    for i in range(1, tl + 1):
        for j in range(1, ql + 1):
            M[i, j] = H[i - 1, j - 1] + mat[target[i - 1], query[j - 1]]
            if i >= 2:
                E[i, j] = max(M[i - 1, j] - o_del - e_del, E[i - 1, j] - e_del)
            if j >= 2:
                F[i, j] = max(M[i, j - 1] - o_ins - e_ins, F[i, j - 1] - e_ins)
            H[i, j] = max(M[i, j], E[i, j], F[i, j])
    return int(H[tl, ql])


def rand_pair(rng, ql, tl):
    return (rng.integers(0, 4, ql).astype(np.uint8),
            rng.integers(0, 4, tl).astype(np.uint8))


def test_extend_perfect_match():
    q = np.array([0, 1, 2, 3, 0, 1], np.uint8)
    r = ksw_extend(q, q, MAT, O_DEL, E_DEL, O_INS, E_INS, 100, 5, 100, h0=10)
    assert r.score == 16 and r.qle == 6 and r.tle == 6
    assert r.gscore == 16 and r.gtle == 6


def test_extend_matches_brute_force():
    rng = np.random.default_rng(0)
    for _ in range(60):
        ql = int(rng.integers(1, 30))
        tl = int(rng.integers(1, 40))
        q, t = rand_pair(rng, ql, tl)
        # plant similarity half the time
        if rng.random() < 0.5 and tl >= ql:
            t[:ql] = q
        h0 = int(rng.integers(1, 60))
        got = ksw_extend(q, t, MAT, O_DEL, E_DEL, O_INS, E_INS,
                         w=1000, end_bonus=5, zdrop=0, h0=h0)
        best, bi, bj, gscore, gtle = brute_extend(
            q, t, MAT, O_DEL, E_DEL, O_INS, E_INS, h0)
        assert got.score == best, (q, t, h0)
        if best > h0:
            assert (got.tle, got.qle) == (bi, bj)
        if gscore > 0:
            assert got.gscore == gscore


def test_extend_zdrop_terminates_early():
    rng = np.random.default_rng(1)
    q = rng.integers(0, 4, 100).astype(np.uint8)
    t = rng.integers(0, 4, 100).astype(np.uint8)
    t[:20] = q[:20]  # similar head, then junk
    r = ksw_extend(q, t, MAT, O_DEL, E_DEL, O_INS, E_INS,
                   w=100, end_bonus=5, zdrop=10, h0=30)
    assert r.score >= 30 + 0  # the matching head extends
    assert r.qle >= 15


def test_global_score_matches_brute_force():
    rng = np.random.default_rng(2)
    for _ in range(60):
        ql = int(rng.integers(1, 25))
        tl = int(rng.integers(max(1, ql - 6), ql + 7))
        q, t = rand_pair(rng, ql, tl)
        score, cigar = ksw_global(q, t, MAT, O_DEL, E_DEL, O_INS, E_INS, w=50)
        want = brute_global(q, t, MAT, O_DEL, E_DEL, O_INS, E_INS)
        assert score == want, (q, t)
        # cigar consumes exactly the two sequences
        qc = sum(n for n, op in cigar if op in "MI")
        tc = sum(n for n, op in cigar if op in "MD")
        assert (qc, tc) == (ql, tl)
        # score recomputed from the cigar path equals the DP score
        s, qi, ti = 0, 0, 0
        for n, op in cigar:
            if op == "M":
                for _ in range(n):
                    s += MAT[t[ti], q[qi]]
                    qi += 1
                    ti += 1
            elif op == "I":
                s -= O_INS + E_INS * n
                qi += n
            else:
                s -= O_DEL + E_DEL * n
                ti += n
        assert s == score


def test_global_identical_gives_all_match():
    q = np.array([0, 1, 2, 3] * 5, np.uint8)
    score, cigar = ksw_global(q, q, MAT, O_DEL, E_DEL, O_INS, E_INS, w=10)
    assert score == 20 and cigar_to_string(cigar) == "20M"


def test_global_single_deletion():
    rng = np.random.default_rng(3)
    t = rng.integers(0, 4, 30).astype(np.uint8)
    q = np.concatenate([t[:10], t[13:]])  # 3-base deletion
    score, cigar = ksw_global(q, t, MAT, O_DEL, E_DEL, O_INS, E_INS, w=10)
    assert cigar_to_string(cigar) == "10M3D17M"
    assert score == 27 - (O_DEL + 3 * E_DEL)


def test_nm_md():
    t = np.array([0, 1, 2, 3, 0, 1, 2, 3], np.uint8)
    q = t.copy()
    q[2] = 3  # mismatch
    nm, md = cigar_nm_md([(8, "M")], q, t)
    assert nm == 1 and md == "2G5"
    # 4M2D4M: query = target with the middle two bases deleted
    t2 = np.array([0, 1, 2, 3, 2, 2, 0, 1, 2, 3], np.uint8)
    q2 = np.concatenate([t2[:4], t2[6:]])
    nm, md = cigar_nm_md([(4, "M"), (2, "D"), (4, "M")], q2, t2)
    assert nm == 2 and md == "4^GG4"


def test_native_ksw_global_matches_python():
    from bioseqdb_tpu.cpu.ksw import ksw_global_py
    from bioseqdb_tpu.index.native.build import ksw_global_native

    rng = np.random.default_rng(9)
    for _ in range(120):
        ql = int(rng.integers(1, 60))
        tl = int(rng.integers(max(1, ql - 8), ql + 9))
        q, t = rand_pair(rng, ql, tl)
        if rng.random() < 0.5 and tl >= ql:
            t[:ql] = q
            for _ in range(int(rng.integers(0, 4))):
                t[int(rng.integers(0, tl))] = rng.integers(0, 4)
        w = int(rng.integers(1, 30))
        sp, cp = ksw_global_py(q, t, MAT, O_DEL, E_DEL, O_INS, E_INS, w)
        sn, cn = ksw_global_native(q, t, MAT, O_DEL, E_DEL, O_INS, E_INS, w)
        assert (sn, cn) == (sp, cp), (q, t, w)


def test_native_ksw_global_empty_edges():
    from bioseqdb_tpu.cpu.ksw import ksw_global_py
    from bioseqdb_tpu.index.native.build import ksw_global_native

    e = np.zeros(0, np.uint8)
    s = np.array([0, 1, 2], np.uint8)
    for q, t in [(e, s), (s, e), (e, e)]:
        assert ksw_global_native(q, t, MAT, O_DEL, E_DEL, O_INS, E_INS, 10) == \
            ksw_global_py(q, t, MAT, O_DEL, E_DEL, O_INS, E_INS, 10)
