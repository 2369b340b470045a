"""Pallas SW kernel pinned against the XLA reference kernel (interpret
mode on CPU; the compiled TPU path is exercised by bench tooling)."""

import numpy as np
import pytest

pytestmark = pytest.mark.slow  # ~minutes of DP sweeps; -m 'not slow' skips

import jax.numpy as jnp

from bioseqdb_tpu.cpu.ksw import fill_scmat
from bioseqdb_tpu.kernels.sw import sw_extend_batch
from bioseqdb_tpu.kernels.sw_pallas import sw_extend_batch_pallas

MAT = fill_scmat(1, 4)


def run_both(cases, w=100, end_bonus=5, zdrop=100, max_qlen=64, max_tlen=128):
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
    xla = sw_extend_batch(
        jnp.asarray(q), jnp.asarray(qlen), jnp.asarray(t), jnp.asarray(tlen),
        jnp.asarray(MAT.astype(np.int32)), 6, 1, 6, 1,
        jnp.full(B, w, jnp.int32), end_bonus, zdrop, jnp.asarray(h0), max_qlen,
    )
    pls = sw_extend_batch_pallas(
        jnp.asarray(q), jnp.asarray(qlen), jnp.asarray(t), jnp.asarray(tlen),
        jnp.full(B, w, jnp.int32), jnp.asarray(h0),
        match_score=1, mismatch_penalty=4, o_del=6, e_del=1, o_ins=6, e_ins=1,
        end_bonus=end_bonus, zdrop=zdrop, max_qlen=max_qlen, interpret=True,
    )
    for f in ("score", "qle", "tle", "gtle", "gscore", "max_off"):
        a, b = np.asarray(xla[f]), np.asarray(pls[f])
        assert np.array_equal(a, b), (f, a, b)


def test_random_pairs():
    rng = np.random.default_rng(1)
    cases = []
    for _ in range(24):
        ql = int(rng.integers(1, 50))
        tl = int(rng.integers(1, 90))
        qq = rng.integers(0, 4, ql)
        tt = rng.integers(0, 4, tl)
        if rng.random() < 0.6 and tl >= ql:
            tt[:ql] = qq
            for _ in range(int(rng.integers(0, 4))):
                tt[int(rng.integers(0, ql))] = rng.integers(0, 4)
        cases.append((qq, tt, int(rng.integers(1, 60))))
    run_both(cases)


def test_narrow_band_and_zdrop():
    rng = np.random.default_rng(2)
    cases = []
    for _ in range(16):
        ql, tl = int(rng.integers(5, 40)), int(rng.integers(5, 60))
        cases.append((rng.integers(0, 4, ql), rng.integers(0, 4, tl),
                      int(rng.integers(10, 50))))
    run_both(cases, w=3)
    run_both(cases, zdrop=5)


def test_ambiguous_and_indels():
    rng = np.random.default_rng(3)
    cases = []
    for _ in range(8):
        ql, tl = int(rng.integers(5, 30)), int(rng.integers(5, 40))
        cases.append((rng.integers(0, 5, ql), rng.integers(0, 5, tl),
                      int(rng.integers(10, 40))))
    for _ in range(8):
        tl = int(rng.integers(30, 60))
        tt = rng.integers(0, 4, tl)
        p = int(rng.integers(5, tl - 8))
        qq = np.concatenate([tt[:p], tt[p + 3 :]])
        cases.append((qq, tt, int(rng.integers(20, 60))))
    run_both(cases)


def test_block_padding():
    # a batch size not divisible by the 8-lane block exercises padding
    rng = np.random.default_rng(4)
    cases = [
        (rng.integers(0, 4, 20), rng.integers(0, 4, 30), 25)
        for _ in range(11)
    ]
    run_both(cases)
