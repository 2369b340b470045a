"""Device (JAX) FM ops must agree bit-for-bit with the numpy reference."""

import numpy as np
import pytest

import jax.numpy as jnp

from bioseqdb_tpu.index.fmindex import build_fmindex_from_codes
from bioseqdb_tpu.kernels import fm as kfm


@pytest.fixture(scope="module")
def pair():
    rng = np.random.default_rng(21)
    pac = rng.integers(0, 4, size=700, dtype=np.uint8)
    idx = build_fmindex_from_codes(pac)
    return idx, kfm.FMDevice.from_host(idx)


def test_occ_stored_agrees(pair):
    idx, fm = pair
    rng = np.random.default_rng(1)
    js = rng.integers(0, idx.seq_len + 1, size=256).astype(np.int32)
    cs = rng.integers(0, 4, size=256).astype(np.int32)
    got = np.asarray(kfm.occ_stored(fm, jnp.asarray(cs), jnp.asarray(js)))
    want = np.array([idx.occ_stored(c, j) for c, j in zip(cs, js)])
    assert np.array_equal(got, want)


def test_occ4_agrees(pair):
    idx, fm = pair
    rng = np.random.default_rng(2)
    rs = rng.integers(0, idx.seq_len + 2, size=128).astype(np.int32)
    got = np.asarray(kfm.occ4B(fm, jnp.asarray(rs)))
    want = np.array([[idx.occB(c, r) for c in range(4)] for r in rs])
    assert np.array_equal(got, want)


def test_backward_search_agrees(pair):
    idx, fm = pair
    rng = np.random.default_rng(3)
    W = 24
    B = 64
    codes = np.full((B, W), 4, dtype=np.int32)
    lens = rng.integers(1, W + 1, size=B).astype(np.int32)
    S = np.concatenate([idx.pac, (3 - idx.pac)[::-1]])
    for i in range(B):
        if rng.random() < 0.6:
            st = int(rng.integers(0, idx.seq_len - lens[i]))
            codes[i, : lens[i]] = S[st : st + lens[i]]
        else:
            codes[i, : lens[i]] = rng.integers(0, 4, size=lens[i])
    # one read with an ambiguous base
    codes[0, lens[0] // 2] = 4
    lo, hi = kfm.backward_search(fm, jnp.asarray(codes), jnp.asarray(lens))
    lo, hi = np.asarray(lo), np.asarray(hi)
    for i in range(B):
        want = idx.backward_search(codes[i, : lens[i]])
        assert (lo[i], hi[i]) == want, i


def test_fmd_extend_agrees(pair):
    idx, fm = pair
    rng = np.random.default_rng(4)
    S = np.concatenate([idx.pac, (3 - idx.pac)[::-1]])
    ks, ls, ss = [], [], []
    for _ in range(64):
        m = int(rng.integers(1, 10))
        st = int(rng.integers(0, idx.seq_len - m))
        pat = S[st : st + m]
        lo, hi = idx.backward_search(pat)
        rlo, _ = idx.backward_search((3 - pat)[::-1])
        ks.append(lo), ls.append(rlo), ss.append(hi - lo)
    k = jnp.asarray(np.array(ks, np.int32))
    l = jnp.asarray(np.array(ls, np.int32))
    s = jnp.asarray(np.array(ss, np.int32))
    for is_back in (True, False):
        k4, l4, s4 = (
            kfm.fmd_extend_back(fm, k, l, s)
            if is_back
            else kfm.fmd_extend_fwd(fm, k, l, s)
        )
        for i in range(64):
            wk, wl, ws = idx.fmd_extend(int(ks[i]), int(ls[i]), int(ss[i]), is_back)
            assert np.array_equal(np.asarray(k4)[i], wk), (is_back, i)
            assert np.array_equal(np.asarray(l4)[i], wl), (is_back, i)
            assert np.array_equal(np.asarray(s4)[i], ws), (is_back, i)


def test_sa_resolve_agrees(pair):
    idx, fm = pair
    rng = np.random.default_rng(5)
    ranks = rng.integers(1, idx.seq_len + 1, size=512).astype(np.int32)
    got = np.asarray(kfm.sa_resolve(fm, jnp.asarray(ranks)))
    want = np.array([idx.sa_at(r) for r in ranks])
    assert np.array_equal(got, want)


def test_depos_and_rid(pair):
    idx, fm = pair
    rng = np.random.default_rng(6)
    m = 20
    pos = rng.integers(0, idx.seq_len - m, size=100).astype(np.int32)
    fwd, rev = kfm.depos(fm, jnp.asarray(pos), m)
    for i, p in enumerate(pos):
        wf, wr = idx.depos(int(p), m)
        assert (int(np.asarray(fwd)[i]), bool(np.asarray(rev)[i])) == (wf, wr)


def test_rid_of_multi_ref():
    from bioseqdb_tpu.index.builder import build_index

    idx = build_index([("a", "ACGTACGTAA"), ("b", "TTTTCCCC"), ("c", "GG" * 30)])
    fm = kfm.FMDevice.from_host(idx)
    pos = jnp.asarray(np.array([0, 9, 10, 17, 18, 77], np.int32))
    got = list(np.asarray(kfm.rid_of(fm, pos)))
    assert got == [0, 0, 1, 1, 2, 2]


def test_major_checkpoints_engaged(monkeypatch):
    """Force a tiny major span so the major/minor checkpoint split is
    exercised at small scale on both host and device paths."""
    import bioseqdb_tpu.index.fmindex as fmx
    import bioseqdb_tpu.kernels.fm as kfm2

    monkeypatch.setattr(fmx, "MAJOR_BLOCKS", 4)
    monkeypatch.setattr(kfm2, "MAJOR_BLOCKS", 4)
    monkeypatch.setattr(kfm2, "_LOG2_MAJOR", 2)
    rng = np.random.default_rng(55)
    pac = rng.integers(0, 4, size=3000, dtype=np.uint8)  # ~47 blocks -> 12 majors
    idx = fmx.build_fmindex_from_codes(pac)
    assert idx.occ_majors.shape[0] > 1 and (np.asarray(idx.occ_majors) != 0).any()
    # host ops vs naive
    S = np.concatenate([pac, (3 - pac)[::-1]])
    for _ in range(20):
        m = int(rng.integers(1, 14))
        st = int(rng.integers(0, len(S) - m))
        pat = S[st : st + m]
        lo, hi = idx.backward_search(pat)
        naive = sum(
            1 for i in range(len(S) - m + 1)
            if np.array_equal(S[i : i + m], pat)
        )
        assert hi - lo == naive
    # device ops agree
    fm = kfm2.FMDevice.from_host(idx)
    ranks = jnp.asarray(rng.integers(1, idx.seq_len + 1, 128).astype(np.int32))
    got = np.asarray(kfm2.sa_resolve(fm, ranks))
    want = np.array([idx.sa_at(int(r)) for r in np.asarray(ranks)])
    assert np.array_equal(got, want)


def test_int64_rank_dtype_path(pair):
    """Forced int64 rank arrays (the >2^31-index configuration) must
    produce identical results to the int32 path."""
    import jax
    from jax import enable_x64

    idx, fm32 = pair
    with enable_x64():
        fm64 = kfm.FMDevice.from_host(idx, rank_dtype=jnp.int64)
        assert fm64.sa_sample.dtype == jnp.int64
        assert fm64.blocks.dtype == jnp.int32  # tables stay int32
        rng = np.random.default_rng(8)
        rs = jnp.asarray(rng.integers(0, idx.seq_len + 1, 64), jnp.int64)
        got = np.asarray(kfm.occ4B(fm64, rs))
        want = np.asarray(kfm.occ4B(fm32, rs.astype(jnp.int32)))
        assert np.array_equal(got, want)
        ranks = jnp.asarray(rng.integers(1, idx.seq_len + 1, 128), jnp.int64)
        got = np.asarray(kfm.sa_resolve(fm64, ranks))
        want = np.asarray(kfm.sa_resolve(fm32, ranks.astype(jnp.int32)))
        assert np.array_equal(got, want)
        codes = jnp.asarray(rng.integers(0, 4, (16, 20)), jnp.int32)
        lens = jnp.full(16, 20, jnp.int32)
        lo64, hi64 = kfm.backward_search(fm64, codes, lens)
        assert lo64.dtype == jnp.int64
    lo32, hi32 = kfm.backward_search(fm32, codes, lens)
    assert np.array_equal(np.asarray(lo64), np.asarray(lo32))
    assert np.array_equal(np.asarray(hi64), np.asarray(hi32))


def test_big_index_requires_x64_guard():
    import types

    fake = types.SimpleNamespace(seq_len=2**31, L2=None)
    with pytest.raises(ValueError, match="enable x64"):
        kfm.FMDevice.from_host(fake)


def test_sa_resolve_fused_walk_boundaries():
    # the unsharded sa_resolve decodes the SA-mark bit from the SAME
    # octo row as the LF fetch; lanes where rank r and j = r - (r >
    # primary) fall in different 1024-rank rows take the flat-bitmap
    # fallback. Exercise every rank around each 1024 boundary and
    # around primary against the host ground truth.
    rng = np.random.default_rng(33)
    pac = rng.integers(0, 4, size=40_000, dtype=np.uint8)
    idx = build_fmindex_from_codes(pac)
    fm = kfm.FMDevice.from_host(idx)
    n = idx.seq_len
    ranks = []
    for b in range(1024, n, 1024):
        ranks.extend(range(b - 2, b + 3))
    ranks.extend(range(max(idx.primary - 2, 0), min(idx.primary + 3, n)))
    ranks.extend(rng.integers(0, n, size=512).tolist())
    ranks = np.array([r for r in ranks if 0 <= r < n], np.int64)
    got = np.asarray(kfm.sa_resolve(fm, jnp.asarray(ranks),
                                    idx.sa_interval))
    want = np.array([idx.sa_at(int(r)) for r in ranks])
    assert np.array_equal(got, want)
