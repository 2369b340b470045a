"""CPU BWA-MEM oracle tests: seeding, chaining, full pipeline behavior."""

import numpy as np
import pytest

from bioseqdb_tpu.align.options import AlignOptions
from bioseqdb_tpu.cpu import oracle as O
from bioseqdb_tpu.cpu.ksw import cigar_to_string
from bioseqdb_tpu.index.builder import build_index
from bioseqdb_tpu.utils.sim import simulate_genome, simulate_reads

LUT = np.zeros(256, np.uint8)
for _i, _c in enumerate(b"ACGT"):
    LUT[_c] = _i
LUT[ord("N")] = 4


def enc(s: str) -> np.ndarray:
    return LUT[np.frombuffer(s.encode(), np.uint8)]


RC = {"A": "T", "C": "G", "G": "C", "T": "A"}


def rc(s: str) -> str:
    return "".join(RC[c] for c in reversed(s))


@pytest.fixture(scope="module")
def setup():
    g = simulate_genome(20_000, seed=1)
    return g, build_index([("ref", g)]), AlignOptions()


# -- SMEM seeding ----------------------------------------------------------


def naive_smems(S: np.ndarray, q: np.ndarray, min_len: int = 1):
    """Brute-force supermaximal exact matches of q in S."""
    n, m = len(S), len(q)

    def count(sub):
        if len(sub) == 0 or (sub >= 4).any():
            return 0
        c = 0
        for i in range(n - len(sub) + 1):
            if np.array_equal(S[i : i + len(sub)], sub):
                c += 1
        return c

    # maximal exact matches: [b, e) occurs but neither [b-1, e) nor [b, e+1)
    mems = []
    for b in range(m):
        for e in range(b + min_len, m + 1):
            if count(q[b:e]) == 0:
                continue
            left_ext = b > 0 and count(q[b - 1 : e]) > 0
            right_ext = e < m and count(q[b : e + 1]) > 0
            if not left_ext and not right_ext:
                mems.append((b, e, count(q[b:e])))
    # dedupe + drop contained
    out = []
    for b, e, c in sorted(set(mems)):
        if not any(b >= b2 and e <= e2 and (b, e) != (b2, e2) for b2, e2, _ in mems):
            out.append((b, e, c))
    return out


def test_smems_match_brute_force():
    # round-1 seeding only: smem1 must produce exactly the brute-force
    # supermaximal exact matches (rounds 2-3 intentionally add sub-MEMs)
    rng = np.random.default_rng(7)
    pac = rng.integers(0, 4, size=400, dtype=np.uint8)
    idx = build_index([("r", "".join("ACGT"[c] for c in pac))])
    S = np.concatenate([pac, (3 - pac)[::-1]])
    for trial in range(15):
        q = rng.integers(0, 4, size=20, dtype=np.uint8)
        mems = []
        x = 0
        while x < len(q):
            x, found = O.smem1(idx, q, x, min_intv=1)
            mems.extend(found)
        got = sorted((m.start, m.end, m.s) for m in mems)
        want = naive_smems(S, q)
        assert got == want, (trial, got, want)


def test_smem_pivot_advance_and_ambiguity(setup):
    g, idx, _ = setup
    q = enc(g[100:150] + "N" + g[300:350])
    opt = AlignOptions(min_seed_len=19, max_mem_intv=0)
    mems, _ = O.collect_intv(idx, opt, q)
    # two seeds, split at the N
    spans = [(m.start, m.end) for m in mems]
    assert (0, 50) in spans and (51, 101) in spans


# -- full pipeline ---------------------------------------------------------


def test_exact_reads_both_strands(setup):
    g, idx, opt = setup
    sim = simulate_reads(g, 12, read_len=100, seed=2)
    for r, p, s in zip(sim.reads, sim.positions, sim.strands):
        a = O.align_read(idx, opt, enc(r))[0]
        assert (a.pos, a.is_rev) == (p, bool(s))
        assert cigar_to_string(a.cigar) == "100M"
        assert a.NM == 0 and a.score == 100 and a.mapq == 60
        assert a.flag & 0x100 == 0


def test_substituted_reads_map_with_correct_nm(setup):
    g, idx, opt = setup
    sim = simulate_reads(g, 12, read_len=150, sub_rate=0.03, seed=3)
    for r, p, s, k in zip(sim.reads, sim.positions, sim.strands, sim.n_subs):
        a = O.align_read(idx, opt, enc(r))[0]
        assert (a.pos, a.is_rev) == (p, bool(s))
        # NM == planted substitutions unless the aligner clipped an
        # end-proximal mismatch (legal local alignment)
        assert a.NM <= k


def test_deletion_cigar(setup):
    g, idx, opt = setup
    a = O.align_read(idx, opt, enc(g[5000:5060] + g[5063:5103]))[0]
    assert cigar_to_string(a.cigar) == "60M3D40M"
    assert a.pos == 5000 and a.NM == 3
    assert a.score == 100 - (6 + 3 * 1)


def test_insertion_cigar(setup):
    g, idx, opt = setup
    a = O.align_read(idx, opt, enc(g[5000:5050] + "ACGT" + g[5050:5096]))[0]
    assert cigar_to_string(a.cigar) == "50M4I46M"
    assert a.pos == 5000 and a.NM == 4


def test_reverse_strand_indel_reports_forward_cigar(setup):
    g, idx, opt = setup
    a = O.align_read(idx, opt, enc(rc(g[5000:5060] + g[5063:5103])))[0]
    assert a.is_rev and a.flag & 0x10
    assert cigar_to_string(a.cigar) == "60M3D40M"
    assert a.pos == 5000


def test_soft_clipping_of_junk_prefix(setup):
    g, idx, opt = setup
    junk = "".join("ACGT"[i % 4] for i in range(20))
    a = O.align_read(idx, opt, enc(junk + g[8000:8080]))[0]
    cig = a.cigar
    assert cig[0][1] == "S" and cig[0][0] >= 18
    assert a.pos + 0 >= 7998


def test_repeat_secondary_and_mapq_zero():
    core = simulate_genome(3000, seed=5)
    rep = simulate_genome(300, seed=6)
    g2 = core[:1000] + rep + core[1000:2000] + rep + core[2000:]
    idx2 = build_index([("rep", g2)])
    alns = O.align_read(idx2, AlignOptions(), enc(rep[50:200]))
    assert len(alns) == 2
    assert alns[0].flag & 0x100 == 0 and alns[0].mapq == 0
    assert alns[1].flag & 0x100
    assert sorted(a.pos for a in alns) == [1050, 2350]


def test_min_score_threshold(setup):
    g, idx, opt = setup
    # 25bp exact fragment embedded in 100bp junk-free read scores 25 < 30
    frag = g[4000:4025]
    a = O.align_read(idx, opt, enc(frag), min_score=30)
    assert a == [] or all(x.score >= 30 for x in a)


def test_chain_and_weight_basics(setup):
    g, idx, opt = setup
    q = enc(g[1000:1150])
    chains = O.mem_chain(idx, opt, q)
    assert len(chains) >= 1
    best = max(chains, key=lambda c: O.chain_weight(c))
    assert O.chain_weight(best) == 150  # full-length exact chain


def test_mark_primary_sub_scores():
    regs = [
        O.AlnReg(qb=0, qe=100, rb=0, re=100, score=100),
        O.AlnReg(qb=0, qe=100, rb=500, re=600, score=80),
        O.AlnReg(qb=0, qe=100, rb=900, re=1000, score=60),
    ]
    opt = AlignOptions()
    out = O.mark_primary(opt, regs)
    assert out[0].secondary == -1 and out[0].sub == 80
    assert out[1].secondary == 0 and out[2].secondary == 0


def test_mapq_monotone_in_gap():
    opt = AlignOptions()
    base = dict(qb=0, qe=150, rb=0, re=150)
    m = [
        O.approx_mapq(opt, O.AlnReg(**base, score=150, sub=s))
        for s in (0, 100, 140, 149)
    ]
    assert m[0] == 60
    assert m == sorted(m, reverse=True)
    assert O.approx_mapq(opt, O.AlnReg(**base, score=100, sub=100)) == 0


def test_seed_sw_filter_guard():
    """mem_flt_chained_seeds' activation guard: inactive for short
    queries, active for ~>=900bp (defaults); min_chain_weight overrides."""
    from bioseqdb_tpu.align.options import AlignOptions
    from bioseqdb_tpu.cpu.oracle import seed_sw_filter_active

    opt = AlignOptions()
    assert not seed_sw_filter_active(opt, 150)
    assert not seed_sw_filter_active(opt, 500)
    assert seed_sw_filter_active(opt, 1000)
    assert seed_sw_filter_active(opt, 5000)
    opt2 = AlignOptions(min_chain_weight=10)
    # 1.1*10 = 11 <= 0.05*l  =>  l >= 220
    assert not seed_sw_filter_active(opt2, 200)
    assert seed_sw_filter_active(opt2, 240)


def test_local_sw_score_basics():
    import numpy as np

    from bioseqdb_tpu.cpu.ksw import fill_scmat
    from bioseqdb_tpu.cpu.oracle import local_sw_score

    mat = fill_scmat(1, 4)
    q = np.array([0, 1, 2, 3, 0, 1, 2, 3], np.uint8)
    assert local_sw_score(q, q, mat, 6, 1, 6, 1) == 8
    # one mismatch in the middle: best local score = longest clean run
    t = q.copy(); t[4] = 3
    assert local_sw_score(q, t, mat, 6, 1, 6, 1) == 4
    # deletion of one base: 8 matches minus one gap open+ext vs 4-run
    t2 = np.concatenate([q[:4], q[5:]])
    assert local_sw_score(q, t2, mat, 6, 1, 6, 1) == max(7 - 7, 4)


def test_long_read_end_to_end():
    """A 1200bp mutated read goes through mem_align1 with the seed-SW
    filter active and still lands at the truth position."""
    import numpy as np

    from bioseqdb_tpu.align.options import AlignOptions
    from bioseqdb_tpu.cpu import oracle as O
    from bioseqdb_tpu.index.builder import build_index
    from bioseqdb_tpu.seq.codec import CODE_OF
    from bioseqdb_tpu.utils.sim import simulate_genome

    genome = simulate_genome(50_000, seed=41)
    idx = build_index([("g", genome)])
    opt = AlignOptions()
    rng = np.random.default_rng(7)
    pos = 13000
    frag = list(genome[pos:pos + 1200])
    for j in rng.integers(0, 1200, 24):
        frag[j] = "ACGT"[rng.integers(0, 4)]
    q = CODE_OF[np.frombuffer("".join(frag).encode(), np.uint8)]
    assert O.seed_sw_filter_active(opt, len(q))
    regs = O.mem_align1(idx, opt, q)
    regs = [r for r in regs if r.secondary < 0]
    assert regs and abs(regs[0].rb - pos) <= 4
