"""Dev harness for the kmer seeder: minimizer-selection parity
(device vs host brute), then round-1/3 mems parity vs the oracle's
collect_intv, on small CPU cases.

    PYTHONPATH=. JAX_PLATFORMS=cpu python tools/dev_kmer_check.py
"""
import sys; sys.path.insert(0, __file__.rsplit("/", 2)[0])  # noqa: E702
import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")

import numpy as np


def log(*a):
    print("[dev]", *a, flush=True)


def check_minimizer_parity(rng):
    """One fixed-shape batched device call vs per-row brute argmin
    (hash arrays crafted to cover ties, UMAX runs, monotone runs)."""
    import jax.numpy as jnp
    from bioseqdb_tpu.kernels import kmer as km

    B, NP = 512, 160
    UMAX = np.uint32(0xFFFFFFFF)
    h = rng.integers(0, 1 << 32, (B, NP), dtype=np.uint32)
    h[:64] = rng.integers(0, 4, (64, NP), dtype=np.uint32)  # heavy ties
    h[64:96] = np.sort(h[64:96], axis=1)                    # monotone up
    h[96:128] = np.sort(h[96:128], axis=1)[:, ::-1]         # monotone down
    h[128:160, :] = 7                                       # constant
    for i in range(160, 256):  # UMAX (ambiguous) runs
        a, b = sorted(rng.integers(0, NP, 2))
        h[i, a : b + 1] = UMAX
    h[256] = UMAX
    NW = NP - km.WIN + 1
    sel_dev = np.asarray(km._select_minimizers(jnp.asarray(h), NW))
    for i in range(B):
        sel_brute = np.zeros(NP, bool)
        for s in range(NW):
            sel_brute[s + int(np.argmin(h[i, s : s + km.WIN]))] = True
        assert (sel_dev[i] == sel_brute).all(), (
            i, np.flatnonzero(sel_dev[i] != sel_brute))
    log(f"minimizer parity: {B} rows ok")


def mems_from_oracle(idx, opt, q):
    """(r1+r3) mems the oracle produces, with round-2 separated out."""
    from bioseqdb_tpu.cpu import oracle as O

    length = len(q)
    split_len = int(opt.min_seed_len * opt.reseed_factor + 0.499)
    r1 = []
    x = 0
    while x < length:
        if q[x] < 4:
            x, found = O.smem1(idx, q, x, min_intv=1)
            for p in found:
                if p.end - p.start >= opt.min_seed_len:
                    r1.append(p)
        else:
            x += 1
    r2 = []
    for p in list(r1):
        if p.end - p.start < split_len or p.s > opt.split_width:
            continue
        _, found = O.smem1(idx, q, (p.start + p.end) >> 1, min_intv=p.s + 1)
        for m in found:
            if m.end - m.start >= opt.min_seed_len:
                r2.append(m)
    r3 = []
    if opt.max_mem_intv > 0:
        x = 0
        while x < length:
            if q[x] < 4:
                x, m = O.seed_strategy1(idx, q, x, opt.min_seed_len,
                                        opt.max_mem_intv)
                if m is not None:
                    r3.append(m)
            else:
                x += 1
    return r1, r2, r3


def check_mems_parity(rng, glen=80_000, n_reads=160, plant_repeats=0,
                      n_frac=0.0, label=""):
    import jax
    import jax.numpy as jnp

    from bioseqdb_tpu.align.options import AlignOptions
    from bioseqdb_tpu.index.builder import build_index
    from bioseqdb_tpu.io.batch import pack_reads
    from bioseqdb_tpu.kernels import kmer as km
    from bioseqdb_tpu.kernels.extend import pack_doubled_rows
    from bioseqdb_tpu.utils.sim import simulate_genome, simulate_reads

    g = simulate_genome(glen, seed=int(rng.integers(1 << 30)),
                        n_frac=n_frac)
    if plant_repeats:
        gl = list(g)
        for _ in range(plant_repeats):
            ln = int(rng.integers(20, 120))
            src = int(rng.integers(0, glen - ln))
            dst = int(rng.integers(0, glen - ln))
            gl[dst : dst + ln] = gl[src : src + ln]
        g = "".join(gl)
    idx = build_index([("g", g)])
    opt = AlignOptions()
    host, meta = km.build_kmer_table(idx.pac)
    kt = km.KmerTable(bmeta=jnp.asarray(host["bmeta"]),
                      entries=jnp.asarray(host["entries"]))
    pac_dev = jnp.asarray(idx.packed_doubled_rows(pack_doubled_rows))

    sim = simulate_reads(g, n_reads, read_len=150, sub_rate=0.02,
                         seed=int(rng.integers(1 << 30)))
    reads = list(sim.reads)
    # adversarial extras: N runs, unmappable, short
    reads[0] = reads[0][:40] + "N" * 7 + reads[0][47:]
    reads[1] = "".join(rng.choice(list("ACGT"), 150))
    reads[2] = reads[2][:21]
    reads[3] = "N" * 150
    batch = pack_reads(reads, [f"r{i}" for i in range(len(reads))])

    split_len = int(opt.min_seed_len * opt.reseed_factor + 0.499)
    out = jax.device_get(km.collect_seeds_kmer(
        kt, pac_dev, idx.seq_len, jnp.asarray(batch.codes, jnp.int32),
        jnp.asarray(batch.lens, jnp.int32), bb=meta.bb,
        min_seed_len=opt.min_seed_len, split_len=split_len,
        split_width=opt.split_width, max_mem_intv=opt.max_mem_intv,
        smax=km.smax_for(opt.max_mem_intv)))

    n_fb = n_r2 = 0
    for i in range(len(reads)):
        q = np.asarray(batch.codes[i, : batch.lens[i]], np.int64)
        r1, r2, r3 = mems_from_oracle(idx, opt, q)
        if out["overflow"][i]:
            n_fb += 1
            continue
        want = sorted([(p.start, p.end, p.s) for p in r1 + r3])
        want_pos = {}
        for p in r1 + r3:
            if p.s == 1:
                want_pos[(p.start, p.end)] = idx.sa_at(p.k)
        n = int(out["n_mem"][i])
        got = sorted(zip(out["mem_b"][i][:n], out["mem_e"][i][:n],
                         out["mem_s"][i][:n]))
        got_pos = {(int(b), int(e)): int(p) for b, e, p in
                   zip(out["mem_b"][i][:n], out["mem_e"][i][:n],
                       out["mem_pos"][i][:n])}
        assert [(int(a), int(b), int(c)) for a, b, c in got] == \
            [(a, b, c) for a, b, c in want], (
                label, i, got, want, "reads[i]=", reads[i])
        for kk, v in want_pos.items():
            assert got_pos[kk] == v, (label, i, kk, got_pos[kk], v)
        # r2 certificate: if the device says r2 is provably empty, the
        # oracle's round 2 must have emitted nothing
        if not out["needs_r2"][i]:
            assert not r2, (label, i, "missed r2 emissions", r2)
        else:
            n_r2 += 1
    log(f"mems parity [{label}]: {len(reads)} reads ok "
        f"(fallback {n_fb}, needs_r2 {n_r2})")
    return n_fb, n_r2


def check_r2_machine(rng, glen=60_000, n_reads=64):
    """Reseed-entry machine (collect_seeds_device entry_reseed) vs the
    oracle's round 2, on a genome dense with 20-60bp two-copy repeats
    (pivot certificates fail -> round 2 actually emits)."""
    import jax
    import jax.numpy as jnp

    from bioseqdb_tpu.align.options import AlignOptions
    from bioseqdb_tpu.index.builder import build_index
    from bioseqdb_tpu.io.batch import pack_reads
    from bioseqdb_tpu.kernels import kmer as km
    from bioseqdb_tpu.kernels.extend import pack_doubled_rows
    from bioseqdb_tpu.kernels.seed import collect_seeds_device
    from bioseqdb_tpu.utils.sim import simulate_genome, simulate_reads

    g = simulate_genome(glen, seed=int(rng.integers(1 << 30)))
    gl = list(g)
    dsts = []
    for _ in range(120):
        ln = int(rng.integers(20, 61))
        src = int(rng.integers(0, glen - ln))
        dst = int(rng.integers(200, glen - ln - 200))
        gl[dst : dst + ln] = gl[src : src + ln]
        dsts.append((dst, ln))
    g = "".join(gl)
    idx = build_index([("g", g)])
    opt = AlignOptions()
    host, meta = km.build_kmer_table(idx.pac)
    kt = km.KmerTable(bmeta=jnp.asarray(host["bmeta"]),
                      entries=jnp.asarray(host["entries"]))
    pac_dev = jnp.asarray(idx.packed_doubled_rows(pack_doubled_rows))
    sim = simulate_reads(g, n_reads, read_len=150, sub_rate=0.01,
                         seed=int(rng.integers(1 << 30)))
    reads = list(sim.reads)
    # crafted reads centered on planted repeat copies: the whole-read
    # SMEM's reseed pivot lands inside the repeat -> round 2 emits
    for dst, ln in dsts[:32]:
        c = dst + ln // 2
        reads.append(g[c - 75 : c + 75])
    n_reads = len(reads)
    batch = pack_reads(reads, [f"r{i}" for i in range(n_reads)])
    split_len = int(opt.min_seed_len * opt.reseed_factor + 0.499)
    codes = jnp.asarray(batch.codes, jnp.int32)
    lens = jnp.asarray(batch.lens, jnp.int32)
    ko = jax.device_get(km.collect_seeds_kmer(
        kt, pac_dev, idx.seq_len, codes, lens, bb=meta.bb,
        min_seed_len=opt.min_seed_len, split_len=split_len,
        split_width=opt.split_width, max_mem_intv=opt.max_mem_intv,
        smax=km.smax_for(opt.max_mem_intv)))
    from bioseqdb_tpu.kernels import fm as kfm

    fm = kfm.FMDevice.from_host(idx)
    M_tot = 16 + 8
    r2m = jax.device_get(collect_seeds_device(
        fm, codes, lens, min_seed_len=opt.min_seed_len,
        split_len=split_len, split_width=opt.split_width, max_mem_intv=0,
        jump_base=0, jump_depth=0, max_cand=16, max_mem=M_tot,
        entry_reseed=True,
        reseed_entry=dict(
            mem_s=jnp.asarray(ko["mem_s"]), mem_b=jnp.asarray(ko["mem_b"]),
            mem_e=jnp.asarray(ko["mem_e"]), n_mem=jnp.asarray(ko["n_mem"]),
            active=jnp.asarray(ko["needs_r2"]))))
    n_checked = n_emitting = 0
    for i in range(n_reads):
        if ko["overflow"][i] or r2m["overflow"][i]:
            continue
        q = np.asarray(batch.codes[i, : batch.lens[i]], np.int64)
        _, r2, _ = mems_from_oracle(idx, AlignOptions(), q)
        if not ko["needs_r2"][i]:
            assert not r2, (i, "cert said empty but oracle emitted", r2)
            continue
        n0, n1 = int(ko["n_mem"][i]), int(r2m["n_mem"][i])
        got = sorted(
            (int(r2m["mems"][i, j, 3]), int(r2m["mems"][i, j, 4]),
             int(r2m["mems"][i, j, 2]), int(r2m["mems"][i, j, 0]))
            for j in range(n0, n1))
        want = sorted((p.start, p.end, p.s, p.k) for p in r2)
        assert got == want, (i, got, want)
        n_checked += 1
        n_emitting += bool(r2)
    log(f"r2 machine: {n_checked} needs_r2 reads checked "
        f"({n_emitting} with emissions)")
    assert n_checked > 0, "test genome produced no needs_r2 reads"


def main():
    rng = np.random.default_rng(0)
    check_minimizer_parity(rng)
    check_mems_parity(rng, glen=80_000, label="random")
    check_mems_parity(rng, glen=80_000, plant_repeats=12, label="repeats")
    check_mems_parity(rng, glen=60_000, n_frac=0.02, label="n-holes")
    check_r2_machine(rng)
    log("ALL OK")


if __name__ == "__main__":
    main()
