import sys; sys.path.insert(0, "/root/repo")
import os, time
import numpy as np
def run(jax, al, idx, batches, sims, pack):
    from bioseqdb_tpu.align.finalize import finalize_batch
    out = jax.device_get(al.device_regions(batches[0], pack=pack))
    finalize_batch(idx, al.options, batches[0], out)
    t0 = time.time()
    pending = al.device_regions(batches[0], pack=pack)
    results = []
    n = len(batches)
    for k in range(n):
        nxt = al.device_regions(batches[k + 1], pack=pack) if k + 1 < n else None
        out = jax.device_get(pending)
        results.append(finalize_batch(idx, al.options, batches[k], out))
        pending = nxt
    return 8192 * n / (time.time() - t0)
def main():
    import jax
    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    from bioseqdb_tpu.align.options import AlignOptions
    from bioseqdb_tpu.align.pipeline import Aligner
    from bioseqdb_tpu.index.builder import build_index
    from bioseqdb_tpu.io.batch import pack_reads
    from bioseqdb_tpu.utils.sim import simulate_genome, simulate_reads
    genome = simulate_genome(4_600_000, seed=1)
    idx = build_index([("ecoli", genome)])
    al = Aligner.build(idx, AlignOptions(), mode="full")
    batches, sims = [], []
    for k in range(6):
        sim = simulate_reads(genome, 8192, read_len=150, sub_rate=0.01, seed=100 + k)
        sims.append(sim); batches.append(pack_reads(sim.reads, sim.names))
    for rep in range(3):
        for pack in (False, True):
            r = run(jax, al, idx, batches, sims, pack)
            print("rep%d pack=%s: %d reads/s" % (rep, pack, r), file=sys.stderr, flush=True)
main()
