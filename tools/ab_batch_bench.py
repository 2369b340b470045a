"""Interleaved A/B of pipeline batch sizes (steady-state reads/s,
overlapped host finalize) — run with the host otherwise idle."""
import sys; sys.path.insert(0, "/root/repo")
import time

def run(jax, al, idx, batches, B):
    from bioseqdb_tpu.align.finalize import finalize_batch
    out = jax.device_get(al.device_regions(batches[0]))
    finalize_batch(idx, al.options, batches[0], out)
    t0 = time.time()
    pending = al.device_regions(batches[0])
    n = len(batches)
    for k in range(n):
        nxt = al.device_regions(batches[k + 1]) if k + 1 < n else None
        out = jax.device_get(pending)
        finalize_batch(idx, al.options, batches[k], out)
        pending = nxt
    return B * n / (time.time() - t0)

def main():
    import jax
    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    from bioseqdb_tpu.align.options import AlignOptions
    from bioseqdb_tpu.align.pipeline import Aligner
    from bioseqdb_tpu.index.builder import build_index
    from bioseqdb_tpu.io.batch import pack_reads
    from bioseqdb_tpu.utils.sim import simulate_genome, simulate_reads
    sizes = [int(a) for a in sys.argv[1:]] or [8192, 16384]
    genome = simulate_genome(4_600_000, seed=1)
    idx = build_index([("ecoli", genome)])
    al = Aligner.build(idx, AlignOptions(), mode="full")
    per = {}
    for B in sizes:
        bs = []
        n = max(2, (8192 * 6) // B)
        for k in range(n):
            sim = simulate_reads(genome, B, read_len=150, sub_rate=0.01, seed=100 + k)
            bs.append(pack_reads(sim.reads, sim.names))
        per[B] = bs
    for rep in range(3):
        for B in sizes:
            r = run(jax, al, idx, per[B], B)
            print("rep%d B=%d: %d reads/s" % (rep, B, r), file=sys.stderr, flush=True)
main()
