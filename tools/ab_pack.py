import sys; sys.path.insert(0, "/root/repo")
import time
import numpy as np
def main():
    import jax, jax.numpy as jnp
    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    from bioseqdb_tpu.align.options import AlignOptions
    from bioseqdb_tpu.align.pipeline import Aligner
    from bioseqdb_tpu.index.builder import build_index
    from bioseqdb_tpu.io.batch import pack_reads
    from bioseqdb_tpu.utils.sim import simulate_genome, simulate_reads
    B = 8192
    genome = simulate_genome(4_600_000, seed=1)
    idx = build_index([("ecoli", genome)])
    al = Aligner.build(idx, AlignOptions(), mode="full")
    sim = simulate_reads(genome, B, read_len=150, sub_rate=0.01, seed=100)
    rb = pack_reads(sim.reads, sim.names)
    for pk in (False, True):
        out = jax.device_get(al.device_regions(rb, pack=pk))
        sz = sum(np.asarray(v).nbytes for v in jax.tree.leaves(out))
        for _ in range(3):
            t0 = time.time(); jax.device_get(al.device_regions(rb, pack=pk))
            print("pack=%s get %.1f ms (payload %.2f MB)" % (pk, 1000*(time.time()-t0), sz/1e6), file=sys.stderr)
main()
