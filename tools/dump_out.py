"""Dump a device-pipeline output dict + read batch to .npz for host-side
finalize profiling (tools/profile_finalize2.py)."""
import sys; sys.path.insert(0, "/root/repo")  # noqa: E702
import pickle
import time


def main():
    import jax
    import numpy as np

    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from bioseqdb_tpu.align.options import AlignOptions
    from bioseqdb_tpu.align.pipeline import Aligner
    from bioseqdb_tpu.index.builder import build_index
    from bioseqdb_tpu.io.batch import pack_reads
    from bioseqdb_tpu.utils.sim import simulate_genome, simulate_reads

    B = int(sys.argv[1]) if len(sys.argv) > 1 else 16384
    path = sys.argv[2] if len(sys.argv) > 2 else "/tmp/out16k.pkl"
    genome = simulate_genome(4_600_000, seed=1)
    idx = build_index([("ecoli", genome)])
    al = Aligner.build(idx, AlignOptions(), mode="full")
    sim = simulate_reads(genome, B, read_len=150, sub_rate=0.01, seed=100)
    batch = pack_reads(sim.reads, sim.names)
    t0 = time.time()
    out = jax.device_get(al.device_regions(batch))
    print(f"device+get {time.time()-t0:.1f}s", file=sys.stderr)
    out = jax.tree.map(np.asarray, out)
    with open(path, "wb") as f:
        pickle.dump(dict(out=out, codes=batch.codes, lens=batch.lens,
                         names=batch.names, B=B), f)
    print("saved", path, file=sys.stderr)


main()
