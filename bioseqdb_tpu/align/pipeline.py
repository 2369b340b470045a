"""The align(reads, index) pipeline.

Replaces the reference's per-row SQL search loop
(``nuclseq_multi_search_bwa``, extension.cpp:345-378 — one
``mem_align1`` call per SPI row on one core) with a batched device
pipeline: reads stream in rectangular code batches, the whole batch
moves through backward search / SA resolution / coordinate rebase as a
single jitted program, and only the compact hit arrays return to the
host.

Currently implemented mode: exact-match seeding end-to-end
(BASELINE.md config 1). Full SMEM seeding + chaining + banded SW
extension land on top of the same step structure (SURVEY.md §7 stages
4-6).
"""

from __future__ import annotations

import functools
from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np

from bioseqdb_tpu.align.options import AlignOptions
from bioseqdb_tpu.align.result import Hit, ReadResult
from bioseqdb_tpu.index.fmindex import FMIndex
from bioseqdb_tpu.io.batch import ReadBatch, pack_reads
from bioseqdb_tpu.kernels import fm as kfm


@functools.partial(jax.jit, static_argnames=("max_hits",))
def exact_align_step(fm: kfm.FMDevice, codes, lens, max_hits: int):
    """Jitted exact-match alignment of one read batch.

    codes: int32[B, W], lens: int32[B]. Returns per-read hit arrays of
    width ``max_hits``: valid mask, rid, 0-based position within the
    reference, strand, plus the total interval size (for MAPQ/ambiguity).
    """
    lo, hi = kfm.backward_search(fm, codes, lens)
    n_hits = hi - lo
    h = jnp.arange(max_hits, dtype=jnp.int32)[None, :]
    valid = h < jnp.minimum(n_hits, max_hits)[:, None]
    ranks = jnp.where(valid, lo[:, None] + h, 1)  # 1 = safe dummy rank
    pos = kfm.sa_resolve(fm, ranks)
    fwd, rev = kfm.depos(fm, pos, lens[:, None])
    rid = kfm.rid_of(fm, fwd)
    ref_off = fm.ref_offsets[rid]
    ref_len = fm.ref_lens[rid]
    # drop hits bridging two concatenated references (bwa drops these too)
    inside = (fwd >= ref_off) & (fwd + lens[:, None] <= ref_off + ref_len)
    valid = valid & inside
    local = fwd - ref_off
    return dict(n_hits=n_hits, valid=valid, rid=rid, pos=local, rev=rev)


@dataclass
class Aligner:
    """Bound (index, options) ready to align read batches.

    The analogue of a built ``BwaIndex`` + applied ``bwa_options``
    (extension.cpp:211-236) — except the index is built once and reused,
    not rebuilt per call.
    """

    index: FMIndex
    options: AlignOptions
    fm: kfm.FMDevice

    @classmethod
    def build(cls, index: FMIndex, options: AlignOptions | None = None,
              device=None) -> "Aligner":
        return cls(
            index=index,
            options=options or AlignOptions(),
            fm=kfm.FMDevice.from_host(index, device=device),
        )

    def align_batch(self, batch: ReadBatch, max_hits: int | None = None,
                    with_query_ids: bool = True) -> list[ReadResult]:
        """Exact-match align a packed batch; returns per-read results."""
        if max_hits is None:
            max_hits = min(self.options.resolve_max_occ(self.index.n_refs), 64)
        out = exact_align_step(
            self.fm,
            jnp.asarray(batch.codes, jnp.int32),
            jnp.asarray(batch.lens, jnp.int32),
            max_hits,
        )
        return self._to_results(batch, jax.device_get(out), with_query_ids)

    def _to_results(self, batch: ReadBatch, out: dict,
                    with_query_ids: bool) -> list[ReadResult]:
        idx = self.index
        results: list[ReadResult] = []
        m = int(self.options.match_score)
        for i, name in enumerate(batch.names):
            L = int(batch.lens[i])
            hits: list[Hit] = []
            order = np.flatnonzero(out["valid"][i])
            n_hits = int(out["n_hits"][i])
            for j_rank, j in enumerate(order):
                rid = int(out["rid"][i, j])
                begin = int(out["pos"][i, j])
                hits.append(
                    Hit(
                        ref_id=int(idx.ref_ids[rid]) if len(idx.ref_ids) else rid,
                        ref_name=idx.ref_names[rid],
                        ref_begin=begin,
                        ref_end=begin + L,
                        query_id=i if with_query_ids else None,
                        query_name=name,
                        query_begin=0,
                        query_end=L,
                        is_primary=j_rank == 0,
                        is_secondary=j_rank != 0,
                        is_reverse=bool(out["rev"][i, j]),
                        cigar=f"{L}M",
                        score=m * L,
                        # exact mode: unique hit -> 60, ambiguous -> 0
                        # (full MEM MAPQ arrives with the SW pipeline)
                        mapq=60 if n_hits == 1 else 0,
                    )
                )
            results.append(ReadResult(query_name=name, hits=hits))
        return results


def align(reads, index: FMIndex, options: AlignOptions | None = None,
          max_hits: int | None = None) -> list[ReadResult]:
    """One-shot convenience: align sequences/ReadBatch against an index."""
    if not isinstance(reads, ReadBatch):
        reads = pack_reads(list(reads))
    return Aligner.build(index, options).align_batch(reads, max_hits=max_hits)
