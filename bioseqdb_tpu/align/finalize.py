"""Host finalization of device-produced candidate regions.

The tail of the per-read pipeline that the reference runs inside
mem_align1/mem_reg2aln (bwa.cpp:149-181): redundancy dedup + colinear
patching, primary/secondary marking, MAPQ, and CIGAR/NM generation via
banded global alignment. Runs on host over the compact region tables
the device pipeline emits (a handful of rows per read); reads flagged
``overflow`` by any device stage fall back to the full host oracle.

Determinism: the reference seeds its primary-marking hash tie-break
with lrand48(); here each read uses its stable batch row id, so results
are reproducible run-to-run and match `cpu.oracle.align_read(rand_id=row)`.
"""

from __future__ import annotations

import numpy as np

from bioseqdb_tpu.align.options import AlignOptions
from bioseqdb_tpu.align.result import Hit, ReadResult
from bioseqdb_tpu.cpu import oracle as O
from bioseqdb_tpu.cpu.ksw import cigar_to_string, fill_scmat
from bioseqdb_tpu.index.fmindex import FMIndex
from bioseqdb_tpu.io.batch import ReadBatch


def frac_rep_of(mems: np.ndarray, n_mem: int, max_occ: int, l_query: int) -> float:
    """Repetitive-coverage fraction from the seed intervals
    (mem_chain's l_rep computation over sorted intervals)."""
    if n_mem == 0 or l_query == 0:
        return 0.0
    rows = mems[:n_mem]
    rows = rows[np.lexsort((rows[:, 4], rows[:, 3]))]
    b = e = l_rep = 0
    for k, l, s, start, end in rows:
        if s <= max_occ:
            continue
        if start > e:
            l_rep += e - b
            b, e = int(start), int(end)
        else:
            e = max(e, int(end))
    l_rep += e - b
    return l_rep / l_query


def regions_to_alnregs(out: dict, i: int, frac_rep: float) -> list[O.AlnReg]:
    regs = []
    r = out["regs"]
    for j in range(int(out["n_regs"][i])):
        regs.append(
            O.AlnReg(
                rb=int(r["rb"][i, j]), re=int(r["re"][i, j]),
                qb=int(r["qb"][i, j]), qe=int(r["qe"][i, j]),
                score=int(r["score"][i, j]), truesc=int(r["truesc"][i, j]),
                w=int(r["w"][i, j]), seedlen0=int(r["seedlen0"][i, j]),
                seedcov=int(r["seedcov"][i, j]), frac_rep=frac_rep,
                rid=int(r["rid"][i, j]),
            )
        )
    return regs


def aln_to_hit(
    idx: FMIndex, aln: O.Aln, reg: O.AlnReg, name: str,
    query_id: int | None,
) -> Hit:
    ref_consumed = sum(n for n, op in aln.cigar if op in "MD")
    return Hit(
        ref_id=int(idx.ref_ids[aln.rid]) if len(idx.ref_ids) else aln.rid,
        ref_name=idx.ref_names[aln.rid],
        ref_begin=aln.pos,
        ref_end=aln.pos + ref_consumed,
        query_id=query_id,
        query_name=name,
        query_begin=reg.qb,
        query_end=reg.qe,
        is_primary=reg.secondary < 0,
        is_secondary=reg.secondary >= 0,
        is_reverse=aln.is_rev,
        cigar=cigar_to_string(aln.cigar),
        score=aln.score,
        mapq=aln.mapq,
        nm=aln.NM,
        md=aln.MD,
        rid=aln.rid,
    )


def finalize_read(
    idx: FMIndex, opt: AlignOptions, q: np.ndarray, regs: list[O.AlnReg],
    mat: np.ndarray, rand_id: int, name: str, query_id: int | None,
    all_hits: bool = True,
) -> ReadResult:
    regs = O.sort_dedup_patch(idx, opt, q, regs, mat)
    if len(idx.ref_is_alt):
        for r in regs:
            if 0 <= r.rid < len(idx.ref_is_alt):
                r.is_alt = bool(idx.ref_is_alt[r.rid])
    regs = O.mark_primary(opt, regs, rand_id)
    return emit_read_hits(idx, opt, q, regs, mat, name, query_id, all_hits)


def emit_read_hits(
    idx: FMIndex, opt: AlignOptions, q: np.ndarray, regs: list[O.AlnReg],
    mat: np.ndarray, name: str, query_id: int | None, all_hits: bool = True,
) -> ReadResult:
    """Filter marked regions (min_score, XA_drop_ratio) and build the
    final per-read records — shared by the device path and the host
    oracle fallback so both apply identical output rules."""
    hits: list[Hit] = []
    xa: list[str] = []
    for r in regs:
        if r.score < opt.min_score:
            continue
        if r.secondary >= 0:
            # XA_drop_ratio gate relative to the primary it shadows
            prim = regs[r.secondary]
            if r.score < prim.score * opt.xa_drop_ratio:
                continue
            if not all_hits:
                # bwa-mem default output: alternates go to the primary's
                # XA:Z: tag instead of separate records
                aln = O.reg2aln(idx, opt, q, r, mat)
                from bioseqdb_tpu.cpu.ksw import cigar_to_string

                strand = "-" if aln.is_rev else "+"
                xa.append(
                    f"{idx.ref_names[aln.rid]},{strand}{aln.pos + 1},"
                    f"{cigar_to_string(aln.cigar)},{aln.NM}"
                )
                continue
        aln = O.reg2aln(idx, opt, q, r, mat)
        hits.append(aln_to_hit(idx, aln, r, name, query_id))
    # non-first primary parts of a chimeric read are supplementary
    # (mem_reg2sam: `if (l && p->secondary < 0) flag |= 0x800`)
    seen_primary = False
    for h in hits:
        if not h.is_secondary:
            if seen_primary:
                h.is_supplementary = True
            seen_primary = True
    res = ReadResult(query_name=name, hits=hits)
    if xa and hits and len(xa) <= opt.max_xa_hits:
        hits[0].xa = ";".join(xa) + ";"
    return res


def finalize_batch(
    idx: FMIndex, opt: AlignOptions, batch: ReadBatch, out: dict,
    with_query_ids: bool = True, all_hits: bool = True,
) -> list[ReadResult]:
    mat = fill_scmat(opt.match_score, opt.mismatch_penalty)
    max_occ = opt.resolve_max_occ(idx.n_refs)
    results: list[ReadResult] = []
    for i, name in enumerate(batch.names):
        q = batch.codes[i, : batch.lens[i]].astype(np.uint8)
        qid = i if with_query_ids else None
        if out["overflow"][i]:
            # device caps exceeded: run the whole read on the host oracle,
            # then apply the same output rules as the device path
            regs = O.mem_align1(idx, opt, q, rand_id=i)
            results.append(
                emit_read_hits(idx, opt, q, regs, mat, name, qid, all_hits)
            )
            continue
        frac = frac_rep_of(out["mems"][i], int(out["n_mem"][i]), max_occ,
                           int(batch.lens[i]))
        regs = regions_to_alnregs(out, i, frac)
        results.append(
            finalize_read(idx, opt, q, regs, mat, i, name, qid, all_hits)
        )
    return results
