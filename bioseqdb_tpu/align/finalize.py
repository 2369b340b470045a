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


def frac_rep_batch(mems: np.ndarray, n_mem: np.ndarray, max_occ: int,
                   lens: np.ndarray) -> np.ndarray:
    """Vectorized frac_rep_of over the whole batch: union length of the
    query spans of high-occurrence seed intervals."""
    B, M, _ = mems.shape
    mm = np.arange(M)[None, :]
    valid = (mm < n_mem[:, None]) & (mems[:, :, 2] > max_occ)
    start = np.where(valid, mems[:, :, 3], 1 << 20).astype(np.int64)
    end = np.where(valid, mems[:, :, 4], 1 << 20).astype(np.int64)
    key = start * (1 << 21) + end
    order = np.argsort(key, axis=1)
    ss = np.take_along_axis(start, order, axis=1)
    ee = np.take_along_axis(end, order, axis=1)
    vv = np.take_along_axis(valid, order, axis=1)
    run = np.maximum.accumulate(np.where(vv, ee, 0), axis=1)
    prev = np.concatenate([np.zeros((B, 1), np.int64), run[:, :-1]], axis=1)
    contrib = np.where(vv, np.maximum(ee - np.maximum(ss, prev), 0), 0)
    l_rep = contrib.sum(axis=1)
    return np.where(lens > 0, l_rep / np.maximum(lens, 1), 0.0)


def fast_fields(
    idx: FMIndex, opt: AlignOptions, batch: ReadBatch, out: dict,
    frac_rep: np.ndarray,
) -> dict:
    """Vectorized finalize fields for the dominant case: exactly one
    candidate region whose inferred band is zero and whose
    query/reference spans are equal — reg2aln then always emits an all-M
    CIGAR (w2 stays 0 through its retry loop), no dedup/patch/primary
    logic applies (single region), and NM/MD reduce to a mismatch walk.

    Must agree exactly with the per-read path (tests/test_finalize_fast).
    Returns a dict of per-row vectors with a ``fast`` eligibility mask;
    ``fast_hit``/SE & PE assemblers build Hits from it."""
    r = out["regs"]
    B = len(batch.names)
    n_regs = np.asarray(out["n_regs"])[:B]
    overflow = np.asarray(out["overflow"])[:B]
    lens = np.asarray(batch.lens).astype(np.int64)[:B]
    qb = np.asarray(r["qb"])[:B, 0].astype(np.int64)
    qe = np.asarray(r["qe"])[:B, 0].astype(np.int64)
    rb = np.asarray(r["rb"])[:B, 0].astype(np.int64)
    re = np.asarray(r["re"])[:B, 0].astype(np.int64)
    score = np.asarray(r["score"])[:B, 0].astype(np.int64)
    truesc = np.asarray(r["truesc"])[:B, 0].astype(np.int64)
    L = qe - qb
    a, b = opt.match_score, opt.mismatch_penalty
    # infer_bw == 0 for both gap-type parameterizations (oracle.infer_bw)
    bw0 = (
        (L * a - truesc < (opt.o_del + opt.e_del - a) << 1)
        & (L * a - truesc < (opt.o_ins + opt.e_ins - a) << 1)
    )
    fast = (
        (~overflow) & (n_regs == 1) & (L == (re - rb)) & (L > 0) & bw0
    )
    f = dict(fast=fast, L=L, qb=qb, qe=qe, rb=rb, re=re, score=score,
             frac_rep=np.asarray(frac_rep)[:B])
    if not fast.any():
        return f

    # ---- reference/query windows (qq, rr as reg2aln orients them) ----
    W = int(L.max())
    jcols = np.arange(W)[None, :]
    n = idx.seq_len
    is_rev = rb >= idx.l_pac
    rstart = np.where(is_rev, n - re, rb)
    rpos = np.clip(rstart[:, None] + jcols, 0, idx.l_pac - 1)
    rvals = np.asarray(idx.pac)[rpos].astype(np.int16)
    rr = np.where(is_rev[:, None], 3 - rvals, rvals)
    qpos = np.where(is_rev[:, None], qe[:, None] - 1 - jcols,
                    qb[:, None] + jcols)
    qq = np.take_along_axis(
        np.asarray(batch.codes)[:B], np.clip(qpos, 0, batch.codes.shape[1] - 1),
        axis=1,
    ).astype(np.int16)
    inwin = jcols < L[:, None]
    mism = inwin & ((qq != rr) | (qq > 3))
    nm = mism.sum(axis=1)

    # ---- MAPQ (approx_mapq with sub=csub=0, sub_n=0) ----
    sub = float(opt.min_seed_len * a)
    lmax = L.astype(np.float64)  # qe-qb == re-rb
    identity = 1.0 - (lmax * a - score) / (a + b) / np.maximum(lmax, 1)
    tmp = np.where(lmax < 50, 1.0, np.log(50) / np.log(np.maximum(lmax, 2)))
    tmp *= identity * identity
    mapq = np.floor(6.02 * (score - sub) / a * tmp * tmp + 0.499)
    mapq = np.clip(mapq, 0, 60)
    mapq = np.floor(mapq * (1.0 - f["frac_rep"]) + 0.499).astype(np.int64)
    mapq = np.where(sub >= score, 0, mapq)
    mapq = np.where(score == 0, 0, mapq)

    # ---- position / rid ----
    pos = np.where(is_rev, n - re, rb)
    rid = np.searchsorted(np.asarray(idx.ref_offsets), pos, side="right") - 1
    local = pos - np.asarray(idx.ref_offsets)[rid]
    clip5 = np.where(is_rev, lens - qe, qb)
    clip3 = np.where(is_rev, qb, lens - qe)
    f.update(is_rev=is_rev, mism=mism, rr=rr, nm=nm, mapq=mapq, rid=rid,
             local=local, clip5=clip5, clip3=clip3)
    return f


_MD_BASE = "ACGTN"


def fast_hit(idx: FMIndex, f: dict, i: int, name: str,
             query_id: int | None) -> Hit:
    """Assemble the Hit for fast row ``i`` (MD walk over the few
    mismatch columns; all-M CIGAR plus soft clips)."""
    Li = int(f["L"][i])
    cols = np.flatnonzero(f["mism"][i, :Li])
    md: list[str] = []
    prevj = -1
    for j in cols:
        md.append(str(int(j) - prevj - 1))
        md.append(_MD_BASE[min(int(f["rr"][i, j]), 4)])
        prevj = int(j)
    md.append(str(Li - prevj - 1))
    cigar = ""
    if f["clip5"][i]:
        cigar += f"{int(f['clip5'][i])}S"
    cigar += f"{Li}M"
    if f["clip3"][i]:
        cigar += f"{int(f['clip3'][i])}S"
    rid = int(f["rid"][i])
    local = int(f["local"][i])
    return Hit(
        ref_id=int(idx.ref_ids[rid]) if len(idx.ref_ids) else rid,
        ref_name=idx.ref_names[rid],
        ref_begin=local,
        ref_end=local + Li,
        query_id=query_id,
        query_name=name,
        query_begin=int(f["qb"][i]),
        query_end=int(f["qe"][i]),
        is_primary=True,
        is_secondary=False,
        is_reverse=bool(f["is_rev"][i]),
        cigar=cigar,
        score=int(f["score"][i]),
        mapq=int(f["mapq"][i]),
        nm=int(f["nm"][i]),
        md="".join(md),
        rid=rid,
    )


def _finalize_fast(
    idx: FMIndex, opt: AlignOptions, batch: ReadBatch, out: dict,
    frac_rep: np.ndarray, with_query_ids: bool,
) -> tuple[np.ndarray, list[ReadResult | None]]:
    f = fast_fields(idx, opt, batch, out, frac_rep)
    fast = f["fast"]
    results: list[ReadResult | None] = [None] * len(batch.names)
    for i in np.flatnonzero(fast):
        name = batch.names[i]
        if f["score"][i] < opt.min_score:
            results[i] = ReadResult(query_name=name, hits=[])
            continue
        results[i] = ReadResult(query_name=name, hits=[
            fast_hit(idx, f, i, name, int(i) if with_query_ids else None)
        ])
    return fast, results


def finalize_batch(
    idx: FMIndex, opt: AlignOptions, batch: ReadBatch, out: dict,
    with_query_ids: bool = True, all_hits: bool = True,
) -> list[ReadResult]:
    mat = fill_scmat(opt.match_score, opt.mismatch_penalty)
    max_occ = opt.resolve_max_occ(idx.n_refs)
    frac_all = frac_rep_batch(np.asarray(out["mems"]), np.asarray(out["n_mem"]),
                              max_occ, np.asarray(batch.lens))
    fast, results = _finalize_fast(idx, opt, batch, out, frac_all,
                                   with_query_ids)
    for i, name in enumerate(batch.names):
        if results[i] is not None:
            continue
        q = batch.codes[i, : batch.lens[i]].astype(np.uint8)
        qid = i if with_query_ids else None
        if out["overflow"][i]:
            # device caps exceeded: run the whole read on the host oracle,
            # then apply the same output rules as the device path
            regs = O.mem_align1(idx, opt, q, rand_id=i)
            results[i] = emit_read_hits(idx, opt, q, regs, mat, name, qid,
                                        all_hits)
            continue
        regs = regions_to_alnregs(out, i, float(frac_all[i]))
        results[i] = finalize_read(idx, opt, q, regs, mat, i, name, qid,
                                   all_hits)
    return results
