"""Reference-parity search API.

The Python-native equivalents of the reference's two SQL entry points
(bioseqdb--0.0.0.sql:214-222; extension.cpp:311-378):

- ``search(query, references, options)``   == nuclseq_search_bwa
- ``multi_search(queries, references, options)`` == nuclseq_multi_search_bwa

Each returned ``SearchResult`` carries the same 15 fields as the SQL
``bwa_result`` composite (bioseqdb--0.0.0.sql:196-212) / ``BwaMatch``
(bwa.h:15-30), including the decoded reference subsequence with
ambiguity holes re-overlaid (extract_reference_subseq, bwa.cpp:55-68)
and the matched query subsequence. ``query_id`` is None in single-query
mode, matching the NULL the reference emits (extension.cpp:289,301-302).

Unlike the reference, the index builds once per call *set* — pass an
``FMIndex`` (or an ``Aligner``) to amortize it, or an iterable of
reference sequences for drop-in convenience.
"""

from __future__ import annotations

from dataclasses import dataclass


from bioseqdb_tpu.align.options import AlignOptions
from bioseqdb_tpu.align.pipeline import Aligner
from bioseqdb_tpu.index.builder import build_index
from bioseqdb_tpu.index.fmindex import FMIndex
from bioseqdb_tpu.io.batch import pack_reads
from bioseqdb_tpu.seq.codec import Sequence


@dataclass
class SearchResult:
    """One match — field-for-field the reference's bwa_result row."""

    ref_id: int
    ref_subseq: str
    ref_match_start: int
    ref_match_end: int
    ref_match_len: int
    query_id: int | None
    query_subseq: str
    query_match_start: int
    query_match_end: int
    query_match_len: int
    is_primary: bool
    is_secondary: bool
    is_reverse: bool
    cigar: str
    score: int
    # extras beyond the SQL surface (no cost to carry)
    ref_name: str = ""
    mapq: int = 0
    nm: int = 0


def _as_aligner(references, options: AlignOptions | None) -> Aligner:
    if isinstance(references, Aligner):
        return references
    if isinstance(references, FMIndex):
        return Aligner.build(references, options)
    return Aligner.build(build_index(references), options)


def _seq_text(s) -> str:
    if isinstance(s, Sequence):
        return s.to_text()
    return str(s)


def _to_search_results(aligner: Aligner, texts, results, multi: bool):
    idx = aligner.index
    out: list[SearchResult] = []
    for i, res in enumerate(results):
        text = texts[i]
        for h in res.hits:
            out.append(
                SearchResult(
                    ref_id=h.ref_id,
                    ref_subseq=idx.extract_subseq(
                        int(idx.ref_offsets[h.rid]) + h.ref_begin,
                        int(idx.ref_offsets[h.rid]) + h.ref_end,
                    ),
                    ref_match_start=h.ref_begin,
                    ref_match_end=h.ref_end,
                    ref_match_len=h.ref_end - h.ref_begin,
                    query_id=i if multi else None,
                    query_subseq=text[h.query_begin : h.query_end],
                    query_match_start=h.query_begin,
                    query_match_end=h.query_end,
                    query_match_len=h.query_end - h.query_begin,
                    is_primary=h.is_primary,
                    is_secondary=h.is_secondary,
                    is_reverse=h.is_reverse,
                    cigar=h.cigar,
                    score=h.score,
                    ref_name=h.ref_name,
                    mapq=h.mapq,
                    nm=h.nm,
                )
            )
    return out


def search(query, references, options: AlignOptions | None = None) -> list[SearchResult]:
    """Single-query search (nuclseq_search_bwa semantics)."""
    aligner = _as_aligner(references, options)
    text = _seq_text(query)
    batch = pack_reads([text], ["q"])
    results = aligner.align_batch(batch)
    return _to_search_results(aligner, [text], results, multi=False)


def multi_search(queries, references, options: AlignOptions | None = None) -> list[SearchResult]:
    """Multi-query search (nuclseq_multi_search_bwa semantics); query_id
    is the row number of each query."""
    aligner = _as_aligner(references, options)
    texts = [_seq_text(q) for q in queries]
    batch = pack_reads(texts, [f"q{i}" for i in range(len(texts))])
    results = aligner.align_batch(batch)
    return _to_search_results(aligner, texts, results, multi=True)
