"""bioseqdb_tpu — a TPU-native short-read alignment engine.

A from-scratch JAX/XLA/Pallas re-design of the capability of
unneon/bioseqdb (a Postgres extension wrapping libbwa/htslib): BWA-MEM
style mapping of query reads against an indexed reference, exposed as an
``align(reads, index)`` API plus bulk FASTA/FASTQ ingest, with the
FM-index held in packed int32 device arrays and the seeding/chaining/
extension stages running as batched TPU programs.

Package map (SURVEY.md §7):
- ``seq``     sequence codec (NUCLSEQ replacement)
- ``io``      FASTA/FASTQ ingest -> packed batches (bioseqdb-import analogue)
- ``index``   FM-index build (native SA-IS) + TPU array layout + serialization
- ``kernels`` device ops: Occ/rank gathers, SMEM seeding, chaining, banded SW
- ``align``   the align() pipeline + options
- ``sam``     CIGAR/SAM emission
- ``cpu``     clean-room CPU oracle (bwa-mem semantics) used as test oracle
- ``dist``    mesh setup, data-parallel sharding, index sharding
"""

from bioseqdb_tpu.seq.codec import (
    ALLOWED_NUCLEOTIDES,
    Sequence,
    nuclseq_in,
)
from bioseqdb_tpu.align.options import AlignOptions

__version__ = "0.1.0"

__all__ = [
    "ALLOWED_NUCLEOTIDES",
    "Sequence",
    "nuclseq_in",
    "AlignOptions",
    "__version__",
]
