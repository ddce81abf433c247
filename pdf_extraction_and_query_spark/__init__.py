"""PySpark-native document-extraction engine.

A from-scratch reimplementation of the *capabilities* of
nahmann/PDF-Extraction-and-Query (reference at /root/reference, read-only):
layout-aware line extraction, wrapped-line reconstruction, header detection,
boilerplate stripping, text cleaning, and section-aware chunking with overlap
— re-expressed as Spark DataFrame transforms + vectorized Arrow UDFs over an
interleaved text+media span corpus, plus the large-scale training-data
operators (dedup, similarity search, text analysis) that a 100 TB pipeline
needs.

Layout:
    core/       pure-Python reference-semantics kernels (used inside Arrow
                UDFs and by the eager oracle; unit-tested against the
                reference's own test cases)
    operators/  Spark DataFrame operators (layout, reconstruct, chunk,
                interleave, dedup, search, textstats)
    sources/    corpus generation, table IO (parquet now, Iceberg-ready)
    functions/  column-expression function library (cleaning, features)
    plans/      pipeline assembly, checkpoint/resume ledger
    streaming/  structured-streaming ingest surface
"""

__version__ = "0.1.0"
