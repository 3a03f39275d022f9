"""readur_spark — a PySpark-native document-extraction and analytics engine.

A from-scratch reimplementation of the extraction semantics of the readur
document-management system (reference: /root/reference, readur v2.9.0) on
Apache Spark. The design is Spark-first:

* the relational/query surface (search, facets, dedup reports, stats) is
  plain DataFrame / SQL, optimized by Catalyst;
* heavy per-document text work (HTML main-content extraction, PDF text-layer
  parse, DOCX/XLSX XML extraction, OCR-output normalization) runs as
  Arrow-batched pandas UDFs via ``mapInPandas`` — never per-row Python;
* orchestration (readur's Postgres work queue, retry and resume) becomes a
  partition-granular checkpoint table plus deterministic job structure.

Layout:
    kernels/    pure-Python parity kernels (no Spark imports) — the exact
                normalization / word-count / quality-gate semantics of the
                reference, reusable inside UDFs and as test oracles
    functions/  Catalyst-native Column builders (regexp chains, text stats)
    operators/  DataFrame-level operators (extraction, dedup, similarity,
                search, multimodal plumbing)
    plans/      job plans: partitioning, checkpoint/lineage, resume
    sources/    readers (parquet, binaryFile, iceberg-behind-import-try)
"""

__version__ = "0.1.0"
