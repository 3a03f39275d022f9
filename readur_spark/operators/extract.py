"""The flagship extraction operator: interleaved docs → ordered spans.

Spark shape
-----------
One ``mapInPandas`` stage over a skew-defused partitioning of the input:

* **Partitioning** (``plan_partitions``): readur prioritizes work by file
  size (size→priority bins, /root/reference/src/ingestion/batch_ingest.rs:
  281-294) so one worker never serializes all the huge files. The Spark
  analog: compute each document's byte weight natively
  (``aggregate(spans, sum(length(text)))`` — pure Catalyst, no Python),
  bin it into the reference's size classes, then ``repartitionByRange``
  on (size_class, salt) where salt = ``pmod(xxhash64(doc_id), 2^20)``.
  Mega-docs land in dedicated, evenly-salted partitions instead of
  straggling a mixed one; AQE cannot split a single giant *row*, so this
  doc-level binning is the explicit skew control the north rule asks for.
* **Extraction**: iterator-of-batches pandas UDF. Each Arrow batch holds
  many documents; each document is processed by the pure-Python kernel
  (readur-parity semantics, see ``kernels.extractor``). No per-row Spark
  serde — batch in, batch out over Arrow.

At cluster scale the same plan holds: the scan is columnar (only ``doc_id``
+ ``spans`` are read), the single shuffle is the explicit repartition, and
the UDF stage is embarrassingly parallel at ``num_partitions`` granularity
(set it to 2–3× total executor cores).
"""

from __future__ import annotations

import time
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from readur_spark.kernels.extractor import extract_document

EXTRACTED_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.StringType(), False),
        T.StructField(
            "spans",
            T.ArrayType(
                T.StructType(
                    [
                        T.StructField("kind", T.StringType(), True),
                        T.StructField("text", T.StringType(), True),
                        T.StructField("media_ref", T.StringType(), True),
                        T.StructField("order", T.IntegerType(), True),
                    ]
                )
            ),
            True,
        ),
        T.StructField("confidence", T.FloatType(), True),
        T.StructField("word_count", T.IntegerType(), True),
        T.StructField("status", T.StringType(), True),
        T.StructField("failure_reason", T.StringType(), True),
        T.StructField("preprocessing_applied", T.ArrayType(T.StringType()), True),
        T.StructField("processing_time_ms", T.LongType(), True),
    ]
)

#: readur's size→priority bins (src/ingestion/batch_ingest.rs:281-294),
#: reused as partition-range classes (higher priority = smaller doc).
_SIZE_BINS_BYTES = [1, 5, 10, 50]  # MB boundaries


def size_class_col(weight_col: str = "doc_bytes"):
    """Column mapping byte weight → readur's priority bins (10/8/6/4/2)."""
    mb = 1024 * 1024
    c = F.col(weight_col)
    return (
        F.when(c <= 1 * mb, F.lit(10))
        .when(c <= 5 * mb, F.lit(8))
        .when(c <= 10 * mb, F.lit(6))
        .when(c <= 50 * mb, F.lit(4))
        .otherwise(F.lit(2))
    )


def plan_partitions(
    docs_df: DataFrame, num_partitions: int, size_binned: bool = False
) -> DataFrame:
    """Skew-defused partitioning.

    Default (``size_binned=False``): one hash repartition on
    ``xxhash64(doc_id)`` — a single shuffle, no extra pass, uniform doc
    spread (the north rule's salt-by-doc_id). This is the right default:
    document costs are long-tailed but hashing 10^12 docs over ~10^5
    partitions averages the tail out.

    ``size_binned=True`` adds readur's size→priority binning
    (batch_ingest.rs:281-294) via ``repartitionByRange`` on
    (size_class, salt): mega-docs get dedicated partitions so one 100 MB
    monster never queues behind thousands of small docs. Costs one extra
    pass (range-boundary sampling re-executes the upstream) — worth it only
    when the size distribution is extreme; both modes are pure Catalyst.
    """
    if not size_binned:
        return docs_df.repartition(num_partitions, F.xxhash64("doc_id"))
    weighted = docs_df.withColumn(
        "doc_bytes",
        F.aggregate(
            F.col("spans"),
            F.lit(0).cast("long"),
            lambda acc, s: acc + F.coalesce(F.octet_length(s["text"]), F.lit(0)),
        ),
    ).withColumn("size_class", size_class_col("doc_bytes")).withColumn(
        "salt", F.pmod(F.xxhash64("doc_id"), F.lit(1 << 20))
    )
    return weighted.repartitionByRange(num_partitions, "size_class", "salt").drop(
        "doc_bytes", "size_class", "salt"
    )


def _extract_batches(
    batches: Iterator[pd.DataFrame], repair_hyphens: bool, passthrough: list[str]
):
    for pdf in batches:
        out = {
            "doc_id": [],
            "spans": [],
            "confidence": [],
            "word_count": [],
            "status": [],
            "failure_reason": [],
            "preprocessing_applied": [],
            "processing_time_ms": [],
        }
        for col in passthrough:
            out[col] = pdf[col].tolist()
        for doc_id, spans in zip(pdf["doc_id"], pdf["spans"]):
            t0 = time.perf_counter()
            # Arrow delivers array<struct> elements as plain dicts with the
            # span field names — hand them to the kernel without re-copying
            # (one less dict per span on the hot path)
            res = extract_document(
                spans if spans is not None else [], repair_hyphens=repair_hyphens
            )
            out["doc_id"].append(doc_id)
            out["spans"].append(res["spans"])
            out["confidence"].append(res["confidence"])
            out["word_count"].append(res["word_count"])
            out["status"].append(res["status"])
            out["failure_reason"].append(res["failure_reason"])
            out["preprocessing_applied"].append(res["preprocessing_applied"])
            out["processing_time_ms"].append(
                int((time.perf_counter() - t0) * 1000)
            )
        yield pd.DataFrame(out)


def extract_spans(
    docs_df: DataFrame,
    repair_hyphens: bool = True,
    num_partitions: int | None = None,
    passthrough_cols: list[str] | None = None,
    size_binned: bool = False,
) -> DataFrame:
    """Run the extraction pipeline over an interleaved-docs DataFrame.

    ``num_partitions``: when set, apply the explicit skew-defused
    repartition first. Sizing guidance: ≈1× total cores when per-doc work
    is light (Arrow/Python per-task overhead dominates otherwise), 2–3×
    cores on a real cluster where tasks run seconds and elasticity matters.
    When ``None`` the input partitioning is kept (caller already planned).

    ``passthrough_cols``: input columns copied verbatim onto the output
    (e.g. a precomputed ``partition_id`` for checkpoint lineage).
    """
    if num_partitions:
        docs_df = plan_partitions(docs_df, num_partitions, size_binned=size_binned)

    passthrough = passthrough_cols or []
    schema = T.StructType(
        EXTRACTED_SCHEMA.fields
        + [docs_df.schema[c] for c in passthrough]
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        return _extract_batches(batches, repair_hyphens, passthrough)

    return docs_df.mapInPandas(run, schema=schema)
