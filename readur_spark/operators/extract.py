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


def plan_partitions(docs_df: DataFrame, num_partitions: int) -> DataFrame:
    """Skew-defused partitioning: size-class binning + doc_id salting.

    Pure Catalyst: the weight is computed from span lengths without leaving
    the JVM, and the only shuffle is the explicit range repartition.
    """
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
            span_dicts = [
                {
                    "kind": s["kind"],
                    "text": s["text"],
                    "media_ref": s["media_ref"],
                    "offset": s["offset"],
                }
                for s in (spans if spans is not None else [])
            ]
            res = extract_document(span_dicts, repair_hyphens=repair_hyphens)
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
) -> DataFrame:
    """Run the extraction pipeline over an interleaved-docs DataFrame.

    ``num_partitions``: when set, apply the explicit skew-defused
    repartition first (recommended: 2–3× total cores). When ``None`` the
    input partitioning is kept (useful when the caller already planned it).

    ``passthrough_cols``: input columns copied verbatim onto the output
    (e.g. a precomputed ``partition_id`` for checkpoint lineage).
    """
    if num_partitions:
        docs_df = plan_partitions(docs_df, num_partitions)

    passthrough = passthrough_cols or []
    schema = T.StructType(
        EXTRACTED_SCHEMA.fields
        + [docs_df.schema[c] for c in passthrough]
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        return _extract_batches(batches, repair_hyphens, passthrough)

    return docs_df.mapInPandas(run, schema=schema)
