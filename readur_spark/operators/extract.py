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
    partitions averages the tail out. Inputs that ALREADY carry at least
    ``num_partitions`` partitions skip the payload shuffle entirely
    (r9): scan splits are byte-bounded and shuffle outputs hash-spread,
    so re-shuffling the span payloads buys nothing there.

    ``size_binned=True`` adds readur's size→priority binning
    (batch_ingest.rs:281-294) via ``repartitionByRange`` on
    (size_class, salt): mega-docs get dedicated partitions so one 100 MB
    monster never queues behind thousands of small docs. Costs one extra
    pass (range-boundary sampling re-executes the upstream) — worth it only
    when the size distribution is extreme; both modes are pure Catalyst.
    """
    if not size_binned:
        # Skip the payload shuffle when the input already carries at
        # least the requested parallelism (guide §2.4 "remove shuffles
        # outright" / §8 "move heavy bytes once"): scan partitions are
        # byte-bounded by maxPartitionBytes and shuffle outputs are
        # hash-spread, so re-shuffling the span payloads buys nothing —
        # measured a third of the flagship's wall. Inputs with FEWER
        # partitions than requested (single-split small corpus, skewed
        # unions) still get the defusing hash repartition, and
        # ``size_binned=True`` always forces the explicit binning.
        try:
            if docs_df.rdd.getNumPartitions() >= num_partitions:
                return docs_df
        except Exception:
            pass
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


def extract_spans_split(
    docs_df: DataFrame,
    repair_hyphens: bool = True,
    num_partitions: int | None = None,
    split_threshold_spans: int = 64,
) -> DataFrame:
    """Mega-doc-safe extraction: giant documents are exploded to span
    granularity, extracted in parallel, and reassembled.

    ``extract_spans`` binds one document to one task — correct until a
    single row carries thousands of spans (AQE can split skewed
    *partitions*, never a single row; SURVEY §7 "mega-doc skew"). Here:

    1. docs with ≤ ``split_threshold_spans`` spans take the normal batch
       path untouched;
    2. bigger docs ``posexplode`` to (doc_id, offset, span) rows, shuffle
       across the cluster by (doc_id, span-position) hash, extract
       per-span (same kernel ⇒ same per-span output), then reassemble with
       ``collect_list(struct(offset, spans))`` + ``array_sort`` — order
       derives from the input offsets, never execution order, so the
       result is byte-identical to the unsplit path (tested).

    Document-level sidecars (combined word count, status, quality gate)
    are recomputed from the reassembled text exactly as the kernel does.
    """
    n_spans = F.size("spans")
    small = docs_df.filter(n_spans <= split_threshold_spans)
    big = docs_df.filter(n_spans > split_threshold_spans)

    small_out = extract_spans(small, repair_hyphens, num_partitions)

    # --- span-granular path for the giants --------------------------------
    exploded = big.select(
        "doc_id", F.posexplode("spans").alias("pos", "span")
    ).select(
        "doc_id",
        "pos",
        F.array(F.col("span")).alias("spans"),
    )
    if num_partitions:
        exploded = exploded.repartition(
            num_partitions, F.xxhash64("doc_id", "pos")
        )

    def run_span(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from readur_spark.kernels.extractor import extract_document

        for pdf in batches:
            rows = {"doc_id": [], "pos": [], "piece": [], "had_text": [], "piece_us": []}
            for doc_id, pos, spans in zip(pdf["doc_id"], pdf["pos"], pdf["spans"]):
                t0 = time.perf_counter()
                res = extract_document(list(spans), repair_hyphens=repair_hyphens)
                rows["doc_id"].append(doc_id)
                rows["pos"].append(pos)
                rows["piece"].append(res["spans"])
                rows["had_text"].append(
                    any((s.get("kind") or "") in ("text", "html") for s in spans)
                )
                rows["piece_us"].append(int((time.perf_counter() - t0) * 1_000_000))
            yield pd.DataFrame(rows)

    piece_schema = T.StructType(
        [
            T.StructField("doc_id", T.StringType(), False),
            T.StructField("pos", T.IntegerType(), False),
            T.StructField("piece", EXTRACTED_SCHEMA["spans"].dataType, True),
            T.StructField("had_text", T.BooleanType(), False),
            T.StructField("piece_us", T.LongType(), False),
        ]
    )
    pieces = exploded.mapInPandas(run_span, piece_schema)

    # reassemble: order by original span position, then re-pack span orders
    assembled = (
        pieces.groupBy("doc_id")
        .agg(
            F.array_sort(
                F.collect_list(F.struct(F.col("pos"), F.col("piece")))
            ).alias("ordered"),
            F.max("had_text").alias("had_text"),
            F.sum("piece_us").alias("piece_us"),
        )
        .select(
            "doc_id",
            F.flatten(F.col("ordered.piece")).alias("raw_spans"),
            "had_text",
            "piece_us",
        )
    )

    def finalize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from readur_spark.kernels.quality import classify_ocr_error, validate_ocr_quality
        from readur_spark.kernels.wordcount import count_words_safely_office

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
            for doc_id, raw, had_text, piece_us in zip(
                pdf["doc_id"], pdf["raw_spans"], pdf["had_text"], pdf["piece_us"]
            ):
                t0 = time.perf_counter()
                spans = [
                    {
                        "kind": s["kind"],
                        "text": s["text"],
                        "media_ref": s["media_ref"],
                        "order": i,
                    }
                    for i, s in enumerate(raw if raw is not None else [])
                ]
                texts = [s["text"] for s in spans if s["kind"] == "text"]
                combined = "\n\n".join(texts)
                wc = count_words_safely_office(combined)
                status, reason = "completed", None
                if texts:
                    err = validate_ocr_quality(combined, 100.0, wc)
                    if err is not None:
                        status = "failed"
                        reason, _ = classify_ocr_error(err)
                elif had_text or not spans:
                    # text/html input yielded nothing usable — failed, like
                    # the unsplit kernel's empty-result path
                    status = "failed"
                    reason, _ = classify_ocr_error(
                        "No extractable text found in document (0 words)"
                    )
                if status == "failed":
                    spans = [s for s in spans if s["kind"] == "media"]
                    for i, s in enumerate(spans):
                        s["order"] = i
                out["doc_id"].append(doc_id)
                out["spans"].append(spans)
                out["confidence"].append(100.0)
                out["word_count"].append(wc)
                out["status"].append(status)
                out["failure_reason"].append(reason)
                out["preprocessing_applied"].append(["Span-split extraction"])
                # real lineage: summed per-piece kernel time + this doc's
                # reassembly/finalize time (comparable to the unsplit path's
                # per-doc wall time within tolerance — tested)
                finalize_us = (time.perf_counter() - t0) * 1_000_000
                out["processing_time_ms"].append(
                    int((int(piece_us) + finalize_us) / 1000)
                )
            yield pd.DataFrame(out)

    big_out = assembled.mapInPandas(finalize, EXTRACTED_SCHEMA)
    return small_out.unionByName(big_out)


def chunk_texts(
    docs_df: DataFrame,
    chunk_words: int = 128,
    overlap_words: int = 32,
    id_col: str = "doc_id",
    text_col: str = "text",
    array_path_max_words: int | None = 10_000,
) -> DataFrame:
    """Training-data chunking: split each document into word-bounded
    chunks of ``chunk_words`` with ``overlap_words`` overlap (stride =
    chunk_words − overlap_words), emitting (id, chunk_no, chunk_text,
    n_words).

    Size-dispatched for the mega-doc tail: docs up to
    ``array_path_max_words`` take the zero-shuffle array path (split +
    sequence + slice + explode — a scan-speed codegen'd projection). The
    array path is NOT safe unbounded: the transform lambda re-evaluates
    the embedded split() per chunk (interpreted HOFs have no CSE), which
    is quadratic-by-chunks — a 200k-word doc effectively hangs. Docs above
    the bound route through the relational path instead: posexplode words
    once, assign each word to its covering chunk indices, groupBy
    (doc, chunk) and reassemble in position order — linear, one shuffle,
    and only the ~1% mega tail pays it.

    Boundary semantics (identical on both paths, mirrored exactly in the
    DuckDB oracle):
    * empty/whitespace docs produce no chunks;
    * the last chunk is the final ≤chunk_words window — a doc shorter than
      chunk_words yields exactly one chunk;
    * trailing windows fully contained in the previous chunk are not
      emitted (stride walks past the end at most once).

    ``array_path_max_words=None`` disables the dispatch and keeps the
    whole plan a zero-shuffle projection — ONLY safe when the caller
    guarantees no mega documents.
    """
    assert 0 <= overlap_words < chunk_words
    stride = chunk_words - overlap_words
    words = F.filter(F.split(F.trim(F.col(text_col)), r"\s+"), lambda w: w != "")
    n = F.size(words)
    array_only = array_path_max_words is None
    if array_only:
        array_path_max_words = 2**31 - 1

    # ---- array path (zero shuffle), docs with n ≤ bound -----------------
    extra = F.greatest(n - F.lit(chunk_words), F.lit(0))
    n_chunks = F.when(n == 0, F.lit(0)).otherwise(
        F.lit(1) + F.ceil(extra / F.lit(stride)).cast("int")
    )
    chunk = F.explode(
        F.transform(
            F.sequence(F.lit(0), n_chunks - 1),
            lambda i: F.struct(
                i.cast("int").alias("chunk_no"),
                F.array_join(
                    F.slice(words, i * stride + 1, chunk_words), " "
                ).alias("chunk_text"),
                F.least(n - i * stride, F.lit(chunk_words)).cast("int").alias("n_words"),
            ),
        )
    ).alias("c")
    small = (
        docs_df.filter((n > 0) & (n <= array_path_max_words))
        .select(F.col(id_col), chunk)
        .select(
            id_col,
            F.col("c.chunk_no").alias("chunk_no"),
            F.col("c.chunk_text").alias("chunk_text"),
            F.col("c.n_words").alias("n_words"),
        )
    )
    if array_only:
        return small

    # ---- relational path (linear), the mega tail -------------------------
    big_rows = docs_df.filter(n > array_path_max_words).select(
        F.col(id_col).alias("_id"), F.posexplode(words).alias("pos", "w")
    )
    counts = big_rows.groupBy("_id").agg(F.count("*").alias("_n"))
    nn = F.col("_n")
    n_chunks_big = F.lit(1) + F.ceil(
        F.greatest(nn - F.lit(chunk_words), F.lit(0)) / F.lit(stride)
    ).cast("int")
    # word at pos p belongs to chunk i iff i*stride ≤ p < i*stride+chunk_words
    i_lo = F.greatest(
        F.ceil((F.col("pos") - F.lit(chunk_words) + 1) / F.lit(stride)).cast("int"),
        F.lit(0),
    )
    i_hi = F.least(
        F.floor(F.col("pos") / F.lit(stride)).cast("int"), n_chunks_big - 1
    )
    assigned = (
        big_rows.join(counts, "_id")
        .select(
            "_id",
            "pos",
            "w",
            F.explode(F.sequence(i_lo, i_hi)).alias("chunk_no"),
        )
    )
    big = assigned.groupBy("_id", "chunk_no").agg(
        F.array_join(
            F.transform(
                F.array_sort(F.collect_list(F.struct("pos", "w"))), lambda x: x["w"]
            ),
            " ",
        ).alias("chunk_text"),
        F.count("*").cast("int").alias("n_words"),
    ).select(
        F.col("_id").alias(id_col),
        F.col("chunk_no").cast("int").alias("chunk_no"),
        "chunk_text",
        "n_words",
    )
    return small.unionByName(big)


def chunk_texts_by_tokens(
    docs_df: DataFrame,
    tokenizer,
    chunk_tokens: int = 512,
    overlap_tokens: int = 0,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Token-boundary chunking: split each document into windows of
    ``chunk_tokens`` BPE tokens with ``overlap_tokens`` overlap, emitting
    (id, chunk_no, chunk_text, n_tokens) where ``chunk_text`` is the
    exact DECODE of the window's token ids. Every window cut is SNAPPED
    to a pre-token boundary (kernels.bpe.token_windows) — byte-level BPE
    tokens need not align to character boundaries, so a raw fixed-stride
    cut could split a multi-byte UTF-8 character (silent U+FFFD) or a
    contraction/letter-digit pre-token (re-tokenization drift). With
    snapped cuts a trainer re-encoding any chunk gets back precisely its
    token slice; windows therefore hold *at most* ``chunk_tokens``
    tokens and overlap *at most* ``overlap_tokens``. Inside a single
    pre-token longer than ``chunk_tokens`` (a mega-run) the cut falls
    back to a character boundary: decode stays exact, re-encode may
    re-merge differently. This is the trainer-faithful sibling of
    :func:`chunk_texts` (word windows): every real pipeline sizes
    context windows in tokens, not words.

    Empty docs produce no chunks; the last chunk is the final tail
    window. Embarrassingly parallel (merges never cross pre-token
    boundaries): one Arrow-batched mapInPandas, no shuffle.
    ``tokenizer`` is a kernels.bpe.BpeTokenizer; its merge table ships
    in the closure, the per-process instance is cached."""
    import pandas as pd

    from readur_spark.kernels.bpe import token_windows
    from readur_spark.operators.bpe import process_tokenizer

    assert 0 <= overlap_tokens < chunk_tokens
    merges = tokenizer.merges
    holder: dict = {}
    id_type = docs_df.schema[id_col].dataType.simpleString()

    def run(batches):
        tok = process_tokenizer(merges, holder)
        vocab = tok.token_bytes()
        for pdf in batches:
            rows = []
            for doc_id, text in zip(pdf[id_col], pdf[text_col]):
                ids, starts = tok.encode_with_starts(text or "")
                if not ids:
                    continue
                windows = token_windows(
                    ids, starts, vocab, chunk_tokens, overlap_tokens
                )
                for chunk_no, (pos, end) in enumerate(windows):
                    rows.append(
                        {
                            id_col: doc_id,
                            "chunk_no": chunk_no,
                            "chunk_text": tok.decode(ids[pos:end]),
                            "n_tokens": end - pos,
                        }
                    )
            yield pd.DataFrame(
                rows, columns=[id_col, "chunk_no", "chunk_text", "n_tokens"]
            )

    return docs_df.select(id_col, text_col).mapInPandas(
        run,
        f"{id_col} {id_type}, chunk_no int, chunk_text string, n_tokens long",
    )
