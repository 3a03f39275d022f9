"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship extraction pipeline (interleaved docs →
ordered spans) over sf0.001. ``queries()`` exposes one entry per implemented
operator family from SURVEY.md §2; ``oracle_sql()`` gives the DuckDB-
equivalent SQL for every SQL-expressible one (same column names/types).
Non-SQL-expressible ops (MinHash-LSH, SimHash, SRP-LSH ANN — they depend on
engine hash functions) are rows-only checks by design.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from readur_spark.functions.textstats import (
    fingerprint_col,
    lang_id_col,
    normalize_text_col,
    quality_score_col,
    text_metadata_cols,
    token_count_col,
    word_count_col,
)
from readur_spark.operators import dedup, relational, search, similarity
from readur_spark.operators.extract import extract_spans
from readur_spark.sources.tables import interleaved_docs, load_table

SF0001 = "/root/testdata/sf0.001"

#: FROZEN_TIER — the documented overflow rule for the driver's 50-row
#: correctness window (r7 verdict, next-round #1). The registry is
#: consolidated to exactly 100 entries so the ≤2-round rotation holds
#: arithmetically from r9 on (50 + 50, alternating halves); in a round
#: where consolidation/new entries push the no-driver-row set past 50
#: (r8: 51 candidates), the overflow entry(s) must be PURE-RELATIONAL
#: oracles over files untouched since their last green driver row, must
#: be named here with the justification, and re-enter the next window
#: first. tests/test_registry_docs.py asserts the arithmetic: every
#: registry entry lacking a row in the latest CORRECTNESS_r*.json is
#: either inside the 50-row window or listed here.
FROZEN_TIER: dict[str, str] = {
    "q1_pricing_summary": (
        "TPC-H Q1 over operators/relational.py:pricing_summary — "
        "pure-relational oracle, implementation file untouched since "
        "its green r6 driver row (r6..r8 diffs touch neither "
        "relational.py nor the lineitem loader), locally re-gated "
        "green through tools/check_correctness.py this round; first "
        "slot of the r9 window."
    ),
}

# --------------------------------------------------------------------------
# Flagship
# --------------------------------------------------------------------------


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: full interleaved extraction (text + HTML boilerplate strip +
    media passthrough) over sf0.001, with skew-defused partitioning."""
    docs = interleaved_docs(spark, SF0001, with_html=True)
    return extract_spans(docs, num_partitions=8)


# --------------------------------------------------------------------------
# The SQL chain used by both engines for readur's normalization
# (clean_extracted_text + null strip + hyphen repair). Backrefs: Spark `$1`,
# DuckDB `\1` — hence two renderings of the same chain.
# --------------------------------------------------------------------------

_DUCK_NORM = (
    "trim(regexp_replace(regexp_replace(regexp_replace(regexp_replace("
    "regexp_replace(regexp_replace(regexp_replace(regexp_replace("
    "text, chr(0), '', 'g'), "
    r"'(\w)-\n(\w)', '\1\2', 'g'), "
    r"'([a-z])([A-Z])', '\1 \2', 'g'), "
    "' {3,}', '  ', 'g'), "
    r"'\n{3,}', '\n\n', 'g'), "
    r"' +\n', '\n', 'g'), "
    r"'\n +', '\n', 'g'), "
    r"'[ \t]+', ' ', 'g')"
    ", ' ' || chr(10) || chr(9) || chr(13))"  # DuckDB trim() strips only
    # spaces by default; pass the whitespace set to match Rust .trim()
)


def _spark_norm(c):
    from readur_spark.functions.textstats import repair_hyphenation_col, strip_null_bytes_col

    return normalize_text_col(repair_hyphenation_col(strip_null_bytes_col(c)))


# --------------------------------------------------------------------------
# Query registry
# --------------------------------------------------------------------------


def _docs(spark, sf):
    return load_table(spark, sf, "documents")


def _q_extract_text_spans(spark: SparkSession, sf: str) -> DataFrame:
    """Single-text-span extraction through the full distributed operator,
    flattened so DuckDB can reproduce it relationally."""
    docs = interleaved_docs(spark, sf, with_html=False)
    ext = extract_spans(docs, num_partitions=8)
    return ext.select(
        F.col("doc_id").cast("long").alias("doc_id"),
        F.col("status"),
        F.col("word_count").cast("long").alias("word_count"),
        F.element_at(F.col("spans"), 1)["text"].alias("span_text"),
    )


def _q_incremental_sync(spark: SparkSession, sf: str) -> DataFrame:
    """S4 smart-sync delta on a synthesized listing: current = all docs with
    etag = md5(text); previous = even doc_ids, with stale etags for
    multiples of 4. Changed set = odd ids ∪ multiples of 4."""
    from readur_spark.sources.files import incremental_changes

    docs = _docs(spark, sf)
    current = docs.select(
        F.col("doc_id").alias("path"), F.md5("text").alias("etag")
    )
    previous = (
        docs.filter(F.col("doc_id") % 2 == 0)
        .select(
            F.col("doc_id").alias("path"),
            F.when(F.col("doc_id") % 4 == 0, F.lit("stale"))
            .otherwise(F.md5("text"))
            .alias("etag"),
        )
    )
    return incremental_changes(current, previous)


def _q_extract_binary_roundtrip(spark: SparkSession, sf: str) -> DataFrame:
    """Binary-extraction round trip through REAL container formats: each
    document's text is packed into a PDF / DOCX / XLSX (by doc_id % 3) with
    the in-repo writers, pushed through the MIME-dispatch extraction
    operator, and flattened for the relational oracle. Exercises magic-byte
    detection, the PDF text-layer ladder, and both Office extractors inside
    the distributed correctness gate."""
    import pandas as pd

    from readur_spark.kernels.minipdf import build_pdf
    from readur_spark.operators.binary_extract import extract_files

    docs = _docs(spark, sf).select("doc_id", "text")

    def build(batches):
        import io
        import zipfile

        w_ns = "http://schemas.openxmlformats.org/wordprocessingml/2006/main"
        s_ns = "http://schemas.openxmlformats.org/spreadsheetml/2006/main"
        r_ns = "http://schemas.openxmlformats.org/officeDocument/2006/relationships"

        from xml.sax.saxutils import escape

        def docx(text: str) -> bytes:
            body = f"<w:p><w:r><w:t>{escape(text)}</w:t></w:r></w:p>"
            doc = (
                f'<w:document xmlns:w="{w_ns}"><w:body>{body}</w:body></w:document>'
            )
            buf = io.BytesIO()
            with zipfile.ZipFile(buf, "w", zipfile.ZIP_DEFLATED) as z:
                z.writestr("word/document.xml", doc)
            return buf.getvalue()

        def xlsx(text: str) -> bytes:
            sst = f'<sst xmlns="{s_ns}"><si><t>{escape(text)}</t></si></sst>'
            sheet = (
                f'<worksheet xmlns="{s_ns}"><sheetData>'
                '<row r="1"><c r="A1" t="s"><v>0</v></c></row>'
                "</sheetData></worksheet>"
            )
            wb = (
                f'<workbook xmlns="{s_ns}" xmlns:r="{r_ns}">'
                '<sheets><sheet name="S1" sheetId="1" r:id="rId1"/></sheets></workbook>'
            )
            buf = io.BytesIO()
            with zipfile.ZipFile(buf, "w", zipfile.ZIP_DEFLATED) as z:
                z.writestr("xl/workbook.xml", wb)
                z.writestr("xl/sharedStrings.xml", sst)
                z.writestr("xl/worksheets/sheet1.xml", sheet)
            return buf.getvalue()

        for pdf_batch in batches:
            rows = []
            for doc_id, text in zip(pdf_batch["doc_id"], pdf_batch["text"]):
                kind = int(doc_id) % 3
                if kind == 0:
                    content = build_pdf([[(72.0, 720.0, text)]])
                    fname = f"{doc_id}.pdf"
                elif kind == 1:
                    content = docx(text)
                    fname = f"{doc_id}.docx"
                else:
                    content = xlsx(text)
                    fname = f"{doc_id}.xlsx"
                rows.append(
                    {"doc_id": str(doc_id), "filename": fname, "content": content}
                )
            yield pd.DataFrame(rows)

    files = docs.mapInPandas(build, "doc_id string, filename string, content binary")
    out = extract_files(files)
    return out.select(
        F.col("doc_id").cast("long").alias("doc_id"),
        "mime_type",
        "status",
        F.col("word_count").cast("long").alias("word_count"),
        F.element_at(F.col("spans"), 1)["text"].alias("span_text"),
    )


def _q_sql_search(spark: SparkSession, sf: str) -> DataFrame:
    """The same engine through the SQL API (Catalyst produces the identical
    plan): per-language doc counts among documents mentioning 'table'."""
    from readur_spark.sources.views import register_views

    register_views(spark, sf, tables=("documents",))
    return spark.sql(
        """
        SELECT lang, count(*) AS n_docs,
               CAST(round(avg(n_chars), 4) AS DOUBLE) AS avg_chars
        FROM documents
        WHERE lower(text) RLIKE '\\\\btable\\\\b'
        GROUP BY lang
        """
    )


def _synthesize_pngs(spark: SparkSession, sf: str, w: int, h: int) -> DataFrame:
    """Deterministic per-doc synthetic PNGs (corpus.quality_png_bytes) —
    the container ships no real scanned images, so the image pipeline's
    correctness gate runs on closed-form synthetic rasters."""
    import pandas as pd

    # a small corpus is one parquet split = ONE partition, which would
    # serialize the whole synth+decode+analyze chain onto a single core
    # (measured: the entire image query ran as 1 task); spreading the
    # 8-byte ids is one trivial shuffle
    docs = (
        _docs(spark, sf)
        .select("doc_id")
        .repartition(spark.sparkContext.defaultParallelism)
    )

    def build(batches):
        from readur_spark.corpus import quality_png_bytes

        for pdf in batches:
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "content": [quality_png_bytes(int(d), w, h) for d in pdf["doc_id"]],
                }
            )

    return docs.mapInPandas(build, "doc_id long, content binary")


def _q_image_quality_stats(spark: SparkSession, sf: str) -> DataFrame:
    """I9 distributed over synthetic PNGs: real stdlib PNG decode + the
    reference's quality analysis; brightness/contrast have closed forms in
    doc_id (see corpus.quality_png_bytes), so DuckDB oracles them with
    pure arithmetic."""
    from readur_spark.operators.multimodal import image_quality

    pngs = _synthesize_pngs(spark, sf, 34, 26)
    out = image_quality(pngs.select(F.col("doc_id").cast("string").alias("doc_id"), "content"))
    return out.select(
        F.col("doc_id").cast("long").alias("doc_id"),
        "width",
        "height",
        F.col("brightness").alias("brightness"),
        F.round(F.col("contrast_ratio"), 6).alias("contrast_ratio"),
    )


def _q_image_ocr_fake(spark: SparkSession, sf: str) -> DataFrame:
    """I1–I4 distributed: decode → preprocess (real pixel math) → fake OCR
    engine → confidence + W3 gates. Oracle: the same kernel replayed
    driver-side (tools/expected.image_ocr_expected) — verifies the
    distributed execution reproduces the sequential reference ladder."""
    from readur_spark.operators.multimodal import ocr_images

    pngs = _synthesize_pngs(spark, sf, 340, 312)
    out = ocr_images(pngs.select(F.col("doc_id").cast("string").alias("doc_id"), "content"))
    return out.select(
        F.col("doc_id").cast("long").alias("doc_id"),
        "status",
        "failure_reason",
        F.col("word_count").cast("long").alias("word_count"),
        "confidence",
    )


def _q_pdf_ocr_glyph(spark: SparkSession, sf: str) -> DataFrame:
    """P6→P7 closed loop, distributed: per-doc PDFs are built with a
    deterministic two-line body, rendered with the built-in 5×7 glyph font
    (kernels/font5x7.py), and READ BACK by GlyphOcrEngine template
    matching. The engine shares only the font with the renderer, so the
    oracle (the planted text, pure SQL arithmetic over doc_id) verifies
    genuine end-to-end reading — enhanced.rs:1402-1508 semantics."""
    import pandas as pd

    docs = _docs(spark, sf).select("doc_id")

    def run(batches):
        from readur_spark.kernels.minipdf import build_pdf, render_pdf_pages
        from readur_spark.kernels.ocr_engine import GlyphOcrEngine

        eng = GlyphOcrEngine(dpi=72)
        for pdf in batches:
            ids, texts, confs = [], [], []
            for d in pdf["doc_id"]:
                d = int(d)
                line1 = f"document {d} rendered page"
                line2 = f"checksum {d % 97} of body text"
                data = build_pdf([[(72.0, 720.0, line1), (72.0, 700.0, line2)]])
                (img,) = render_pdf_pages(data, dpi=72)
                text, conf = eng.recognize(img, "eng")
                ids.append(d)
                texts.append(text)
                confs.append(float(conf))
            yield pd.DataFrame({"doc_id": ids, "ocr_text": texts, "confidence": confs})

    return docs.mapInPandas(run, "doc_id long, ocr_text string, confidence double")


def _q_query_vec(spark: SparkSession, sf: str) -> list[float]:
    row = (
        load_table(spark, sf, "embeddings").filter(F.col("vec_id") == 0).select("embedding").first()
    )
    return [float(x) for x in row["embedding"]]


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    q: dict[str, Callable[[SparkSession, str], DataFrame]] = {}

    # ---- extraction (flagship, SURVEY §2.3–2.6) ----
    q["extract_text_spans"] = _q_extract_text_spans

    # ---- normalization / text analysis (O6/O7/O11, W-class, §2.6 + tier ops)
    q["normalize_text"] = lambda s, sf: _docs(s, sf).select(
        "doc_id", _spark_norm(F.col("text")).alias("normalized")
    )
    q["word_count_simple"] = lambda s, sf: _docs(s, sf).select(
        "doc_id", word_count_col(F.col("text")).cast("long").alias("word_count")
    )
    q["token_count"] = lambda s, sf: _docs(s, sf).select(
        "doc_id", token_count_col(F.col("text")).cast("long").alias("n_tokens")
    )
    q["lang_id"] = lambda s, sf: _docs(s, sf).select(
        "doc_id", lang_id_col(F.col("text")).alias("detected_lang")
    )
    q["quality_score"] = lambda s, sf: _docs(s, sf).select(
        "doc_id", quality_score_col(F.col("text")).alias("quality")
    )
    def _q_fingerprint(s, sf):
        # r8 registry consolidation (r7 verdict, next-round #1): the
        # md5 content fingerprint (D1) and the raw-byte sha256 file
        # hash were two single-code-path rows; one row now oracles
        # BOTH expressions — identical coverage, one window slot.
        from readur_spark.functions.textstats import fingerprint_bytes_col

        return _docs(s, sf).select(
            "doc_id",
            fingerprint_col(F.col("text")).alias("fingerprint"),
            fingerprint_bytes_col(F.col("text")).alias("file_hash"),
        )

    q["fingerprint"] = _q_fingerprint

    def _q_quality_gopher(s, sf):
        from readur_spark.functions.textstats import gopher_flags_cols

        # corpus-appropriate stopword list (the synthetic corpus speaks a
        # technical vocabulary; Gopher's English list is the default)
        return _docs(s, sf).select(
            "doc_id",
            *gopher_flags_cols(
                F.col("text"), stopwords=("the", "a", "table", "value", "row", "key")
            ),
        )

    q["quality_gopher"] = _q_quality_gopher

    def _q_chunk_documents(s, sf):
        from readur_spark.operators.extract import chunk_texts

        return chunk_texts(_docs(s, sf), chunk_words=40, overlap_words=8).select(
            "doc_id",
            F.col("chunk_no").cast("long").alias("chunk_no"),
            "chunk_text",
            F.col("n_words").cast("long").alias("n_words"),
        )

    q["chunk_documents"] = _q_chunk_documents
    q["text_metadata"] = lambda s, sf: _docs(s, sf).select(
        "doc_id", *text_metadata_cols(F.col("text"))
    )
    q["incremental_sync"] = _q_incremental_sync

    # ---- search surface (F1–F13, SURVEY §2.9) ----
    def _q_fts_modes(s, sf):
        # r8 registry consolidation: F1/F2/F3 were three rows over the
        # same tokenize-and-match path in operators/search.py; one
        # union row (mode column disambiguates) keeps all three query
        # shapes value-oracled in a single window slot.
        d = _docs(s, sf)
        return (
            search.fts_simple(d, "spark window")
            .withColumn("mode", F.lit("simple"))
            .unionByName(
                search.fts_phrase(d, "table value").withColumn(
                    "mode", F.lit("phrase")
                )
            )
            .unionByName(
                search.fts_boolean(
                    d,
                    must=["table"],
                    should=["spark", "window"],
                    must_not=["vector"],
                ).withColumn("mode", F.lit("boolean"))
            )
        )

    q["fts_modes"] = _q_fts_modes
    q["fuzzy_search"] = lambda s, sf: search.fuzzy_search(
        _docs(s, sf), "spark table window merge batch", threshold=0.15
    )
    q["search_ranked"] = lambda s, sf: search.search_ranked(_docs(s, sf), "spark", limit=25).select(
        "doc_id", F.col("search_rank").cast("long").alias("search_rank"), "n_chars"
    )
    q["paginate"] = lambda s, sf: search.paginate(_docs(s, sf), limit=20, offset=10)
    q["count_matching"] = lambda s, sf: search.count_matching(_docs(s, sf), "merge")
    def _q_facet_source_lang(s, sf):
        # r8 registry consolidation: the scalar-column facet path
        # (F11) faceted twice — source and lang — as two rows; one
        # stacked row keeps both value-oracled. facet_tags stays its
        # own entry (array-explode path, different code).
        d = _docs(s, sf)
        return (
            search.facet_counts(d, "source")
            .select(
                F.lit("source").alias("facet"),
                F.col("source").alias("value"),
                "n_docs",
            )
            .unionByName(
                search.facet_counts(d, "lang").select(
                    F.lit("lang").alias("facet"),
                    F.col("lang").alias("value"),
                    "n_docs",
                )
            )
        )

    q["facet_source_lang"] = _q_facet_source_lang
    q["filter_lang"] = lambda s, sf: search.filter_by_values(_docs(s, sf), "lang", ["es", "fr"])

    def _q_filter_labels(s, sf):
        from readur_spark.sources.tables import document_labels_table, labels_table

        return search.filter_by_labels(
            _docs(s, sf),
            document_labels_table(s, sf),
            labels_table(s),
            ["contract", "archive"],
        )

    def _q_facet_tags(s, sf):
        from readur_spark.sources.tables import document_labels_table, labels_table

        return search.tag_facets(document_labels_table(s, sf), labels_table(s))

    q["filter_labels"] = _q_filter_labels
    q["facet_tags"] = _q_facet_tags

    def _q_filter_role(s, sf):
        # deterministic ownership: owner_id = doc_id % 50; user 7, role=user
        owned = _docs(s, sf).withColumn("owner_id", F.col("doc_id") % 50)
        return search.filter_by_role(owned, user_id=7, role="user").select(
            "doc_id", "lang", "source", "n_chars"
        )

    q["filter_role"] = _q_filter_role
    q["search_ranked_ts"] = lambda s, sf: search.search_ranked_ts(
        _docs(s, sf), "spark merge", limit=25
    )
    q["snippets"] = lambda s, sf: search.snippets(_docs(s, sf), "spark").select(
        "doc_id", "snippet", F.col("match_offset").cast("long").alias("match_offset")
    )
    q["snippets_full"] = lambda s, sf: search.snippets_full(_docs(s, sf), "spark merge")
    q["list_documents"] = lambda s, sf: search.list_documents(_docs(s, sf), lang="en", min_chars=200)
    q["doc_stats"] = lambda s, sf: search.doc_stats(_docs(s, sf))
    q["sql_search"] = _q_sql_search
    q["extract_binary_roundtrip"] = _q_extract_binary_roundtrip

    # ---- image pipeline (I1–I17, real pixel layer + fake engine) ----
    q["image_quality_stats"] = _q_image_quality_stats
    q["image_ocr_fake"] = _q_image_ocr_fake
    q["pdf_ocr_glyph"] = _q_pdf_ocr_glyph

    # ---- dedup (D1–D4 + near-dup family) ----
    q["dedup_exact"] = lambda s, sf: dedup.exact_duplicates(_docs(s, sf))
    q["dedup_keep_first"] = lambda s, sf: dedup.dedup_keep_first(_docs(s, sf)).select(
        "doc_id", "lang", "source", "n_chars"
    )
    q["dedup_ngram_jaccard"] = lambda s, sf: dedup.ngram_jaccard_pairs(
        _docs(s, sf), threshold=0.5, n=3
    )
    def _q_ngram_capped(s, sf):
        # the SCALE configuration of the exact operator (df-cap + mass-
        # duplicate recovery) — the one a 100 TB run uses. A 31-doc
        # boilerplate family (> cap) is planted deterministically so the
        # recovery path is exercised, not just the cap.
        docs_df = _docs(s, sf).select("doc_id", "text")
        planted = s.range(31).select(
            (F.col("id") + 9_000_000).alias("doc_id"),
            F.lit(_BOILER_TEXT).alias("text"),
        )
        return dedup.ngram_jaccard_pairs(
            docs_df.unionByName(planted), threshold=0.5, n=3, max_shingle_df=25
        )

    q["dedup_ngram_capped"] = _q_ngram_capped

    def _q_lm_perplexity(s, sf):
        # CCNet shape: train the bigram LM on half the corpus, score ALL
        # docs — held-out docs exercise the unseen-pair/context smoothing
        from readur_spark.operators.lm import perplexity_score, train_bigram_lm

        docs_df = _docs(s, sf)
        lm = train_bigram_lm(docs_df.filter(F.col("doc_id") % 2 == 0))
        return perplexity_score(docs_df, lm, broadcast_model=True).select(
            "doc_id",
            F.col("n_bigrams").cast("long").alias("n_bigrams"),
            F.round("avg_nll", 6).alias("avg_nll"),
        )

    q["lm_perplexity"] = _q_lm_perplexity

    def _q_dedup_lines(s, sf):
        # plant a corpus-wide boilerplate footer + a unique per-doc tail:
        # the footer (df=5000 > 10) must vanish from every doc, the tails
        # and original lines must survive in order
        from readur_spark.operators.dedup import dedup_lines

        d = _docs(s, sf).select(
            "doc_id",
            F.concat(
                F.col("text"),
                F.lit("\nShared Copyright Footer Line For All Documents\nUnique tail "),
                F.col("doc_id").cast("string"),
            ).alias("text"),
        )
        return dedup_lines(d, max_line_df=10).select(
            "doc_id",
            "text",
            F.col("n_lines").cast("long").alias("n_lines"),
            F.col("n_lines_removed").cast("long").alias("n_lines_removed"),
        )

    q["dedup_lines"] = _q_dedup_lines

    def _q_decontaminate_ngrams(s, sf):
        # GPT-3-style exact 13-gram collision check, self-decontamination
        # form: eval = doc_id % 7 == 0, identity pairs excluded
        docs_df = _docs(s, sf)
        heldout = docs_df.filter(F.col("doc_id") % 7 == 0)
        return dedup.decontaminate_ngrams(
            docs_df, heldout, n=13, exclude_same_id=True
        ).select(
            "doc_id",
            F.col("n_collisions").cast("long").alias("n_collisions"),
            F.col("n_grams").cast("long").alias("n_grams"),
            "collision_frac",
        )

    q["decontaminate_ngrams"] = _q_decontaminate_ngrams
    q["tfidf_top_terms"] = lambda s, sf: search.tfidf_top_terms(
        _docs(s, sf), k=5
    )

    def _q_warc_roundtrip(s, sf):
        # Common Crawl ingestion check: documents synthesized into
        # per-record-gzip .warc.gz shards (memoized fixture, one file per
        # 500 docs — the fixture build collects bounded sf0.01 rows; the
        # OPERATOR under test is the distributed read_warc), read back and
        # compared value-for-value against the source table.
        import glob
        import hashlib
        import os

        from readur_spark.sources.warc import build_warc, read_warc

        # fixture tag folds in the docs parquet's (path, mtime, size) so a
        # regenerated table at the same sf invalidates stale shards
        # (ADVICE r4) — stat-based, no extra scan of the table
        doc_files = sorted(
            glob.glob(os.path.join(sf, "documents.parquet"))
            + glob.glob(os.path.join(sf, "documents.parquet", "*.parquet"))
        )
        stamp = ";".join(
            f"{p}:{os.path.getmtime(p)}:{os.path.getsize(p)}" for p in doc_files
        )
        tag = hashlib.md5((sf + "|" + stamp).encode()).hexdigest()[:8]
        out_dir = f"/tmp/readur_spark_warc_{tag}"
        marker = os.path.join(out_dir, "_DONE")
        if not os.path.exists(marker):
            os.makedirs(out_dir, exist_ok=True)
            rows = sorted(
                (r["doc_id"], r["text"])
                for r in _docs(s, sf).select("doc_id", "text").collect()
            )
            for fi in range(0, len(rows), 500):
                shard = [
                    {
                        "warc_type": "resource",
                        "target_uri": f"https://corpus.example/doc/{did}",
                        "payload": (text or "").encode("utf-8"),
                    }
                    for did, text in rows[fi : fi + 500]
                ]
                with open(
                    os.path.join(out_dir, f"part-{fi // 500:05d}.warc.gz"), "wb"
                ) as f:
                    f.write(build_warc(shard))
            open(marker, "w").close()
        recs = read_warc(s, out_dir + "/*.warc.gz", warc_types=("resource",))
        return recs.select(
            F.regexp_extract("target_uri", r"/doc/(\d+)$", 1)
            .cast("long")
            .alias("doc_id"),
            F.decode(F.col("payload"), "UTF-8").alias("text"),
        )

    q["warc_roundtrip"] = _q_warc_roundtrip

    def _q_dedup_incremental(s, sf):
        # ingest-time dedup: history = docs with doc_id%3==0 already
        # committed; the incoming batch is the whole table — survivors are
        # docs whose content is NOT in history, keep-first within batch
        docs_df = _docs(s, sf)
        history = docs_df.filter(F.col("doc_id") % 3 == 0).select(
            dedup.fingerprint_col(F.col("text")).alias("fingerprint")
        )
        return dedup.dedup_against_history(docs_df, history).select(
            "doc_id", "lang", "source", "n_chars"
        )

    q["dedup_incremental"] = _q_dedup_incremental

    def _q_lm_backoff(s, sf):
        # trigram Stupid Backoff trained on even doc_ids, scoring all docs
        # — held-out docs exercise every backoff level incl. OOV
        from readur_spark.operators.lm import backoff_score, train_backoff_lm

        docs_df = _docs(s, sf)
        lm = train_backoff_lm(docs_df.filter(F.col("doc_id") % 2 == 0))
        return backoff_score(docs_df, lm, broadcast_model=True).select(
            "doc_id",
            F.col("n_trigrams").cast("long").alias("n_trigrams"),
            F.round("avg_nll", 6).alias("avg_nll"),
        )

    q["lm_backoff"] = _q_lm_backoff

    def _q_minhash_incremental(s, sf):
        # incoming batch = doc_id%3 != 0, committed history = doc_id%3 == 0
        docs_df = _docs(s, sf)
        return dedup.minhash_lsh_incremental(
            docs_df.filter(F.col("doc_id") % 3 != 0),
            docs_df.filter(F.col("doc_id") % 3 == 0),
            threshold=0.5,
            num_hashes=32,
            bands=8,
            n=3,
        )

    q["dedup_minhash_incremental"] = _q_minhash_incremental
    q["corpus_stats"] = lambda s, sf: relational.corpus_stats(_docs(s, sf))

    def _q_dsir(s, sf):
        # DSIR importance weights: target = doc_id%5==0, raw = everything
        from readur_spark.operators.dsir import dsir_weights

        docs_df = _docs(s, sf)
        return dsir_weights(
            docs_df, docs_df.filter(F.col("doc_id") % 5 == 0),
            n=2, num_buckets=4096,
        ).select(
            "doc_id",
            F.col("n_features").cast("long").alias("n_features"),
            F.round("log_w", 6).alias("log_w"),
        )

    q["dsir_weights"] = _q_dsir

    def _q_dsir_resample_largek(s, sf):
        # the large-k THRESHOLD path (r5 verdict #4): driver_topk_max=0
        # forces approxQuantile bracket + distributed filter — no k-row
        # TakeOrdered anywhere; the selected set must still equal exact
        # top-k by (gumbel key desc, id asc), which the oracle computes
        # directly from the same salted-md5 uniform.
        from readur_spark.operators.dsir import dsir_resample

        docs_df = _docs(s, sf)
        out = dsir_resample(
            docs_df,
            docs_df.filter(F.col("doc_id") % 5 == 0),
            k=120,
            temperature=1.0,
            driver_topk_max=0,
            n=2,
            num_buckets=4096,
        )
        return out.select("doc_id")

    q["dsir_resample_largek"] = _q_dsir_resample_largek

    def _q_url_dedup(s, sf):
        # canonical-URL dedup (crawl-frontier hygiene): five deterministic
        # messy spellings per logical page — case-shifted host + default
        # port, tracking params, re-ordered query, fragments — must
        # collapse to two canonical groups per page. The oracle mirrors
        # BOTH the messy construction and the full canonicalization in
        # DuckDB SQL (_canonical_url_sql), so every folding rule is
        # value-checked, not just the row count.
        from readur_spark.functions.urls import canonical_url_col

        d = _docs(s, sf).select("doc_id")
        page = (F.col("doc_id") % 97).cast("string")
        v = F.col("doc_id") % 5
        base = F.concat(F.lit("https://www.site.com/page/"), page)
        url = (
            F.when(v == 0, base)
            .when(
                v == 1,
                F.concat(
                    F.lit("HTTPS://WWW.SITE.COM:443/page/"),
                    page,
                    F.lit("#frag"),
                ),
            )
            .when(
                v == 2,
                F.concat(base, F.lit("?utm_source=rss&utm_medium=feed")),
            )
            .when(v == 3, F.concat(base, F.lit("?b=2&a=1")))
            .otherwise(F.concat(base, F.lit("?a=1&b=2#s")))
        )
        canon = d.select(
            "doc_id", canonical_url_col(url).alias("canonical_url")
        )
        return canon.groupBy("canonical_url").agg(
            F.min("doc_id").alias("keep_doc"),
            F.count("*").alias("n_variants"),
        )

    q["url_canonical_dedup"] = _q_url_dedup

    def _q_global_shuffle(s, sf):
        # deterministic global shuffle with explicit positions (the
        # every-epoch training-data ordering step). The operator computes
        # ranks via the bucketed two-phase prefix scan (no SinglePartition
        # exchange); the oracle is the definitionally-global
        # row_number() OVER (ORDER BY md5(id||salt), id) — equality
        # proves the distributed rank assembly exact.
        from readur_spark.operators.sampling import global_shuffle

        return global_shuffle(
            _docs(s, sf).select("doc_id"), num_buckets=64
        ).select("doc_id", "shuffle_pos")

    q["global_shuffle"] = _q_global_shuffle

    def _q_outlink_domains(s, sf):
        # outlink extraction as curation statistics: five deterministic
        # hrefs per document (a messy absolute one that exercises the
        # whole canonicalization, a relative one attributed to the
        # page's own domain, a clean cross-site one, plus — r7, the
        # widened-extractor forms — a SINGLE-QUOTED and an UNQUOTED
        # href), extracted with the three codegen'd per-form patterns,
        # aggregated per target domain. The oracle rebuilds the SAME
        # markup in SQL and unnests the same three regexes —
        # extraction, canonicalization, attribution, and aggregation
        # are all value-checked.
        from readur_spark.operators.linkgraph import extract_outlinks

        d = _docs(s, sf).select("doc_id")
        html = F.concat(
            F.lit('<p>x</p><a href="https://Site'),
            (F.col("doc_id") % 23).cast("string"),
            F.lit(".COM:443/p/"),
            (F.col("doc_id") % 7).cast("string"),
            F.lit('?utm_source=x&b=2&a=1">t</a><a href="/rel/'),
            (F.col("doc_id") % 5).cast("string"),
            F.lit('">r</a><a href="http://c'),
            (F.col("doc_id") % 13).cast("string"),
            F.lit(".org/q#frag\">u</a><a href='https://sq"),
            (F.col("doc_id") % 9).cast("string"),
            F.lit(".example/s'>sq</a><a href=http://uq"),
            (F.col("doc_id") % 6).cast("string"),
            F.lit(".net/u class=z>uq</a>"),
        )
        base_dom = F.concat(
            F.lit("host"), (F.col("doc_id") % 11).cast("string"),
            F.lit(".net"),
        )
        pages = d.select(
            "doc_id", html.alias("html"), base_dom.alias("dom")
        )
        links = extract_outlinks(pages, base_domain_col="dom")
        return links.groupBy("dst_domain").agg(
            F.count("*").alias("n_links"),
            F.countDistinct("doc_id").alias("n_docs"),
            F.min("target_url").alias("sample_url"),
        )

    q["outlink_domains"] = _q_outlink_domains

    def _q_domain_pagerank(s, sf):
        # distributed PageRank over a deterministic host graph derived
        # from doc_id: src = d(id % 53), dst = d((13·id + 5) % 97) in a
        # SHARED d0..d96 namespace — so d53..d96 never emit edges
        # (real dangling mass, redistributed uniformly each step) while
        # d0..d52 form cycles. 5 power iterations at damping 0.85; the
        # oracle replays the identical iteration as five chained CTEs
        # (see _pagerank_sql), value-checking mass conservation,
        # dangling handling, and the join+groupBy contribution sums.
        from readur_spark.operators.linkgraph import (
            build_domain_graph,
            pagerank,
        )

        d = _docs(s, sf).select("doc_id")
        raw = d.select(
            F.concat(
                F.lit("d"), (F.col("doc_id") % 53).cast("string")
            ).alias("src_domain"),
            F.concat(
                F.lit("d"), ((F.col("doc_id") * 13 + 5) % 97).cast("string")
            ).alias("dst_domain"),
        )
        edges = build_domain_graph(raw)
        return pagerank(edges, damping=0.85, iters=5).select(
            "node", "rank"
        )

    q["domain_pagerank"] = _q_domain_pagerank

    def _q_domain_trustrank(s, sf):
        # TrustRank (r7): the SAME deterministic host graph, but the
        # teleport / dangling re-entry / initial mass restricted to
        # five trusted seed hosts — trust flows outward along links, so
        # hosts far from every seed (and the d53..d96 sink-only nodes)
        # score near-zero. Oracle: chained-CTE replay of the identical
        # personalized recurrence (_trustrank_sql).
        from readur_spark.operators.linkgraph import (
            build_domain_graph,
            trustrank,
        )

        d = _docs(s, sf).select("doc_id")
        raw = d.select(
            F.concat(
                F.lit("d"), (F.col("doc_id") % 53).cast("string")
            ).alias("src_domain"),
            F.concat(
                F.lit("d"), ((F.col("doc_id") * 13 + 5) % 97).cast("string")
            ).alias("dst_domain"),
        )
        edges = build_domain_graph(raw)
        return trustrank(
            edges,
            ["d0", "d7", "d14", "d21", "d35"],
            damping=0.85,
            iters=5,
        ).select("node", "rank")

    q["domain_trustrank"] = _q_domain_trustrank

    def _q_domain_hits(s, sf):
        # HITS (r8): hub/authority mutual reinforcement over the SAME
        # deterministic host graph — 5 iterations, each vector
        # L2-normalized, authority from previous hubs then hub from the
        # NEW authorities (Kleinberg's update order). Oracle: chained-
        # CTE replay of the identical recurrence (_hits_sql), value-
        # checking both vectors and the normalization scalars.
        from readur_spark.operators.linkgraph import (
            build_domain_graph,
            hits,
        )

        d = _docs(s, sf).select("doc_id")
        raw = d.select(
            F.concat(
                F.lit("d"), (F.col("doc_id") % 53).cast("string")
            ).alias("src_domain"),
            F.concat(
                F.lit("d"), ((F.col("doc_id") * 13 + 5) % 97).cast("string")
            ).alias("dst_domain"),
        )
        edges = build_domain_graph(raw)
        return hits(edges, iters=5).select("node", "hub", "authority")

    q["domain_hits"] = _q_domain_hits

    def _q_domain_harmonic(s, sf):
        # HyperBall (Boldi-Vigna 2013, r7) over the same deterministic
        # host graph: HLL-sketched reachability balls, one
        # join+register-max round per hop with exact fixpoint stop;
        # emits reach estimate, harmonic centrality (the Common Crawl
        # host-rank signal), and the convergence round per node. The
        # md5 register function makes the sketches bit-deterministic,
        # so the oracle replays the IDENTICAL algorithm in pure Python
        # (hyperball_replay) and the match is exact, not approximate.
        from readur_spark.operators.linkgraph import build_domain_graph
        from readur_spark.operators.neighborhood import hyperball

        d = _docs(s, sf).select("doc_id")
        raw = d.select(
            F.concat(
                F.lit("d"), (F.col("doc_id") % 53).cast("string")
            ).alias("src_domain"),
            F.concat(
                F.lit("d"), ((F.col("doc_id") * 13 + 5) % 97).cast("string")
            ).alias("dst_domain"),
        )
        edges = build_domain_graph(raw)
        return hyperball(edges, p=6, max_t=8).select(
            "node",
            F.round("reach_est", 6).alias("reach_est"),
            F.round("harmonic", 6).alias("harmonic"),
            "t_converged",
        )

    q["domain_harmonic"] = _q_domain_harmonic

    def _q_domain_blocklist(s, sf):
        # UT1-style curated-blocklist filter: the broadcast anti-join
        # must drop exactly the residue classes on the list,
        # case-insensitively
        from readur_spark.operators.linkgraph import (
            filter_by_domain_blocklist,
        )

        d = _docs(s, sf).select("doc_id")
        docs = d.select(
            "doc_id",
            F.concat(
                F.when(F.col("doc_id") % 2 == 0, F.lit("Host"))
                .otherwise(F.lit("host")),
                (F.col("doc_id") % 19).cast("string"),
                F.lit(".example"),
            ).alias("domain"),
        )
        out = filter_by_domain_blocklist(
            docs, ["host3.example", "HOST7.example", "host11.example"]
        )
        return out.select("doc_id", "domain")

    q["domain_blocklist_filter"] = _q_domain_blocklist

    def _q_domain_degrees(s, sf):
        # degree profile over the SAME deterministic host graph as
        # domain_pagerank — out/in/reciprocal degree, with the
        # reciprocal count exercising the edge-reversal semi-join.
        # r8 registry consolidation: the DISTINCT-neighbor profile and
        # the r7 MULTIPLICITY-weighted profile (the modulus mapping is
        # many-to-one, so several doc_ids emit the same pair and
        # build_domain_graph(weighted=True) counts them — the stronger
        # spam signal) were two rows over domain_degree_stats; one
        # joined row now oracles both modes. reciprocal stays the
        # distinct-mutual-neighbor count in both modes by contract, so
        # only the distinct leg's column is kept.
        from readur_spark.operators.linkgraph import (
            build_domain_graph,
            domain_degree_stats,
        )

        d = _docs(s, sf).select("doc_id")
        raw = d.select(
            F.concat(
                F.lit("d"), (F.col("doc_id") % 53).cast("string")
            ).alias("src_domain"),
            F.concat(
                F.lit("d"), ((F.col("doc_id") * 13 + 5) % 97).cast("string")
            ).alias("dst_domain"),
        )
        dist = domain_degree_stats(build_domain_graph(raw))
        wtd = domain_degree_stats(
            build_domain_graph(raw, weighted=True), weight_col="weight"
        ).select(
            "domain",
            F.col("out_degree").alias("w_out_degree"),
            F.col("in_degree").alias("w_in_degree"),
        )
        # same node set on both sides (same edge list, weighted only
        # adds multiplicity) — inner join is total
        return dist.join(wtd, "domain")

    q["domain_degrees"] = _q_domain_degrees

    def _q_rank_filter_docs(s, sf):
        # the link-graph family composed end-to-end the way a curation
        # pipeline uses it: build the host graph, rank it, attribute
        # each document to its domain, keep docs whose domain ranks
        # ABOVE UNIFORM (1/N) — the drop-link-farm-islands policy. The
        # rank join is a broadcast (domain table is small by
        # definition); at 10^8 domains it becomes a shuffle join on the
        # uniform domain key — either way no new scale surface beyond
        # pagerank itself.
        from readur_spark.operators.linkgraph import (
            build_domain_graph,
            pagerank,
        )

        d = _docs(s, sf).select("doc_id")
        raw = d.select(
            F.concat(
                F.lit("d"), (F.col("doc_id") % 53).cast("string")
            ).alias("src_domain"),
            F.concat(
                F.lit("d"), ((F.col("doc_id") * 13 + 5) % 97).cast("string")
            ).alias("dst_domain"),
        )
        pr = pagerank(build_domain_graph(raw), damping=0.85, iters=5)
        n = pr.count()  # one scalar — same driver discipline as pagerank
        docs2 = d.select(
            "doc_id",
            F.concat(
                F.lit("d"), (F.col("doc_id") % 53).cast("string")
            ).alias("domain"),
        )
        return (
            docs2.join(
                F.broadcast(pr), docs2["domain"] == pr["node"]
            )
            .filter(F.col("rank") > 1.0 / n)
            .select("doc_id", "domain", "rank")
        )

    q["rank_filter_docs"] = _q_rank_filter_docs

    def _q_domain_islands(s, sf):
        # weakly-connected components of the host graph with sizes —
        # the link-farm island signal. Oracle: an INDEPENDENT
        # union-find over the same deterministic edge set (VALUES
        # literal), vs the distributed min-label propagation here.
        from readur_spark.operators.linkgraph import (
            build_domain_graph,
            domain_components,
        )

        d = _docs(s, sf).select("doc_id")
        # sparser construction than the pagerank graph so the
        # components are non-trivial (mod 100 on both ends leaves
        # disconnected islands at sf0.01)
        raw = d.filter(F.col("doc_id") % 5 < 2).select(
            F.concat(
                F.lit("h"), (F.col("doc_id") % 100).cast("string")
            ).alias("src_domain"),
            F.concat(
                F.lit("h"), ((F.col("doc_id") * 7 + 3) % 100).cast("string")
            ).alias("dst_domain"),
        )
        return domain_components(build_domain_graph(raw))

    q["domain_islands"] = _q_domain_islands

    def _q_sentence_stats(s, sf):
        # sentence-level quality features over the corpus (C4's >=3
        # sentences / terminal-punctuation family) — one codegen'd
        # pass, mirrored expression-for-expression in the oracle
        from readur_spark.functions.textstats import sentence_stats_cols

        d = _docs(s, sf)
        return d.select("doc_id", *sentence_stats_cols(F.col("text")))

    q["sentence_stats"] = _q_sentence_stats

    def _q_curriculum_order(s, sf):
        # curriculum-learning data order: ascending quality bands with a
        # salted shuffle inside each band, positions from the shared
        # bucketed prefix scan. Synthetic quality = (doc_id % 97)/97 so
        # the oracle replays the identical band arithmetic; the REAL
        # quality function has its own oracled row (quality_score).
        from readur_spark.operators.sampling import curriculum_positions

        d = _docs(s, sf).select(
            "doc_id", ((F.col("doc_id") % 97) / 97.0).alias("quality")
        )
        return curriculum_positions(d, phases=10).select(
            "doc_id", "curriculum_pos"
        )

    q["curriculum_order"] = _q_curriculum_order

    def _q_curriculum_pack_roundtrip(s, sf):
        # curriculum × packing composed: a real trainer packs sequences
        # in the order it READS — the curriculum order — not id order.
        # curriculum_positions assigns band-annealed positions; the
        # packer's order_col hook cuts the token stream in ascending
        # curriculum_pos (r6 verdict, next-round #8). The oracle replays
        # the position window and the definitional running-sum cut
        # ordered by those positions — position assembly, the order_col
        # key plumbing, and boundary explosion are all value-checked as
        # one composition.
        from readur_spark.operators.packing import pack_sequences
        from readur_spark.operators.sampling import curriculum_positions

        d = _docs(s, sf).select(
            "doc_id",
            "text",
            ((F.col("doc_id") % 97) / 97.0).alias("quality"),
        )
        cur = curriculum_positions(d, phases=10)
        return pack_sequences(cur, seq_len=512, order_col="curriculum_pos")

    q["curriculum_pack_roundtrip"] = _q_curriculum_pack_roundtrip

    def _q_semdedup(s, sf):
        from readur_spark.operators.similarity import semdedup

        return semdedup(
            load_table(s, sf, "embeddings"), threshold=0.3, n_clusters=16
        ).select("vec_id")

    q["semdedup"] = _q_semdedup

    def _q_pack_stats(s, sf):
        from readur_spark.operators.packing import pack_sequences, packing_stats

        return packing_stats(pack_sequences(_docs(s, sf), seq_len=512), 512).select(
            "seq_id",
            F.col("n_docs").cast("long").alias("n_docs"),
            F.col("n_tokens").cast("long").alias("n_tokens"),
            "fill_ratio",
        )

    q["pack_stats"] = _q_pack_stats

    def _q_scrub_pii(s, sf):
        from readur_spark.functions.textstats import pii_counts_cols, scrub_pii_col

        planted = F.concat(
            F.col("text"),
            F.lit(" contact user"),
            F.col("doc_id").cast("string"),
            F.lit("@example.com or 10.0."),
            (F.col("doc_id") % 256).cast("string"),
            F.lit(".7 phone +1 555 867-5309 done"),
        )
        d = _docs(s, sf).select("doc_id", planted.alias("text"))
        return d.select(
            "doc_id",
            scrub_pii_col(F.col("text")).alias("scrubbed"),
            *pii_counts_cols(F.col("text")),
        )

    q["scrub_pii"] = _q_scrub_pii
    q["dedup_minhash_lsh"] = lambda s, sf: dedup.minhash_lsh_pairs(
        _docs(s, sf), threshold=0.5, num_hashes=32, bands=8, n=3
    )
    q["dedup_simhash"] = lambda s, sf: dedup.simhash_pairs(_docs(s, sf), max_hamming=3)
    q["dedup_embedding"] = lambda s, sf: dedup.embedding_dup_pairs(
        load_table(s, sf, "embeddings"), threshold=0.4
    )
    q["winnow_overlap"] = lambda s, sf: dedup.winnow_overlap_pairs(
        _docs(s, sf), min_shared=3, k=25, window=16
    ).select("id_a", "id_b", F.col("shared_fps").cast("long").alias("shared_fps"))
    # oracled view: the confirmed spans (the operator additionally emits a
    # seeds_truncated flag + marker rows for capped pairs, not SQL-expressible)
    q["dup_spans"] = lambda s, sf: dedup.duplicate_spans(
        _docs(s, sf), min_len=50, k=25, window=16
    ).filter(F.col("length") > 0).select(
        "id_a", "id_b", "start_a", "start_b", "length"
    )

    def _q_decontaminate(s, sf):
        docs_df = _docs(s, sf)
        heldout = docs_df.filter(F.col("doc_id") % 5 == 0)
        return dedup.decontaminate(
            docs_df, heldout, min_len=50, k=25, window=16, exclude_same_id=True
        ).filter(F.col("n_spans") > 0).select(
            "doc_id",
            "n_eval_docs",
            F.col("n_spans").cast("long").alias("n_spans"),
            F.col("contaminated_chars").cast("long").alias("contaminated_chars"),
        )

    q["decontaminate"] = _q_decontaminate

    def _q_pack_sequences(s, sf):
        from readur_spark.operators.packing import pack_sequences

        return pack_sequences(_docs(s, sf), seq_len=512)

    q["pack_sequences"] = _q_pack_sequences

    def _interleaved_docs(s, sf):
        # deterministic interleaved table in the north-rule shape
        # (doc_id, spans: array<struct<kind,text,media_ref,offset>>):
        # first half of the document text, an image every 3rd doc
        # (media_ref repeats mod 50), the second half, an audio clip
        # every 7th doc — so text spans split at boundaries AND media
        # blocks land mid-sequence, and the oracle rebuilds the exact
        # same spans in SQL.
        d = _docs(s, sf)
        mk = lambda kind, text, ref, off: F.struct(  # noqa: E731
            F.lit(kind).alias("kind"),
            text.alias("text"),
            ref.alias("media_ref"),
            F.lit(off).alias("offset"),
        )
        spans = F.filter(
            F.array(
                mk("text", F.expr("substring(text, 1, CAST(length(text)/2 AS INT))"), F.lit(""), 0),
                F.when(
                    F.col("doc_id") % 3 == 0,
                    mk(
                        "image",
                        F.lit(""),
                        F.concat(F.lit("img://"), (F.col("doc_id") % 50).cast("string")),
                        1,
                    ),
                ),
                mk("text", F.expr("substring(text, CAST(length(text)/2 AS INT) + 1)"), F.lit(""), 2),
                F.when(
                    F.col("doc_id") % 7 == 0,
                    mk(
                        "audio",
                        F.lit(""),
                        F.concat(F.lit("aud://"), F.col("doc_id").cast("string")),
                        3,
                    ),
                ),
            ),
            lambda x: x.isNotNull(),
        )
        return d.select("doc_id", spans.alias("spans"))

    def _q_interleave_pack(s, sf):
        # multimodal interleaved packing manifest: text spans counted by
        # the regex pre-tokenizer, image=64 / audio=128 token blocks,
        # GPT-style stream cut at 512 with straddle flags — the whole
        # span-stream prefix scan value-checked against a windowed-SQL
        # replay of the same stream
        from readur_spark.operators.interleave import (
            build_interleaved_sequences,
        )

        return build_interleaved_sequences(
            _interleaved_docs(s, sf),
            seq_len=512,
            media_token_cost={"image": 64, "audio": 128},
        )

    q["interleave_pack"] = _q_interleave_pack

    def _q_interleave_fill_stats(s, sf):
        # per-sequence multimodal fill report over the same manifest
        from readur_spark.operators.interleave import (
            build_interleaved_sequences,
            interleave_stats,
        )

        man = build_interleaved_sequences(
            _interleaved_docs(s, sf),
            seq_len=512,
            media_token_cost={"image": 64, "audio": 128},
        )
        st = interleave_stats(man, 512)
        return st.select(
            "seq_id",
            "n_docs",
            "n_spans",
            "n_text_tokens",
            "n_media_tokens",
            "n_media",
            "n_cut_media",
            F.round("fill", 6).alias("fill"),
        )

    q["interleave_fill_stats"] = _q_interleave_fill_stats

    def _q_interleave_materialize(s, sf):
        # the COMPLETE multimodal layout path: span-stream manifest ->
        # materialized element sequences (token-id slices for text,
        # placeholders for media), verified per sequence by element
        # count, token total, and an md5 over the ordered canonical
        # rendering kind|media_ref|ids. The encoder is Catalyst-only
        # (one id per regex token = its character length) so the oracle
        # can replay the exact slices in SQL.
        from readur_spark.operators.interleave import (
            build_interleaved_sequences,
            materialize_interleaved,
        )

        docs_df = _interleaved_docs(s, sf)
        man = build_interleaved_sequences(
            docs_df,
            seq_len=512,
            media_token_cost={"image": 64, "audio": 128},
        )

        def enc(c):
            return F.transform(
                F.regexp_extract_all(
                    c, F.lit(r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]"), 0
                ),
                lambda t: F.length(t),
            )

        seqs = materialize_interleaved(docs_df, man, enc)
        render = F.transform(
            "elements",
            lambda el: F.concat_ws(
                "|",
                el["kind"],
                el["media_ref"],
                F.concat_ws(
                    ",",
                    F.coalesce(
                        el["ids"].cast("array<string>"),
                        F.array().cast("array<string>"),
                    ),
                ),
            ),
        )
        return seqs.select(
            "seq_id",
            F.size("elements").cast("long").alias("n_elements"),
            "n_tokens",
            F.md5(F.concat_ws(";", render)).alias("sig"),
        )

    q["interleave_materialize"] = _q_interleave_materialize

    def _q_anchor_profile(s, sf):
        # anchor-text aggregation per link target: two same-target
        # anchors with different texts per doc (plus a relative one,
        # plus — r7, the widened-extractor forms — a SINGLE-QUOTED
        # anchor with NESTED MARKUP in its body and an UNQUOTED-href
        # anchor) so frequency ranking, whitespace collapse, markup
        # strip, dedup counts, and the bounded top-k window all carry
        # signal. The oracle re-extracts element-wise with the same
        # RE2-mirrored patterns in SQL.
        from readur_spark.operators.linkgraph import (
            anchor_text_stats,
            extract_anchor_texts,
        )

        d = _docs(s, sf).select("doc_id")
        html = F.concat(
            F.lit('<a href="https://t'),
            (F.col("doc_id") % 17).cast("string"),
            F.lit('.com/p">Anchor  '),
            (F.col("doc_id") % 3).cast("string"),
            F.lit('</a><a id="x" href="https://t'),
            (F.col("doc_id") % 17).cast("string"),
            F.lit('.com/p">Anchor '),
            (F.col("doc_id") % 5).cast("string"),
            F.lit('</a><a href="/l/'),
            (F.col("doc_id") % 4).cast("string"),
            F.lit('">Rel '),
            (F.col("doc_id") % 2).cast("string"),
            F.lit("</a><a href='https://t"),
            (F.col("doc_id") % 17).cast("string"),
            F.lit(".com/p'><b>Bold</b> "),
            (F.col("doc_id") % 3).cast("string"),
            F.lit("</a><a href=/u/"),
            (F.col("doc_id") % 4).cast("string"),
            F.lit(" rel=nofollow>Unq "),
            (F.col("doc_id") % 2).cast("string"),
            F.lit("</a>"),
        )
        a = extract_anchor_texts(d.select("doc_id", html.alias("html")))
        st = anchor_text_stats(a, top_k=2)
        return st.select(
            "target_url",
            "n_anchors",
            "n_doc_anchor_pairs",
            "n_unique_texts",
            F.concat_ws("|", "top_anchors").alias("top2"),
        )

    q["anchor_profile"] = _q_anchor_profile

    def _q_anchor_quality(s, sf):
        # NEW r8 (r7 verdict next-round #6): inbound-anchor profiles
        # consumed as per-DOCUMENT quality features. Same deterministic
        # markup as anchor_profile; each doc is attributed url
        # https://t{doc_id%23}.com/p — %23 > %17, so docs landing on
        # t17..t22 exercise the never-linked zero-fill branch while
        # t0..t16 join real profiles (diversity, top-share, len mean).
        from readur_spark.operators.linkgraph import (
            anchor_quality_features,
            extract_anchor_texts,
        )

        d = _docs(s, sf).select("doc_id")
        html = F.concat(
            F.lit('<a href="https://t'),
            (F.col("doc_id") % 17).cast("string"),
            F.lit('.com/p">Anchor  '),
            (F.col("doc_id") % 3).cast("string"),
            F.lit('</a><a id="x" href="https://t'),
            (F.col("doc_id") % 17).cast("string"),
            F.lit('.com/p">Anchor '),
            (F.col("doc_id") % 5).cast("string"),
            F.lit('</a><a href="/l/'),
            (F.col("doc_id") % 4).cast("string"),
            F.lit('">Rel '),
            (F.col("doc_id") % 2).cast("string"),
            F.lit("</a><a href='https://t"),
            (F.col("doc_id") % 17).cast("string"),
            F.lit(".com/p'><b>Bold</b> "),
            (F.col("doc_id") % 3).cast("string"),
            F.lit("</a><a href=/u/"),
            (F.col("doc_id") % 4).cast("string"),
            F.lit(" rel=nofollow>Unq "),
            (F.col("doc_id") % 2).cast("string"),
            F.lit("</a>"),
        )
        a = extract_anchor_texts(d.select("doc_id", html.alias("html")))
        docs2 = d.select(
            "doc_id",
            F.concat(
                F.lit("https://t"),
                (F.col("doc_id") % 23).cast("string"),
                F.lit(".com/p"),
            ).alias("url"),
        )
        out = anchor_quality_features(docs2, a)
        return out.select(
            "doc_id",
            "url",
            "n_inlink_anchors",
            "n_linking_docs",
            "n_unique_anchor_texts",
            F.round("anchor_diversity", 6).alias("anchor_diversity"),
            F.round("top_anchor_share", 6).alias("top_anchor_share"),
            F.round("anchor_text_len_mean", 6).alias(
                "anchor_text_len_mean"
            ),
        )

    q["anchor_quality_features"] = _q_anchor_quality

    def _q_bpe_token_counts(s, sf):
        # distributed BPE train (word-count shuffle + driver merge loop)
        # + Arrow-batched encode; id_sum checks the actual token ids, not
        # just their count. Oracle: independent naive trainer + rank-order
        # encoder replayed in Python, emitted as a VALUES literal.
        from readur_spark.operators.bpe import (
            bpe_encode_udf,
            train_bpe_distributed,
        )

        docs_df = _docs(s, sf)
        tok = train_bpe_distributed(docs_df, num_merges=_BPE_MERGES)
        d = docs_df.select(
            "doc_id", bpe_encode_udf(tok)(F.col("text")).alias("ids")
        )
        return d.select(
            "doc_id",
            F.size("ids").cast("long").alias("n_tokens"),
            F.aggregate(
                "ids", F.lit(0).cast("long"), lambda a, x: a + x
            ).alias("id_sum"),
        )

    q["bpe_token_counts"] = _q_bpe_token_counts

    def _q_bpe_token_counts_sparkloop(s, sf):
        # the SAME contract as bpe_token_counts but trained through the
        # executor-side merge loop (train_bpe_spark_loop — the
        # beyond-1M-word fallback path): word-count table stays
        # distributed, each pass applies a batch of provably
        # sequential-exact compatible merges. Until r7 this path was
        # equality-tested offline but never driver-oracled (r6 verdict,
        # next-round #6); the oracle is the identical naive replay, so a
        # green row proves spark-loop == sequential == naive end to end
        # in the driver harness.
        from readur_spark.kernels.bpe import BpeTokenizer
        from readur_spark.operators.bpe import (
            bpe_encode_udf,
            train_bpe_spark_loop,
            word_count_table,
        )

        docs_df = _docs(s, sf)
        merges = train_bpe_spark_loop(
            word_count_table(docs_df), num_merges=_BPE_MERGES
        )
        tok = BpeTokenizer(merges)
        d = docs_df.select(
            "doc_id", bpe_encode_udf(tok)(F.col("text")).alias("ids")
        )
        return d.select(
            "doc_id",
            F.size("ids").cast("long").alias("n_tokens"),
            F.aggregate(
                "ids", F.lit(0).cast("long"), lambda a, x: a + x
            ).alias("id_sum"),
        )

    q["bpe_token_counts_sparkloop"] = _q_bpe_token_counts_sparkloop

    def _q_pack_sequences_bpe(s, sf):
        # the trainer-faithful packing manifest: same distributed prefix
        # scan, token counts from the BPE encoder instead of the regex
        from readur_spark.operators.bpe import (
            bpe_count_udf,
            train_bpe_distributed,
        )
        from readur_spark.operators.packing import pack_sequences

        docs_df = _docs(s, sf)
        tok = train_bpe_distributed(docs_df, num_merges=_BPE_MERGES)
        return pack_sequences(
            docs_df, seq_len=512, token_counter=bpe_count_udf(tok)
        )

    q["pack_sequences_bpe"] = _q_pack_sequences_bpe

    def _q_chunk_pack_roundtrip(s, sf):
        # the actual training-data layout path: chunk -> pack composed
        # end-to-end, so chunk ids, ordering, and token ranges are checked
        # as a composition (not just each operator alone). chunk_id packs
        # (doc_id, chunk_no) into one dense numeric key preserving
        # doc-then-chunk order (a hash would scramble packing order, so
        # the composite stays arithmetic). Base 2^20 = ~33M words/doc
        # headroom at the 40-word window; the raise_error guard turns a
        # beyond-bound document into a loud failure instead of a silent
        # key collision (r5 verdict, what's-wrong #3).
        from readur_spark.operators.extract import chunk_texts
        from readur_spark.operators.packing import pack_sequences

        chunks = chunk_texts(
            _docs(s, sf), chunk_words=40, overlap_words=8
        ).select(
            F.when(
                F.col("chunk_no") < F.lit(1 << 20),
                F.col("doc_id") * F.lit(1 << 20) + F.col("chunk_no"),
            )
            .otherwise(
                F.raise_error("chunk_no exceeds composite-key bound 2^20")
            )
            .alias("chunk_id"),
            F.col("chunk_text").alias("text"),
        )
        return pack_sequences(
            chunks, seq_len=256, id_col="chunk_id", text_col="text"
        )

    q["chunk_pack_roundtrip"] = _q_chunk_pack_roundtrip

    def _q_pdf_layout_roundtrip(s, sf):
        # north-star layout parsing: each doc's first 96 words are laid
        # out as a TWO-COLUMN PDF page (left column = first half of the
        # lines, right column = second half); the XY-cut reading order
        # must reconstruct the original word sequence — a naive y-sort
        # would interleave the columns and fail the hash. All distributed:
        # build + extract in one mapInPandas.
        import pandas as pd

        from readur_spark.kernels.minipdf import build_pdf, extract_text_layout

        docs_df = _docs(s, sf).select("doc_id", "text")

        def run(batches):
            for pdf_b in batches:
                rows = []
                for doc_id, text in zip(pdf_b["doc_id"], pdf_b["text"]):
                    # drop non-latin-1 words (build_pdf writes latin-1
                    # content streams); oracle applies the same codepoint
                    # filter relationally
                    words = [
                        w for w in (text or "").split()
                        if all(ord(c) <= 0xFF for c in w)
                    ][:96]
                    lines = [
                        " ".join(words[i : i + 6])
                        for i in range(0, len(words), 6)
                    ]
                    half = (len(lines) + 1) // 2
                    # right column starts past the WIDEST left line plus a
                    # 48pt gutter (> min_col_gap at any line length) — a
                    # fixed 330pt offset left a sub-24pt gutter for long
                    # lines, collapsing the column split (r5 review,
                    # reproduced at sf0.001/sf0.1)
                    left_w = max(
                        (6.0 * len(ln) for ln in lines[:half]), default=0.0
                    )
                    right_x = 50.0 + left_w + 48.0
                    page = [
                        (50.0, 740.0 - 14.0 * i, ln)
                        for i, ln in enumerate(lines[:half])
                    ] + [
                        (right_x, 740.0 - 14.0 * i, ln)
                        for i, ln in enumerate(lines[half:])
                    ]
                    got = extract_text_layout(build_pdf([page]))[0]
                    rows.append(
                        {"doc_id": int(doc_id),
                         "layout_text": " ".join(got.split())}
                    )
                yield pd.DataFrame(rows, columns=["doc_id", "layout_text"])

        return docs_df.mapInPandas(run, "doc_id long, layout_text string")

    q["pdf_layout_roundtrip"] = _q_pdf_layout_roundtrip

    def _q_pack_materialize_bpe(s, sf):
        # the COMPLETE training-data layout path: BPE train -> count ->
        # pack manifest -> materialize the actual fixed-length token
        # sequences. Verified per sequence by length, id-sum, and an md5
        # over the comma-joined ids (exact content, order included).
        from readur_spark.operators.bpe import (
            bpe_count_udf,
            bpe_encode_udf,
            train_bpe_distributed,
        )
        from readur_spark.operators.packing import (
            materialize_sequences,
            pack_sequences,
        )

        docs_df = _docs(s, sf)
        tok = train_bpe_distributed(docs_df, num_merges=_BPE_MERGES)
        manifest = pack_sequences(
            docs_df, seq_len=512, token_counter=bpe_count_udf(tok)
        )
        seqs = materialize_sequences(docs_df, manifest, bpe_encode_udf(tok))
        return seqs.select(
            "seq_id",
            "n_tokens",
            F.aggregate(
                "ids", F.lit(0).cast("long"), lambda a, x: a + x
            ).alias("id_sum"),
            F.md5(F.concat_ws(",", F.col("ids").cast("array<string>"))).alias(
                "ids_md5"
            ),
        )

    q["pack_materialize_bpe"] = _q_pack_materialize_bpe

    def _q_chunk_by_tokens(s, sf):
        # token-boundary chunking: windows of 128 BPE tokens, overlap 16;
        # chunk text is the exact decode of the window — verified by md5
        # against the independent naive replay's decode.
        from readur_spark.operators.bpe import train_bpe_distributed
        from readur_spark.operators.extract import chunk_texts_by_tokens

        docs_df = _docs(s, sf)
        tok = train_bpe_distributed(docs_df, num_merges=_BPE_MERGES)
        chunks = chunk_texts_by_tokens(
            docs_df, tok, chunk_tokens=128, overlap_tokens=16
        )
        return chunks.select(
            "doc_id",
            F.col("chunk_no").cast("long").alias("chunk_no"),
            "n_tokens",
            F.md5("chunk_text").alias("chunk_md5"),
        )

    q["chunk_by_tokens"] = _q_chunk_by_tokens

    def _q_quality_classifier(s, sf):
        # the GPT-3/CCNet learned quality filter: logistic regression on
        # md5-hashed unigram features, trained pos = lang=='en' vs the
        # rest, deterministic to the bit (DECIMAL-summed gradients, fixed
        # fold order) so the pure-Python replica in tools/expected.py IS
        # the oracle. Scores every document.
        from readur_spark.operators.dedup import _materialize_release
        from readur_spark.operators.quality_classifier import (
            doc_features,
            score_quality,
            train_quality_classifier,
        )

        docs_df = _docs(s, sf)
        # train+score share ONE featurize pass: labeled = en ∪ non-en =
        # the whole corpus, so the same persisted feature table feeds
        # both (released once the scores are materialized)
        feats = doc_features(docs_df, 512).persist()
        model = train_quality_classifier(
            docs_df.filter(F.col("lang") == "en").select("doc_id", "text"),
            docs_df.filter(F.col("lang") != "en").select("doc_id", "text"),
            num_buckets=512,
            iters=15,
            features=feats,
        )
        return _materialize_release(score_quality(docs_df, model, features=feats), feats)

    q["quality_classifier_scores"] = _q_quality_classifier

    def _q_repetition(s, sf):
        from readur_spark.operators.repetition import repetition_metrics

        return repetition_metrics(_docs(s, sf))

    q["repetition_filters"] = _q_repetition

    def _q_split(s, sf):
        from readur_spark.operators.sampling import split_assign

        return (
            split_assign(_docs(s, sf), {"train": 0.9, "val": 0.05, "test": 0.05})
            .groupBy("split")
            .agg(F.count("*").alias("n_docs"))
        )

    q["split_assign"] = _q_split

    def _q_sample(s, sf):
        from readur_spark.functions.textstats import quality_score_col
        from readur_spark.operators.sampling import sample_by_weight

        docs_df = _docs(s, sf).withColumn(
            "weight", quality_score_col(F.col("text"))
        )
        return sample_by_weight(docs_df, rate=0.5, weight_col="weight").select(
            "doc_id", F.round("weight", 6).alias("weight")
        )

    q["sample_weighted"] = _q_sample

    def _q_mix(s, sf):
        from readur_spark.operators.sampling import mix_sources

        return mix_sources(
            _docs(s, sf), {"src0": 0.5, "src1": 0.3, "src2": 0.2}
        ).select("doc_id", "source")

    q["mix_sources"] = _q_mix

    def _q_mix_temperature(s, sf):
        # temperature-scaled mixing (mT5/PaLM recipe, r7): target share
        # ∝ p^(1/T) over the OBSERVED source distribution, then the
        # same downsample-only salted-Bernoulli machinery. The sf0.01
        # sources are exactly uniform (identity under any T), so the
        # row derives a SKEWED synthetic source (70/20/10 by residue)
        # and T=2 must measurably flatten it. Oracle: the
        # normalization constant cancels in the keep rate (rate_s =
        # min_r(n_r/t_r) · t_s/n_s), so the SQL replays pow(p, 1/T)
        # directly.
        from readur_spark.operators.sampling import mix_sources_temperature

        d = _docs(s, sf).select(
            "doc_id",
            F.when(F.col("doc_id") % 10 < 7, "big")
            .when(F.col("doc_id") % 10 < 9, "mid")
            .otherwise("small")
            .alias("source"),
        )
        return mix_sources_temperature(d, temperature=2.0).select(
            "doc_id", "source"
        )

    q["mix_sources_temperature"] = _q_mix_temperature
    q["dedup_cluster"] = lambda s, sf: dedup.dedup_cluster_keep_first(
        _docs(s, sf), dedup.ngram_jaccard_pairs(_docs(s, sf), threshold=0.5, n=3)
    ).select("doc_id", "lang", "source", "n_chars")

    # ---- similarity search ----
    def _q_embedding_quantize(s, sf):
        emb = load_table(s, sf, "embeddings")
        q8 = similarity.quantize_int8(emb)
        deq = similarity.dequantize_int8(q8)
        e = F.col("embedding").cast("array<double>")
        err = F.sqrt(
            F.aggregate(
                F.zip_with(e, F.col("embedding_deq"), lambda x, y: (x - y) * (x - y)),
                F.lit(0.0),
                lambda a, v: a + v,
            )
        )
        return deq.select(
            "vec_id",
            F.round(F.col("embedding_q8_scale"), 9).alias("scale"),
            F.round(err, 6).alias("l2_error"),
        )

    q["embedding_quantize"] = _q_embedding_quantize
    q["ann_topk_cosine"] = lambda s, sf: similarity.cosine_topk(
        load_table(s, sf, "embeddings"), _q_query_vec(s, sf), k=10
    )
    def _q_ann_topk_indexed(s, sf):
        # r8 registry consolidation (same pattern as fts_modes): the
        # SRP-LSH and IVF approximate-NN variants share the
        # (vec_id, cosine) result shape; one union row (mode column
        # disambiguates) keeps both index structures value-oracled in
        # a single window slot.
        emb = load_table(s, sf, "embeddings")
        qv = _q_query_vec(s, sf)
        return (
            similarity.ann_topk_lsh(emb, qv, k=10, num_planes=4)
            .withColumn("mode", F.lit("lsh"))
            .unionByName(
                similarity.ivf_topk(emb, qv, k=10, n_probe=4).withColumn(
                    "mode", F.lit("ivf")
                )
            )
        )

    q["ann_topk_indexed"] = _q_ann_topk_indexed

    # ---- relational checklist (§2.10) ----
    q["q1_pricing_summary"] = lambda s, sf: relational.pricing_summary(
        load_table(s, sf, "lineitem")
    )
    q["top_customers"] = lambda s, sf: relational.top_customers_by_revenue(
        load_table(s, sf, "orders"), load_table(s, sf, "customer"), k=10
    )
    def _q_customers_semi_anti(s, sf):
        # r8 registry consolidation: the NOT-EXISTS anti join and the
        # EXISTS semi join (§2.10 checklist) were two rows; one
        # stacked row (kind column) keeps both join plans value-oracled
        # in a single window slot.
        c = load_table(s, sf, "customer")
        od = load_table(s, sf, "orders")
        anti = relational.customers_without_orders(c, od).select(
            "c_custkey",
            "c_name",
            F.lit(None).cast("string").alias("c_mktsegment"),
            F.lit("no_orders").alias("kind"),
        )
        semi = relational.customers_with_high_value_orders(
            c, od, min_total=450_000.0
        ).withColumn("kind", F.lit("high_value"))
        return anti.unionByName(semi)

    q["customers_semi_anti"] = _q_customers_semi_anti
    q["revenue_by_nation"] = lambda s, sf: relational.revenue_by_nation(
        load_table(s, sf, "customer"),
        load_table(s, sf, "orders"),
        load_table(s, sf, "nation"),
        load_table(s, sf, "region"),
    )
    q["event_type_stats"] = lambda s, sf: relational.event_type_stats(load_table(s, sf, "events"))

    def _q_event_windowed_metrics(s, sf):
        from readur_spark.streaming.metrics import windowed_metrics

        return windowed_metrics(load_table(s, sf, "events"), window="1 hour").select(
            "window_start", "window_end", "event_type", "n_events", "total_value"
        )

    q["event_windowed_metrics"] = _q_event_windowed_metrics
    q["user_event_windows"] = lambda s, sf: relational.user_event_windows(
        load_table(s, sf, "events")
    ).select(
        "user_id", "event_type", F.col("seq").cast("long").alias("seq"), "running_value"
    )
    q["sessionize"] = lambda s, sf: relational.sessionize(load_table(s, sf, "events")).select(
        "user_id",
        F.col("session_no").cast("long").alias("session_no"),
        "n_events",
        "session_value",
        "session_start",
        "session_end",
    )

    # The driver samples a bounded prefix of the registry (50 rows per
    # round, insertion order). Rotation policy: no entry may go >2
    # rounds without a driver row. r7 closed with 105 entries — 55 of
    # them without an r7 row, which made the invariant arithmetically
    # unsatisfiable (55 stale > 50 window; r7 verdict, what's-wrong #1).
    # r8 therefore CONSOLIDATES the registry to exactly 100 entries by
    # merging near-duplicate single-code-path rows with identical total
    # oracle coverage (fingerprint+fingerprint_sha256 -> fingerprint;
    # fts_simple+fts_phrase+fts_boolean -> fts_modes; facet_source+
    # facet_lang -> facet_source_lang; domain_degrees+
    # domain_degrees_weighted -> domain_degrees; customers_without_
    # orders+customers_high_value -> customers_semi_anti), so from r9 on
    # the arithmetic holds exactly: 100 entries / 50-row window = every
    # entry gets a driver row every 2 rounds, alternating halves.
    #
    # The r8 window (first 50) = every entry WITHOUT an r7 driver row
    # under its current code: the 7 the r7 verdict ordered to lead
    # (5 r7-new entries never driver-checked + outlink_domains/
    # anchor_profile whose r6 rows predate the extractor widening),
    # then the 5 consolidated/new names (merged queries are new code
    # paths; anchor_quality_features is NEW r8), then the 38 r6-green
    # remainder. That is 51 candidates for 50 slots; the single
    # overflow rides the FROZEN_TIER rule (see that constant).
    # (Late-r8, window-neutral: ann_topk_lsh+ann_topk_ivf consolidated
    # into ann_topk_indexed and domain_hits added — both slotted into
    # the two freed window positions, both gated green locally.)
    #
    # R9 ROTATION (mechanical, EXECUTED at r9 open): the r9 window =
    # the 50 entries with no row in CORRECTNESS_r08.json
    # (q1_pricing_summary first — it rode FROZEN_TIER through r8), then
    # the 50 r8-checked entries, which re-enter the window at r10 under
    # the alternating-halves rule. Any entry whose implementation file
    # changes in a round jumps to the front regardless.
    priority = [
        # --- R9 WINDOW: the 50 entries with NO row in CORRECTNESS_r08
        # (q1_pricing_summary first — clears its FROZEN_TIER debt) ---
        "q1_pricing_summary",
        "extract_text_spans",
        "filter_lang",
        "filter_labels",
        "facet_tags",
        "filter_role",
        "search_ranked_ts",
        "snippets",
        "snippets_full",
        "list_documents",
        "doc_stats",
        "sql_search",
        "extract_binary_roundtrip",
        "image_quality_stats",
        "image_ocr_fake",
        "pdf_ocr_glyph",
        "dedup_exact",
        "dedup_keep_first",
        "dedup_ngram_jaccard",
        "dedup_ngram_capped",
        "lm_perplexity",
        "dedup_lines",
        "warc_roundtrip",
        "dedup_incremental",
        "lm_backoff",
        "dedup_minhash_incremental",
        "corpus_stats",
        "dsir_weights",
        "curriculum_order",
        "semdedup",
        "pack_stats",
        "dedup_minhash_lsh",
        "dedup_simhash",
        "dedup_embedding",
        "winnow_overlap",
        "dup_spans",
        "decontaminate",
        "pack_sequences",
        "bpe_token_counts_sparkloop",
        "pack_sequences_bpe",
        "chunk_pack_roundtrip",
        "pdf_layout_roundtrip",
        "pack_materialize_bpe",
        "quality_classifier_scores",
        "repetition_filters",
        "split_assign",
        "sample_weighted",
        "mix_sources",
        "dedup_cluster",
        "event_windowed_metrics",
        # ---------------- 50-row window cut ----------------
        # --- the r8-checked half (green CORRECTNESS_r08 rows); these
        # re-enter the window at r10 under the alternating-halves rule ---
        "curriculum_pack_roundtrip",
        "domain_degrees",
        "mix_sources_temperature",
        "domain_harmonic",
        "domain_trustrank",
        "outlink_domains",
        "anchor_profile",
        "fingerprint",
        "fts_modes",
        "facet_source_lang",
        "customers_semi_anti",
        "anchor_quality_features",
        "normalize_text",
        "word_count_simple",
        "token_count",
        "lang_id",
        "quality_score",
        "quality_gopher",
        "chunk_documents",
        "text_metadata",
        "sentence_stats",
        "scrub_pii",
        "fuzzy_search",
        "search_ranked",
        "paginate",
        "count_matching",
        "decontaminate_ngrams",
        "tfidf_top_terms",
        "dsir_resample_largek",
        "url_canonical_dedup",
        "global_shuffle",
        "domain_pagerank",
        "domain_blocklist_filter",
        "rank_filter_docs",
        "domain_islands",
        "interleave_pack",
        "interleave_fill_stats",
        "interleave_materialize",
        "bpe_token_counts",
        "chunk_by_tokens",
        "embedding_quantize",
        "ann_topk_cosine",
        "ann_topk_indexed",
        "domain_hits",
        "incremental_sync",
        "top_customers",
        "revenue_by_nation",
        "event_type_stats",
        "user_event_windows",
        "sessionize",
    ]
    assert all(k in q for k in priority), sorted(set(priority) - set(q))
    return {k: q[k] for k in priority} | {
        k: v for k, v in q.items() if k not in priority
    }


# --------------------------------------------------------------------------
# DuckDB oracles
# --------------------------------------------------------------------------

#: merge-table size for the BPE driver queries — large enough that multi-
#: level merges (merged tokens merging with merged tokens) are exercised
#: on the sf0.01 corpus, small enough that the naive oracle replay stays
#: sub-second
_BPE_MERGES = 200


def _canonical_url_sql(url: str) -> str:
    """DuckDB scalar expression mirroring
    readur_spark.functions.urls.canonical_url_col byte-for-byte (same
    anchored regexes — Spark's replace-all equals DuckDB's replace-first
    on anchored patterns — same tracking-param list, same sort/join).
    Built programmatically so each sub-step is written once;
    tests/test_urls.py pins the two engines equal on a messy battery."""
    track = (
        "^(utm_[A-Za-z0-9_]*|fbclid|gclid|yclid|msclkid|igshid|mc_eid)(=|$)"
    )
    # 'g': Spark's regexp_replace replaces ALL matches; without the
    # flag DuckDB replaces only the first, and a (pathological) href
    # containing a newline + second '#' would canonicalize differently
    # on the two engines (advisor finding, r6)
    s = f"regexp_replace(trim({url}), '#.*', '', 'g')"
    scheme = f"lower(regexp_extract({s}, '^([A-Za-z][A-Za-z0-9+.\\-]*)://', 1))"
    after = f"regexp_replace({s}, '^[A-Za-z][A-Za-z0-9+.\\-]*://', '')"
    auth0 = f"lower(regexp_extract({after}, '^([^/?]*)', 1))"
    auth = (
        f"CASE WHEN {scheme} = 'http' THEN regexp_replace({auth0}, ':80$', '') "
        f"WHEN {scheme} = 'https' THEN regexp_replace({auth0}, ':443$', '') "
        f"ELSE {auth0} END"
    )
    pathq = f"regexp_replace({after}, '^[^/?]*', '')"
    path = f"regexp_extract({pathq}, '^([^?]*)', 1)"
    query = f"regexp_replace({pathq}, '^[^?]*\\??', '')"
    params = (
        f"list_sort(list_filter(string_split({query}, '&'), "
        f"p -> p <> '' AND NOT regexp_matches(p, '{track}')))"
    )
    # DuckDB's array_to_string returns NULL for an empty list (Spark's
    # array_join returns '') — coalesce, or the final || nulls the row
    qcanon = f"coalesce(array_to_string({params}, '&'), '')"
    return (
        f"(CASE WHEN {scheme} = '' THEN '' ELSE {scheme} || '://' END) "
        f"|| ({auth}) "
        f"|| (CASE WHEN {path} = '/' THEN '' ELSE {path} END) "
        f"|| (CASE WHEN {qcanon} = '' THEN '' ELSE '?' || {qcanon} END)"
    )


#: template with an {url} placeholder (tests format it directly)
_CANONICAL_URL_SQL = _canonical_url_sql("{url}")

#: DuckDB mirror of operators.linkgraph.domain_of (same regex; both
#: engines return '' when the reference is relative / has no scheme)
_DOMAIN_OF_SQL = (
    "lower(regexp_extract({url}, "
    "'^[A-Za-z][A-Za-z0-9+.\\-]*://(?:[^/?#@]*@)?([^/?#:]+)', 1))"
)


def _pagerank_sql(edges_cte: str, damping: float, iters: int) -> str:
    """DuckDB replay of operators.linkgraph.pagerank as ``iters``
    chained CTEs — the identical power iteration (per-src contribution
    = rank/outdeg, dangling mass redistributed uniformly, (1-d)/N
    teleport), so the distributed join+groupBy assembly is
    value-checked against the definitional recurrence. ``edges_cte``
    must select columns (src, dst), already distinct / self-loop-free.
    Float note: per-node fan-in sums differ from Spark's only by
    addition order (≤1e-15 at these magnitudes), far inside the
    gate's round-to-9 normalization."""
    d = damping
    parts = [
        f"WITH edges AS ({edges_cte})",
        "nodes AS (SELECT src AS node FROM edges "
        "UNION SELECT dst FROM edges)",
        "nn AS (SELECT CAST(count(*) AS DOUBLE) AS n FROM nodes)",
        "outdeg AS (SELECT src, CAST(count(*) AS DOUBLE) AS c "
        "FROM edges GROUP BY src)",
        "r0 AS (SELECT node, 1.0/(SELECT n FROM nn) AS rank FROM nodes)",
    ]
    for i in range(1, iters + 1):
        p, r = f"r{i - 1}", f"r{i}"
        parts.append(
            f"{r} AS (SELECT no.node, (1.0 - {d})/(SELECT n FROM nn) "
            f"+ {d} * (coalesce(m.inmass, 0.0) "
            f"+ (SELECT coalesce(sum(pr.rank), 0.0) FROM {p} pr "
            f"LEFT JOIN outdeg o ON pr.node = o.src "
            f"WHERE o.src IS NULL)/(SELECT n FROM nn)) AS rank "
            f"FROM nodes no LEFT JOIN ("
            f"SELECT e.dst AS node, sum(pr.rank / o.c) AS inmass "
            f"FROM edges e JOIN {p} pr ON e.src = pr.node "
            f"JOIN outdeg o ON e.src = o.src GROUP BY e.dst"
            f") m ON no.node = m.node)"
        )
    return ",\n".join(parts) + f"\nSELECT node, rank FROM r{iters}"


def _hits_sql(edges_cte: str, iters: int) -> str:
    """DuckDB replay of operators.linkgraph.hits as chained CTEs — the
    identical mutual-reinforcement iteration (authority(v) = Σ hub of
    in-linkers from the PREVIOUS hub vector, hub(u) = Σ authority of
    out-targets from the NEW authority vector, each L2-normalized), so
    the distributed two-join assembly is value-checked against the
    definitional recurrence. ``edges_cte`` must select (src, dst),
    already distinct / self-loop-free."""
    # every iteration CTE is MATERIALIZED: each level is referenced
    # 2-3 times (norm scalar + next level + final join), and DuckDB
    # inlines plain CTEs — un-materialized, the 5-deep chain expands
    # multiplicatively and the query never finishes. (_pagerank_sql
    # survives un-hinted because its chain branches only 2x per level;
    # this one branches ~8x.)
    parts = [
        f"WITH edges AS MATERIALIZED ({edges_cte})",
        "nodes AS MATERIALIZED (SELECT src AS node FROM edges "
        "UNION SELECT dst FROM edges)",
        "nn AS MATERIALIZED (SELECT CAST(count(*) AS DOUBLE) AS n "
        "FROM nodes)",
        "h0 AS MATERIALIZED (SELECT node, 1.0/sqrt((SELECT n FROM nn)) "
        "AS hub FROM nodes)",
    ]
    for i in range(1, iters + 1):
        p = f"h{i - 1}"
        parts.extend(
            [
                f"ar{i} AS MATERIALIZED (SELECT no.node, "
                f"coalesce(m.s, 0.0) AS a_raw "
                f"FROM nodes no LEFT JOIN ("
                f"SELECT e.dst AS node, sum(h.hub) AS s FROM edges e "
                f"JOIN {p} h ON e.src = h.node GROUP BY e.dst"
                f") m ON no.node = m.node)",
                f"an{i} AS MATERIALIZED (SELECT sqrt(sum(a_raw*a_raw)) "
                f"AS nrm FROM ar{i})",
                f"a{i} AS MATERIALIZED (SELECT node, "
                f"a_raw/(SELECT nrm FROM an{i}) AS authority FROM ar{i})",
                f"hr{i} AS MATERIALIZED (SELECT no.node, "
                f"coalesce(m.s, 0.0) AS h_raw "
                f"FROM nodes no LEFT JOIN ("
                f"SELECT e.src AS node, sum(a.authority) AS s "
                f"FROM edges e JOIN a{i} a ON e.dst = a.node "
                f"GROUP BY e.src"
                f") m ON no.node = m.node)",
                f"hn{i} AS MATERIALIZED (SELECT sqrt(sum(h_raw*h_raw)) "
                f"AS nrm FROM hr{i})",
                f"h{i} AS MATERIALIZED (SELECT node, "
                f"h_raw/(SELECT nrm FROM hn{i}) AS hub FROM hr{i})",
            ]
        )
    return (
        ",\n".join(parts)
        + f"\nSELECT h.node, h.hub, a.authority FROM h{iters} h "
        f"JOIN a{iters} a ON h.node = a.node"
    )


def _trustrank_sql(
    edges_cte: str, seeds_cte: str, damping: float, iters: int
) -> str:
    """DuckDB replay of operators.linkgraph.trustrank — the personalized
    power iteration: teleport vector t = uniform over seeds∩nodes (0
    elsewhere), r0 = t, and each step
    rank'(v) = (1-d)·t(v) + d·(inmass(v) + dangling·t(v)).
    ``seeds_cte`` must select a single ``node`` column."""
    d = damping
    parts = [
        f"WITH edges AS ({edges_cte})",
        "nodes AS (SELECT src AS node FROM edges "
        "UNION SELECT dst FROM edges)",
        f"seeds AS ({seeds_cte})",
        "sn AS (SELECT CAST(count(*) AS DOUBLE) AS k FROM seeds s "
        "JOIN nodes n ON s.node = n.node)",
        "tv AS (SELECT n.node, CASE WHEN s.node IS NOT NULL "
        "THEN 1.0/(SELECT k FROM sn) ELSE 0.0 END AS t "
        "FROM nodes n LEFT JOIN seeds s ON n.node = s.node)",
        "outdeg AS (SELECT src, CAST(count(*) AS DOUBLE) AS c "
        "FROM edges GROUP BY src)",
        "r0 AS (SELECT node, t AS rank FROM tv)",
    ]
    for i in range(1, iters + 1):
        p, r = f"r{i - 1}", f"r{i}"
        parts.append(
            f"{r} AS (SELECT no.node, (1.0 - {d}) * no.t "
            f"+ {d} * (coalesce(m.inmass, 0.0) "
            f"+ (SELECT coalesce(sum(pr.rank), 0.0) FROM {p} pr "
            f"LEFT JOIN outdeg o ON pr.node = o.src "
            f"WHERE o.src IS NULL) * no.t) AS rank "
            f"FROM tv no LEFT JOIN ("
            f"SELECT e.dst AS node, sum(pr.rank / o.c) AS inmass "
            f"FROM edges e JOIN {p} pr ON e.src = pr.node "
            f"JOIN outdeg o ON e.src = o.src GROUP BY e.dst"
            f") m ON no.node = m.node)"
        )
    return ",\n".join(parts) + f"\nSELECT node, rank FROM r{iters}"


_BPE_ORACLE_CACHE: dict[tuple, list] = {}


def _bpe_oracle_key(num_merges: int) -> tuple:
    """Single definition of the replay cache key — _bpe_oracle_rows and
    _bpe_oracle_ids must never disagree on it."""
    return ("sf0.01", num_merges)


def _bpe_oracle_rows(num_merges: int = _BPE_MERGES) -> list[tuple[int, int, int]]:
    """(doc_id, n_tokens, id_sum) per document of the sf0.01 corpus,
    computed by an INDEPENDENT sequential BPE: a naive full-recount
    trainer and the apply-in-rank-order encoder — different formulations
    from the production kernel on both axes (incremental pair-count
    maintenance; greedy lowest-rank loop), per the same public spec:
    all adjacent positions counted (overlaps included), best = highest
    count then smallest (a, b) pair, stop below count 2, left-to-right
    non-overlapping merge application.

    The driver's oracle gate runs at sf0.01 (TESTDATA.md), so the replay
    reads that parquet directly; like the other corpus-keyed oracles
    (planted families, df thresholds) this entry is only meaningful at
    the gate's scale factor."""
    key = _bpe_oracle_key(num_merges)
    if key not in _BPE_ORACLE_CACHE:
        import re
        from collections import Counter

        import duckdb

        con = duckdb.connect()
        docs = con.execute(
            "SELECT doc_id, text FROM "
            "'/root/testdata/sf0.01/documents.parquet' ORDER BY doc_id"
        ).fetchall()
        con.close()
        pretok = re.compile(
            r"'(?:s|t|re|ve|m|ll|d)| ?[A-Za-z]+| ?[0-9]+"
            r"| ?[^\sA-Za-z0-9]+|\s+(?!\S)|\s+"
        )

        def words_of(text):
            return [m.group().encode("utf-8") for m in pretok.finditer(text)]

        wf = Counter()
        for _, text in docs:
            wf.update(words_of(text or ""))
        # naive trainer: full recount each iteration
        table = {w: (tuple(w), c) for w, c in wf.items() if len(w) >= 2}
        merges = []
        for step in range(num_merges):
            counts = Counter()
            for ids, c in table.values():
                for p in zip(ids, ids[1:]):
                    counts[p] += c
            if not counts:
                break
            best_count = max(counts.values())
            if best_count < 2:
                break
            best = min(p for p, c in counts.items() if c == best_count)
            merges.append(best)
            new_id = 256 + step
            nxt = {}
            for w, (ids, c) in table.items():
                lst, i = [], 0
                while i < len(ids):
                    if i + 1 < len(ids) and (ids[i], ids[i + 1]) == best:
                        lst.append(new_id)
                        i += 2
                    else:
                        lst.append(ids[i])
                        i += 1
                nxt[w] = (tuple(lst), c)
            table = nxt

        # rank-order encoder, memoized per distinct word
        word_cache: dict[bytes, list[int]] = {}

        def encode_word(w: bytes) -> list[int]:
            got = word_cache.get(w)
            if got is None:
                ids = list(w)
                for rank, (a, b) in enumerate(merges):
                    new_id = 256 + rank
                    lst, i = [], 0
                    while i < len(ids):
                        if i + 1 < len(ids) and ids[i] == a and ids[i + 1] == b:
                            lst.append(new_id)
                            i += 2
                        else:
                            lst.append(ids[i])
                            i += 1
                    ids = lst
                got = word_cache[w] = ids
            return got

        rows = []
        ids_by_doc: dict[int, list[int]] = {}
        starts_by_doc: dict[int, list[int]] = {}
        for doc_id, text in docs:
            doc_ids: list[int] = []
            doc_starts: list[int] = []
            for w in words_of(text or ""):
                doc_starts.append(len(doc_ids))
                doc_ids.extend(encode_word(w))
            ids_by_doc[int(doc_id)] = doc_ids
            starts_by_doc[int(doc_id)] = doc_starts
            rows.append((int(doc_id), len(doc_ids), sum(doc_ids)))
        # vocab bytes for chunk-decode replay (naive expansion of merges)
        vocab = [bytes([i]) for i in range(256)]
        for a, b in merges:
            vocab.append(vocab[a] + vocab[b])
        _BPE_ORACLE_CACHE[key] = rows
        _BPE_ORACLE_CACHE[key + ("ids",)] = ids_by_doc
        _BPE_ORACLE_CACHE[key + ("starts",)] = starts_by_doc
        _BPE_ORACLE_CACHE[key + ("vocab",)] = vocab
    return _BPE_ORACLE_CACHE[key]


def _bpe_oracle_starts(num_merges: int = _BPE_MERGES):
    """Per-doc pre-token start indices (token space) from the replay —
    the chunk oracle snaps its window cuts to these, mirroring the
    operator's boundary contract."""
    _bpe_oracle_rows(num_merges)
    key = _bpe_oracle_key(num_merges)
    return _BPE_ORACLE_CACHE[key + ("starts",)]


def _bpe_oracle_ids(num_merges: int = _BPE_MERGES):
    """Per-doc token ids + vocab byte table from the same independent
    replay (memoized alongside _bpe_oracle_rows)."""
    _bpe_oracle_rows(num_merges)
    key = _bpe_oracle_key(num_merges)
    return (
        _BPE_ORACLE_CACHE[key + ("ids",)],
        _BPE_ORACLE_CACHE[key + ("vocab",)],
    )


#: planted boilerplate family for dedup_ngram_capped — tokens chosen so no
#: 3-gram collides with the synthetic corpus vocabulary
_BOILER_TEXT = (
    "zqvw boilerplate disclaimer verbatim fenwick clause repeated "
    "identically across the entire planted family corpus xkcdq"
)

_SHINGLE3 = (
    "WITH toks AS (SELECT doc_id AS id, "
    "list_filter(string_split_regex(lower(text), '[^a-z0-9]+'), x -> x != '') t "
    "FROM documents), "
    "sh AS (SELECT id, unnest(list_distinct("
    "[array_to_string(t[i:i+2], ' ') for i in range(1, len(t)-1)])) AS shingle "
    "FROM toks WHERE len(t) >= 3), "
    "sz AS (SELECT id, count(*) sz FROM sh GROUP BY id), "
    "inter AS (SELECT a.id ia, b.id ib, count(*) i FROM sh a "
    "JOIN sh b ON a.shingle = b.shingle AND a.id < b.id GROUP BY 1, 2) "
)


def oracle_sql() -> dict[str, str]:
    import duckdb

    o: dict[str, str] = {}

    o["extract_text_spans"] = f"""
        WITH c AS (SELECT doc_id, {_DUCK_NORM} AS cleaned FROM documents)
        SELECT doc_id,
               CASE WHEN cleaned <> '' AND
                         length(regexp_replace(cleaned, '[^A-Za-z0-9]', '', 'g'))
                         >= 0.1 * length(cleaned)
                    THEN 'completed' ELSE 'failed' END AS status,
               CASE WHEN cleaned <> '' AND
                         length(regexp_replace(cleaned, '[^A-Za-z0-9]', '', 'g'))
                         >= 0.1 * length(cleaned)
                    THEN CAST(len(regexp_split_to_array(cleaned, '\\s+')) AS BIGINT)
                    ELSE 0 END AS word_count,
               CASE WHEN cleaned <> '' AND
                         length(regexp_replace(cleaned, '[^A-Za-z0-9]', '', 'g'))
                         >= 0.1 * length(cleaned)
                    THEN cleaned ELSE NULL END AS span_text
        FROM c
    """

    o["normalize_text"] = f"SELECT doc_id, {_DUCK_NORM} AS normalized FROM documents"
    o["word_count_simple"] = (
        "SELECT doc_id, CASE WHEN trim(text) = '' THEN 0 ELSE "
        "CAST(len(regexp_split_to_array(trim(text), '\\s+')) AS BIGINT) END AS word_count "
        "FROM documents"
    )
    o["token_count"] = (
        "SELECT doc_id, CAST(len(regexp_extract_all(text, "
        "'[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]')) AS BIGINT) AS n_tokens FROM documents"
    )
    marker = {
        "en": "the|and|of|is|a",
        "es": "el|la|de|que|un",
        "fr": "le|la|les|et|une",
        "de": "der|die|und|das|ein",
    }
    hits = {
        k: f"len(regexp_extract_all(lower(text), '\\b({v})\\b'))" for k, v in marker.items()
    }
    best = f"greatest({hits['en']}, {hits['es']}, {hits['fr']}, {hits['de']})"
    o["lang_id"] = f"""
        SELECT doc_id,
          CASE WHEN {best} = 0 THEN 'und'
               WHEN {hits['en']} = {best} THEN 'en'
               WHEN {hits['es']} = {best} THEN 'es'
               WHEN {hits['fr']} = {best} THEN 'fr'
               ELSE 'de' END AS detected_lang
        FROM documents
    """
    o["quality_score"] = """
        SELECT doc_id, round((
          least(length(text) / 1000.0, 1.0)
          + CASE WHEN length(text) = 0 THEN 0.0
                 ELSE length(regexp_replace(text, '[^A-Za-z0-9]', '', 'g')) * 1.0 / length(text) END
          + least((CASE WHEN trim(text) = '' THEN 0
                        ELSE len(regexp_split_to_array(trim(text), '\\s+')) END) * 6.0
                  / greatest(length(text), 1), 1.0)
        ) / 3.0, 6) AS quality
        FROM documents
    """
    o["fingerprint"] = (
        "SELECT doc_id, md5(lower(regexp_replace(trim(text), '\\s+', ' ', 'g'))) "
        "AS fingerprint, sha256(text) AS file_hash FROM documents"
    )
    _gw = "list_filter(regexp_split_to_array(trim(text), '\\s+'), w -> w != '')"
    _gwc = f"len({_gw})"
    _gsafe = f"greatest({_gwc}, 1)"
    _glines = "regexp_split_to_array(text, '\\n')"
    _gnl = f"greatest(len({_glines}), 1)"
    _gstops = " + ".join(
        f"CASE WHEN regexp_matches(lower(text), '\\b{s}\\b') THEN 1 ELSE 0 END"
        for s in ["the", "a", "table", "value", "row", "key"]
    )
    _gflags = {
        "ok_word_count": f"({_gwc} >= 50 AND {_gwc} <= 100000)",
        "ok_mean_word_length": (
            f"(list_sum(list_transform({_gw}, w -> length(w))) * 1.0 / {_gsafe} >= 3.0"
            f" AND list_sum(list_transform({_gw}, w -> length(w))) * 1.0 / {_gsafe} <= 10.0)"
        ),
        "ok_symbol_ratio": (
            "((len(regexp_extract_all(text, '#')) + len(regexp_extract_all(text, '\\.\\.\\.'))"
            f" + len(regexp_extract_all(text, '…'))) * 1.0 / {_gsafe} <= 0.1)"
        ),
        "ok_bullet_lines": (
            f"(len(list_filter({_glines}, l -> regexp_matches(trim(l), '^([-*•])')))"
            f" * 1.0 / {_gnl} <= 0.9)"
        ),
        "ok_ellipsis_lines": (
            f"(len(list_filter({_glines}, l -> regexp_matches(rtrim(l), '(\\.\\.\\.|…)$')))"
            f" * 1.0 / {_gnl} <= 0.3)"
        ),
        "ok_alpha_words": (
            f"(len(list_filter({_gw}, w -> regexp_matches(w, '[A-Za-z]'))) * 1.0 / {_gsafe} >= 0.8)"
        ),
        "ok_stopwords": f"(({_gstops}) >= 2)",
    }
    _gsel = ", ".join(f"{sql} AS {name}" for name, sql in _gflags.items())
    _gpass = " AND ".join(_gflags.values())
    o["quality_gopher"] = (
        f"SELECT doc_id, {_gsel}, ({_gpass}) AS gopher_pass FROM documents"
    )
    eng = " + ".join(
        f"len(regexp_extract_all(lower(text), '{w}'))"
        for w in ["the", "and", "or", "but", "in", "on", "at", "to", "for", "of", "with", "by"]
    )
    wc = (
        "CASE WHEN trim(text) = '' THEN 0 "
        "ELSE len(regexp_split_to_array(trim(text), '\\s+')) END"
    )
    o["text_metadata"] = f"""
        SELECT doc_id,
               CAST(length(text) AS BIGINT) AS character_count,
               CAST({wc} AS BIGINT) AS word_count,
               CAST(CASE WHEN text = '' THEN 0
                    ELSE len(regexp_split_to_array(regexp_replace(text, '\\n$', ''), '\\n'))
                    END AS BIGINT) AS line_count,
               regexp_matches(text, '[^\\x00-\\x7F]') AS contains_unicode,
               CASE WHEN ltrim(text) LIKE '<?xml%' THEN 'xml'
                    WHEN ltrim(text) LIKE '{{%' OR ltrim(text) LIKE '[%' THEN 'json'
                    WHEN text LIKE '%<!DOCTYPE html%' OR text LIKE '%<html%' THEN 'html'
                    ELSE NULL END AS text_format,
               ({eng}) > ({wc}) // 20 AS likely_english
        FROM documents
    """
    # chunking: stride 32 (= 40 - 8); DuckDB 1-based inclusive list slice
    # words[a:b] == Spark slice(words, a, b-a+1)
    o["chunk_documents"] = """
        WITH w AS (
          SELECT doc_id,
                 list_filter(regexp_split_to_array(trim(text), '\\s+'), x -> x != '') AS words
          FROM documents),
        c AS (
          SELECT doc_id, words, len(words) AS n,
                 CASE WHEN len(words) = 0 THEN 0
                      ELSE 1 + CAST(ceil(greatest(len(words) - 40, 0) / 32.0) AS INT)
                 END AS nc
          FROM w)
        SELECT doc_id,
               CAST(i AS BIGINT) AS chunk_no,
               array_to_string(words[i * 32 + 1 : i * 32 + 40], ' ') AS chunk_text,
               CAST(least(n - i * 32, 40) AS BIGINT) AS n_words
        FROM c, unnest(range(nc)) AS t(i)
        WHERE nc > 0
    """
    o["incremental_sync"] = """
        WITH current AS (SELECT doc_id AS path, md5(text) AS etag FROM documents),
        previous AS (
          SELECT doc_id AS path,
                 CASE WHEN doc_id % 4 = 0 THEN 'stale' ELSE md5(text) END AS etag
          FROM documents WHERE doc_id % 2 = 0)
        SELECT c.path, c.etag FROM current c
        LEFT JOIN previous p ON c.path = p.path
        WHERE p.path IS NULL OR c.etag <> p.etag
    """

    o["fts_modes"] = (
        "SELECT doc_id, lang, source, n_chars, 'simple' AS mode FROM documents "
        "WHERE regexp_matches(lower(text), '\\bspark\\b') "
        "AND regexp_matches(lower(text), '\\bwindow\\b') "
        "UNION ALL "
        "SELECT doc_id, lang, source, n_chars, 'phrase' AS mode FROM documents "
        "WHERE position('table value' IN lower(text)) > 0 "
        "UNION ALL "
        "SELECT doc_id, lang, source, n_chars, 'boolean' AS mode FROM documents "
        "WHERE regexp_matches(lower(text), '\\btable\\b') "
        "AND (regexp_matches(lower(text), '\\bspark\\b') OR regexp_matches(lower(text), '\\bwindow\\b')) "
        "AND NOT regexp_matches(lower(text), '\\bvector\\b')"
    )
    from readur_spark.operators.search import _trigrams

    qtri = _trigrams("spark table window merge batch")
    qlit = "[" + ", ".join("'" + t.replace("'", "''") + "'" for t in qtri) + "]"
    o["fuzzy_search"] = f"""
        WITH t AS (
          SELECT doc_id, n_chars,
                 list_distinct([substring(lower(text), i, 3)
                                for i in range(1, greatest(length(text) - 2, 1) + 1)]) AS tri
          FROM documents)
        SELECT doc_id,
               round(len(list_intersect(tri, {qlit})) * 1.0
                     / (len(tri) + {len(qtri)} - len(list_intersect(tri, {qlit}))), 6)
               AS similarity,
               n_chars
        FROM t
        WHERE round(len(list_intersect(tri, {qlit})) * 1.0
                    / (len(tri) + {len(qtri)} - len(list_intersect(tri, {qlit}))), 6) > 0.15
    """
    o["search_ranked"] = """
        SELECT doc_id, CAST(len(regexp_extract_all(lower(text), 'spark')) AS BIGINT) AS search_rank,
               n_chars
        FROM documents
        WHERE len(regexp_extract_all(lower(text), 'spark')) > 0
        ORDER BY search_rank DESC, doc_id ASC LIMIT 25
    """
    o["paginate"] = (
        "SELECT doc_id, lang, source, n_chars FROM documents "
        "ORDER BY doc_id ASC LIMIT 20 OFFSET 10"
    )
    o["count_matching"] = (
        "SELECT count(*) AS n_matching FROM documents "
        "WHERE regexp_matches(lower(text), '\\bmerge\\b')"
    )
    o["facet_source_lang"] = (
        "SELECT 'source' AS facet, source AS value, count(*) AS n_docs "
        "FROM documents GROUP BY source "
        "UNION ALL "
        "SELECT 'lang' AS facet, lang AS value, count(*) AS n_docs "
        "FROM documents GROUP BY lang"
    )
    o["filter_lang"] = (
        "SELECT doc_id, lang, source, n_chars FROM documents WHERE lang IN ('es', 'fr')"
    )
    # labels synthesis: doc d carries label k iff d % (k+2) == 0
    # (sources/tables.document_labels_table); contract=k2, archive=k5
    o["filter_labels"] = (
        "SELECT doc_id, lang, source, n_chars FROM documents "
        "WHERE doc_id % 4 = 0 OR doc_id % 7 = 0"
    )
    o["filter_role"] = (
        "SELECT doc_id, lang, source, n_chars FROM documents WHERE doc_id % 50 = 7"
    )
    o["facet_tags"] = """
        WITH labels(label_id, name) AS (VALUES
            (0,'invoice'),(1,'receipt'),(2,'contract'),
            (3,'report'),(4,'personal'),(5,'archive'))
        SELECT name,
               (SELECT count(*) FROM documents WHERE doc_id % (label_id + 2) = 0)
               AS n_docs
        FROM labels
    """
    _wc = (
        "greatest(CASE WHEN trim(text) = '' THEN 0 "
        "ELSE len(regexp_split_to_array(trim(lower(text)), '\\s+')) END, 1)"
    )

    def _ts_term(t: str) -> str:
        tf = f"len(regexp_extract_all(lower(text), '{t}'))"
        return f"(CASE WHEN {tf} > 0 THEN (1.0 + ln({tf})) / (1.0 + ln({_wc})) ELSE 0.0 END)"

    o["search_ranked_ts"] = f"""
        SELECT doc_id, round({_ts_term('spark')} + {_ts_term('merge')}, 6) AS search_rank,
               n_chars
        FROM documents
        WHERE round({_ts_term('spark')} + {_ts_term('merge')}, 6) > 0
        ORDER BY search_rank DESC, doc_id ASC LIMIT 25
    """
    o["snippets"] = """
        SELECT doc_id,
               substr(text, greatest(strpos(lower(text), 'spark') - 50, 1), 200) AS snippet,
               CAST(strpos(lower(text), 'spark') - 1 AS BIGINT) AS match_offset
        FROM documents WHERE strpos(lower(text), 'spark') > 0
    """
    o["list_documents"] = (
        "SELECT doc_id, lang, source, n_chars FROM documents "
        "WHERE lang = 'en' AND n_chars >= 200 ORDER BY doc_id"
    )
    # O6 cleaning chain only (DOCX applies clean_extracted_text without the
    # null/hyphen pre-steps of the span pipeline)
    clean6 = (
        "trim(regexp_replace(regexp_replace(regexp_replace(regexp_replace("
        "regexp_replace(regexp_replace("
        r"text || chr(10) || chr(10), "  # end-of-paragraph \n\n from w:p
        r"'([a-z])([A-Z])', '\1 \2', 'g'), "
        "' {3,}', '  ', 'g'), "
        r"'\n{3,}', '\n\n', 'g'), "
        r"' +\n', '\n', 'g'), "
        r"'\n +', '\n', 'g'), "
        r"'[ \t]+', ' ', 'g')"
        ", ' ' || chr(10) || chr(9) || chr(13))"
    )
    docx_mime = "application/vnd.openxmlformats-officedocument.wordprocessingml.document"
    xlsx_mime = "application/vnd.openxmlformats-officedocument.spreadsheetml.sheet"
    o["extract_binary_roundtrip"] = f"""
        SELECT doc_id,
               CASE doc_id % 3 WHEN 0 THEN 'application/pdf'
                               WHEN 1 THEN '{docx_mime}'
                               ELSE '{xlsx_mime}' END AS mime_type,
               'completed' AS status,
               CAST(len(regexp_split_to_array(trim(text), '\\s+')) AS BIGINT) AS word_count,
               CASE doc_id % 3 WHEN 0 THEN trim(text)
                               WHEN 1 THEN {clean6}
                               ELSE text END AS span_text
        FROM documents
    """
    o["sql_search"] = """
        SELECT lang, count(*) AS n_docs,
               CAST(round(avg(n_chars), 4) AS DOUBLE) AS avg_chars
        FROM documents
        WHERE regexp_matches(lower(text), '\\btable\\b')
        GROUP BY lang
    """
    o["doc_stats"] = """
        SELECT source, count(*) AS n_docs, round(avg(n_chars), 4) AS avg_chars,
               min(n_chars) AS min_chars, max(n_chars) AS max_chars
        FROM documents GROUP BY source
    """

    fp = "md5(lower(regexp_replace(trim(text), '\\s+', ' ', 'g')))"
    o["dedup_exact"] = (
        f"SELECT {fp} AS fingerprint, count(*) AS n_dups FROM documents "
        "GROUP BY 1 HAVING count(*) > 1"
    )
    o["dedup_keep_first"] = f"""
        SELECT doc_id, lang, source, n_chars FROM documents
        QUALIFY row_number() OVER (PARTITION BY {fp} ORDER BY doc_id) = 1
    """
    # dedup_incremental: history = fingerprints of doc_id%3==0; keep docs
    # whose content hash is unseen, first-in-batch per fingerprint
    o["dedup_incremental"] = f"""
        SELECT doc_id, lang, source, n_chars FROM documents
        WHERE {fp} NOT IN (SELECT {fp} FROM documents WHERE doc_id % 3 = 0)
        QUALIFY row_number() OVER (PARTITION BY {fp} ORDER BY doc_id) = 1
    """
    o["dedup_ngram_jaccard"] = _SHINGLE3 + """
        SELECT ia AS id_a, ib AS id_b,
               round(i * 1.0 / (sa.sz + sb.sz - i), 6) AS jaccard
        FROM inter JOIN sz sa ON ia = sa.id JOIN sz sb ON ib = sb.id
        WHERE i * 1.0 / (sa.sz + sb.sz - i) >= 0.5
    """
    o["dedup_embedding"] = """
        SELECT a.vec_id AS id_a, b.vec_id AS id_b,
               round(list_cosine_similarity(CAST(a.embedding AS DOUBLE[]),
                                            CAST(b.embedding AS DOUBLE[])), 6) AS cosine
        FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
        WHERE round(list_cosine_similarity(CAST(a.embedding AS DOUBLE[]),
                                           CAST(b.embedding AS DOUBLE[])), 6) >= 0.4
    """
    # dedup_minhash_lsh: the banding join bounds recall only, and the exact
    # shingle-Jaccard verification removes all false positives — at the
    # planted-pair separation of the test corpora recall is 1.0, so the
    # correct output EQUALS the exact all-pairs oracle.
    o["dedup_minhash_lsh"] = o["dedup_ngram_jaccard"]

    # dedup_minhash_incremental: exact cross-set Jaccard (new = id%3!=0 vs
    # history = id%3==0) — LSH recall is 1.0 on the planted pairs at these
    # parameters (same evidence as dedup_minhash_lsh), candidates verify
    # exactly, so the SQL truth is the full cross join on shared shingles
    o["dedup_minhash_incremental"] = (
        "WITH toks AS (SELECT doc_id AS id, "
        "list_filter(string_split_regex(lower(text), '[^a-z0-9]+'), x -> x != '') t "
        "FROM documents), "
        "sh AS (SELECT id, unnest(list_distinct("
        "[array_to_string(t[i:i+2], ' ') for i in range(1, len(t)-1)])) AS shingle "
        "FROM toks WHERE len(t) >= 3), "
        "sz AS (SELECT id, count(*) sz FROM sh GROUP BY id), "
        "inter AS (SELECT a.id ia, b.id ib, count(*) i FROM sh a "
        "JOIN sh b ON a.shingle = b.shingle "
        "AND a.id % 3 != 0 AND b.id % 3 = 0 GROUP BY 1, 2) "
        "SELECT ia AS id_a, ib AS id_b, "
        "round(i * 1.0 / (sa.sz + sb.sz - i), 6) AS jaccard "
        "FROM inter JOIN sz sa ON ia = sa.id JOIN sz sb ON ib = sb.id "
        "WHERE i * 1.0 / (sa.sz + sb.sz - i) >= 0.5"
    )

    # dedup_lines: corpus-wide boilerplate-line removal with the planted
    # footer (df = corpus size > 10) and per-doc unique tails; the oracle
    # matches lines by string where the operator joins on xxhash64(line)
    o["dedup_lines"] = r"""
        WITH docs2 AS (
          SELECT doc_id,
                 text || chr(10) ||
                 'Shared Copyright Footer Line For All Documents' ||
                 chr(10) || 'Unique tail ' || doc_id AS text
          FROM documents
        ),
        split AS (SELECT doc_id, string_split(text, chr(10)) t FROM docs2),
        lines AS (
          SELECT doc_id, i.i AS pos, t[i.i] AS line,
                 regexp_replace(t[i.i], '^\s+|\s+$', '', 'g') AS nrm
          FROM split, LATERAL (
            SELECT unnest(generate_series(1, len(t))) AS i) i
        ),
        drop AS (
          SELECT nrm FROM (
            SELECT nrm, count(DISTINCT doc_id) c FROM lines
            WHERE length(nrm) >= 10 GROUP BY nrm)
          WHERE c > 10
        ),
        kept AS (
          SELECT * FROM lines
          WHERE NOT (length(nrm) >= 10 AND nrm IN (SELECT nrm FROM drop))
        ),
        totals AS (SELECT doc_id, count(*) n_lines FROM lines GROUP BY doc_id),
        reb AS (
          SELECT doc_id, string_agg(line, chr(10) ORDER BY pos) AS text,
                 count(*) n_kept
          FROM kept GROUP BY doc_id
        )
        SELECT t.doc_id, coalesce(reb.text, '') AS text, t.n_lines,
               t.n_lines - coalesce(reb.n_kept, 0) AS n_lines_removed
        FROM totals t LEFT JOIN reb USING (doc_id)
    """

    # scrub_pii: identical planted PII + the SAME regex patterns (kept
    # engine-portable: no lookaround, valid Java regex AND RE2)
    from readur_spark.functions.textstats import PII_PATTERNS as _PII

    _planted = (
        "text || ' contact user' || doc_id || '@example.com or 10.0.' || "
        "(doc_id % 256) || '.7 phone +1 555 867-5309 done'"
    )
    _scrub = _planted
    for _pat, _tok in _PII:
        _scrub = f"regexp_replace({_scrub}, '{_pat}', '{_tok}', 'g')"
    o["scrub_pii"] = f"""
        SELECT doc_id,
               {_scrub} AS scrubbed,
               len(regexp_extract_all({_planted}, '{_PII[0][0]}')) AS n_emails,
               len(regexp_extract_all({_planted}, '{_PII[1][0]}')) AS n_ips,
               len(regexp_extract_all({_planted}, '{_PII[2][0]}')) AS n_phones
        FROM documents
    """

    # warc_roundtrip: the WARC shards are synthesized FROM documents, so
    # the oracle is the source table itself — framing + per-record gzip +
    # distributed parse must reproduce it exactly
    o["warc_roundtrip"] = "SELECT doc_id, text FROM documents"

    # tfidf_top_terms: smoothed sklearn-convention tf-idf, deterministic
    # tie-break on the term, top-5 per doc, min_df=2
    o["tfidf_top_terms"] = """
        WITH toks AS (
          SELECT doc_id AS id, unnest(
            list_filter(string_split_regex(lower(text), '[^a-z0-9]+'),
                        x -> x != '')) AS tk
          FROM documents
        ),
        n AS (SELECT count(*) n FROM documents),
        tf AS (SELECT id, tk, count(*) tf FROM toks GROUP BY 1, 2),
        df AS (SELECT tk, count(*) df FROM tf GROUP BY 1 HAVING count(*) >= 2),
        sc AS (
          SELECT tf.id, tf.tk,
                 round(tf.tf * (ln(((SELECT n FROM n) + 1.0) / (df.df + 1.0))
                                + 1.0), 6) AS tfidf
          FROM tf JOIN df USING (tk)
        ),
        rk AS (
          SELECT id, tk, tfidf,
                 row_number() OVER (PARTITION BY id
                                    ORDER BY tfidf DESC, tk ASC) AS rnk
          FROM sc
        )
        SELECT id AS doc_id, tk AS term, tfidf, CAST(rnk AS INTEGER) AS rnk
        FROM rk WHERE rnk <= 5
    """

    # dsir_weights: hashed-bigram importance weights (Xie 2023) with the
    # same portable md5 bucket construction the sampling oracles use;
    # target = doc_id%5==0 inside the raw corpus
    o["dsir_weights"] = """
        WITH toks AS (
          SELECT doc_id AS id,
                 list_filter(string_split_regex(lower(text), '[^a-z0-9]+'),
                             x -> x != '') t
          FROM documents
        ),
        grams AS (
          SELECT id, t[i.i] || ' ' || t[i.i + 1] AS g
          FROM toks, LATERAL (
            SELECT unnest(generate_series(1, len(t) - 1)) AS i) i
          WHERE len(t) >= 2
        ),
        feats AS (
          SELECT id,
                 CAST(('0x' || substr(md5(g || ':dsir-v1'), 1, 8)) AS BIGINT)
                   % 4096 AS bucket,
                 count(*) cnt
          FROM grams GROUP BY 1, 2
        ),
        tgt AS (SELECT bucket, sum(cnt) ct FROM feats
                WHERE id % 5 = 0 GROUP BY 1),
        rawc AS (SELECT bucket, sum(cnt) cr FROM feats GROUP BY 1),
        tots AS (SELECT (SELECT sum(cr) FROM rawc) tr,
                        (SELECT coalesce(sum(ct), 0) FROM tgt) tt),
        ratio AS (
          SELECT r.bucket,
                 ln((coalesce(t.ct, 0) + 1.0)
                    / (CAST((SELECT tt FROM tots) AS DOUBLE) + 1.0 * 4096))
                 - ln((r.cr + 1.0)
                      / (CAST((SELECT tr FROM tots) AS DOUBLE) + 1.0 * 4096))
                   AS log_ratio
          FROM rawc r LEFT JOIN tgt t USING (bucket)
        )
        SELECT f.id AS doc_id,
               CAST(sum(f.cnt) AS BIGINT) AS n_features,
               round(sum(f.cnt * ratio.log_ratio), 6) AS log_w
        FROM feats f JOIN ratio USING (bucket)
        GROUP BY f.id
    """

    # dsir_resample_largek: the threshold-selection path must equal exact
    # top-k by (gumbel key desc, id asc). Same weight CTE as dsir_weights
    # (UNROUNDED log_w — rounding could flip the rank-120 cut), gumbel
    # key from the same salted-md5 uniform with the operator's exact
    # clamp. k=120, temperature=1.
    o["dsir_resample_largek"] = f"""
        WITH toks AS (
          SELECT doc_id AS id,
                 list_filter(string_split_regex(lower(text), '[^a-z0-9]+'),
                             x -> x != '') t
          FROM documents
        ),
        grams AS (
          SELECT id, t[i.i] || ' ' || t[i.i + 1] AS g
          FROM toks, LATERAL (
            SELECT unnest(generate_series(1, len(t) - 1)) AS i) i
          WHERE len(t) >= 2
        ),
        feats AS (
          SELECT id,
                 CAST(('0x' || substr(md5(g || ':dsir-v1'), 1, 8)) AS BIGINT)
                   % 4096 AS bucket,
                 count(*) cnt
          FROM grams GROUP BY 1, 2
        ),
        tgt AS (SELECT bucket, sum(cnt) ct FROM feats
                WHERE id % 5 = 0 GROUP BY 1),
        rawc AS (SELECT bucket, sum(cnt) cr FROM feats GROUP BY 1),
        tots AS (SELECT (SELECT sum(cr) FROM rawc) tr,
                        (SELECT coalesce(sum(ct), 0) FROM tgt) tt),
        ratio AS (
          SELECT r.bucket,
                 ln((coalesce(t.ct, 0) + 1.0)
                    / (CAST((SELECT tt FROM tots) AS DOUBLE) + 1.0 * 4096))
                 - ln((r.cr + 1.0)
                      / (CAST((SELECT tr FROM tots) AS DOUBLE) + 1.0 * 4096))
                   AS log_ratio
          FROM rawc r LEFT JOIN tgt t USING (bucket)
        ),
        w AS (
          SELECT f.id AS doc_id, sum(f.cnt * ratio.log_ratio) AS log_w
          FROM feats f JOIN ratio USING (bucket)
          GROUP BY f.id
        ),
        keyed AS (
          SELECT doc_id,
                 log_w - ln(-ln(least(greatest(
                   CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)
                     || ':dsir-resample-v1'), 1, 8)) AS BIGINT)
                     / 4294967296.0, 1e-12), 1.0 - 1e-12)))
                   AS gk
          FROM w
        )
        SELECT doc_id FROM keyed ORDER BY gk DESC, doc_id LIMIT 120
    """

    # url_canonical_dedup: the messy construction AND the canonicalization
    # both mirrored (same regexes/case-folds/sort — _canonical_url_sql);
    # count(*) CAST to BIGINT for the pandas-path hash
    o["url_canonical_dedup"] = f"""
        WITH urls AS (
          SELECT doc_id,
                 CASE doc_id % 5
                   WHEN 0 THEN 'https://www.site.com/page/'
                     || CAST(doc_id % 97 AS VARCHAR)
                   WHEN 1 THEN 'HTTPS://WWW.SITE.COM:443/page/'
                     || CAST(doc_id % 97 AS VARCHAR) || '#frag'
                   WHEN 2 THEN 'https://www.site.com/page/'
                     || CAST(doc_id % 97 AS VARCHAR)
                     || '?utm_source=rss&utm_medium=feed'
                   WHEN 3 THEN 'https://www.site.com/page/'
                     || CAST(doc_id % 97 AS VARCHAR) || '?b=2&a=1'
                   ELSE 'https://www.site.com/page/'
                     || CAST(doc_id % 97 AS VARCHAR) || '?a=1&b=2#s'
                 END AS url
          FROM documents
        )
        SELECT {_canonical_url_sql('url')} AS canonical_url,
               min(doc_id) AS keep_doc,
               CAST(count(*) AS BIGINT) AS n_variants
        FROM urls GROUP BY 1
    """

    # global_shuffle: the oracle is the definitionally-global rank the
    # distributed two-phase prefix scan must reproduce exactly
    o["global_shuffle"] = """
        SELECT doc_id,
               row_number() OVER (
                 ORDER BY md5(CAST(doc_id AS VARCHAR) || ':shuffle-v1'),
                          doc_id) - 1 AS shuffle_pos
        FROM documents
    """

    # outlink_domains: the SAME markup rebuilt in SQL, hrefs unnested
    # with the same three per-quoting-form regexes (RE2 mirrors of the
    # Java patterns), canonicalized + domain-attributed by the mirrored
    # expressions, aggregated identically
    o["outlink_domains"] = f"""
        WITH pages AS (
          SELECT doc_id,
                 '<p>x</p><a href="https://Site' || CAST(doc_id % 23 AS VARCHAR)
                 || '.COM:443/p/' || CAST(doc_id % 7 AS VARCHAR)
                 || '?utm_source=x&b=2&a=1">t</a><a href="/rel/'
                 || CAST(doc_id % 5 AS VARCHAR)
                 || '">r</a><a href="http://c' || CAST(doc_id % 13 AS VARCHAR)
                 || '.org/q#frag">u</a><a href=''https://sq'
                 || CAST(doc_id % 9 AS VARCHAR)
                 || '.example/s''>sq</a><a href=http://uq'
                 || CAST(doc_id % 6 AS VARCHAR)
                 || '.net/u class=z>uq</a>' AS html,
                 'host' || CAST(doc_id % 11 AS VARCHAR) || '.net' AS dom
          FROM documents
        ),
        links AS (
          SELECT doc_id, dom,
                 unnest(
                     regexp_extract_all(html,
                         '(?i)href\\s*=\\s*"([^"]+)"', 1)
                     || regexp_extract_all(html,
                         '(?i)href\\s*=\\s*''([^'']+)''', 1)
                     || regexp_extract_all(html,
                         '(?i)(^|[^\\w.-])href\\s*=\\s*([^\\s>"''][^\\s>]*)',
                         2)
                 ) AS href
          FROM pages
        ),
        canon AS (
          SELECT doc_id,
                 {_canonical_url_sql('href')} AS target_url,
                 CASE WHEN {_DOMAIN_OF_SQL.format(url='href')} = ''
                      THEN lower(dom)
                      ELSE {_DOMAIN_OF_SQL.format(url='href')}
                 END AS dst_domain
          FROM links
        )
        SELECT dst_domain,
               CAST(count(*) AS BIGINT) AS n_links,
               CAST(count(DISTINCT doc_id) AS BIGINT) AS n_docs,
               min(target_url) AS sample_url
        FROM canon GROUP BY dst_domain
    """

    # domain_pagerank: five chained-CTE power iterations replaying the
    # operator's exact recurrence (see _pagerank_sql)
    o["domain_pagerank"] = _pagerank_sql(
        """SELECT DISTINCT 'd' || CAST(doc_id % 53 AS VARCHAR) AS src,
                  'd' || CAST((doc_id * 13 + 5) % 97 AS VARCHAR) AS dst
           FROM documents
           WHERE 'd' || CAST(doc_id % 53 AS VARCHAR)
                 <> 'd' || CAST((doc_id * 13 + 5) % 97 AS VARCHAR)""",
        damping=0.85,
        iters=5,
    )

    # domain_degrees: same edge construction, degrees in SQL; the
    # reciprocal count is an EXISTS against the reversed edge set
    # domain_degrees (r8 consolidated): distinct-neighbor AND
    # multiplicity-weighted degrees over the same derived host graph
    # in one row; reciprocal is the distinct-mutual-neighbor count
    # (identical in both modes by contract)
    o["domain_degrees"] = """
        WITH wedges AS (
          SELECT 'd' || CAST(doc_id % 53 AS VARCHAR) AS src,
                 'd' || CAST((doc_id * 13 + 5) % 97 AS VARCHAR) AS dst,
                 count(*) AS w
          FROM documents
          WHERE 'd' || CAST(doc_id % 53 AS VARCHAR)
                <> 'd' || CAST((doc_id * 13 + 5) % 97 AS VARCHAR)
          GROUP BY 1, 2
        ),
        edges AS (SELECT src, dst FROM wedges),
        nodes AS (SELECT src AS domain FROM edges
                  UNION SELECT dst FROM edges),
        outd AS (SELECT src AS domain, count(*) AS c FROM edges GROUP BY src),
        ind AS (SELECT dst AS domain, count(*) AS c FROM edges GROUP BY dst),
        woutd AS (SELECT src AS domain, sum(w) AS c FROM wedges GROUP BY src),
        wind AS (SELECT dst AS domain, sum(w) AS c FROM wedges GROUP BY dst),
        recip AS (
          SELECT e.src AS domain, count(*) AS c FROM edges e
          WHERE EXISTS (SELECT 1 FROM edges r
                        WHERE r.src = e.dst AND r.dst = e.src)
          GROUP BY e.src
        )
        SELECT n.domain,
               CAST(coalesce(o.c, 0) AS BIGINT) AS out_degree,
               CAST(coalesce(i.c, 0) AS BIGINT) AS in_degree,
               CAST(coalesce(r.c, 0) AS BIGINT) AS reciprocal_degree,
               CAST(coalesce(wo.c, 0) AS BIGINT) AS w_out_degree,
               CAST(coalesce(wi.c, 0) AS BIGINT) AS w_in_degree
        FROM nodes n
        LEFT JOIN outd o ON n.domain = o.domain
        LEFT JOIN ind i ON n.domain = i.domain
        LEFT JOIN recip r ON n.domain = r.domain
        LEFT JOIN woutd wo ON n.domain = wo.domain
        LEFT JOIN wind wi ON n.domain = wi.domain
    """

    # domain_trustrank: the personalized replay over the same edge
    # construction, seeds as a VALUES literal
    o["domain_trustrank"] = _trustrank_sql(
        """SELECT DISTINCT 'd' || CAST(doc_id % 53 AS VARCHAR) AS src,
                  'd' || CAST((doc_id * 13 + 5) % 97 AS VARCHAR) AS dst
           FROM documents
           WHERE 'd' || CAST(doc_id % 53 AS VARCHAR)
                 <> 'd' || CAST((doc_id * 13 + 5) % 97 AS VARCHAR)""",
        "SELECT node FROM (VALUES ('d0'), ('d7'), ('d14'), ('d21'), "
        "('d35')) AS v(node)",
        damping=0.85,
        iters=5,
    )

    # domain_hits: the HITS replay (chained CTEs, see _hits_sql) over
    # the same edge construction
    o["domain_hits"] = _hits_sql(
        """SELECT DISTINCT 'd' || CAST(doc_id % 53 AS VARCHAR) AS src,
                  'd' || CAST((doc_id * 13 + 5) % 97 AS VARCHAR) AS dst
           FROM documents
           WHERE 'd' || CAST(doc_id % 53 AS VARCHAR)
                 <> 'd' || CAST((doc_id * 13 + 5) % 97 AS VARCHAR)""",
        iters=5,
    )

    # domain_harmonic: the HyperBall run replayed exactly in pure
    # Python (same md5 registers, same estimator, same merge schedule)
    # on the same derived edge list, shipped as a VALUES literal. The
    # replay corpus is the documented sf0.01 gate dir (overridable via
    # SPARK_GRAFT_ORACLE_SF_DIR for local sweeps at another sf), and
    # the emitted SQL guards on the registered ``documents`` view
    # having the SAME distinct-doc_id signature: if the gate ever runs
    # at a different sf the guard empties the oracle result and the
    # row-count check fails LOUDLY instead of silently comparing
    # against the wrong corpus (r7 advisor finding).
    def _hyperball_oracle_sql() -> str:
        import os as _os

        import duckdb as _dd

        from readur_spark.operators.neighborhood import hyperball_replay

        sf_dir = _os.environ.get(
            "SPARK_GRAFT_ORACLE_SF_DIR", "/root/testdata/sf0.01"
        )
        ids = [
            r[0]
            for r in _dd.sql(
                "SELECT DISTINCT doc_id FROM "
                f"'{sf_dir}/documents.parquet'"
            ).fetchall()
        ]
        edges = sorted(
            {
                (f"d{i % 53}", f"d{(i * 13 + 5) % 97}")
                for i in ids
                if f"d{i % 53}" != f"d{(i * 13 + 5) % 97}"
            }
        )
        rows = hyperball_replay(edges, p=6, max_t=8)
        values = ", ".join(
            f"('{v}', {round(est, 6)!r}, {round(harm, 6)!r}, {tc})"
            for v, (est, harm, tc) in sorted(rows.items())
        )
        return (
            "SELECT node, CAST(reach_est AS DOUBLE) AS reach_est, "
            "CAST(harmonic AS DOUBLE) AS harmonic, "
            "CAST(t_converged AS INT) AS t_converged "
            f"FROM (VALUES {values}) AS v(node, reach_est, harmonic, "
            "t_converged) WHERE "
            "(SELECT count(DISTINCT doc_id) FROM documents) = "
            f"{len(ids)} AND "
            "(SELECT coalesce(sum(DISTINCT doc_id), 0) FROM documents)"
            f" = {sum(ids)}"
        )

    try:
        o["domain_harmonic"] = _hyperball_oracle_sql()
    except (FileNotFoundError, OSError, duckdb.Error):
        # oracle replay unavailable (no parquet at the gate dir on this
        # host): omit the entry — the driver records the weaker
        # rows-only check
        pass

    # rank_filter_docs: the pagerank replay wrapped as a CTE, joined to
    # the doc->domain attribution, above-uniform filter
    _pr_cte = _pagerank_sql(
        """SELECT DISTINCT 'd' || CAST(doc_id % 53 AS VARCHAR) AS src,
                  'd' || CAST((doc_id * 13 + 5) % 97 AS VARCHAR) AS dst
           FROM documents
           WHERE 'd' || CAST(doc_id % 53 AS VARCHAR)
                 <> 'd' || CAST((doc_id * 13 + 5) % 97 AS VARCHAR)""",
        damping=0.85,
        iters=5,
    )
    o["rank_filter_docs"] = f"""
        WITH pr AS ({_pr_cte}),
        docs2 AS (
          SELECT doc_id,
                 'd' || CAST(doc_id % 53 AS VARCHAR) AS domain
          FROM documents
        )
        SELECT d.doc_id, d.domain, p.rank
        FROM docs2 d JOIN pr p ON d.domain = p.node
        WHERE p.rank > 1.0 / (SELECT count(*) FROM pr)
    """

    # domain_islands: INDEPENDENT union-find replay over the same
    # deterministic edge construction, emitted as a VALUES literal —
    # a different algorithm family (path-compressed union-find) from
    # the operator's distributed min-label propagation. Reads the
    # gate's sf0.01 parquet like the BPE replays; component = MIN
    # member string on both sides (Python str min == Spark string min:
    # both codepoint-lexicographic).
    try:
        import duckdb as _dd

        _ids = [
            int(r[0])
            for r in _dd.connect()
            .execute(
                "SELECT doc_id FROM "
                "'/root/testdata/sf0.01/documents.parquet' "
                "WHERE doc_id % 5 < 2"
            )
            .fetchall()
        ]
        _edges = set()
        for _i in _ids:
            _a, _b = f"h{_i % 100}", f"h{(_i * 7 + 3) % 100}"
            if _a != _b:
                _edges.add((_a, _b))
        _parent: dict = {}

        def _find(x):
            while _parent.setdefault(x, x) != x:
                _parent[x] = _parent[_parent[x]]
                x = _parent[x]
            return x

        for _a, _b in _edges:
            _parent[_find(_a)] = _find(_b)
        _members: dict = {}
        for _v in _parent:
            _members.setdefault(_find(_v), []).append(_v)
        _rows = []
        for _grp in _members.values():
            _lbl = min(_grp)
            for _v in _grp:
                _rows.append((_v, _lbl, len(_grp)))
        if _rows:
            o["domain_islands"] = (
                "SELECT n AS node, c AS component, "
                "CAST(s AS BIGINT) AS component_size FROM (VALUES "
                + ", ".join(f"('{n}', '{c}', {s})" for n, c, s in _rows)
                + ") AS v(n, c, s)"
            )
    except Exception:
        pass  # no sf0.01 parquet on this host: weaker rows-only check

    # sentence_stats: expression-for-expression mirror (the splitter is
    # deliberately lookaround-free so RE2 can run it; DuckDB backrefs
    # are \1 where Spark's are $1, and DuckDB needs the 'g' flag where
    # Spark replaces all by default)
    o["sentence_stats"] = r"""
        WITH sent AS (
          SELECT doc_id,
                 list_filter(
                   list_transform(
                     string_split(
                       regexp_replace(text, '([.!?]["'')\]]*)\s+',
                                      '\1' || chr(30), 'g'),
                       chr(30)),
                     s -> trim(s)),
                   s -> s <> '') AS sents
          FROM documents
        ),
        wc AS (
          SELECT doc_id, sents,
                 list_transform(sents,
                   s -> len(string_split_regex(s, '\s+'))) AS wcs
          FROM sent
        )
        SELECT doc_id,
               CAST(len(sents) AS BIGINT) AS n_sentences,
               CASE WHEN len(sents) > 0
                    THEN round(CAST(list_aggregate(wcs, 'sum') AS DOUBLE)
                               / len(sents), 6)
                    ELSE 0.0 END AS mean_sentence_words,
               CAST(CASE WHEN len(sents) > 0
                    THEN list_aggregate(wcs, 'max') ELSE 0 END
                    AS BIGINT) AS max_sentence_words,
               CASE WHEN len(sents) > 0
                    THEN round(CAST(len(list_filter(sents,
                         s -> regexp_matches(s, '[.!?]["'')\]]*$')))
                         AS DOUBLE) / len(sents), 6)
                    ELSE 0.0 END AS terminal_punct_ratio
        FROM wc
    """

    # curriculum_order: one definitional global sort in SQL — band from
    # the same double arithmetic (both engines compute (k/97.0)*10 with
    # identical IEEE ops), shuffle key = the same salted md5; ordering
    # by (band, h, id) equals the operator's (band·2^48 + u48(h), h, id)
    # because u48 is a monotone prefix of h
    o["curriculum_order"] = """
        WITH d AS (
          SELECT doc_id,
                 (doc_id % 97) / 97.0 AS q,
                 md5(CAST(doc_id AS VARCHAR) || ':curriculum-v1') AS h
          FROM documents
        )
        SELECT doc_id,
               CAST(row_number() OVER (
                 ORDER BY greatest(0, least(9, CAST(floor(q * 10) AS INT))),
                          h, doc_id) - 1 AS BIGINT) AS curriculum_pos
        FROM d
    """

    # curriculum_pack_roundtrip: the curriculum position window feeding
    # the definitional running-sum packing cut, ORDERED BY position
    # (floor() before the INT cast — DuckDB CAST(double AS INT) rounds)
    o["curriculum_pack_roundtrip"] = r"""
        WITH d AS (
          SELECT doc_id, text,
                 (doc_id % 97) / 97.0 AS q,
                 md5(CAST(doc_id AS VARCHAR) || ':curriculum-v1') AS h
          FROM documents
        ),
        cur AS (
          SELECT doc_id, text,
                 row_number() OVER (
                   ORDER BY greatest(0, least(9, CAST(floor(q * 10) AS INT))),
                            h, doc_id) - 1 AS pos
          FROM d
        ),
        t AS (
          SELECT doc_id, pos,
                 CAST(len(regexp_extract_all(text,
                     '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]')) AS BIGINT) AS n
          FROM cur
        ),
        c AS (
          SELECT doc_id, n,
                 sum(n) OVER (ORDER BY pos
                              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                   - n AS gstart
          FROM t WHERE n > 0
        )
        SELECT s.seq AS seq_id,
               c.doc_id,
               CAST(greatest(c.gstart, s.seq * 512) - c.gstart
                    AS BIGINT) AS tok_start,
               CAST(least(c.gstart + c.n, (s.seq + 1) * 512) - c.gstart
                    AS BIGINT) AS tok_end,
               CAST(least(c.gstart + c.n, (s.seq + 1) * 512)
                    - greatest(c.gstart, s.seq * 512) AS BIGINT) AS n_tokens
        FROM c, LATERAL (
          SELECT unnest(generate_series(CAST(c.gstart // 512 AS BIGINT),
                                        CAST((c.gstart + c.n - 1) // 512 AS BIGINT))) AS seq
        ) s
    """

    # domain_blocklist_filter: the broadcast anti-join = NOT IN on the
    # lowercased domain
    o["domain_blocklist_filter"] = """
        SELECT doc_id,
               (CASE WHEN doc_id % 2 = 0 THEN 'Host' ELSE 'host' END)
               || CAST(doc_id % 19 AS VARCHAR) || '.example' AS domain
        FROM documents
        WHERE lower((CASE WHEN doc_id % 2 = 0 THEN 'Host' ELSE 'host' END)
              || CAST(doc_id % 19 AS VARCHAR) || '.example')
              NOT IN ('host3.example', 'host7.example', 'host11.example')
    """

    # corpus_stats: one ROLLUP pass — the sum() must CAST to BIGINT (DuckDB
    # promotes to HUGEINT, which breaks the pandas-path hash; see the
    # pack_sequences lesson + tests/test_correctness_gate.py)
    o["corpus_stats"] = """
        SELECT lang, source, count(*) AS n_docs,
               CAST(sum(n_chars) AS BIGINT) AS total_chars,
               round(avg(n_chars), 4) AS avg_chars
        FROM documents GROUP BY ROLLUP (lang, source)
    """

    # lm_backoff: trigram Stupid Backoff (Brants 2007), trained on even
    # doc_ids, scored over all docs. Constants CAST to DOUBLE so both
    # engines compute the identical IEEE products (0.4*0.4 in DECIMAL
    # would be exactly 0.16; the double product is 0.16000000000000003).
    o["lm_backoff"] = """
        WITH toks AS (
          SELECT doc_id AS id,
                 list_filter(string_split_regex(lower(text), '[^a-z0-9]+'),
                             x -> x != '') t
          FROM documents
        ),
        tri AS (
          SELECT id, t[i.i] w1, t[i.i + 1] w2, t[i.i + 2] w3
          FROM toks, LATERAL (
            SELECT unnest(generate_series(1, len(t) - 2)) AS i) i
          WHERE len(t) >= 3
        ),
        c3 AS (SELECT w1, w2, w3, count(*) c3 FROM tri
               WHERE id % 2 = 0 GROUP BY 1, 2, 3),
        bi AS (
          SELECT t[i.i] w1, t[i.i + 1] w2, count(*) c2
          FROM toks, LATERAL (
            SELECT unnest(generate_series(1, len(t) - 1)) AS i) i
          WHERE len(t) >= 2 AND id % 2 = 0 GROUP BY 1, 2
        ),
        uni AS (
          SELECT w, count(*) c1
          FROM (SELECT unnest(t) w FROM toks WHERE id % 2 = 0) GROUP BY w
        ),
        n AS (SELECT sum(c1) n FROM uni),
        sc AS (
          SELECT g.id,
                 ln(CASE
                      WHEN c3.c3 IS NOT NULL AND bctx.c2 > 0
                        THEN c3.c3 * 1.0 / bctx.c2
                      WHEN bback.c2 IS NOT NULL AND uctx.c1 > 0
                        THEN CAST(0.4 AS DOUBLE) * bback.c2 / uctx.c1
                      ELSE CAST(0.4 AS DOUBLE) * CAST(0.4 AS DOUBLE)
                           * coalesce(CAST(uw.c1 AS DOUBLE),
                                      CAST(0.5 AS DOUBLE))
                           / CAST((SELECT n FROM n) AS DOUBLE)
                    END) lp
          FROM tri g
          LEFT JOIN c3 ON g.w1 = c3.w1 AND g.w2 = c3.w2 AND g.w3 = c3.w3
          LEFT JOIN bi bctx ON g.w1 = bctx.w1 AND g.w2 = bctx.w2
          LEFT JOIN bi bback ON g.w2 = bback.w1 AND g.w3 = bback.w2
          LEFT JOIN uni uctx ON g.w2 = uctx.w
          LEFT JOIN uni uw ON g.w3 = uw.w
        )
        SELECT id AS doc_id, count(*) AS n_trigrams,
               round(-avg(lp), 6) AS avg_nll
        FROM sc GROUP BY id
    """

    # decontaminate_ngrams: exact 13-gram collisions vs eval = doc_id%7==0,
    # identity pairs excluded; the oracle matches grams by string where the
    # operator joins on xxhash64(gram)
    o["decontaminate_ngrams"] = """
        WITH toks AS (
          SELECT doc_id AS id,
                 list_filter(string_split_regex(lower(text), '[^a-z0-9]+'),
                             x -> x != '') t
          FROM documents
        ),
        sh AS (
          SELECT id, unnest(list_distinct(
            [array_to_string(t[i:i+12], ' ') for i in range(1, len(t) - 11)]
          )) AS g
          FROM toks WHERE len(t) >= 13
        ),
        ev AS (SELECT id AS eid, g FROM sh WHERE id % 7 = 0),
        hits AS (
          SELECT DISTINCT c.id, c.g
          FROM sh c JOIN ev ON c.g = ev.g AND c.id != ev.eid
        ),
        tot AS (SELECT id, count(*) n_grams FROM sh GROUP BY id)
        SELECT h.id AS doc_id,
               count(*) AS n_collisions,
               any_value(t.n_grams) AS n_grams,
               round(count(*) * 1.0 / any_value(t.n_grams), 6) AS collision_frac
        FROM hits h JOIN tot t ON h.id = t.id
        GROUP BY h.id
    """

    # lm_perplexity: add-k bigram LM trained on even doc_ids, scoring all
    # docs; V = distinct training unigrams. avg_nll rounded (exp is
    # monotone, so the ranking check is complete without it).
    o["lm_perplexity"] = """
        WITH toks AS (
          SELECT doc_id,
                 list_filter(string_split_regex(lower(text), '[^a-z0-9]+'),
                             x -> x != '') t
          FROM documents
        ),
        big AS (
          SELECT doc_id, t[i.i] AS prev, t[i.i + 1] AS word
          FROM toks, LATERAL (
            SELECT unnest(generate_series(1, len(t) - 1)) AS i) i
          WHERE len(t) >= 2
        ),
        train AS (SELECT * FROM big WHERE doc_id % 2 = 0),
        pc AS (SELECT prev, word, count(*) c FROM train GROUP BY 1, 2),
        ctx AS (SELECT prev, sum(c) cc FROM pc GROUP BY 1),
        v AS (
          SELECT count(DISTINCT w) v
          FROM (SELECT unnest(t) w FROM toks WHERE doc_id % 2 = 0)
        ),
        sc AS (
          SELECT b.doc_id,
                 ln((coalesce(pc.c, 0) + 0.5)
                    / (coalesce(ctx.cc, 0) + 0.5 * (SELECT v FROM v))) lp
          FROM big b
          LEFT JOIN pc USING (prev, word)
          LEFT JOIN ctx USING (prev)
        )
        SELECT doc_id, count(*) AS n_bigrams,
               round(-avg(lp), 6) AS avg_nll
        FROM sc GROUP BY doc_id
    """

    # dedup_ngram_capped: the df-capped scale configuration. Semantics
    # mirrored exactly: set sizes from the UN-pruned shingle table, the
    # inverted index only over shingles with df <= cap, and orphaned docs
    # (entire shingle set above the cap) recovered by identical-set
    # pairing at jaccard 1.0 — the oracle groups on the full sorted
    # shingle-set string where the operator hashes it (equal sets are
    # equal either way; the hash never reaches the output).
    o["dedup_ngram_capped"] = f"""
        WITH corpus AS (
          SELECT doc_id, text FROM documents
          UNION ALL
          SELECT 9000000 + i AS doc_id, '{_BOILER_TEXT}' AS text
          FROM range(31) t(i)
        ),
        toks AS (
          SELECT doc_id AS id,
                 list_filter(string_split_regex(lower(text), '[^a-z0-9]+'),
                             x -> x != '') t
          FROM corpus
        ),
        sh AS (
          SELECT id, unnest(list_distinct(
            [array_to_string(t[i:i+2], ' ') for i in range(1, len(t)-1)])) AS shingle
          FROM toks WHERE len(t) >= 3
        ),
        sz AS (SELECT id, count(*) sz FROM sh GROUP BY id),
        df AS (SELECT shingle, count(*) c FROM sh GROUP BY shingle),
        kept AS (
          SELECT sh.id, sh.shingle FROM sh JOIN df USING (shingle)
          WHERE df.c <= 25
        ),
        inter AS (
          SELECT a.id ia, b.id ib, count(*) i FROM kept a
          JOIN kept b ON a.shingle = b.shingle AND a.id < b.id GROUP BY 1, 2
        ),
        pairs AS (
          SELECT ia AS id_a, ib AS id_b,
                 round(i * 1.0 / (sa.sz + sb.sz - i), 6) AS jaccard
          FROM inter JOIN sz sa ON ia = sa.id JOIN sz sb ON ib = sb.id
          WHERE i * 1.0 / (sa.sz + sb.sz - i) >= 0.5
        ),
        orphans AS (
          SELECT id, string_agg(shingle, chr(31) ORDER BY shingle) AS set_key
          FROM sh WHERE id NOT IN (SELECT DISTINCT id FROM kept)
          GROUP BY id
        ),
        mass AS (
          SELECT o1.id AS id_a, o2.id AS id_b, CAST(1.0 AS DOUBLE) AS jaccard
          FROM orphans o1 JOIN orphans o2
            ON o1.set_key = o2.set_key AND o1.id < o2.id
        )
        SELECT * FROM pairs UNION ALL SELECT * FROM mass
    """

    # dedup_simhash / ann_topk_indexed / snippets_full depend on
    # seeded hashes (blake2b bit folds, SRP hyperplanes, k-means init) or an
    # imperative scan, so no relational SQL over the base tables exists.
    # Oracle strategy: a driver-side pure-Python/numpy replica (tools/
    # expected.py — duckdb scan + stdlib math, no Spark) recomputes the
    # expected rows and registers them as a typed VALUES literal table.
    import os as _os

    _osf = _os.environ.get("SPARK_GRAFT_ORACLE_SF_DIR", "/root/testdata/sf0.01")
    if _os.path.isdir(_osf):
        from tools import expected as _exp

        # cluster dedup: DuckDB computes the same exact pair graph, a pure-
        # Python union-find derives components; survivors = NOT IN losers
        _pairs_sql = _SHINGLE3 + (
            "SELECT ia, ib FROM inter JOIN sz sa ON ia = sa.id JOIN sz sb ON ib = sb.id "
            "WHERE i * 1.0 / (sa.sz + sb.sz - i) >= 0.5"
        )
        _drop = _exp.cluster_drop_ids(_osf, _pairs_sql)
        _not_in = (
            f"WHERE doc_id NOT IN ({', '.join(map(str, _drop))})" if _drop else ""
        )
        o["dedup_cluster"] = (
            f"SELECT doc_id, lang, source, n_chars FROM documents {_not_in}"
        )

        o["dedup_simhash"] = _exp.values_sql(
            ["id_a", "id_b", "hamming"],
            ["BIGINT", "BIGINT", "INTEGER"],
            _exp.simhash_pairs_expected(_osf, max_hamming=3),
        )
        o["quality_classifier_scores"] = _exp.values_sql(
            ["doc_id", "quality_prob"],
            ["BIGINT", "DOUBLE"],
            _exp.quality_classifier_expected(_osf)[0],
        )
        o["ann_topk_indexed"] = _exp.values_sql(
            ["mode", "vec_id", "cosine"],
            ["VARCHAR", "BIGINT", "DOUBLE"],
            [
                ("lsh",) + tuple(r)
                for r in _exp.ann_topk_lsh_expected(
                    _osf, k=10, num_planes=4
                )
            ]
            + [
                ("ivf",) + tuple(r)
                for r in _exp.ivf_topk_expected(
                    _osf, k=10, n_centroids=16, n_probe=4
                )
            ],
        )
        o["semdedup"] = _exp.values_sql(
            ["vec_id"],
            ["BIGINT"],
            _exp.semdedup_expected(_osf, threshold=0.3, n_clusters=16),
        )
        o["winnow_overlap"] = _exp.values_sql(
            ["id_a", "id_b", "shared_fps"],
            ["BIGINT", "BIGINT", "BIGINT"],
            _exp.winnow_overlap_expected(_osf, min_shared=3, k=25, window=16),
        )
        o["dup_spans"] = _exp.values_sql(
            ["id_a", "id_b", "start_a", "start_b", "length"],
            ["BIGINT", "BIGINT", "INTEGER", "INTEGER", "INTEGER"],
            _exp.duplicate_spans_expected(_osf, min_len=50, k=25, window=16),
        )
        o["decontaminate"] = _exp.values_sql(
            ["doc_id", "n_eval_docs", "n_spans", "contaminated_chars"],
            ["BIGINT", "BIGINT", "BIGINT", "BIGINT"],
            _exp.decontaminate_expected(_osf, min_len=50, k=25, window=16, eval_mod=5),
        )

        o["image_ocr_fake"] = _exp.values_sql(
            ["doc_id", "status", "failure_reason", "word_count", "confidence"],
            ["BIGINT", "VARCHAR", "VARCHAR", "BIGINT", "DOUBLE"],
            _exp.image_ocr_expected(_osf),
        )
        o["snippets_full"] = _exp.values_sql(
            ["doc_id", "text", "start_offset", "end_offset", "highlight_start", "highlight_end"],
            ["BIGINT", "VARCHAR", "INTEGER", "INTEGER", "INTEGER", "INTEGER"],
            _exp.snippets_full_expected(_osf, "spark merge"),
        )

    # split_assign / sample_weighted: the salted-md5 uniform is engine-
    # portable by construction (first 32 md5 bits / 2^32)
    _u = (
        "CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR) || ':{salt}'), 1, 8)) "
        "AS BIGINT) / 4294967296.0"
    )
    o["split_assign"] = f"""
        WITH u AS (SELECT doc_id, {_u.format(salt="split-v1")} AS u FROM documents)
        SELECT CASE WHEN u < 0.9 THEN 'train'
                    WHEN u < 0.95 THEN 'val'
                    ELSE 'test' END AS split,
               count(*) AS n_docs
        FROM u GROUP BY 1
    """
    o["sample_weighted"] = f"""
        WITH w AS (
          SELECT doc_id,
                 round((
                   least(length(text) / 1000.0, 1.0)
                   + CASE WHEN length(text) = 0 THEN 0.0
                          ELSE length(regexp_replace(text, '[^A-Za-z0-9]', '', 'g')) * 1.0 / length(text) END
                   + least((CASE WHEN trim(text) = '' THEN 0
                                 ELSE len(regexp_split_to_array(trim(text), '\\s+')) END) * 6.0
                           / greatest(length(text), 1), 1.0)
                 ) / 3.0, 6) AS weight,
                 {_u.format(salt="sample-v1")} AS u
          FROM documents)
        SELECT doc_id, weight FROM w
        WHERE u < least(greatest(0.5 * weight, 0.0), 1.0)
    """

    # mix_sources: downsample-only domain reweighting — rates derived from
    # per-source counts, the same salted-md5 uniform as split/sample
    o["mix_sources"] = f"""
        WITH t(source, t) AS (VALUES ('src0', 0.5), ('src1', 0.3), ('src2', 0.2)),
        c AS (
          SELECT d.source, t.t, count(*) AS n
          FROM documents d JOIN t ON d.source = t.source
          GROUP BY d.source, t.t
        ),
        r AS (
          SELECT source, least(1.0, (SELECT min(n / t) FROM c) * t / n) AS rate
          FROM c
        )
        SELECT d.doc_id, d.source
        FROM documents d JOIN r ON d.source = r.source
        WHERE {_u.format(salt="mix-v1")} < r.rate
    """

    # mix_sources_temperature: targets = p^(1/T) over observed shares;
    # the target-normalization constant cancels in the keep rate, so
    # the replay computes pow directly (T = 2)
    o["mix_sources_temperature"] = f"""
        WITH docs AS (
          SELECT doc_id,
                 CASE WHEN doc_id % 10 < 7 THEN 'big'
                      WHEN doc_id % 10 < 9 THEN 'mid'
                      ELSE 'small' END AS source
          FROM documents
        ),
        c AS (
          SELECT source, CAST(count(*) AS DOUBLE) AS n
          FROM docs GROUP BY source
        ),
        tt AS (
          SELECT source, n,
                 pow(n / (SELECT sum(n) FROM c), 1.0/2.0) AS t
          FROM c
        ),
        r AS (
          SELECT source, least(1.0, (SELECT min(n / t) FROM tt) * t / n) AS rate
          FROM tt
        )
        SELECT d.doc_id, d.source
        FROM docs d JOIN r ON d.source = r.source
        WHERE {_u.format(salt="mix-v1")} < r.rate
    """

    # pack_sequences: the distributed prefix scan must equal the
    # straightforward global-order window + lateral series (fine for the
    # oracle at sf0.01; the Spark plan avoids exactly that single-partition
    # window — tests/test_packing.py asserts it)
    o["pack_sequences"] = r"""
        WITH t AS (
          SELECT doc_id,
                 CAST(len(regexp_extract_all(text,
                     '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]')) AS BIGINT) AS n
          FROM documents
        ),
        c AS (
          SELECT doc_id, n,
                 sum(n) OVER (ORDER BY doc_id
                              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                   - n AS gstart
          FROM t WHERE n > 0
        )
        SELECT s.seq AS seq_id,
               c.doc_id,
               CAST(greatest(c.gstart, s.seq * 512) - c.gstart
                    AS BIGINT) AS tok_start,
               CAST(least(c.gstart + c.n, (s.seq + 1) * 512) - c.gstart
                    AS BIGINT) AS tok_end,
               CAST(least(c.gstart + c.n, (s.seq + 1) * 512)
                    - greatest(c.gstart, s.seq * 512) AS BIGINT) AS n_tokens
        FROM c, LATERAL (
          SELECT unnest(generate_series(CAST(c.gstart // 512 AS BIGINT),
                                        CAST((c.gstart + c.n - 1) // 512 AS BIGINT))) AS seq
        ) s
    """

    # pack_stats: per-sequence rollup of the same manifest (fill-report);
    # counts CAST to BIGINT per the HUGEINT rule
    o["pack_stats"] = (
        "WITH manifest AS (" + o["pack_sequences"] + ") "
        "SELECT seq_id, CAST(count(*) AS BIGINT) AS n_docs, "
        "CAST(sum(n_tokens) AS BIGINT) AS n_tokens, "
        "round(sum(n_tokens) * 1.0 / 512, 6) AS fill_ratio "
        "FROM manifest GROUP BY seq_id"
    )

    # interleave_pack: the SAME deterministic span construction rebuilt
    # in SQL (halved text, image every 3rd doc at 64 tokens, audio every
    # 7th at 128), then the definitional stream cut — cumulative sum over
    # (doc_id, span_idx) and a generate_series explode per crossing.
    # Integer-division note: Spark's CAST(length/2 AS INT) truncates,
    # DuckDB's CAST(double AS INT) ROUNDS — use // on the DuckDB side.
    o["interleave_pack"] = r"""
        WITH spans AS (
          SELECT doc_id, 0 AS span_idx, 'text' AS kind, '' AS media_ref,
                 CAST(len(regexp_extract_all(
                     substr(text, 1, CAST(length(text) // 2 AS INT)),
                     '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]')) AS BIGINT) AS n
          FROM documents
          UNION ALL
          SELECT doc_id, 1, 'image',
                 'img://' || CAST(doc_id % 50 AS VARCHAR), 64
          FROM documents WHERE doc_id % 3 = 0
          UNION ALL
          SELECT doc_id, 2, 'text', '',
                 CAST(len(regexp_extract_all(
                     substr(text, CAST(length(text) // 2 AS INT) + 1),
                     '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]')) AS BIGINT)
          FROM documents
          UNION ALL
          SELECT doc_id, 3, 'audio',
                 'aud://' || CAST(doc_id AS VARCHAR), 128
          FROM documents WHERE doc_id % 7 = 0
        ),
        renum AS (
          -- Spark's posexplode numbers the PRESENT spans 0..k-1 (the
          -- array is built with absent image/audio slots filtered out),
          -- so renumber before the zero-cost drop
          SELECT doc_id, kind, media_ref, n,
                 CAST(row_number() OVER (PARTITION BY doc_id
                                         ORDER BY span_idx) - 1
                      AS INT) AS span_idx
          FROM spans
        ),
        c AS (
          SELECT doc_id, span_idx, kind, media_ref, n,
                 sum(n) OVER (ORDER BY doc_id, span_idx
                              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                   - n AS gstart
          FROM renum WHERE n > 0
        )
        SELECT s.seq AS seq_id,
               c.doc_id,
               c.span_idx AS span_idx,
               c.kind,
               c.media_ref,
               CAST(greatest(c.gstart, s.seq * 512) - c.gstart
                    AS BIGINT) AS tok_start,
               CAST(least(c.gstart + c.n, (s.seq + 1) * 512) - c.gstart
                    AS BIGINT) AS tok_end,
               CAST(least(c.gstart + c.n, (s.seq + 1) * 512)
                    - greatest(c.gstart, s.seq * 512) AS BIGINT) AS n_tokens,
               CAST(greatest(c.gstart, s.seq * 512) - s.seq * 512
                    AS BIGINT) AS seq_pos,
               (c.gstart // 512) <> ((c.gstart + c.n - 1) // 512)
                 AS straddles
        FROM c, LATERAL (
          SELECT unnest(generate_series(CAST(c.gstart // 512 AS BIGINT),
                                        CAST((c.gstart + c.n - 1) // 512 AS BIGINT))) AS seq
        ) s
    """

    # interleave_fill_stats: per-sequence multimodal rollup of the same
    # manifest (BIGINT casts per the HUGEINT rule)
    o["interleave_fill_stats"] = (
        "WITH manifest AS (" + o["interleave_pack"] + ") "
        "SELECT seq_id, "
        "CAST(count(DISTINCT doc_id) AS BIGINT) AS n_docs, "
        "CAST(count(*) AS BIGINT) AS n_spans, "
        "CAST(sum(CASE WHEN kind = 'text' THEN n_tokens ELSE 0 END) "
        "  AS BIGINT) AS n_text_tokens, "
        "CAST(sum(CASE WHEN kind <> 'text' THEN n_tokens ELSE 0 END) "
        "  AS BIGINT) AS n_media_tokens, "
        "CAST(sum(CASE WHEN kind <> 'text' THEN 1 ELSE 0 END) "
        "  AS BIGINT) AS n_media, "
        "CAST(sum(CASE WHEN kind <> 'text' AND straddles THEN 1 ELSE 0 END) "
        "  AS BIGINT) AS n_cut_media, "
        "round(sum(n_tokens) * 1.0 / 512, 6) AS fill "
        "FROM manifest GROUP BY seq_id"
    )

    # interleave_materialize: replay the whole span stream WITH text
    # carried through, slice each segment's token-length ids in SQL
    # (DuckDB list slicing l[a:b] is 1-based inclusive — [tok_start+1 :
    # tok_end] is exactly the half-open segment), assemble per sequence
    # ordered by seq_pos, md5 the same canonical rendering
    o["interleave_materialize"] = r"""
        WITH spans0 AS (
          SELECT doc_id, 0 AS i0, 'text' AS kind, '' AS media_ref,
                 substr(text, 1, CAST(length(text) // 2 AS INT)) AS sptext
          FROM documents
          UNION ALL
          SELECT doc_id, 1, 'image',
                 'img://' || CAST(doc_id % 50 AS VARCHAR), ''
          FROM documents WHERE doc_id % 3 = 0
          UNION ALL
          SELECT doc_id, 2, 'text', '',
                 substr(text, CAST(length(text) // 2 AS INT) + 1)
          FROM documents
          UNION ALL
          SELECT doc_id, 3, 'audio',
                 'aud://' || CAST(doc_id AS VARCHAR), ''
          FROM documents WHERE doc_id % 7 = 0
        ),
        renum AS (
          SELECT doc_id, kind, media_ref, sptext,
                 row_number() OVER (PARTITION BY doc_id ORDER BY i0) - 1
                   AS span_idx
          FROM spans0
        ),
        cost AS (
          SELECT *,
                 CASE WHEN kind = 'text'
                      THEN CAST(len(regexp_extract_all(sptext,
                          '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]')) AS BIGINT)
                      WHEN kind = 'image' THEN 64
                      WHEN kind = 'audio' THEN 128 END AS n
          FROM renum
        ),
        c AS (
          SELECT *,
                 sum(n) OVER (ORDER BY doc_id, span_idx
                              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                   - n AS gstart
          FROM cost WHERE n > 0
        ),
        seg AS (
          SELECT s.seq AS seq_id,
                 greatest(c.gstart, s.seq * 512) - s.seq * 512 AS seq_pos,
                 c.kind, c.media_ref,
                 least(c.gstart + c.n, (s.seq + 1) * 512)
                   - greatest(c.gstart, s.seq * 512) AS seg_len,
                 CASE WHEN c.kind = 'text'
                   THEN array_to_string(
                     (list_transform(regexp_extract_all(c.sptext,
                          '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]'),
                        t -> CAST(length(t) AS VARCHAR))
                     )[CAST(greatest(c.gstart, s.seq * 512) - c.gstart + 1 AS BIGINT)
                       : CAST(least(c.gstart + c.n, (s.seq + 1) * 512) - c.gstart AS BIGINT)],
                     ',')
                   ELSE '' END AS ids_str
          FROM c, LATERAL (
            SELECT unnest(generate_series(CAST(c.gstart // 512 AS BIGINT),
                                          CAST((c.gstart + c.n - 1) // 512 AS BIGINT))) AS seq
          ) s
        )
        SELECT seq_id,
               CAST(count(*) AS BIGINT) AS n_elements,
               CAST(sum(seg_len) AS BIGINT) AS n_tokens,
               md5(string_agg(kind || '|' || media_ref || '|' || ids_str,
                              ';' ORDER BY seq_pos)) AS sig
        FROM seg GROUP BY seq_id
    """

    # anchor_profile: same markup rebuilt in SQL, anchors re-extracted
    # ELEMENT-WISE with the same RE2-mirrored patterns (whole <a>
    # elements unnested; per element the href is pulled from the
    # OPENING TAG only across the three quoting forms, the body
    # tag-stripped and whitespace-collapsed), counted, top-2 by
    # (freq DESC, text ASC)
    o["anchor_profile"] = f"""
        WITH pages AS (
          SELECT doc_id,
                 '<a href="https://t' || CAST(doc_id % 17 AS VARCHAR)
                 || '.com/p">Anchor  ' || CAST(doc_id % 3 AS VARCHAR)
                 || '</a><a id="x" href="https://t' || CAST(doc_id % 17 AS VARCHAR)
                 || '.com/p">Anchor ' || CAST(doc_id % 5 AS VARCHAR)
                 || '</a><a href="/l/' || CAST(doc_id % 4 AS VARCHAR)
                 || '">Rel ' || CAST(doc_id % 2 AS VARCHAR)
                 || '</a><a href=''https://t' || CAST(doc_id % 17 AS VARCHAR)
                 || '.com/p''><b>Bold</b> ' || CAST(doc_id % 3 AS VARCHAR)
                 || '</a><a href=/u/' || CAST(doc_id % 4 AS VARCHAR)
                 || ' rel=nofollow>Unq ' || CAST(doc_id % 2 AS VARCHAR)
                 || '</a>' AS html
          FROM documents
        ),
        els AS (
          SELECT doc_id,
                 unnest(regexp_extract_all(html,
                     '(?is)<a(?:\\s[^>]*)?>.*?</a\\s*>', 0)) AS el
          FROM pages
        ),
        tagged AS (
          SELECT doc_id, el,
                 regexp_extract(el, '(?is)^<a(?:\\s[^>]*)?>', 0) AS open_tag
          FROM els
        ),
        pairs AS (
          SELECT doc_id,
                 coalesce(
                   nullif(regexp_extract(open_tag,
                       '(?i)href\\s*=\\s*"([^"]+)"', 1), ''),
                   nullif(regexp_extract(open_tag,
                       '(?i)href\\s*=\\s*''([^'']+)''', 1), ''),
                   nullif(regexp_extract(open_tag,
                       '(?i)(^|[^\\w.-])href\\s*=\\s*([^\\s>"''][^\\s>]*)',
                       2), '')
                 ) AS href,
                 trim(regexp_replace(
                   regexp_replace(
                     regexp_replace(el,
                         '(?is)^<a(?:\\s[^>]*)?>|</a\\s*>$', '', 'g'),
                     '(?s)<[^>]*>', ' ', 'g'),
                   '\\s+', ' ', 'g')) AS anchor
          FROM tagged
        ),
        canon AS (
          SELECT doc_id, {_canonical_url_sql('href')} AS target_url, anchor
          FROM pairs WHERE anchor <> '' AND href IS NOT NULL
        ),
        counts AS (
          SELECT target_url, anchor,
                 count(*) AS c, count(DISTINCT doc_id) AS d
          FROM canon GROUP BY target_url, anchor
        ),
        ranked AS (
          SELECT *, row_number() OVER (PARTITION BY target_url
                                       ORDER BY c DESC, anchor ASC) AS rn
          FROM counts
        )
        SELECT target_url,
               CAST(sum(c) AS BIGINT) AS n_anchors,
               CAST(sum(d) AS BIGINT) AS n_doc_anchor_pairs,
               CAST(count(*) AS BIGINT) AS n_unique_texts,
               string_agg(CASE WHEN rn <= 2 THEN anchor END, '|'
                          ORDER BY rn) AS top2
        FROM ranked GROUP BY target_url
    """

    # anchor_quality_features (NEW r8): the SAME element-wise anchor
    # re-extraction CTEs, aggregated per target into the feature set
    # and LEFT-joined onto the doc→url attribution (urls mod 23 so
    # t17..t22 exercise the zero-fill branch)
    _aqf_prefix = o["anchor_profile"].split("counts AS (")[0]
    o["anchor_quality_features"] = (
        _aqf_prefix
        + """counts AS (
          SELECT target_url, anchor, count(*) AS c
          FROM canon GROUP BY target_url, anchor
        ),
        prof AS (
          SELECT target_url,
                 sum(c) AS n_anchors,
                 count(*) AS n_unique,
                 max(c) AS top_c,
                 sum(length(anchor) * c) * 1.0 / sum(c) AS len_mean
          FROM counts GROUP BY target_url
        ),
        linking AS (
          SELECT target_url, count(DISTINCT doc_id) AS n_docs
          FROM canon GROUP BY target_url
        ),
        docs2 AS (
          SELECT doc_id,
                 'https://t' || CAST(doc_id % 23 AS VARCHAR) || '.com/p'
                 AS url
          FROM documents
        )
        SELECT d.doc_id, d.url,
               CAST(coalesce(p.n_anchors, 0) AS BIGINT)
                   AS n_inlink_anchors,
               CAST(coalesce(l.n_docs, 0) AS BIGINT) AS n_linking_docs,
               CAST(coalesce(p.n_unique, 0) AS BIGINT)
                   AS n_unique_anchor_texts,
               round(coalesce(p.n_unique * 1.0 / p.n_anchors, 0), 6)
                   AS anchor_diversity,
               round(coalesce(p.top_c * 1.0 / p.n_anchors, 0), 6)
                   AS top_anchor_share,
               round(coalesce(p.len_mean, 0), 6)
                   AS anchor_text_len_mean
        FROM docs2 d
        LEFT JOIN prof p ON d.url = p.target_url
        LEFT JOIN linking l ON d.url = l.target_url
    """
    )

    # bpe_token_counts / pack_sequences_bpe: BPE is not SQL-expressible,
    # so the oracle replays an INDEPENDENT sequential implementation
    # (naive full-recount trainer + rank-order encoder — see
    # _bpe_oracle_rows) and ships its per-doc results as a VALUES literal;
    # the packing window then runs relationally over those counts exactly
    # like o["pack_sequences"] does over the regex counts.
    try:
        _bpe_rows = _bpe_oracle_rows()
        _bpe_values = ", ".join(
            f"({d}, {n}, {s})" for d, n, s in _bpe_rows
        )
        o["bpe_token_counts"] = (
            "SELECT CAST(doc_id AS BIGINT) AS doc_id, "
            "CAST(n AS BIGINT) AS n_tokens, CAST(s AS BIGINT) AS id_sum "
            f"FROM (VALUES {_bpe_values}) AS v(doc_id, n, s)"
        )
        # the spark-loop trainer is pinned sequential-exact, so the
        # SAME naive replay is its oracle — a green row is the proof
        o["bpe_token_counts_sparkloop"] = o["bpe_token_counts"]
        o["pack_sequences_bpe"] = f"""
            WITH t AS (
              SELECT CAST(doc_id AS BIGINT) AS doc_id, CAST(n AS BIGINT) AS n
              FROM (VALUES {_bpe_values}) AS v(doc_id, n, s)
            ),
            c AS (
              SELECT doc_id, n,
                     sum(n) OVER (ORDER BY doc_id
                                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                       - n AS gstart
              FROM t WHERE n > 0
            )
            SELECT s.seq AS seq_id,
                   c.doc_id,
                   CAST(greatest(c.gstart, s.seq * 512) - c.gstart
                        AS BIGINT) AS tok_start,
                   CAST(least(c.gstart + c.n, (s.seq + 1) * 512) - c.gstart
                        AS BIGINT) AS tok_end,
                   CAST(least(c.gstart + c.n, (s.seq + 1) * 512)
                        - greatest(c.gstart, s.seq * 512) AS BIGINT) AS n_tokens
            FROM c, LATERAL (
              SELECT unnest(generate_series(CAST(c.gstart // 512 AS BIGINT),
                                            CAST((c.gstart + c.n - 1) // 512 AS BIGINT))) AS seq
            ) s
        """
        # pack_materialize_bpe: cut the replayed doc-order token stream
        # every 512 and hash each sequence's exact content
        import hashlib as _hl

        _ids_by_doc, _vocab = _bpe_oracle_ids()
        _stream: list[int] = []
        for _d in sorted(_ids_by_doc):
            _stream.extend(_ids_by_doc[_d])
        _seq_rows = []
        for _sid in range((len(_stream) + 511) // 512):
            _seg = _stream[_sid * 512 : (_sid + 1) * 512]
            _seq_rows.append(
                (
                    _sid,
                    len(_seg),
                    sum(_seg),
                    _hl.md5(",".join(map(str, _seg)).encode()).hexdigest(),
                )
            )
        if _seq_rows:  # an empty stream would render invalid VALUES SQL
            o["pack_materialize_bpe"] = (
                "SELECT CAST(seq_id AS BIGINT) AS seq_id, "
                "CAST(n AS BIGINT) AS n_tokens, CAST(s AS BIGINT) AS id_sum, "
                "m AS ids_md5 FROM (VALUES "
                + ", ".join(
                    f"({a}, {b}, {c}, '{d}')" for a, b, c, d in _seq_rows
                )
                + ") AS v(seq_id, n, s, m)"
            )

        # chunk_by_tokens: windows of ≤128 tokens, overlap ≤16, every cut
        # snapped to a pre-token boundary (char-boundary fallback inside
        # mega-pre-tokens) per the operator's contract; chunk text
        # decoded with the replay's own vocab table, hashed. The walk is
        # an independent linear-scan formulation of the same spec the
        # operator implements with bisect (kernels.bpe.token_windows).
        _starts_by_doc = _bpe_oracle_starts()
        _chunk_rows = []
        for _d in sorted(_ids_by_doc):
            _ids = _ids_by_doc[_d]
            if not _ids:
                continue
            _nn = len(_ids)
            _bnd = [False] * (_nn + 1)
            for _s in _starts_by_doc[_d]:
                _bnd[_s] = True

            def _snap_back(lo, hi, _bnd=_bnd, _ids=_ids):
                # largest cut in (lo, hi]: pre-token boundary preferred,
                # else a UTF-8 character boundary, else None
                for _c in range(hi, lo, -1):
                    if _bnd[_c]:
                        return _c
                for _c in range(hi, lo, -1):
                    if not 0x80 <= _vocab[_ids[_c]][0] < 0xC0:
                        return _c
                return None

            def _snap_fwd(lo, hi, _bnd=_bnd, _ids=_ids):
                # smallest cut in [lo, hi]: boundary preferred, else a
                # character boundary, else None
                for _c in range(lo, hi + 1):
                    if _bnd[_c]:
                        return _c
                for _c in range(lo, hi + 1):
                    if not 0x80 <= _vocab[_ids[_c]][0] < 0xC0:
                        return _c
                return None

            def _char_fwd(lo, _ids=_ids):
                # nearest character-safe cut ≥ lo (_nn at worst)
                _c = lo
                while _c < _nn and 0x80 <= _vocab[_ids[_c]][0] < 0xC0:
                    _c += 1
                return _c

            _pos = _cn = 0
            _prev_end = 0
            while True:
                _end = (
                    _nn
                    if _nn - _pos <= 128
                    else (
                        _snap_back(_pos, _pos + 128)
                        or _char_fwd(_pos + 129)
                    )
                )
                if _end <= _prev_end and _nn - _pos > 128:
                    # strict-subset window (overlap snap stalled before
                    # a mega pre-token): skip, jump to the frontier —
                    # mirrors the kernel's strictly-advancing-end rule
                    _pos = _prev_end
                    continue
                _prev_end = _end
                _w = _ids[_pos:_end]
                _text = b"".join(_vocab[i] for i in _w).decode(
                    "utf-8", "replace"
                )
                _chunk_rows.append(
                    (
                        _d,
                        _cn,
                        len(_w),
                        _hl.md5(_text.encode("utf-8")).hexdigest(),
                    )
                )
                _cn += 1
                if _end >= _nn:
                    break
                _pos = _snap_fwd(max(_end - 16, _pos + 1), _end) or _end
        if _chunk_rows:  # same empty-VALUES guard
            o["chunk_by_tokens"] = (
                "SELECT CAST(doc_id AS BIGINT) AS doc_id, "
                "CAST(cn AS BIGINT) AS chunk_no, CAST(n AS BIGINT) AS n_tokens, "
                "m AS chunk_md5 FROM (VALUES "
                + ", ".join(
                    f"({a}, {b}, {c}, '{d}')" for a, b, c, d in _chunk_rows
                )
                + ") AS v(doc_id, cn, n, m)"
            )
    except Exception:
        # oracle replay unavailable (no sf0.01 parquet on this host):
        # omit the entries — the driver records the weaker rows-only check
        pass

    # pdf_layout_roundtrip: the two-column layout must read back as the
    # original word sequence (capped at 96 words / 6-word lines, matching
    # the query's fixture builder exactly)
    o["pdf_layout_roundtrip"] = r"""
        SELECT doc_id,
               array_to_string(
                 list_filter(regexp_split_to_array(trim(text), '\s+'),
                             x -> x != ''
                                  AND regexp_matches(x, '^[\x00-\xff]*$')
                 )[1:96], ' ') AS layout_text
        FROM documents
    """

    # chunk_pack_roundtrip: chunk (40/8) -> pack (256) composed
    # relationally: the chunk oracle's word windows feed the same regex
    # token counts + global packing window, keyed by the composite
    # chunk_id = doc_id * 2^20 + chunk_no
    o["chunk_pack_roundtrip"] = r"""
        WITH base AS (
          SELECT doc_id,
                 list_filter(regexp_split_to_array(trim(text), '\s+'),
                             x -> x != '') AS words
          FROM documents
        ),
        nc AS (
          SELECT doc_id, words,
                 CASE WHEN len(words) = 0 THEN 0
                      ELSE 1 + CAST(ceil(greatest(len(words) - 40, 0) / 32.0) AS INT)
                 END AS nc
          FROM base
        ),
        chunks AS (
          SELECT doc_id * 1048576 + i AS chunk_id,
                 array_to_string(words[i * 32 + 1 : i * 32 + 40], ' ') AS chunk_text
          FROM nc, unnest(range(nc)) AS t(i)
          WHERE nc > 0
        ),
        t AS (
          SELECT chunk_id,
                 CAST(len(regexp_extract_all(chunk_text,
                     '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]')) AS BIGINT) AS n
          FROM chunks
        ),
        c AS (
          SELECT chunk_id, n,
                 sum(n) OVER (ORDER BY chunk_id
                              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                   - n AS gstart
          FROM t WHERE n > 0
        )
        SELECT s.seq AS seq_id,
               c.chunk_id,
               CAST(greatest(c.gstart, s.seq * 256) - c.gstart
                    AS BIGINT) AS tok_start,
               CAST(least(c.gstart + c.n, (s.seq + 1) * 256) - c.gstart
                    AS BIGINT) AS tok_end,
               CAST(least(c.gstart + c.n, (s.seq + 1) * 256)
                    - greatest(c.gstart, s.seq * 256) AS BIGINT) AS n_tokens
        FROM c, LATERAL (
          SELECT unnest(generate_series(CAST(c.gstart // 256 AS BIGINT),
                                        CAST((c.gstart + c.n - 1) // 256 AS BIGINT))) AS seq
        ) s
    """

    # repetition_filters: the Gopher repetition family mirrored relationally
    # (dup lines/paragraphs + top-n-gram coverage, cnt>1 only, clamped ≤1)
    _rep_gram = lambda n: f"""
        g{n} AS (
          SELECT tok.doc_id, tok.total_chars,
                 array_to_string(tok.ts[i.g : i.g + {n - 1}], ' ') AS gram
          FROM tok, LATERAL (
            SELECT unnest(generate_series(1, len(tok.ts) - {n - 1})) AS g) i
          WHERE len(tok.ts) >= {n}
        ),
        t{n} AS (
          SELECT doc_id,
                 round(least(max(CASE WHEN cnt > 1 THEN cnt * length(gram)
                                      ELSE 0 END) * 1.0 / any_value(total_chars),
                             1.0), 6) AS top{n}_char_frac
          FROM (SELECT doc_id, total_chars, gram, count(*) AS cnt
                FROM g{n} GROUP BY 1, 2, 3)
          GROUP BY doc_id
        )"""
    o["repetition_filters"] = (
        r"""
        WITH base AS (SELECT doc_id, text, length(text) AS total_chars FROM documents),
        lines AS (
          SELECT doc_id, unit FROM (
            SELECT doc_id, unnest(string_split_regex(text, '\n')) AS unit FROM base)
          WHERE trim(unit) <> ''),
        lf AS (
          SELECT doc_id,
                 round(sum(CASE WHEN cnt > 1 THEN cnt ELSE 0 END) * 1.0 / sum(cnt), 6)
                   AS dup_line_frac,
                 round(sum(CASE WHEN cnt > 1 THEN cnt * length(unit) ELSE 0 END) * 1.0
                       / sum(cnt * length(unit)), 6) AS dup_line_char_frac
          FROM (SELECT doc_id, unit, count(*) AS cnt FROM lines GROUP BY 1, 2)
          GROUP BY doc_id),
        paras AS (
          SELECT doc_id, unit FROM (
            SELECT doc_id, unnest(string_split_regex(text, '\n\s*\n')) AS unit FROM base)
          WHERE trim(unit) <> ''),
        pf AS (
          SELECT doc_id,
                 round(sum(CASE WHEN cnt > 1 THEN cnt ELSE 0 END) * 1.0 / sum(cnt), 6)
                   AS dup_para_frac,
                 round(sum(CASE WHEN cnt > 1 THEN cnt * length(unit) ELSE 0 END) * 1.0
                       / sum(cnt * length(unit)), 6) AS dup_para_char_frac
          FROM (SELECT doc_id, unit, count(*) AS cnt FROM paras GROUP BY 1, 2)
          GROUP BY doc_id),
        tok AS (
          SELECT doc_id, total_chars,
                 list_filter(string_split_regex(lower(text), '[^a-z0-9]+'),
                             x -> x <> '') AS ts
          FROM base),"""
        + _rep_gram(2) + "," + _rep_gram(3) + "," + _rep_gram(4)
        + """
        SELECT base.doc_id,
               coalesce(lf.dup_line_frac, 0.0) AS dup_line_frac,
               coalesce(lf.dup_line_char_frac, 0.0) AS dup_line_char_frac,
               coalesce(pf.dup_para_frac, 0.0) AS dup_para_frac,
               coalesce(pf.dup_para_char_frac, 0.0) AS dup_para_char_frac,
               coalesce(t2.top2_char_frac, 0.0) AS top2_char_frac,
               coalesce(t3.top3_char_frac, 0.0) AS top3_char_frac,
               coalesce(t4.top4_char_frac, 0.0) AS top4_char_frac,
               coalesce(lf.dup_line_frac, 0.0) <= 0.30
                 AND coalesce(pf.dup_para_frac, 0.0) <= 0.30
                 AND coalesce(lf.dup_line_char_frac, 0.0) <= 0.20
                 AND coalesce(pf.dup_para_char_frac, 0.0) <= 0.20
                 AND coalesce(t2.top2_char_frac, 0.0) <= 0.20
                 AND coalesce(t3.top3_char_frac, 0.0) <= 0.18
                 AND coalesce(t4.top4_char_frac, 0.0) <= 0.16 AS rep_pass
        FROM base
        LEFT JOIN lf USING (doc_id)
        LEFT JOIN pf USING (doc_id)
        LEFT JOIN t2 USING (doc_id)
        LEFT JOIN t3 USING (doc_id)
        LEFT JOIN t4 USING (doc_id)
    """
    )

    # pdf_ocr_glyph: the glyph engine reads rendered pages EXACTLY, so the
    # expected OCR text is the planted body — closed-form in doc_id. Any
    # rendering or template-matching defect breaks the hash.
    o["pdf_ocr_glyph"] = """
        SELECT doc_id,
               'document ' || CAST(doc_id AS VARCHAR) || ' rendered page'
                 || chr(10) ||
               'checksum ' || CAST(doc_id % 97 AS VARCHAR) || ' of body text'
                 AS ocr_text,
               100.0 AS confidence
        FROM documents
    """

    # image_quality_stats: the synthetic raster's stats are closed-form in
    # doc_id (corpus.quality_png_bytes docstring): brightness = doc_id%200
    # + 14, contrast = sqrt(38)/255 — a real relational oracle over the
    # distributed decode+analyze path.
    o["image_quality_stats"] = """
        SELECT doc_id,
               34 AS width, 26 AS height,
               CAST(doc_id % 200 + 14 AS DOUBLE) AS brightness,
               round(sqrt(38.0) / 255.0, 6) AS contrast_ratio
        FROM documents
    """

    o["embedding_quantize"] = """
        WITH q AS (
          SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e,
                 list_max(list_transform(CAST(embedding AS DOUBLE[]), x -> abs(x))) / 127.0
                 AS scale
          FROM embeddings)
        SELECT vec_id, round(scale, 9) AS scale,
               round(sqrt(list_sum([
                   pow(e[i] - round(e[i] / scale) * scale, 2)
                   for i in range(1, len(e) + 1)])), 6) AS l2_error
        FROM q
    """
    o["ann_topk_cosine"] = """
        SELECT vec_id,
               round(list_cosine_similarity(CAST(embedding AS DOUBLE[]),
                   (SELECT CAST(embedding AS DOUBLE[]) FROM embeddings WHERE vec_id = 0)), 6)
               AS cosine
        FROM embeddings
        ORDER BY cosine DESC, vec_id ASC LIMIT 10
    """

    o["q1_pricing_summary"] = """
        SELECT l_returnflag, l_linestatus,
          CAST(round(sum(CAST(l_quantity AS DECIMAL(18,4))), 2) AS DOUBLE) AS sum_qty,
          CAST(round(sum(CAST(l_extendedprice AS DECIMAL(18,4))), 2) AS DOUBLE) AS sum_base_price,
          CAST(round(sum(CAST(l_extendedprice AS DECIMAL(18,4)) * (1 - CAST(l_discount AS DECIMAL(18,4)))), 2) AS DOUBLE) AS sum_disc_price,
          CAST(round(sum(CAST(l_extendedprice AS DECIMAL(18,4)) * (1 - CAST(l_discount AS DECIMAL(18,4))) * (1 + CAST(l_tax AS DECIMAL(18,4)))), 2) AS DOUBLE) AS sum_charge,
          count(*) AS count_order
        FROM lineitem WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
        GROUP BY l_returnflag, l_linestatus
    """
    o["top_customers"] = """
        WITH rev AS (
          SELECT o_custkey, CAST(round(sum(CAST(o_totalprice AS DECIMAL(18,4))), 2) AS DOUBLE) AS revenue,
                 count(*) AS n_orders
          FROM orders GROUP BY o_custkey)
        SELECT c_custkey, c_name, c_mktsegment, revenue, n_orders
        FROM rev JOIN customer ON o_custkey = c_custkey
        ORDER BY revenue DESC, c_custkey ASC LIMIT 10
    """
    o["customers_semi_anti"] = """
        SELECT c_custkey, c_name, CAST(NULL AS VARCHAR) AS c_mktsegment,
               'no_orders' AS kind
        FROM customer
        WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
        UNION ALL
        SELECT c_custkey, c_name, c_mktsegment, 'high_value' AS kind
        FROM customer
        WHERE EXISTS (SELECT 1 FROM orders
                      WHERE o_custkey = c_custkey AND o_totalprice > 450000.0)
    """
    o["revenue_by_nation"] = """
        SELECT r_name, n_name,
               CAST(round(sum(CAST(o_totalprice AS DECIMAL(18,4))), 2) AS DOUBLE) AS revenue,
               count(*) AS n_orders
        FROM orders
        JOIN customer ON o_custkey = c_custkey
        JOIN nation ON c_nationkey = n_nationkey
        JOIN region ON n_regionkey = r_regionkey
        GROUP BY r_name, n_name
    """
    o["event_windowed_metrics"] = """
        SELECT date_trunc('hour', ts) AS window_start,
               date_trunc('hour', ts) + INTERVAL 1 HOUR AS window_end,
               event_type,
               count(*) AS n_events,
               round(sum(value), 4) AS total_value
        FROM events GROUP BY 1, 2, 3
    """
    o["event_type_stats"] = """
        SELECT event_type, count(*) AS n_events, round(avg(value), 4) AS avg_value,
               round(min(value), 4) AS min_value, round(max(value), 4) AS max_value,
               count(DISTINCT user_id) AS n_users
        FROM events GROUP BY event_type HAVING count(*) > 0
    """
    o["user_event_windows"] = """
        WITH seq AS (
          SELECT user_id, event_type, ts, event_id,
                 CAST(row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS BIGINT) AS seq,
                 round(sum(value) OVER (PARTITION BY user_id ORDER BY ts, event_id
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 4) AS running_value
          FROM events)
        SELECT user_id, event_type, seq, running_value FROM seq
        QUALIFY row_number() OVER (PARTITION BY user_id, event_type ORDER BY ts DESC, event_id DESC) = 1
    """
    o["sessionize"] = """
        WITH g AS (
          SELECT user_id, ts, event_id, value,
                 CASE WHEN lag(ts) OVER w IS NULL
                           OR date_diff('second', lag(ts) OVER w, ts) > 1800
                      THEN 1 ELSE 0 END AS new_session
          FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
        s AS (
          SELECT *, CAST(sum(new_session) OVER (PARTITION BY user_id ORDER BY ts, event_id
                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS session_no
          FROM g)
        SELECT user_id, session_no, count(*) AS n_events,
               round(sum(value), 4) AS session_value,
               min(ts) AS session_start, max(ts) AS session_end
        FROM s GROUP BY user_id, session_no
    """
    return o
