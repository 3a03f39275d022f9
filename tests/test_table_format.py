"""The table-format seam (north rule: "over Iceberg tables").

This container has no Iceberg runtime, so the tests pin three things:
the parquet fallback is byte-compatible with the previous hard-coded
paths, iceberg requests FAIL FAST with the cluster recipe (never a
silent downgrade), and the dispatch actually routes to catalog
reads/writes when the runtime is present (faked via monkeypatch).
"""

import pytest

from readur_spark.sources import table_format as tf
from readur_spark.sources.tables import load_table

SF = "/root/testdata/sf0.001"


def test_parquet_fallback_reads_identically(spark):
    a = load_table(spark, SF, "documents").count()
    b = tf.read_table(spark, f"{SF}/documents.parquet", "parquet").count()
    assert a == b > 0


def test_iceberg_unavailable_fails_fast_with_recipe(spark):
    assert tf.iceberg_available(spark) is False  # this container
    with pytest.raises(RuntimeError) as e:
        tf.resolve_format(spark, "iceberg")
    msg = str(e.value)
    assert "iceberg-spark-runtime" in msg and "spark.sql.catalog" in msg
    with pytest.raises(RuntimeError):
        load_table(spark, "lake.corpus", "documents", table_format="iceberg")
    with pytest.raises(ValueError):
        tf.resolve_format(spark, "orc")


def test_iceberg_dispatch_routes_to_catalog(spark, monkeypatch):
    """With the runtime 'present', reads must go through the catalog
    (spark.read.table) and never touch a parquet path."""
    monkeypatch.setattr(tf, "iceberg_available", lambda s: True)
    seen = {}

    class _Reader:
        def table(self, ident):
            seen["table"] = ident
            return "sentinel-df"

        def parquet(self, path):  # pragma: no cover - must not be hit
            raise AssertionError("iceberg read fell through to parquet")

    class _Spark:
        read = _Reader()

    out = tf.read_table(_Spark(), "lake.corpus.documents", "iceberg")
    assert out == "sentinel-df"
    assert seen["table"] == "lake.corpus.documents"


def test_checkpoint_parquet_fallback_roundtrip(spark, tmp_path):
    """CheckpointTable with the explicit parquet format keeps the tested
    resume semantics (append -> completed_partitions)."""
    from readur_spark.plans.checkpoint import CheckpointTable

    ck = CheckpointTable(spark, str(tmp_path / "ck"), table_format="parquet")
    assert ck.completed_partitions() == set()
    ck.append(
        [
            {"run_id": "r", "partition_id": 0, "status": "completed"},
            {"run_id": "r", "partition_id": 1, "status": "processing"},
        ]
    )
    assert ck.completed_partitions() == {0}
    with pytest.raises(RuntimeError):
        CheckpointTable(spark, "lake.db.ck", table_format="iceberg")


def test_run_extraction_rejects_unknown_format(spark, tmp_path):
    from readur_spark.corpus import docs_dataframe
    from readur_spark.plans.pipeline import run_extraction

    with pytest.raises(ValueError):
        run_extraction(
            spark,
            docs_dataframe(spark, 5, seed=1),
            output_path=str(tmp_path / "out"),
            checkpoint_path=str(tmp_path / "ck"),
            num_partitions=2,
            table_format="delta",
        )
