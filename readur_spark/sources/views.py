"""SQL surface: register the corpus tables as temp views.

The engine is DataFrame-first, but Catalyst compiles ``spark.sql`` to the
same plans — users who prefer SQL get the full operator surface by
registering views once. (readur's own query layer IS SQL — delegated to
Postgres; here the same statements run distributed.)
"""

from __future__ import annotations

from pyspark.sql import SparkSession

from readur_spark.sources.tables import TABLES, load_table


def register_views(spark: SparkSession, sf_dir: str, tables: tuple[str, ...] = TABLES) -> None:
    for t in tables:
        load_table(spark, sf_dir, t).createOrReplaceTempView(t)
