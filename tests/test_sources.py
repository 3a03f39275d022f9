"""File sources: binary dir ingest (S2), size priority (Q2), incremental
sync (S4), interleaved synthesis."""

import os
import tempfile

import pytest
from pyspark.sql import functions as F

from readur_spark.sources.files import incremental_changes, read_binary_dir, size_priority


@pytest.fixture(scope="module")
def file_tree():
    d = tempfile.mkdtemp(prefix="readur_files_")
    os.makedirs(f"{d}/sub", exist_ok=True)
    with open(f"{d}/a.txt", "w") as f:
        f.write("hello text file")
    with open(f"{d}/sub/b.html", "w") as f:
        f.write("<html><body><p>page</p></body></html>")
    with open(f"{d}/skip.exe", "wb") as f:
        f.write(b"\x00" * 10)
    with open(f"{d}/big.txt", "wb") as f:
        f.write(b"x" * (2 * 1024 * 1024))
    return d


def test_read_binary_dir(spark, file_tree):
    df = read_binary_dir(spark, file_tree, max_bytes=1024 * 1024)
    rows = {r["filename"]: r for r in df.collect()}
    assert set(rows) == {"a.txt", "b.html"}  # .exe filtered, big.txt skipped
    assert bytes(rows["a.txt"]["content"]) == b"hello text file"
    assert rows["b.html"]["length"] == len("<html><body><p>page</p></body></html>")


def test_size_priority(spark):
    mb = 1024 * 1024
    df = spark.createDataFrame(
        [(1, mb), (2, 3 * mb), (3, 8 * mb), (4, 20 * mb), (5, 80 * mb)],
        "id int, length long",
    ).withColumn("prio", size_priority())
    got = {r["id"]: r["prio"] for r in df.collect()}
    assert got == {1: 10, 2: 8, 3: 6, 4: 4, 5: 2}


def test_incremental_changes(spark):
    current = spark.createDataFrame(
        [("p1", "e1"), ("p2", "e2-new"), ("p3", "e3")], "path string, etag string"
    )
    previous = spark.createDataFrame(
        [("p1", "e1"), ("p2", "e2-old")], "path string, etag string"
    )
    got = {r["path"] for r in incremental_changes(current, previous).collect()}
    assert got == {"p2", "p3"}  # changed + new; unchanged p1 skipped


def test_binary_dir_into_extraction(spark, file_tree):
    from readur_spark.operators.binary_extract import extract_files

    files = read_binary_dir(spark, file_tree, max_bytes=1024 * 1024)
    out = {r["filename"]: r for r in extract_files(files).collect()}
    assert out["a.txt"]["status"] == "completed"
    assert out["a.txt"]["spans"][0]["text"] == "hello text file"
