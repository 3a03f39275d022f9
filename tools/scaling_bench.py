"""Scaling-efficiency evidence (north rule: ≥0.8 from N to 4N executors).

No real cluster exists in this sandbox, so the criterion is evidenced the
way BASELINE.md specifies: the identical extraction job at two local
parallelism levels over the same materialized input, reporting throughput
at both and

    efficiency = (docs_per_sec_hi / docs_per_sec_lo) / (cores_hi / cores_lo)

Methodology (each point was load-bearing in getting a faithful number —
see BASELINE.md "Scaling evidence" for the analysis):

* **Executor analog**: one Spark "executor slot" in local mode is a JVM
  task thread *plus* its Python worker process — local[N] consumes ~2N
  hardware threads. On this 32-core box the honest N→4N comparison is
  local[4] vs local[16] (8 vs 32 hw threads, both levels fully inside the
  machine). local[8]→local[32] is also reported: its hi level
  oversubscribes (64 runnable threads on 32 cores), which is a local-mode
  artifact a real 4N-executor cluster does not have.
* **Input**: a realistic-weight interleaved corpus (~10 KB HTML + text +
  media per doc — real web pages are 10-100 KB) MATERIALIZED to parquet
  with 128 files before any timing, so the scan parallelizes and wave
  counts divide evenly at both levels.
* **Protocol**: fresh JVM per level; full-corpus passthrough mapInPandas
  warm-up (spawns every Python worker, warms the page cache, finishes JIT);
  3 timed repetitions, best taken (the sandbox shares a host — min is the
  least-interfered estimate); pure-Python multiprocessing control run
  included to measure the machine's own scaling ceiling.

Usage: python tools/scaling_bench.py [--lo 4 --hi 16 --replicate 40]
Writes BENCH_scaling.json and prints the summary.
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import tempfile

BUILD = r"""
import sys
sys.path.insert(0, "/root/repo")
from pyspark.sql import functions as F
from readur_spark.session import get_spark
from readur_spark.sources.tables import load_table

replicate = int(sys.argv[1]); sf_dir = sys.argv[2]; out = sys.argv[3]
spark = get_spark(cores=32, app_name="scaling_build")
docs0 = load_table(spark, sf_dir, "documents")
did = F.col("doc_id").cast("string")
para = F.concat(F.lit("<p>"), F.col("text"), F.lit(" trailing content for weight</p>"))
paras = F.concat(*([para] * 12))
nav = F.lit("<nav><ul>" + "".join(
    f"<li><a href='/p{i}'>navigation link {i}</a></li>" for i in range(12)) + "</ul></nav>")
html = F.concat(F.lit("<html><body>"), nav, F.lit("<article>"), paras,
                F.lit("<img src='media://img/x'></article>"
                      "<footer><a href='/a'>about page</a></footer></body></html>"))
text_span = F.struct(F.lit("text").alias("kind"),
                     F.concat(F.col("text"),
                              F.lit("  with   messy\n\n\n\nwhitespace and hyphen-\nated words")).alias("text"),
                     F.lit("").alias("media_ref"), F.lit(0).alias("offset"))
html_span = F.struct(F.lit("html").alias("kind"), html.alias("text"),
                     F.lit("").alias("media_ref"), F.lit(1).alias("offset"))
media_span = F.struct(F.lit("media").alias("kind"), F.lit("").alias("text"),
                      F.concat(F.lit("media://obj/"), did).alias("media_ref"),
                      F.lit(2).alias("offset"))
base = docs0.select(did.alias("doc_id"),
                    F.array(text_span, html_span, media_span).alias("spans"))
docs = (base.repartition(64)
        .select(F.explode(F.sequence(F.lit(1), F.lit(replicate))).alias("rep"), "doc_id", "spans")
        .select(F.concat_ws("-", "doc_id", "rep").alias("doc_id"), "spans")
        .repartition(128))
docs.write.mode("overwrite").parquet(out)
print("built", spark.read.parquet(out).count())
spark.stop()
"""

WORKER = r"""
import json, sys, time
import pandas as pd
sys.path.insert(0, "/root/repo")
from readur_spark.session import get_spark
from readur_spark.operators.extract import extract_spans

cores = int(sys.argv[1]); corpus = sys.argv[2]; reps = int(sys.argv[3])
spark = get_spark(cores=cores, app_name=f"scaling_{cores}")
docs = spark.read.parquet(corpus)
n = docs.count()

def passthrough(batches):
    for pdf in batches:
        yield pd.DataFrame({"doc_id": pdf["doc_id"]})

docs.mapInPandas(passthrough, "doc_id string").write.format("noop").mode("overwrite").save()
times = []
for _ in range(reps):
    t0 = time.perf_counter()
    extract_spans(docs).write.format("noop").mode("overwrite").save()
    times.append(round(time.perf_counter() - t0, 3))
print(json.dumps({"cores": cores, "docs": n, "times": times,
                  "secs": min(times), "docs_per_sec": round(n / min(times), 2)}))
spark.stop()
"""

CONTROL = r"""
import json, multiprocessing as mp, sys, time

def burn(n):
    sys.path.insert(0, "/root/repo")
    from readur_spark.kernels.extractor import extract_document
    spans = [{"kind": "text", "text": "hello world " * 50, "media_ref": "", "offset": 0},
             {"kind": "html", "text": "<html><body><article>" +
              "<p>some paragraph content with enough words to be kept around here</p>" * 12 +
              "</article></body></html>", "media_ref": "", "offset": 1}]
    t0 = time.perf_counter()
    for _ in range(n):
        extract_document(spans)
    return n / (time.perf_counter() - t0)

if __name__ == "__main__":
    lo, hi = int(sys.argv[1]), int(sys.argv[2])
    out = {}
    for procs in (lo, hi):
        with mp.Pool(procs) as p:
            t0 = time.perf_counter()
            p.map(burn, [400] * procs)
            wall = time.perf_counter() - t0
        out[str(procs)] = round(procs * 400 / wall, 1)
    print(json.dumps(out))
"""


def _run(code: str, *args: str, env: dict | None = None) -> str:
    e = dict(os.environ)
    if env:
        e.update(env)
    out = subprocess.run(
        [sys.executable, "-c", code, *args],
        capture_output=True, text=True, timeout=3600, env=e,
    )
    if out.returncode != 0:
        raise RuntimeError(out.stderr[-2000:])
    return out.stdout


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--lo", type=int, default=4)
    ap.add_argument("--hi", type=int, default=16)
    ap.add_argument("--replicate", type=int, default=40)
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.1")
    ap.add_argument("--corpus", default=None, help="reuse a prebuilt corpus dir")
    args = ap.parse_args()

    corpus = args.corpus
    if corpus is None:
        corpus = tempfile.mkdtemp(prefix="scaling_corpus_") + "/docs"
        _run(BUILD, str(args.replicate), args.sf_dir, corpus)

    results = {}
    for cores in (args.lo, args.hi):
        line = [
            ln
            for ln in _run(
                WORKER, str(cores), corpus, str(args.reps),
                env={"SPARK_DRIVER_MEMORY": "64g"},
            ).splitlines()
            if ln.startswith("{")
        ][-1]
        results[cores] = json.loads(line)
    lo, hi = results[args.lo], results[args.hi]

    control = json.loads(
        [ln for ln in _run(CONTROL, str(args.lo), str(args.hi)).splitlines() if ln.startswith("{")][-1]
    )
    ctrl_eff = (control[str(args.hi)] / control[str(args.lo)]) / (args.hi / args.lo)

    speedup = hi["docs_per_sec"] / lo["docs_per_sec"]
    efficiency = speedup / (args.hi / args.lo)
    result = {
        "job": "interleaved extraction (text + HTML main-content + media)",
        "input": f"realistic-weight interleaved corpus (~10KB html/doc), "
                 f"sf0.1 documents x{args.replicate}, 128-file parquet",
        "executor_analog": "one executor slot = 1 JVM task thread + 1 Python "
                           "worker; both levels fit within the 32 physical cores",
        "lo": lo,
        "hi": hi,
        "speedup": round(speedup, 3),
        "core_ratio": args.hi / args.lo,
        "scaling_efficiency": round(efficiency, 3),
        "machine_ceiling_pure_python_efficiency": round(ctrl_eff, 3),
        "criterion": ">=0.8",
        "pass": efficiency >= 0.8,
    }
    # atomic rename: a crash mid-write must not leave a torn JSON where
    # the committed artifact used to be
    tmp = "/root/repo/.BENCH_scaling.json.tmp"
    with open(tmp, "w") as f:
        json.dump(result, f, indent=2)
    import os

    os.replace(tmp, "/root/repo/BENCH_scaling.json")
    print(json.dumps(result, indent=2))


if __name__ == "__main__":
    main()
