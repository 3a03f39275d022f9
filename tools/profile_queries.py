"""Per-query stage-level profiling (guide §1: measure first).

Usage: python tools/profile_queries.py <name> [name ...]

Runs each named registry query once against $SPARK_GRAFT_SF_DIR (default
sf0.1) with the noop sink, then dumps the stages that executed during
that window (from the UI REST API): wall, task time, shuffle read/write
bytes, input bytes — so optimization targets the stage that actually
costs, not the one that looks expensive in the code.
"""

from __future__ import annotations

import json
import os
import sys
import time
import urllib.request

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _stages(ui: str, app_id: str) -> dict[int, dict]:
    url = f"{ui}/api/v1/applications/{app_id}/stages?status=complete"
    with urllib.request.urlopen(url) as r:
        data = json.load(r)
    return {s["stageId"]: s for s in data}


def main() -> None:
    names = sys.argv[1:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")

    import __spark_entry__ as entry
    from readur_spark.session import get_spark

    spark = get_spark(
        cores=cpus,
        app_name="profile_queries",
        extra_conf={"spark.ui.enabled": "true", "spark.ui.port": "4099"},
    )
    sc = spark.sparkContext
    ui = sc.uiWebUrl
    app_id = sc.applicationId
    qs = entry.queries()

    for name in names:
        sc.setJobDescription(f"profile: {name}")
        before = _stages(ui, app_id)
        t0 = time.perf_counter()
        qs[name](spark, sf_dir).write.format("noop").mode("overwrite").save()
        wall = time.perf_counter() - t0
        spark.catalog.clearCache()
        time.sleep(0.5)
        after = _stages(ui, app_id)
        new = [s for sid, s in sorted(after.items()) if sid not in before]
        print(f"\n=== {name}: wall {wall:.2f}s, {len(new)} stages ===")
        rows = []
        for s in new:
            rows.append(
                (
                    s["stageId"],
                    s.get("executorRunTime", 0) / 1000.0,
                    s.get("executorCpuTime", 0) / 1e9,
                    s.get("jvmGcTime", 0) / 1000.0,
                    s.get("inputBytes", 0) / 1e6,
                    s.get("shuffleReadBytes", 0) / 1e6,
                    s.get("shuffleWriteBytes", 0) / 1e6,
                    s.get("numTasks", 0),
                    (s.get("name", "") or "").split("\n")[0][:60],
                )
            )
        rows.sort(key=lambda r: -r[1])
        print(
            f"{'stage':>5} {'runT(s)':>8} {'cpuT(s)':>8} {'gc(s)':>7} {'in(MB)':>8} "
            f"{'shR(MB)':>8} {'shW(MB)':>8} {'tasks':>5}  name"
        )
        for r in rows[:14]:
            print(
                f"{r[0]:>5} {r[1]:>8.2f} {r[2]:>8.2f} {r[3]:>7.2f} {r[4]:>8.1f} "
                f"{r[5]:>8.1f} {r[6]:>8.1f} {r[7]:>5}  {r[8]}"
            )
        tot_rt = sum(r[1] for r in rows)
        print(f"total executorRunTime {tot_rt:.1f}s across {len(rows)} stages")
    spark.stop()


if __name__ == "__main__":
    main()
