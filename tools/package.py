"""Build the --py-files artifact for cluster submission.

The north rule ships the job via ``spark-submit --py-files`` to a real
multi-executor cluster. This packages the pure-Python engine into a single
zip (no native deps — kernels are stdlib-only by design, so the artifact
works on any executor image with pyspark/pandas/pyarrow/numpy):

    python tools/package.py                # writes dist/readur_spark.zip

Submit example (cluster mode):

    spark-submit \
      --master yarn --deploy-mode cluster \
      --py-files dist/readur_spark.zip \
      --conf spark.sql.adaptive.enabled=true \
      --conf spark.sql.execution.arrow.maxRecordsPerBatch=1024 \
      jobs/run_extraction.py --input <iceberg table> --output <table> \
          --checkpoint <table> --partitions <2-3x total cores>
"""

from __future__ import annotations

import os
import zipfile

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def build(out_path: str | None = None) -> str:
    out_path = out_path or os.path.join(ROOT, "dist", "readur_spark.zip")
    os.makedirs(os.path.dirname(out_path), exist_ok=True)
    pkg = os.path.join(ROOT, "readur_spark")
    with zipfile.ZipFile(out_path, "w", zipfile.ZIP_DEFLATED) as z:
        for dirpath, _, files in os.walk(pkg):
            if "__pycache__" in dirpath:
                continue
            for f in files:
                if f.endswith(".py"):
                    full = os.path.join(dirpath, f)
                    z.write(full, os.path.relpath(full, ROOT))
    return out_path


if __name__ == "__main__":
    path = build()
    size = os.path.getsize(path)
    print(f"{path} ({size / 1024:.1f} KB)")
