#!/usr/bin/env python
"""Package the engine for cluster deployment (north_rule:
`spark-submit --py-files`).

Produces dist/data_pipeline_spark.zip containing the package (no
tests, no caches); submit a job with:

    spark-submit --py-files dist/data_pipeline_spark.zip your_job.py

Executors then import `data_pipeline_spark` for the pandas-UDF /
foreachBatch closures exactly as local mode does via PYTHONPATH
(session.py handles the local case automatically).
"""

from __future__ import annotations

import os
import zipfile

REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def build(out_path: str | None = None) -> str:
    out_path = out_path or os.path.join(REPO_ROOT, "dist", "data_pipeline_spark.zip")
    os.makedirs(os.path.dirname(out_path), exist_ok=True)
    pkg = os.path.join(REPO_ROOT, "data_pipeline_spark")
    with zipfile.ZipFile(out_path, "w", zipfile.ZIP_DEFLATED) as z:
        for root, dirs, files in os.walk(pkg):
            dirs[:] = [d for d in dirs if d != "__pycache__"]
            for fn in sorted(files):
                if fn.endswith(".py"):
                    full = os.path.join(root, fn)
                    z.write(full, os.path.relpath(full, REPO_ROOT))
    return out_path


if __name__ == "__main__":
    print(build())
