"""spark-submit --py-files packaging (north-rule ship vehicle).

Builds dist/lucenenet_spark.zip containing the package, suitable for

    spark-submit --py-files dist/lucenenet_spark.zip tools/submit_job.py \
        --data /path/to/corpus.parquet --out /path/to/index

The zip is deterministic (sorted entries, zeroed timestamps) so repeated
builds of the same tree are byte-identical — the artifact can be
content-addressed in a deployment manifest.
"""

from __future__ import annotations

import os
import sys
import zipfile

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def build(out_path: str | None = None) -> str:
    out_path = out_path or os.path.join(ROOT, "dist", "lucenenet_spark.zip")
    os.makedirs(os.path.dirname(out_path), exist_ok=True)
    pkg = os.path.join(ROOT, "lucenenet_spark")
    entries = []
    for dirpath, _, files in os.walk(pkg):
        if "__pycache__" in dirpath:
            continue
        for f in sorted(files):
            if f.endswith(".py"):
                full = os.path.join(dirpath, f)
                entries.append((os.path.relpath(full, ROOT), full))
    entries.sort()
    with zipfile.ZipFile(out_path, "w", zipfile.ZIP_DEFLATED) as z:
        for arc, full in entries:
            with open(full, "rb") as fh:
                data = fh.read()
            info = zipfile.ZipInfo(arc, date_time=(1980, 1, 1, 0, 0, 0))
            info.external_attr = 0o644 << 16
            z.writestr(info, data)
    return out_path


if __name__ == "__main__":
    p = build(sys.argv[1] if len(sys.argv) > 1 else None)
    print(p)
