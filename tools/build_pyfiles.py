"""Build the ``--py-files`` artifact: a deterministic zip of the
``ppocr_spark`` package (sorted entries, fixed timestamps, no caches), the
north-rule packaging unit:

    python tools/build_pyfiles.py            # → dist/ppocr_spark.zip
    spark-submit --py-files dist/ppocr_spark.zip tools/extract_submit.py \
        --documents <path> --media <path> --output <path>

Executors import the engine from the zip (zipimport); nothing in the
package does filesystem-relative loads, so the zip is self-contained.
"""

from __future__ import annotations

import os
import sys
import zipfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def build(out_path: str | None = None) -> str:
    out_path = out_path or os.path.join(REPO, "dist", "ppocr_spark.zip")
    os.makedirs(os.path.dirname(out_path), exist_ok=True)
    pkg = os.path.join(REPO, "ppocr_spark")
    entries = []
    for root, dirs, files in os.walk(pkg):
        dirs[:] = sorted(d for d in dirs if d != "__pycache__")
        for f in sorted(files):
            if not f.endswith(".py"):
                continue
            full = os.path.join(root, f)
            rel = os.path.relpath(full, REPO)
            entries.append((full, rel))
    with zipfile.ZipFile(out_path, "w", zipfile.ZIP_DEFLATED) as z:
        for full, rel in entries:
            with open(full, "rb") as fh:
                data = fh.read()
            info = zipfile.ZipInfo(rel, date_time=(2020, 1, 1, 0, 0, 0))
            info.external_attr = 0o644 << 16
            z.writestr(info, data)
    return out_path


if __name__ == "__main__":
    path = build(sys.argv[1] if len(sys.argv) > 1 else None)
    print(path)
