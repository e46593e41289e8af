"""Build the spark-submit artifact: a zip of the deduplipy_spark package.

    python scripts/package.py [out.zip]        # default dist/deduplipy_spark.zip
    spark-submit --py-files dist/deduplipy_spark.zip your_job.py

The zip contains only the package sources (no tests, no caches); it is
importable directly from sys.path, which is exactly what --py-files does on
every executor. tests/test_packaging.py asserts that in a clean interpreter.
"""
from __future__ import annotations

import os
import sys
import zipfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
PKG = os.path.join(REPO, "deduplipy_spark")


def build(out: str) -> str:
    os.makedirs(os.path.dirname(out) or ".", exist_ok=True)
    with zipfile.ZipFile(out, "w", zipfile.ZIP_DEFLATED) as z:
        for root, dirs, files in os.walk(PKG):
            dirs[:] = [d for d in dirs if d != "__pycache__"]
            for f in sorted(files):
                if not f.endswith(".py"):
                    continue
                full = os.path.join(root, f)
                z.write(full, os.path.relpath(full, REPO))
    return out


if __name__ == "__main__":
    out = sys.argv[1] if len(sys.argv) > 1 else os.path.join(
        REPO, "dist", "deduplipy_spark.zip")
    print(build(out))
