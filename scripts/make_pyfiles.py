"""Package bytefreq_spark into a --py-files zip for spark-submit.

    python scripts/make_pyfiles.py [dist/bytefreq_spark.zip]

The zip contains the package at top level (``bytefreq_spark/...``) so
``--py-files dist/bytefreq_spark.zip`` makes it importable on every executor
— the north rule's launch mode (spark-submit --py-files on a cluster).
"""

from __future__ import annotations

import os
import sys
import zipfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def build(out_path: str | None = None) -> str:
    out_path = out_path or os.path.join(REPO, "dist", "bytefreq_spark.zip")
    os.makedirs(os.path.dirname(out_path), exist_ok=True)
    pkg = os.path.join(REPO, "bytefreq_spark")
    with zipfile.ZipFile(out_path, "w", zipfile.ZIP_DEFLATED) as z:
        for root, _dirs, files in os.walk(pkg):
            if "__pycache__" in root:
                continue
            for fn in sorted(files):
                if not fn.endswith(".py"):
                    continue
                full = os.path.join(root, fn)
                rel = os.path.relpath(full, REPO)
                z.write(full, rel)
    return out_path


if __name__ == "__main__":
    print(build(sys.argv[1] if len(sys.argv) > 1 else None))
