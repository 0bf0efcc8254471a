"""Build the --py-files artifact for spark-submit deployment.

    python tools/package_zip.py [out.zip]
    spark-submit --py-files vlm_ocr_doc_reader_spark.zip \
        --master <cluster> -m vlm_ocr_doc_reader_spark.cli extract ...

The package is pure Python (no compiled extensions), so one zip is the whole
deployment unit; executors import the same modules the driver runs.
"""

from __future__ import annotations

import os
import sys
import zipfile

PKG = "vlm_ocr_doc_reader_spark"


def build(out: str) -> int:
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    n = 0
    with zipfile.ZipFile(out, "w", zipfile.ZIP_DEFLATED) as z:
        for dirpath, dirnames, filenames in os.walk(os.path.join(root, PKG)):
            dirnames[:] = [d for d in dirnames if d != "__pycache__"]
            for f in sorted(filenames):
                if not f.endswith(".py"):
                    continue
                full = os.path.join(dirpath, f)
                z.write(full, os.path.relpath(full, root))
                n += 1
    return n


if __name__ == "__main__":
    out = sys.argv[1] if len(sys.argv) > 1 else f"{PKG}.zip"
    n = build(out)
    print(f"wrote {out} ({n} modules)")
