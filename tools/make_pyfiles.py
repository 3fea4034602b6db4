#!/usr/bin/env python
"""Package pdf_extractor_spark for `spark-submit --py-files`:

    python tools/make_pyfiles.py            # → dist/pdf_extractor_spark.zip
    spark-submit --py-files dist/pdf_extractor_spark.zip jobs.py \
        --pages ... --out ... --run-id r1

The zip contains only the library package (no tests/tools); jobs.py is
the application file passed to spark-submit directly.
"""

from __future__ import annotations

import os
import zipfile

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def main() -> str:
    dist = os.path.join(ROOT, "dist")
    os.makedirs(dist, exist_ok=True)
    out = os.path.join(dist, "pdf_extractor_spark.zip")
    pkg = os.path.join(ROOT, "pdf_extractor_spark")
    with zipfile.ZipFile(out, "w", zipfile.ZIP_DEFLATED) as zf:
        for dirpath, _dirs, files in os.walk(pkg):
            if "__pycache__" in dirpath:
                continue
            for f in sorted(files):
                if not f.endswith(".py"):
                    continue
                full = os.path.join(dirpath, f)
                zf.write(full, os.path.relpath(full, ROOT))
    print(out)
    return out


if __name__ == "__main__":
    main()
