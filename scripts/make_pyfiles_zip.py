#!/usr/bin/env python
"""Build the --py-files zip for spark-submit runs.

Zips the grobid_clinical_report_spark package (sources only, no caches) with
the package directory at the zip root, so `--py-files <zip>` makes
`import grobid_clinical_report_spark` resolve on the driver and on every
executor.

    python scripts/make_pyfiles_zip.py [dest.zip]
"""

from __future__ import annotations

import os
import sys
import zipfile

PKG = "grobid_clinical_report_spark"


def build(dest: str, repo_root: str | None = None) -> str:
    root = repo_root or os.path.dirname(
        os.path.dirname(os.path.abspath(__file__))
    )
    pkg_dir = os.path.join(root, PKG)
    with zipfile.ZipFile(dest, "w", zipfile.ZIP_DEFLATED) as z:
        for dirpath, dirnames, filenames in os.walk(pkg_dir):
            dirnames[:] = [d for d in dirnames if d != "__pycache__"]
            for fn in sorted(filenames):
                if not fn.endswith(".py"):
                    continue
                full = os.path.join(dirpath, fn)
                rel = os.path.relpath(full, root)
                z.write(full, rel)
    return dest


if __name__ == "__main__":
    out = sys.argv[1] if len(sys.argv) > 1 else f"{PKG}.zip"
    print(build(out))
