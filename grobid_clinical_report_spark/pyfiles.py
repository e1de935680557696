"""Build the --py-files zip for spark-submit runs.

Zips this package (sources only, no caches) with the package directory at
the zip root, so `--py-files <zip>` makes `import
grobid_clinical_report_spark` resolve on the driver and on every executor.
One implementation for every launcher (scripts/make_pyfiles_zip.py CLI,
bench.py --scaling legs, tests/test_submit.py) — the loader snippet used
to be copy-pasted per call site.
"""

from __future__ import annotations

import os
import zipfile

PKG = "grobid_clinical_report_spark"


def build(dest: str, repo_root: str | None = None) -> str:
    """Write the package zip to `dest`; returns `dest`.

    repo_root defaults to this package's parent directory (works from a
    source checkout; a zip-imported copy must pass it explicitly).
    """
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
