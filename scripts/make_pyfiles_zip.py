#!/usr/bin/env python
"""Build the --py-files zip for spark-submit runs (CLI wrapper around
grobid_clinical_report_spark.pyfiles.build — the single implementation).

    python scripts/make_pyfiles_zip.py [dest.zip]
"""

from __future__ import annotations

import os
import sys

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if _REPO not in sys.path:
    sys.path.insert(0, _REPO)

from grobid_clinical_report_spark.pyfiles import PKG, build  # noqa: E402

if __name__ == "__main__":
    out = sys.argv[1] if len(sys.argv) > 1 else f"{PKG}.zip"
    print(build(out, repo_root=_REPO))
