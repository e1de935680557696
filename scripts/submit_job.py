#!/usr/bin/env python
"""spark-submit launcher for the extraction batch job (north-rule run shape).

The package itself ships as a --py-files zip (build it with
scripts/make_pyfiles_zip.py); this file is the primary application script —
spark-submit needs a script path, not a module name, so it simply delegates
to the package CLI (grobid_clinical_report_spark.__main__.main), which is
what `python -m grobid_clinical_report_spark` runs in-process.

    /opt/spark/bin/spark-submit \
        --master local[8] \            # or yarn/k8s + --num-executors N
        --py-files grobid_clinical_report_spark.zip \
        scripts/submit_job.py \
        --input  /data/documents \
        --output /data/extracted \
        --mode   extract_full --buckets 256

Cluster topology (master, executor count/memory) belongs to spark-submit;
session.get_spark detects the submitted gateway and does NOT override it
(see session.py). Mirrors the reference batch entry
(GrobidMedicalReportMain.java:136-218 / ProcessEngineMedical.java).
"""

import sys

from grobid_clinical_report_spark.__main__ import main

if __name__ == "__main__":
    sys.exit(main(sys.argv[1:]))
