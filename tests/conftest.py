from __future__ import annotations

import pytest


@pytest.fixture(scope="session")
def spark():
    from grobid_clinical_report_spark.session import get_spark

    s = get_spark(app="tests", cpus=4, shuffle_partitions=4)
    yield s
    s.stop()


@pytest.fixture(scope="session")
def fixture_docs_pdf():
    from grobid_clinical_report_spark import datagen

    return datagen.fixture_documents_pdf()
