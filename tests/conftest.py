import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


@pytest.fixture(scope="session")
def spark():
    from ocr_documents_spark.session import get_spark
    spark = get_spark("ocr-documents-tests", master="local[4]",
                      shuffle_partitions=8)
    yield spark
    spark.stop()
