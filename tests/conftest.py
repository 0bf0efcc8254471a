import pytest

from vlm_ocr_doc_reader_spark.sources.session import get_spark


@pytest.fixture(scope="session")
def spark():
    s = get_spark(master="local[4]", app_name="tests",
                  shuffle_partitions=8,
                  extra_conf={"spark.ui.enabled": "false",
                              "spark.driver.memory": "4g"})
    yield s
    s.stop()
