from __future__ import annotations

import pytest

from comic_text_detector_spark.session import get_spark


@pytest.fixture(scope="session")
def spark():
    s = get_spark(app_name="ctd-tests", master="local[4]", shuffle_partitions=8)
    s.sparkContext.setLogLevel("ERROR")
    yield s
    s.stop()
