import os
import sys

sys.path.insert(0, os.path.dirname(__file__))  # make `import oracle` work
sys.path.insert(0, os.path.dirname(os.path.dirname(__file__)))

import pytest


@pytest.fixture(scope="session")
def spark():
    from gbdc_spark.session import get_spark

    s = get_spark(app_name="gbdc-tests", cores=4, shuffle_partitions=8)
    yield s
    s.stop()
