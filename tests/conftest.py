import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from amplab_hive_spark.session import get_spark  # noqa: E402
from amplab_hive_spark.testing import DEFAULT_SF_DIR  # noqa: E402


@pytest.fixture(scope="session")
def spark():
    s = get_spark("amplab_hive_spark-tests")
    yield s


@pytest.fixture(scope="session")
def sf_dir():
    return DEFAULT_SF_DIR
