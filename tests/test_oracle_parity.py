"""The correctness gate: every registered query with an oracle must
hash-match DuckDB on the driver's sf0.01 testdata; oracle-less
queries must at least execute and return a stable schema.
"""

import pytest

from amplab_hive_spark.registry import all_queries
from amplab_hive_spark.testing import compare

QUERIES = all_queries()


@pytest.mark.parametrize("name", sorted(QUERIES))
def test_query_parity(spark, sf_dir, name):
    spec = QUERIES[name]
    if spec.oracle is None:
        df = spec.fn(spark, sf_dir)
        assert df.columns, f"{name}: empty schema"
        assert df.count() >= 0
    else:
        compare(spark, spec, sf_dir)
