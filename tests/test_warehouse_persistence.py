"""Cross-process warehouse persistence (round-4 verdict task 5).

The reference runs a SEPARATE metastore service so table metadata
outlives any one client (metastore/src/java/org/apache/hadoop/hive/
metastore/HiveMetaStore.java:232). The single-node analogue here is
``get_spark(warehouse=...)``: Hive catalog + embedded Derby metastore
under the warehouse dir. This test proves the semantics end-to-end by
using two SEPARATE JVM processes — process 1 saves a managed table
and a partitioned table and exits; process 2 starts fresh on the same
warehouse dir and must see both tables, their schemas, their rows,
and the partition list. (In-memory catalog would lose the metadata —
files on disk, table names gone — which is exactly the gap flagged.)

Subprocesses, not fixtures: the session-scoped test SparkSession uses
the in-memory catalog, and catalogImplementation cannot change on a
live JVM. Each subprocess pays a full Spark startup (~20 s), so this
file costs ~1 min — the price of honestly testing process death.
"""

import os
import subprocess
import sys
import tempfile

_WRITER = """
import sys
sys.path.insert(0, {repo!r})
from amplab_hive_spark.session import get_spark

spark = get_spark("persist-writer", master="local[4]", warehouse={wh!r})
df = spark.range(100).selectExpr(
    "id", "id % 7 AS bucket", "concat('row-', id) AS label"
)
df.write.saveAsTable("survivors")
df.write.partitionBy("bucket").saveAsTable("survivors_part")
assert spark.table("survivors").count() == 100
spark.stop()
print("WRITER_OK")
"""

_READER = """
import sys
sys.path.insert(0, {repo!r})
from amplab_hive_spark.session import get_spark

spark = get_spark("persist-reader", master="local[4]", warehouse={wh!r})
names = {{t.name for t in spark.catalog.listTables()}}
assert "survivors" in names and "survivors_part" in names, names
t = spark.table("survivors")
assert [f.name for f in t.schema.fields] == ["id", "bucket", "label"], t.schema
assert t.count() == 100
assert t.selectExpr("sum(id) AS s").collect()[0].s == 4950
parts = spark.sql("SHOW PARTITIONS survivors_part").collect()
assert len(parts) == 7, parts
assert spark.table("survivors_part").filter("bucket = 3").count() == 14
spark.stop()
print("READER_OK")
"""


def _run(code: str) -> str:
    env = dict(os.environ)
    proc = subprocess.run(
        [sys.executable, "-c", code],
        capture_output=True,
        text=True,
        timeout=240,
        env=env,
    )
    assert proc.returncode == 0, f"stdout:\n{proc.stdout}\nstderr:\n{proc.stderr[-3000:]}"
    return proc.stdout


def test_managed_tables_survive_process_restart():
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    with tempfile.TemporaryDirectory(prefix="persist_wh_") as wh:
        out1 = _run(_WRITER.format(repo=repo, wh=wh))
        assert "WRITER_OK" in out1
        # metastore_db materialized — the catalog state lives on disk
        assert os.path.isdir(os.path.join(wh, "metastore_db"))
        out2 = _run(_READER.format(repo=repo, wh=wh))
        assert "READER_OK" in out2
