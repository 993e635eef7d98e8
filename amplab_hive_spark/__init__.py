"""amplab_hive_spark — a PySpark-native analytics engine.

A from-scratch re-expression of the query and data-processing
capabilities of the reference warehouse engine (an Apache Hive
1.2.0-SNAPSHOT fork; see SURVEY.md) on the public PySpark
DataFrame/SQL API, plus first-class large-scale training-data
pipeline operators (dedup, similarity search, text analysis,
multimodal column plumbing).

Design stance (SURVEY.md §3.4): the reference's Driver→Operator-DAG→
Task pipeline collapses into Catalyst. We write zero physical
operator code — queries are declared with the DataFrame/SQL API and
Catalyst+Tungsten pick the physical strategy (broadcast joins, AQE
skew handling, whole-stage codegen, partial aggregation, spill).
Custom code is limited to semantics Spark genuinely lacks.
"""

from amplab_hive_spark.engine import Engine
from amplab_hive_spark.session import get_spark
from amplab_hive_spark.catalog import TABLES, load_tables, tables

__all__ = ["Engine", "get_spark", "TABLES", "load_tables", "tables"]
