-- metadataonly1.q shapes (reference clientpositive/metadataonly1.q,
-- MetadataOnlyOptimizer.java) under Spark's data-path semantics:
-- partition-column-only aggregates on one- and two-level partitioned
-- tables, plus the join-against-max(ds) shape. The scan for these
-- reads ZERO payload columns (ReadSchema struct<> — gated in
-- tests/test_metadata_only.py); the catalog-metadata answer is the
-- explicit ddl.partition_values API, with the empty-partition
-- divergence pinned there too.
DROP TABLE IF EXISTS golden_meta;
CREATE TABLE golden_meta (k BIGINT, v DOUBLE, hr STRING, ds STRING)
USING parquet PARTITIONED BY (ds) LOCATION '/tmp/golden_meta';
INSERT OVERWRITE golden_meta
SELECT o_orderkey, o_totalprice, o_orderpriority, o_orderstatus FROM orders;
SELECT 'max_ds' AS shape, max(ds) AS val FROM golden_meta
UNION ALL SELECT 'min_ds', min(ds) FROM golden_meta
UNION ALL SELECT 'count_distinct_ds', CAST(count(DISTINCT ds) AS STRING) FROM golden_meta
UNION ALL SELECT 'count_ds', CAST(count(ds) AS STRING) FROM golden_meta
UNION ALL SELECT concat('distinct_ds_', ds), ds FROM (SELECT DISTINCT ds FROM golden_meta) d
UNION ALL SELECT 'join_max_part_rows',
  CAST(count(*) AS STRING)
  FROM golden_meta a2 JOIN (SELECT max(ds) AS m FROM golden_meta) b ON a2.ds = b.m
UNION ALL SELECT concat('hr_per_ds_', ds), CAST(count(DISTINCT hr) AS STRING)
  FROM golden_meta GROUP BY ds
