-- stats*.q family shape (reference clientpositive/stats4.q): dynamic-
-- partition INSERT OVERWRITE into two tables from one source — one
-- fully dynamic (ds, hr), one with a static ds and dynamic hr — then
-- the partition listing as the stats-visible result. Hive autogathers
-- row stats per partition here; the Spark-side analogue of the stats
-- readout is SHOW PARTITIONS + per-partition counts (final SELECT).
DROP TABLE IF EXISTS golden_stats1;
DROP TABLE IF EXISTS golden_stats2;
CREATE TABLE golden_stats1 (k BIGINT, ds STRING, hr STRING)
USING parquet PARTITIONED BY (ds, hr) LOCATION '/tmp/golden_stats1';
CREATE TABLE golden_stats2 (k BIGINT, hr STRING)
USING parquet PARTITIONED BY (hr) LOCATION '/tmp/golden_stats2';
INSERT OVERWRITE golden_stats1 PARTITION (ds, hr)
SELECT o_orderkey, o_orderstatus, o_orderpriority FROM orders WHERE o_orderstatus <= 'O';
INSERT OVERWRITE golden_stats2 PARTITION (hr)
SELECT o_orderkey, o_orderpriority FROM orders WHERE o_orderstatus > 'O';
SELECT t, ds, hr, n FROM (
  SELECT 't1' AS t, ds, hr, count(*) AS n FROM golden_stats1 GROUP BY ds, hr
  UNION ALL
  SELECT 't2', NULL, hr, count(*) FROM golden_stats2 GROUP BY hr
) u
