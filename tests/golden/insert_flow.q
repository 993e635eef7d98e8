-- CREATE / INSERT INTO / INSERT OVERWRITE lifecycle (FileSinkOperator).
-- External LOCATION + final OVERWRITE keeps the flow idempotent across
-- sessions (a managed table's leftover warehouse dir would block CREATE).
DROP TABLE IF EXISTS golden_insert_flow;
CREATE TABLE golden_insert_flow (k STRING, n BIGINT) USING parquet LOCATION '/tmp/golden_insert_flow';
INSERT INTO golden_insert_flow SELECT o_orderstatus, COUNT(*) FROM orders GROUP BY o_orderstatus;
INSERT INTO golden_insert_flow VALUES ('X', 0);
INSERT OVERWRITE golden_insert_flow SELECT o_orderpriority, COUNT(*) FROM orders GROUP BY o_orderpriority;
SELECT k, n FROM golden_insert_flow
