-- Merged READ before compaction (round 10): the reference's ACID
-- reader merges deltas for EVERY SQL reader (ql/io/AcidUtils.java
-- getAcidState + ql/io/orc/OrcRawRecordMerger.java) — a SELECT
-- between an UPDATE/DELETE and the next compaction returns the
-- committed row-level changes, never the raw base. Engine.sql's
-- statement scope (acid.mor_statement_scope) is the analogue: the
-- rendered SELECT below runs with THREE uncompacted delta
-- transactions outstanding and must show their net effect.
DROP TABLE IF EXISTS golden_mor_read;
CREATE TABLE golden_mor_read (id INT, grp STRING, val INT) USING parquet LOCATION '/tmp/golden_mor_read' TBLPROPERTIES ('transactional'='true','merge_keys'='id');
INSERT OVERWRITE golden_mor_read VALUES (1,'a',10),(2,'a',20),(3,'b',30),(4,'b',40);
UPDATE golden_mor_read SET val = val + 1 WHERE grp = 'a';
UPDATE golden_mor_read SET val = val * 10 WHERE id = 3;
DELETE FROM golden_mor_read WHERE id = 4;
SELECT id, grp, val FROM golden_mor_read ORDER BY id
