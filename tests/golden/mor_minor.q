-- Minor compaction through the pure-SQL surface (round 9): a
-- transactional table accumulates UPDATE/DELETE deltas; ALTER TABLE
-- .. COMPACT 'minor' consolidates them into ONE txnc range unit with
-- the BASE untouched (CompactorMR's cheap half; tests/test_acid_mor
-- pins base mtimes + the consolidated layout). A later COMPACT
-- 'major' folds the consolidated unit into the base. Since round 10
-- a SELECT at ANY point in the lifecycle returns the merged state —
-- Engine.sql resolves transactional tables through the merged view,
-- the reference's own reader rule (AcidUtils.getAcidState +
-- OrcRawRecordMerger merge for every SQL reader; see
-- golden/mor_merged_read.q for the pre-compaction read) — so the
-- rendered SELECT would print the same rows before either compaction.
DROP TABLE IF EXISTS golden_mor_minor;
CREATE TABLE golden_mor_minor (id INT, grp STRING, val INT) USING parquet LOCATION '/tmp/golden_mor_minor' TBLPROPERTIES ('transactional'='true','merge_keys'='id');
INSERT OVERWRITE golden_mor_minor VALUES (1,'a',10),(2,'a',20),(3,'b',30),(4,'b',40);
UPDATE golden_mor_minor SET val = val + 1 WHERE grp = 'a';
UPDATE golden_mor_minor SET val = val * 10 WHERE id = 3;
DELETE FROM golden_mor_minor WHERE id = 4;
ALTER TABLE golden_mor_minor COMPACT 'minor';
ALTER TABLE golden_mor_minor COMPACT 'major';
SELECT id, grp, val FROM golden_mor_minor ORDER BY id
