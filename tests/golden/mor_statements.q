-- Merge-on-read through the pure-SQL surface (round 8): the
-- transactional=true + merge_keys TBLPROPERTIES trigger routes
-- UPDATE/DELETE statements into equality-delete deltas
-- (acid.update_mor/delete_mor — no base rewrite), and HiveQL's
-- ALTER TABLE .. COMPACT 'major' folds them back (compactor Worker).
-- After compaction a plain scan sees the statements' net effect.
DROP TABLE IF EXISTS golden_mor;
CREATE TABLE golden_mor (id INT, grp STRING, val INT) USING parquet LOCATION '/tmp/golden_mor' TBLPROPERTIES ('transactional'='true','merge_keys'='id');
INSERT OVERWRITE golden_mor VALUES (1,'a',10),(2,'a',20),(3,'b',30),(4,'b',40),(5,'b',50);
UPDATE golden_mor SET val = val + 100 WHERE grp = 'a';
UPDATE golden_mor SET val = val * 2 WHERE id = 2;
DELETE FROM golden_mor WHERE id = 5;
ALTER TABLE golden_mor COMPACT 'major';
SELECT id, grp, val FROM golden_mor ORDER BY id
