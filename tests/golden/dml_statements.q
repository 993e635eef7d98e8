-- UPDATE / DELETE / MERGE as SQL statements (round 6 dml_text shim;
-- reference: ql/parse/UpdateDeleteSemanticAnalyzer.java rewrites the
-- same statements onto INSERT...SELECT). External LOCATION keeps the
-- flow idempotent across sessions.
DROP TABLE IF EXISTS golden_dml;
CREATE TABLE golden_dml (id INT, grp STRING, val INT) USING parquet LOCATION '/tmp/golden_dml';
INSERT OVERWRITE golden_dml VALUES (1,'a',10),(2,'a',20),(3,'b',30),(4,'b',40),(5,'c',50);
UPDATE golden_dml SET val = val * 10 WHERE grp = 'a';
DELETE FROM golden_dml WHERE val = 50;
MERGE INTO golden_dml t USING (SELECT * FROM VALUES (4,'b',0),(9,'z',90) AS v(id, grp, val)) s ON t.id = s.id WHEN MATCHED AND s.val = 0 THEN DELETE WHEN MATCHED THEN UPDATE SET val = s.val WHEN NOT MATCHED THEN INSERT (id, grp, val) VALUES (s.id, s.grp, s.val);
SELECT id, grp, val FROM golden_dml
