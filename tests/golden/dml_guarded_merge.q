-- Guarded MERGE clauses (round 7: the Hive 2.2 MergeSemanticAnalyzer
-- grammar dml_text previously rejected): WHEN MATCHED AND <cond>
-- THEN UPDATE, a guarded NOT MATCHED INSERT, and the UPDATE-first
-- clause order composed onto delete-before-update evaluation via the
-- NOT-guard fold. ANSI first-matching-clause: id=2 satisfies BOTH
-- the update guard and the (unconditioned) DELETE, and must UPDATE.
DROP TABLE IF EXISTS golden_gmerge;
CREATE TABLE golden_gmerge (id INT, grp STRING, val INT) USING parquet LOCATION '/tmp/golden_gmerge';
INSERT OVERWRITE golden_gmerge VALUES (1,'a',10),(2,'a',20),(3,'b',30),(4,'b',40);
MERGE INTO golden_gmerge t USING (SELECT * FROM VALUES (1,'a',100),(2,'a',7),(8,'z',80),(9,'z',5) AS v(id, grp, val)) s ON t.id = s.id WHEN MATCHED AND s.val >= 7 THEN UPDATE SET val = s.val WHEN MATCHED THEN DELETE WHEN NOT MATCHED AND s.val > 50 THEN INSERT (id, grp, val) VALUES (s.id, s.grp, s.val);
SELECT id, grp, val FROM golden_gmerge
