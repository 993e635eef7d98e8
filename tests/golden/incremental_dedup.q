-- the incremental batch-vs-corpus dedup surface as engine SQL: the
-- last 20% of doc_ids audit against the older 80% by 8-token lead
-- fingerprint (llm/dedup.py dedup_incremental_exact re-spelled as
-- one statement through spark.sql; the split/classification logic
-- must parse and execute natively).
WITH hashed AS (
  SELECT doc_id, source,
         md5(concat_ws(' ', slice(split(lower(text), ' '), 1, 8))) AS h
  FROM documents
),
corpus AS (
  SELECT DISTINCT h FROM hashed WHERE doc_id % 10 < 8
),
batch AS (
  SELECT doc_id, source, h FROM hashed WHERE doc_id % 10 >= 8
),
cls AS (
  SELECT b.doc_id, b.source,
         CASE WHEN c.h IS NOT NULL THEN 'dup_corpus'
              WHEN b.doc_id > MIN(b.doc_id) OVER (PARTITION BY b.h)
                THEN 'dup_batch'
              ELSE 'novel' END AS status
  FROM batch b LEFT JOIN corpus c ON b.h = c.h
)
SELECT source, status, COUNT(*) AS n, MIN(doc_id) AS first_doc
FROM cls GROUP BY source, status
