-- Ingestion-audit combo: the one-pass column profile
-- (operators/sql_surface.py profile_documents_table) joined with the
-- redaction pass's corpus-level hit counts (llm/text.py
-- text_scrub_blocklist) — the summary a pipeline operator reads
-- before admitting a crawl drop into training.
SELECT 'corpus_profile' AS section,
       CAST(COUNT(*) AS STRING) AS a,
       CAST(COUNT(DISTINCT lang) AS STRING) AS b,
       CAST(MIN(n_chars) AS STRING) AS c,
       CAST(MAX(n_chars) AS STRING) AS d
FROM documents
UNION ALL
SELECT 'scrub_hits',
       CAST(SUM(regexp_count(text, '\\b(customer|vector|spark)\\b')) AS STRING),
       CAST(SUM(regexp_count(text, '[a-z0-9._%+-]+@[a-z0-9.-]+\\.[a-z]{2,}')) AS STRING),
       CAST(SUM(CASE WHEN length(text) <> n_chars THEN 1 ELSE 0 END) AS STRING),
       CAST(COUNT(*) AS STRING)
FROM documents
ORDER BY section
