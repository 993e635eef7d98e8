-- decontamination audit in pure SQL (llm/contamination.py analogue)
WITH grams AS (
  SELECT doc_id, source, explode(array_distinct(transform(
           sequence(0, size(split(lower(text), ' ')) - 4),
           i -> concat_ws(' ', slice(split(lower(text), ' '), i + 1, 4))))) AS g
  FROM documents WHERE size(split(lower(text), ' ')) >= 4
),
eval_grams AS (SELECT DISTINCT g FROM grams WHERE source = 'src1')
SELECT t.source, COUNT(DISTINCT t.doc_id) AS n_contaminated
FROM grams t JOIN eval_grams e ON t.g = e.g
WHERE t.source <> 'src1'
GROUP BY t.source
