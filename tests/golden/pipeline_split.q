-- training-pipeline split audit over the portable md5 bucket (llm/pipeline.py)
SELECT CASE WHEN conv(substring(md5(text), 1, 15), 16, 10) % 100 < 80 THEN 'train'
            WHEN conv(substring(md5(text), 1, 15), 16, 10) % 100 < 90 THEN 'val'
            ELSE 'test' END AS split,
       COUNT(*) AS n_docs
FROM documents
GROUP BY 1
