-- mirrors clientpositive/lateral_view.q (UDTF in Generate node)
SELECT word, COUNT(*) AS n
FROM (SELECT explode(split(p_name, ' ')) AS word FROM part) w
GROUP BY word
