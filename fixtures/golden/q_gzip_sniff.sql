SELECT CAST(file AS VARCHAR) AS file, CAST(file_size AS BIGINT) AS file_size, CAST(n_lines AS BIGINT) AS n_lines FROM (VALUES
('c1', 1222, 2),
('c2', 407, 3),
('c3.json.gz', 433, 3)
) AS t(file, file_size, n_lines)