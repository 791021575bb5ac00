SELECT CAST(file AS VARCHAR) AS file, CAST(file_size AS BIGINT) AS file_size, CAST(n_lines AS BIGINT) AS n_lines FROM (VALUES
('a1.json', 3045, 5),
('a2.json', 5385, 9),
('a3.json', 1795, 3),
('a4.json.gz', 412, 3),
('a5.json', 1836, 3)
) AS t(file, file_size, n_lines)