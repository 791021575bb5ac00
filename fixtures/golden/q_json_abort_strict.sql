SELECT CAST(file AS VARCHAR) AS file, CAST(n_records AS BIGINT) AS n_records FROM (VALUES
('f1.json', 3)
) AS t(file, n_records)