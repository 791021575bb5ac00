SELECT CAST(file AS VARCHAR) AS file, CAST(num_messages_total AS BIGINT) AS num_messages_total, CAST(num_validations AS BIGINT) AS num_validations, CAST(num_errors AS BIGINT) AS num_errors, CAST(num_error_messages AS BIGINT) AS num_error_messages, CAST(num_valid AS BIGINT) AS num_valid FROM (VALUES
('a1.json', 6, 116, 0, 0, 6),
('a2.json', 10, 209, 17, 7, 3),
('a3.json', 4, 70, 2, 2, 2),
('a4.json.gz', 4, 70, 0, 0, 4),
('a5.json', 4, 70, 4, 4, 0)
) AS t(file, num_messages_total, num_validations, num_errors, num_error_messages, num_valid)