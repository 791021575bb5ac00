SELECT CAST(file AS VARCHAR) AS file, CAST(num_messages_total AS BIGINT) AS num_messages_total, CAST(num_validations AS BIGINT) AS num_validations, CAST(num_errors AS BIGINT) AS num_errors, CAST(num_error_messages AS BIGINT) AS num_error_messages, CAST(num_valid AS BIGINT) AS num_valid FROM (VALUES
('e1.json', 17, 731, 41, 15, 2),
('e2.json', 3, 129, 0, 0, 3)
) AS t(file, num_messages_total, num_validations, num_errors, num_error_messages, num_valid)