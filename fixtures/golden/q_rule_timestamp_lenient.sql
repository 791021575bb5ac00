SELECT CAST(id AS BIGINT) AS id, CAST(field_path AS VARCHAR) AS field_path, CAST(valid AS BOOLEAN) AS valid, CAST(details AS VARCHAR) AS details FROM (VALUES
(0, 'ts', FALSE, 'Timestamp value ''2019-05-14 19:05:47+00:00'' occurs before earliest limit ''2030-01-01 00:00:00+00:00'''),
(1, 'ts', FALSE, 'Timestamp value ''2019-05-14 19:05:47+00:00'' occurs before earliest limit ''2030-01-01 00:00:00+00:00'''),
(2, 'ts', FALSE, 'Timestamp value ''2019-05-14 19:05:47+00:00'' occurs before earliest limit ''2030-01-01 00:00:00+00:00'''),
(3, 'ts', FALSE, 'Timestamp value ''2019-05-14 19:05:47+00:00'' occurs before earliest limit ''2030-01-01 00:00:00+00:00'''),
(4, 'ts', FALSE, 'Timestamp value ''2019-05-14 19:05:47.123456+00:00'' occurs before earliest limit ''2030-01-01 00:00:00+00:00'''),
(5, 'ts', FALSE, 'Timestamp value ''2019-05-14 19:05:47+00:00'' occurs before earliest limit ''2030-01-01 00:00:00+00:00'''),
(6, 'ts', FALSE, 'failure to perform timestamp validation, error: can''t compare offset-naive and offset-aware datetimes'),
(7, 'ts', FALSE, 'failure to perform timestamp validation, error: can''t compare offset-naive and offset-aware datetimes'),
(8, 'ts', FALSE, 'failure to perform timestamp validation, error: can''t compare offset-naive and offset-aware datetimes'),
(9, 'ts', FALSE, 'failure to perform timestamp validation, error: can''t compare offset-naive and offset-aware datetimes'),
(10, 'ts', FALSE, 'failure to perform timestamp validation, error: can''t compare offset-naive and offset-aware datetimes'),
(11, 'ts', FALSE, 'failure to perform timestamp validation, error: Unknown string format: not-a-timestamp'),
(12, 'ts', FALSE, 'failure to perform timestamp validation, error: Unknown string format: xx 99 zz')
) AS t(id, field_path, valid, details)