SELECT CAST(file AS VARCHAR) AS file, CAST(field_path AS VARCHAR) AS field_path, CAST(valid AS BOOLEAN) AS valid, CAST(details AS VARCHAR) AS details, CAST(serial_number AS BIGINT) AS serial_number FROM (VALUES
('a1.json', 'SequentialCheck', TRUE, '', NULL),
('a2.json', NULL, FALSE, 'Detected non-chronological recordGeneratedAt. Previous timestamp was ''2019-05-14 19:05:02+00:00'' but current timestamp is ''2019-05-14 19:05:01+00:00''', 202),
('a2.json', NULL, FALSE, 'Detected non-chronological odeReceivedAt. Previous timestamp was ''2019-05-14 19:05:07+00:00'' but current timestamp is ''2019-05-14 19:05:06+00:00''', 207),
('a2.json', NULL, FALSE, 'Detected incorrectly incremented recordId. Expected recordId ''1'' but got ''2''', 209),
('a2.json', NULL, FALSE, 'bundleSize doesn''t match number of records. Number of records: ''2'' != bundlSize: ''3''', 209),
('a3.json', NULL, FALSE, 'Detected non-chronological odeReceivedAt. Previous timestamp was ''2019-05-14 19:05:31+00:00'' but current timestamp is ''2019-05-14 19:05:29+00:00''', 303),
('a4.json.gz', 'SequentialCheck', TRUE, '', NULL),
('a5.json', NULL, FALSE, 'Detected incorrectly incremented serialNumber. Expected serialNumber ''502'' but got ''505''', 505)
) AS t(file, field_path, valid, details, serial_number)