SELECT CAST(file AS VARCHAR) AS file, CAST(serial_number AS BIGINT) AS serial_number, CAST(field_path AS VARCHAR) AS field_path, CAST(valid AS BOOLEAN) AS valid, CAST(details AS VARCHAR) AS details FROM (VALUES
('r1.json', 1, 'metadata.recordType', TRUE, ''),
('r1.json', 1, 'metadata.serialId.serialNumber', TRUE, ''),
('r1.json', 2, 'metadata.recordType', FALSE, 'Value ''rxMsg'' not in list of known values: [bsmTx, bsmLogDuringEvent]'),
('r1.json', 2, 'metadata.serialId.serialNumber', TRUE, ''),
('r2.json', 4, 'metadata.recordType', TRUE, ''),
('r2.json', 4, 'metadata.serialId.serialNumber', TRUE, ''),
('r2.json', 5, 'metadata.recordType', FALSE, 'Value ''bsmTx'' not in list of known values: [dnMsg, driverAlert]'),
('r2.json', 5, 'metadata.serialId.serialNumber', TRUE, ''),
('r3.json', 10, 'metadata.recordType', TRUE, ''),
('r3.json', 10, 'metadata.score', TRUE, ''),
('r3.json', 10, 'metadata.serialId.serialNumber', TRUE, ''),
('r3.json', 11, 'metadata.recordType', FALSE, 'Field missing: metadata.recordType'),
('r3.json', 11, 'metadata.score', TRUE, ''),
('r3.json', 11, 'metadata.serialId.serialNumber', TRUE, '')
) AS t(file, serial_number, field_path, valid, details)