SELECT key, CAST(ContentLength AS BIGINT) AS ContentLength,
  CAST(ContentLength AS DOUBLE)/1048576.0 AS SizeMiB,
  LastModified,
  md5(key) AS ETag, Dataset, TrafficType, TableName, State,
  DataProvider, DataType, Environment,
  CAST(MessageCount AS BIGINT) AS MessageCount
FROM (VALUES
('cv/provider1/bsm/2020/r1.json', 160, '2024-01-15T12:00:00+00:00', 'cv', NULL, NULL, NULL, 'provider1', 'bsm', 'test-env', 2),
('cv/provider2/tim/2021/r2.json', 160, '2024-01-15T14:00:00+00:00', 'cv', NULL, NULL, NULL, 'provider2', 'tim', 'test-env', 2),
('cv/provider3/edge/2022/r3.json', 177, '2024-01-15T15:00:00+00:00', 'cv', NULL, NULL, NULL, 'provider3', 'edge', 'test-env', 2),
('waze/type=alerts/table=t1/state=CO/w1.json', 240, '2024-01-15T17:00:00+00:00', 'waze', 'alerts', 't1', 'CO', NULL, NULL, 'test-env', 3)
) AS t(key, ContentLength, LastModified, Dataset, TrafficType, TableName, State, DataProvider, DataType, Environment, MessageCount)