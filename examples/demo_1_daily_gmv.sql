-- demo_1.md VERBATIM: single-stream kafka JSON topic → daily GMV →
-- PRIMARY-KEY upsert sink (reference:
-- /root/reference/docs/sql_demo/demo_1.md — msg shape
-- {"day_time": "20201009","id": 7,"amnount":20}).
-- '${kafka_servers}' points at a real broker in deployment; the test
-- suite points it at the file:// transport (sources/kafka_file.py),
-- which runs the same readStream path with per-partition offsets.
create table flink_test_1 (
  id BIGINT,
  day_time VARCHAR,
  amnount BIGINT,
  proctime AS PROCTIME ()
)
 with (
  'connector' = 'kafka',
  'topic' = 'flink_test',
  'properties.bootstrap.servers' = '${kafka_servers}',
  'properties.group.id' = 'flink_gp_test1',
  'scan.startup.mode' = 'earliest-offset',
  'format' = 'json',
  'json.fail-on-missing-field' = 'false',
  'json.ignore-parse-errors' = 'true'
 );

CREATE TABLE sync_test_1 (
  day_time string,
  total_gmv bigint,
  PRIMARY KEY (day_time) NOT ENFORCED
) WITH (
  'connector' = 'jdbc'
);

INSERT INTO sync_test_1
SELECT day_time, SUM(amnount) AS total_gmv
FROM flink_test_1
GROUP BY day_time;
