-- demo_2.md: double-stream LEFT JOIN into a continuously-updated GMV
-- aggregate with an upsert sink (PRIMARY KEY day_time).
-- Reference source: two kafka JSON topics; here: the filesystem
-- connector (swap the WITH options for kafka in a real deployment —
-- the query text is unchanged).
create table flink_test_2_1 (
  id BIGINT,
  day_time VARCHAR,
  amnount BIGINT,
  proctime AS PROCTIME ()
) with (
  'connector' = 'filesystem',
  'path' = '${data_dir}/orders_stream',
  'format' = 'json'
);

create table flink_test_2_2 (
  id BIGINT,
  coupon_amnount BIGINT,
  proctime AS PROCTIME ()
) with (
  'connector' = 'filesystem',
  'path' = '${data_dir}/coupon_stream',
  'format' = 'json'
);

CREATE TABLE sync_test_2 (
  day_time string,
  total_gmv bigint,
  PRIMARY KEY (day_time) NOT ENFORCED
) WITH (
  'connector' = 'jdbc'
);

INSERT INTO sync_test_2
SELECT
  day_time,
  SUM(amnount - coupon_amnount) AS total_gmv
FROM (
  SELECT
    a.day_time AS day_time,
    a.amnount AS amnount,
    COALESCE(b.coupon_amnount, 0) AS coupon_amnount
  FROM flink_test_2_1 a
  LEFT JOIN flink_test_2_2 b ON b.id = a.id
) GROUP BY day_time;
