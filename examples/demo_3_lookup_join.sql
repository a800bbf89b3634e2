-- demo_3.md: lookup (temporal) join against a dimension table.
CREATE TABLE a (
  id BIGINT,
  amount BIGINT,
  proctime AS PROCTIME()
) WITH (
  'connector' = 'filesystem',
  'path' = '${data_dir}/stream_a',
  'format' = 'json'
);

CREATE TABLE test_dim (
  id BIGINT,
  coupon_amnount BIGINT
) WITH ('connector' = 'memory', 'view' = 'test_dim_view');

CREATE TABLE joined_out (
  id BIGINT, amount BIGINT, coupon_amnount BIGINT
) WITH ('connector' = 'memory');

INSERT INTO joined_out
SELECT a.id, a.amount, b.coupon_amnount
FROM a LEFT JOIN test_dim FOR SYSTEM_TIME AS OF a.proctime AS b
  ON b.id = a.id;
