-- Flink 1.13 streaming-SQL features (docs: queries/joins §Event Time
-- Temporal Join, queries/over-agg) — the round-6 engine surface:
--
--   §1 event-time temporal join: each order joins the currency-rate
--      VERSION valid at the order's own event time. Declaring BOTH a
--      PRIMARY KEY and a WATERMARK makes `rates` a versioned table
--      (Flink's definition), which routes the FOR SYSTEM_TIME join to
--      per-key version-history state instead of a lookup snapshot.
--   §2 streaming OVER aggregation: every order row appends one output
--      row aggregating its trailing 10-minute window per currency.
--
-- Sources arrive as json files under ${data_dir} (the kafka stand-in,
-- as in the other demos).

CREATE TABLE orders (
  order_id BIGINT,
  currency STRING,
  ts TIMESTAMP,
  amount DOUBLE,
  WATERMARK FOR ts AS ts - INTERVAL '60' SECOND
) WITH (
  'connector' = 'filesystem',
  'path' = '${data_dir}/orders',
  'format' = 'json',
  'source.max-files-per-trigger' = '1'
);

CREATE TABLE rates (
  currency STRING,
  rts TIMESTAMP,
  rate DOUBLE,
  PRIMARY KEY (currency) NOT ENFORCED,
  WATERMARK FOR rts AS rts - INTERVAL '60' SECOND
) WITH (
  'connector' = 'filesystem',
  'path' = '${data_dir}/rates',
  'format' = 'json',
  'source.max-files-per-trigger' = '1'
);

CREATE TABLE enriched_orders (
  order_id BIGINT,
  amount DOUBLE,
  rate DOUBLE
) WITH ('connector' = 'memory');

INSERT INTO enriched_orders
SELECT o.order_id, o.amount, r.rate
FROM orders o
JOIN rates FOR SYSTEM_TIME AS OF o.ts r
ON o.currency = r.currency;

CREATE TABLE order_stats (
  order_id BIGINT,
  amount DOUBLE,
  n_10m BIGINT,
  max_10m DOUBLE
) WITH ('connector' = 'memory');

INSERT INTO order_stats
SELECT order_id, amount,
       COUNT(*) OVER w AS n_10m,
       MAX(amount) OVER w AS max_10m
FROM orders
WINDOW w AS (PARTITION BY currency ORDER BY ts
             RANGE BETWEEN INTERVAL '10' MINUTE PRECEDING
             AND CURRENT ROW);
