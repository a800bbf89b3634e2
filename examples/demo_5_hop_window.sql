-- demo_5.md: sliding (HOP) window click counts — 1-minute windows
-- advancing every 30 seconds, so each click lands in two windows.
-- The reference's HOP/HOP_START/HOP_END syntax runs verbatim
-- (translated to Spark's window(col, size, slide)); source adapted
-- kafka→filesystem as in the other demos.
CREATE TABLE user_clicks (
  username VARCHAR,
  click_url VARCHAR,
  ts TIMESTAMP(3),
  WATERMARK FOR ts AS ts - INTERVAL '20' SECOND
) WITH (
  'connector' = 'filesystem',
  'path' = '${data_dir}/user_clicks',
  'format' = 'json'
);

CREATE TABLE sync_test_hop_output (
  window_start STRING,
  window_end STRING,
  username VARCHAR,
  clicks BIGINT
) WITH ('connector' = 'memory');

INSERT INTO sync_test_hop_output
SELECT
 date_format(HOP_START (ts, INTERVAL '30' SECOND, INTERVAL '1' MINUTE),
             'yyyy-MM-dd HH:mm:ss') as window_start,
 date_format(HOP_END (ts, INTERVAL '30' SECOND, INTERVAL '1' MINUTE),
             'yyyy-MM-dd HH:mm:ss') as window_end,
 username,
 COUNT(click_url) AS clicks
 FROM user_clicks
 GROUP BY HOP (ts, INTERVAL '30' SECOND, INTERVAL '1' MINUTE), username;
