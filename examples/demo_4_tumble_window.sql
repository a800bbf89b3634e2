-- demo_4.md: watermarked tumbling-window click counts.
SET table.exec.mini-batch.allow-latency = '5 s';

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

CREATE TABLE clicks_per_minute (
  window_start STRING,
  username STRING,
  clicks BIGINT
) WITH ('connector' = 'memory');

-- the reference's GROUP-window syntax runs VERBATIM (TUMBLE/
-- TUMBLE_START translate to Spark's window()/.start)
INSERT INTO clicks_per_minute
SELECT date_format(TUMBLE_START(ts, INTERVAL '60' SECOND),
                   'yyyy-MM-dd HH:mm:ss') AS window_start,
       username,
       COUNT(*) AS clicks
FROM user_clicks
GROUP BY TUMBLE(ts, INTERVAL '60' SECOND), username;
