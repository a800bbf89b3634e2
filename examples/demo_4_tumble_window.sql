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

INSERT INTO clicks_per_minute
SELECT date_format(window(ts, '60 seconds').start,
                   'yyyy-MM-dd HH:mm:ss') AS window_start,
       username,
       COUNT(*) AS clicks
FROM user_clicks
GROUP BY window(ts, '60 seconds'), username;
