-- Flink's three documented streaming ROW_NUMBER patterns (docs:
-- queries/window-topn, queries/topn, queries/deduplication) in one
-- script: the runner recognizes each nesting and maintains rank /
-- dedup state per micro-batch (retract + re-emit, RankOperator
-- parity).
CREATE TABLE clicks (
  username VARCHAR,
  click_url VARCHAR,
  ts TIMESTAMP(3),
  WATERMARK FOR ts AS ts - INTERVAL '20' SECOND
) WITH (
  'connector' = 'filesystem',
  'path' = '${data_dir}/rank_clicks',
  'format' = 'json'
);

-- window top-2 urls per minute
CREATE TABLE top_urls (
  window_start STRING, click_url STRING, clicks BIGINT, rn BIGINT,
  PRIMARY KEY (window_start, rn) NOT ENFORCED
) WITH ('connector' = 'memory');

INSERT INTO top_urls
SELECT window_start, click_url, clicks, rn FROM (
  SELECT *, ROW_NUMBER() OVER (
           PARTITION BY window_start ORDER BY clicks DESC) AS rn
  FROM (
    SELECT date_format(window_start, 'yyyy-MM-dd HH:mm:ss')
             AS window_start,
           click_url, COUNT(*) AS clicks
    FROM TABLE(TUMBLE(TABLE clicks, DESCRIPTOR(ts),
                      INTERVAL '60' SECOND))
    GROUP BY window_start, click_url
  )
) WHERE rn <= 2;

-- keep-first dedup per user (queries/deduplication)
CREATE TABLE first_click (
  username STRING, ts_s STRING, click_url STRING,
  PRIMARY KEY (username) NOT ENFORCED
) WITH ('connector' = 'memory');

INSERT INTO first_click
SELECT username, ts_s, click_url FROM (
  SELECT *, ROW_NUMBER() OVER (
           PARTITION BY username ORDER BY ts_s ASC) AS rownum
  FROM (
    SELECT username,
           date_format(ts, 'yyyy-MM-dd HH:mm:ss.SSSSSS') AS ts_s,
           click_url
    FROM clicks
  )
) WHERE rownum = 1;
