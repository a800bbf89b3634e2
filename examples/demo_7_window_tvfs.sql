-- Flink 1.13 windowing TVFs (FLIP-145): the TABLE(TUMBLE/CUMULATE
-- (...)) syntax form. The TVF appends window_start / window_end /
-- window_time columns; GROUP BY references them directly. Translated
-- by functions/flink_compat.translate_expr into derived subqueries —
-- see docs in that module for the streaming-mode caveat.

CREATE TABLE bids (
  bidder VARCHAR,
  price DOUBLE,
  ts TIMESTAMP(3),
  WATERMARK FOR ts AS ts - INTERVAL '10' SECOND
) WITH (
  'connector' = 'filesystem',
  'path' = '${data_dir}/bids',
  'format' = 'json'
);

CREATE TABLE bids_per_window (
  window_start TIMESTAMP,
  window_end TIMESTAMP,
  n_bids BIGINT,
  total DOUBLE
) WITH ('connector' = 'memory');

CREATE TABLE bids_cumulative (
  window_start TIMESTAMP,
  window_end TIMESTAMP,
  n_bids BIGINT
) WITH ('connector' = 'memory');

-- tumbling TVF (the Flink docs' bid-window example shape)
INSERT INTO bids_per_window
SELECT window_start, window_end, COUNT(*) AS n_bids,
       CAST(SUM(CAST(price AS DECIMAL(18,2))) AS DOUBLE) AS total
FROM TABLE(TUMBLE(TABLE bids, DESCRIPTOR(ts), INTERVAL '10' MINUTE))
GROUP BY window_start, window_end;

-- cumulating TVF: expanding 2-minute slices of each 10-minute window
INSERT INTO bids_cumulative
SELECT window_start, window_end, COUNT(*) AS n_bids
FROM TABLE(CUMULATE(TABLE bids, DESCRIPTOR(ts),
                    INTERVAL '2' MINUTE, INTERVAL '10' MINUTE))
GROUP BY window_start, window_end;
