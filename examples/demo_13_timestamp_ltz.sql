-- Flink 1.13's TO_TIMESTAMP_LTZ (FLINK-21869 — the release's datetime
-- headliner; the reference pins Flink 1.13 in pom.xml:41) plus the
-- TIMESTAMPDIFF temporal scalar, through the full script route: the
-- translator rewrites the numeric TO_TIMESTAMP_LTZ onto
-- timestamp_seconds/timestamp_millis (Spark's native name parses
-- strings), TIMESTAMPDIFF passes through (same name + argument order).
CREATE TABLE clicks (
  id BIGINT,
  epoch_ms BIGINT
) WITH (
  'connector' = 'filesystem',
  'path' = '${data_dir}/clicks',
  'format' = 'json'
);

CREATE TABLE click_times (
  id BIGINT, at_ms STRING, at_s STRING, mins_in BIGINT
) WITH ('connector' = 'memory');

INSERT INTO click_times
SELECT id,
       date_format(TO_TIMESTAMP_LTZ(epoch_ms, 3),
                   'yyyy-MM-dd HH:mm:ss.SSS') AS at_ms,
       date_format(TO_TIMESTAMP_LTZ(epoch_ms DIV 1000, 0),
                   'yyyy-MM-dd HH:mm:ss') AS at_s,
       TIMESTAMPDIFF(MINUTE, TIMESTAMP '2024-01-01 00:00:00',
                     TO_TIMESTAMP_LTZ(epoch_ms, 3)) AS mins_in
FROM clicks;
