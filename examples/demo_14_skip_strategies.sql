-- Flink SQL AFTER MATCH strategies (docs: queries/match_recognize
-- §After Match Strategy), all four over the same rising-pair pattern
-- so their consumption differences are visible side by side:
--   SKIP PAST LAST ROW   — disjoint matches
--   SKIP TO NEXT ROW     — every start position
--   SKIP TO LAST TOP     — chained matches sharing the TOP row
--   SKIP TO FIRST UP     — resume at the first UP row
-- The runner routes each INSERT's clause to the CEP operator; the
-- fixed-length row-local shapes compile to the pure-JVM window tier
-- (islands + per-strategy stride).
CREATE TABLE ticker14 (
  symbol STRING,
  tstamp BIGINT,
  price DOUBLE
) WITH (
  'connector' = 'filesystem',
  'path' = '${data_dir}/ticker',
  'format' = 'json'
);

CREATE TABLE past_last (start_t BIGINT, top_t BIGINT)
WITH ('connector' = 'memory');
CREATE TABLE to_next (start_t BIGINT, top_t BIGINT)
WITH ('connector' = 'memory');
CREATE TABLE to_last_top (start_t BIGINT, top_t BIGINT)
WITH ('connector' = 'memory');
CREATE TABLE to_first_up (start_t BIGINT, top_t BIGINT)
WITH ('connector' = 'memory');

INSERT INTO past_last
SELECT start_t, top_t FROM ticker14 MATCH_RECOGNIZE (
  PARTITION BY symbol ORDER BY tstamp
  MEASURES FIRST(STRT.tstamp) AS start_t, LAST(TOP.tstamp) AS top_t
  ONE ROW PER MATCH
  AFTER MATCH SKIP PAST LAST ROW
  PATTERN (STRT UP TOP)
  DEFINE UP AS UP.price > PREV(UP.price),
         TOP AS TOP.price > PREV(TOP.price)
);

INSERT INTO to_next
SELECT start_t, top_t FROM ticker14 MATCH_RECOGNIZE (
  PARTITION BY symbol ORDER BY tstamp
  MEASURES FIRST(STRT.tstamp) AS start_t, LAST(TOP.tstamp) AS top_t
  ONE ROW PER MATCH
  AFTER MATCH SKIP TO NEXT ROW
  PATTERN (STRT UP TOP)
  DEFINE UP AS UP.price > PREV(UP.price),
         TOP AS TOP.price > PREV(TOP.price)
);

INSERT INTO to_last_top
SELECT start_t, top_t FROM ticker14 MATCH_RECOGNIZE (
  PARTITION BY symbol ORDER BY tstamp
  MEASURES FIRST(STRT.tstamp) AS start_t, LAST(TOP.tstamp) AS top_t
  ONE ROW PER MATCH
  AFTER MATCH SKIP TO LAST TOP
  PATTERN (STRT UP TOP)
  DEFINE UP AS UP.price > PREV(UP.price),
         TOP AS TOP.price > PREV(TOP.price)
);

INSERT INTO to_first_up
SELECT start_t, top_t FROM ticker14 MATCH_RECOGNIZE (
  PARTITION BY symbol ORDER BY tstamp
  MEASURES FIRST(STRT.tstamp) AS start_t, LAST(TOP.tstamp) AS top_t
  ONE ROW PER MATCH
  AFTER MATCH SKIP TO FIRST UP
  PATTERN (STRT UP TOP)
  DEFINE UP AS UP.price > PREV(UP.price),
         TOP AS TOP.price > PREV(TOP.price)
);
