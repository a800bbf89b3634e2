-- Flink SQL MATCH_RECOGNIZE (docs: queries/match_recognize): the
-- Ticker example's V-pattern — find each price dip-and-recovery per
-- symbol. The runner routes the clause to the CEP operator
-- (operators/cep.py): greedy NFA per partition key, one shuffle.
CREATE TABLE ticker (
  symbol STRING,
  tstamp BIGINT,
  price DOUBLE
) WITH (
  'connector' = 'filesystem',
  'path' = '${data_dir}/ticker',
  'format' = 'json'
);

CREATE TABLE dips (
  symbol STRING,
  start_tstamp BIGINT,
  bottom_tstamp BIGINT,
  end_tstamp BIGINT
) WITH ('connector' = 'memory');

INSERT INTO dips
SELECT symbol, start_tstamp, bottom_tstamp, end_tstamp
FROM ticker MATCH_RECOGNIZE (
  PARTITION BY symbol
  ORDER BY tstamp
  MEASURES
    STRT.tstamp AS start_tstamp,
    LAST(DOWN.tstamp) AS bottom_tstamp,
    LAST(UP.tstamp) AS end_tstamp
  ONE ROW PER MATCH
  AFTER MATCH SKIP PAST LAST ROW
  PATTERN (STRT DOWN+ UP+)
  DEFINE
    DOWN AS DOWN.price < PREV(DOWN.price),
    UP AS UP.price > PREV(UP.price)
);
