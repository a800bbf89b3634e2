-- Round-8 MATCH_RECOGNIZE pattern grammar (Flink docs:
-- queries/match_recognize §PERMUTE, §Patterns): PERMUTE matches its
-- variables in ANY order (expanded to the alternation of all
-- permutations, original order preferred), and a quantified NESTED
-- group repeats its whole body as a unit. The runner routes both to
-- the CEP operator's AST walker (operators/cep.py); flat patterns
-- keep the iterative fast path.
CREATE TABLE ticks (
  symbol STRING,
  seq BIGINT,
  price DOUBLE
) WITH (
  'connector' = 'filesystem',
  'path' = '${data_dir}/ticks',
  'format' = 'json'
);

CREATE TABLE swings (
  symbol STRING, hi_seq BIGINT, lo_seq BIGINT
) WITH ('connector' = 'memory');

-- a high/low tick pair in EITHER order: PERMUTE(HI, LO) is
-- (HI LO | LO HI); the FIRST measures report which row each
-- variable actually bound
INSERT INTO swings
SELECT symbol, hi_seq, lo_seq
FROM ticks MATCH_RECOGNIZE (
  PARTITION BY symbol
  ORDER BY seq
  MEASURES
    FIRST(HI.seq) AS hi_seq,
    FIRST(LO.seq) AS lo_seq
  ONE ROW PER MATCH
  AFTER MATCH SKIP PAST LAST ROW
  PATTERN (PERMUTE(HI, LO))
  DEFINE
    HI AS HI.price >= 20.0,
    LO AS LO.price < 10.0
);

CREATE TABLE oscillations (
  symbol STRING, start_seq BIGINT, n_swings BIGINT
) WITH ('connector' = 'memory');

-- repeated up-down pairs as a UNIT: (UP DOWN)+ cannot be expressed
-- with flat quantifiers (UP+ DOWN+ would accept UP UP DOWN)
INSERT INTO oscillations
SELECT symbol, start_seq, n_swings
FROM ticks MATCH_RECOGNIZE (
  PARTITION BY symbol
  ORDER BY seq
  MEASURES
    FIRST(STRT.seq) AS start_seq,
    COUNT(UP.*) AS n_swings
  ONE ROW PER MATCH
  AFTER MATCH SKIP PAST LAST ROW
  PATTERN (STRT (UP DOWN)+)
  DEFINE
    UP AS UP.price > PREV(UP.price),
    DOWN AS DOWN.price < PREV(DOWN.price)
);

CREATE TABLE ticks_g (
  symbol STRING,
  seq BIGINT,
  price DOUBLE,
  grp AS CAST(FLOOR(seq / 3.0) AS BIGINT)
) WITH (
  'connector' = 'filesystem',
  'path' = '${data_dir}/ticks',
  'format' = 'json'
);

CREATE TABLE dips (
  symbol STRING, lo_seq BIGINT, hi_seq BIGINT
) WITH ('connector' = 'memory');

-- DESC on a SECONDARY ordering column (the first column must stay
-- ascending — Flink's event-time-attribute rule): within each grp
-- tie-group the scan runs seq-DESCENDING, so which tick FOLLOWS
-- which flips vs ASC and different LO→HI adjacencies match
INSERT INTO dips
SELECT symbol, lo_seq, hi_seq
FROM ticks_g MATCH_RECOGNIZE (
  PARTITION BY symbol
  ORDER BY grp, seq DESC
  MEASURES
    FIRST(LO.seq) AS lo_seq,
    FIRST(HI.seq) AS hi_seq
  ONE ROW PER MATCH
  AFTER MATCH SKIP PAST LAST ROW
  PATTERN (LO HI)
  DEFINE
    LO AS LO.price < 10.0,
    HI AS HI.price >= 20.0
);
