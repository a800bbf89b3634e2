-- demo_1.md: single-stream daily GMV with an upsert sink.
-- Reference source: kafka JSON topic; here: the filesystem connector
-- (swap the WITH options for kafka in a real deployment — the query
-- text is unchanged).
CREATE TABLE source_table (
  id BIGINT,
  day_time VARCHAR,
  amnount BIGINT,
  proctime AS PROCTIME()
) WITH (
  'connector' = 'filesystem',
  'path' = '${data_dir}/simple_orders',
  'format' = 'json'
);

CREATE TABLE sink_table (
  day_time STRING,
  total_gmv BIGINT,
  PRIMARY KEY (day_time) NOT ENFORCED
) WITH (
  'connector' = 'jdbc'
);

INSERT INTO sink_table
SELECT day_time, SUM(amnount) AS total_gmv
FROM source_table
GROUP BY day_time;
