-- Training-data preprocessing as a PLATFORM JOB: the same script
-- surface the reference's users submit (CREATE TABLE ... WITH
-- connector, INSERT INTO), running a corpus quality-filter → exact
-- dedup → stratified sample → mix accounting pipeline in one batch
-- statement. The Python-API twin (with the full Gopher-style filter)
-- is operators/pipeline.pp01_training_mix, oracle-gated in the
-- inventory; this script is the SQL-job packaging of the same shape.
CREATE TABLE documents (
  doc_id BIGINT,
  text STRING,
  lang STRING,
  source STRING,
  n_chars BIGINT
) WITH (
  'connector' = 'filesystem',
  'path' = '${data_dir}/documents.parquet',
  'format' = 'parquet'
);

CREATE TABLE training_mix (
  lang STRING,
  source STRING,
  n_docs BIGINT,
  total_chars BIGINT
) WITH (
  'connector' = 'filesystem',
  'path' = '${out_dir}/training_mix',
  'format' = 'parquet'
);

INSERT INTO training_mix
WITH scored AS (
  SELECT doc_id, lang, source, n_chars, text,
         size(split(text, ' ')) AS n_tokens
  FROM documents
),
kept AS (
  -- quality gate: drop fragments (the composite Gopher filter lives
  -- in the Python API; the gate shape is the same scan-bound filter)
  SELECT * FROM scored WHERE n_tokens >= 10
),
deduped AS (
  -- exact dedup by content digest, first-occurrence survivor
  SELECT * FROM (
    SELECT *, ROW_NUMBER() OVER (PARTITION BY md5(text)
                                 ORDER BY doc_id) AS rn
    FROM kept
  ) WHERE rn = 1
),
sampled AS (
  -- deterministic stratified sample: salted portable hash per doc,
  -- per-language keep rates in per-mille
  SELECT * FROM deduped
  WHERE CAST(conv(substring(md5(concat('mix|', CAST(doc_id AS STRING))),
                            1, 15), 16, 10) AS BIGINT) % 1000
        < CASE lang WHEN 'en' THEN 200 WHEN 'zh' THEN 500
                    WHEN 'fr' THEN 500 WHEN 'de' THEN 800
                    WHEN 'es' THEN 800 ELSE 0 END
)
SELECT lang, source, COUNT(*) AS n_docs, SUM(n_chars) AS total_chars
FROM sampled
GROUP BY lang, source;
