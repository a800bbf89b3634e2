-- demo_datagen.md §2.1: the built-in datagen connector — sequence +
-- random fields, a computed processing-time column, bounded by the
-- sequence field (the job exits when the sequence is exhausted,
-- exactly the documented behavior).
CREATE TABLE datagen (
  f_sequence INT,
  f_random INT,
  f_random_str STRING,
  ts AS localtimestamp
) WITH (
  'connector' = 'datagen',
  'rows-per-second' = '25',
  'fields.f_sequence.kind' = 'sequence',
  'fields.f_sequence.start' = '1',
  'fields.f_sequence.end' = '50',
  'fields.f_random.min' = '1',
  'fields.f_random.max' = '100',
  'fields.f_random_str.length' = '10'
);

CREATE TABLE datagen_out (
  f_sequence INT,
  f_random INT,
  f_random_str STRING
) WITH ('connector' = 'memory');

INSERT INTO datagen_out
SELECT f_sequence, f_random, f_random_str FROM datagen;
