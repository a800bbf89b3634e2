-- README.md:100-123 hello-world: datagen → print.
CREATE TABLE source_table (
  f0 INT,
  f1 INT,
  f2 STRING
) WITH (
  'connector' = 'datagen',
  'rows-per-second' = '5',
  'number-of-rows' = '25'
);

CREATE TABLE print_table (
  f0 INT, f1 INT, f2 STRING
) WITH ('connector' = 'print');

INSERT INTO print_table SELECT f0, f1, f2 FROM source_table;
