-- Reference docs/sql_demo/demo_batch.md: a BATCH job writing into a
-- hive-catalog table. The reference script points 'hive-conf-dir' at
-- a live metastore config; here the runner's CREATE CATALOG
-- ('type'='hive') binds Spark's hive catalogImplementation (embedded
-- Derby metastore in this container — swap hive-site.xml for a real
-- one in production). USE CATALOG + INSERT INTO ... VALUES then run
-- verbatim. Requires a hive-enabled session (get_spark(hive=True));
-- tests/test_hive_catalog.py drives the same statements end-to-end
-- in a subprocess because catalogImplementation is session-static.

CREATE CATALOG testmyhive WITH ('type' = 'hive');

USE CATALOG testmyhive;

CREATE DATABASE IF NOT EXISTS test;

CREATE TABLE IF NOT EXISTS test.test (
  id INT,
  name STRING
);

insert into test.test values(4,'n2');
