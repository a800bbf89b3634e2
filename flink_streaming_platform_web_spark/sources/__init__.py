"""Connector surface: DDL interpretation + source/sink registry
(SURVEY §2.2). The reference's users declare every dataset as
``CREATE TABLE … WITH ('connector' = …)``; here the same DDL text
builds Spark batch/streaming readers and writers."""
