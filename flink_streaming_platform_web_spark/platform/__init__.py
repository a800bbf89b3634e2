"""Job platform: metadata store, lifecycle manager, monitoring,
alarms, CLI — the reference's web/service tier rebuilt CLI-first
(SURVEY §2.4: JobConfigApiController verbs, SchedulerTask monitoring,
DingDing/HTTP alarms, savepoint registry)."""
