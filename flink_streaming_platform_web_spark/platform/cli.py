"""CLI — the JobConfigApiController verb surface, CLI-first
(SURVEY §2.4 REST-API row: /api/start|stop|savepoint|addConfig|
editConfig|listTask|checkfSql → subcommands).

    python -m flink_streaming_platform_web_spark.platform.cli add \
        --name j1 --sql-file job.sql
    ... list | start --id 1 | stop --id 1 | savepoint --id 1 \
      | history --id 1 | validate --sql-file job.sql | run --sql-file f

``run`` executes a script directly (the JobApplication entry used by
cluster submission, platform/submit.py) and prints the structured
JSON handshake instead of the reference's scraped
``job-submitted-success:<id>`` marker (SystemConstant.java:29-31).
"""

from __future__ import annotations

import argparse
import json
import sys

from flink_streaming_platform_web_spark.platform.manager import JobManager
from flink_streaming_platform_web_spark.platform.store import JobStore
from flink_streaming_platform_web_spark.session import get_spark
from flink_streaming_platform_web_spark.sql.validation import validate_script


def main(argv: list[str] | None = None) -> int:
    p = argparse.ArgumentParser(prog="spark-streaming-platform")
    p.add_argument("--store", default="jobs.sqlite")
    sub = p.add_subparsers(dest="verb", required=True)

    addp = sub.add_parser("add")
    addp.add_argument("--name", required=True)
    addp.add_argument("--sql-file", required=True)
    addp.add_argument("--job-type", default="streaming",
                      choices=["streaming", "batch", "app"])
    addp.add_argument("--checkpoint-dir")

    for verb in ("start", "stop", "savepoint", "history", "status"):
        vp = sub.add_parser(verb)
        vp.add_argument("--id", type=int, required=True)
        if verb == "start":
            vp.add_argument(
                "--await", action="store_true", dest="await_",
                help="drain available input, then stop the job",
            )
            vp.add_argument("--savepoint-id", type=int)

    sub.add_parser("list")

    vp = sub.add_parser("validate")
    vp.add_argument("--sql-file", required=True)
    vp.add_argument("--job-type", default="streaming")

    rp = sub.add_parser("run")
    rp.add_argument("--sql-file", required=True)
    rp.add_argument("--job-type", default="streaming")
    rp.add_argument("--checkpoint-dir")
    rp.add_argument("--await", action="store_true", dest="await_",
                    help="process all available input, then stop")
    rp.add_argument("--stop-file",
                    help="cooperative stop channel: when this path"
                         " appears, drain-stop every query and exit"
                         " (the manager's stop verb — a SIGTERM to"
                         " spark-submit never reaches this python"
                         " driver, the JVM kills it outright)")

    args = p.parse_args(argv)
    store = JobStore(args.store)

    if args.verb == "add":
        sql = open(args.sql_file).read()
        job_id = store.add_job(args.name, sql, args.job_type,
                               checkpoint_dir=args.checkpoint_dir)
        print(json.dumps({"job_id": job_id}))
        return 0
    if args.verb == "list":
        print(json.dumps([
            {"id": j.id, "name": j.job_name, "type": j.job_type,
             "status": j.status_name} for j in store.list_jobs()
        ]))
        return 0
    if args.verb == "history":
        print(json.dumps([
            {"version": v, "sql": s} for v, s in store.history(args.id)
        ]))
        return 0
    if args.verb == "validate":
        sql = open(args.sql_file).read()
        spark = get_spark("validate")
        r = validate_script(sql, spark, args.job_type)
        print(json.dumps({"ok": r.ok, "errors": r.errors}))
        return 0 if r.ok else 1

    spark = get_spark("platform-cli")
    mgr = JobManager(spark, store)
    if args.verb == "start":
        result = mgr.start(args.id, args.savepoint_id)
        if result.streaming_queries:
            # an in-process streaming job ends with this process — a
            # bare exit would kill the queries while the store says
            # RUN forever. --await drains + stops cleanly; otherwise
            # block until termination/Ctrl-C, then mark STOP.
            try:
                if args.await_:
                    for q in result.streaming_queries:
                        q.processAllAvailable()
                else:
                    spark.streams.awaitAnyTermination()
            except KeyboardInterrupt:
                pass
            finally:
                mgr.stop(args.id)
        print(json.dumps({"job_id": args.id,
                          "queries": result.query_ids,
                          "batch_results": result.batch_results,
                          "status": mgr.status(args.id)}))
        return 0
    if args.verb == "stop":
        mgr.stop(args.id)
        print(json.dumps({"job_id": args.id, "status": mgr.status(args.id)}))
        return 0
    if args.verb == "savepoint":
        loc = mgr.savepoint(args.id)
        print(json.dumps({"job_id": args.id, "checkpoint_location": loc}))
        return 0
    if args.verb == "status":
        print(json.dumps({"job_id": args.id, "status": mgr.status(args.id)}))
        return 0
    if args.verb == "run":
        from flink_streaming_platform_web_spark.streaming.checkpoints import (
            CheckPointParam,
        )
        from flink_streaming_platform_web_spark.streaming.runner import (
            JobRunner,
        )

        sql = open(args.sql_file).read()
        runner = JobRunner(
            spark, mode=args.job_type,
            checkpoint=CheckPointParam(checkpoint_dir=args.checkpoint_dir),
        )
        result = runner.execute_script(sql)
        # structured submit handshake, emitted the moment the queries
        # are running and BEFORE any draining — the typed replacement
        # for the reference's scraped `job-submitted-success:<jobID>`
        # stdout marker (SystemConstant.java:29-31; scraped at
        # CommandRpcClinetAdapterImpl.java:150-161). A parent process
        # (platform/manager._start_process) reads this line to flip
        # the job to RUN while the child keeps executing.
        print(json.dumps({"marker": "job-submitted-success",
                          "queries": result.query_ids}), flush=True)
        if args.await_:
            for q in result.streaming_queries:
                q.processAllAvailable()
                q.stop()
        elif result.streaming_queries:
            # production-shaped long-running child (manager launched
            # with drain=False): block until a query dies or the
            # manager asks for a stop. The stop request arrives as a
            # FILE (--stop-file), not a signal: the manager's SIGTERM
            # lands on the spark-submit JVM, whose PythonRunner kills
            # this python driver outright — a signal handler here
            # never runs. Polling the marker makes the platform stop
            # verb behave like Flink `stop` (drain), not `cancel`:
            # each query stops through its wrapper, so
            # watermark-buffered event-time tails flush before exit.
            # The manager only falls back to SIGTERM after a grace
            # period; a kill mid-drain degrades to the crash-restart
            # contract (checkpointed state intact — tests/test_ooo).
            import os as _os

            def _drain_stop():
                for q in result.streaming_queries:
                    try:
                        q.stop()
                        q.awaitTermination(60)
                    except Exception:  # sibling leak > one failure
                        pass

            try:
                while True:
                    # True → some query terminated on its own.
                    # NB: PySpark's timeout is SECONDS (the JVM API
                    # takes ms) — 2 s is the stop-file poll cadence.
                    if spark.streams.awaitAnyTermination(2):
                        break
                    if args.stop_file and _os.path.exists(
                        args.stop_file
                    ):
                        _drain_stop()
                        break
            except KeyboardInterrupt:
                _drain_stop()
        print(json.dumps({"queries": result.query_ids,
                          "batch_results": result.batch_results}))
        return 0
    return 2


if __name__ == "__main__":
    sys.exit(main())
