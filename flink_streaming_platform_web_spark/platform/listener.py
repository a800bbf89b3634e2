"""Push-based job monitoring — ``StreamingQueryListener`` replacing
the reference's 5-minute polling scheduler (SchedulerTask.checkJobStatus,
flink-streaming-web/src/main/java/com/flink/streaming/web/scheduler/SchedulerTask.java:66-78).

The reference polls YARN/Flink REST per RUN job and marks stopped jobs
+ fires alarms (TaskServiceAOImpl.checkYarn:208-225). Spark delivers
termination events in-process: `onQueryTerminated` fires the same
mark-STOP/FAIL + alarm + auto-restart flow with zero polling latency.
`JobManager.reconcile()` remains as the belt-and-braces sweep (the
reference's cron) for cluster modes where the listener isn't attached.
"""

from __future__ import annotations

from pyspark.sql.streaming import StreamingQueryListener


class PlatformQueryListener(StreamingQueryListener):
    """Routes query-termination events to the JobManager's alarm/
    status flow. Deliberate stops (JobManager.stop) remove the job
    from `running` before stopping queries, so events for them find
    no owner and are ignored."""

    def __init__(self, manager) -> None:
        self._manager = manager

    def onQueryStarted(self, event) -> None:  # noqa: N802 (Spark API)
        pass

    def onQueryProgress(self, event) -> None:  # noqa: N802
        pass

    def onQueryIdle(self, event) -> None:  # noqa: N802
        pass

    def onQueryTerminated(self, event) -> None:  # noqa: N802
        qid = str(event.id)
        mgr = self._manager
        for job_id, rj in list(mgr.running.items()):
            if qid in {str(q.id) for q in rj.result.streaming_queries}:
                # delegate to the same logic as the polling sweep
                mgr.reconcile()
                return


def attach(spark, manager) -> PlatformQueryListener:
    listener = PlatformQueryListener(manager)
    spark.streams.addListener(listener)
    return listener
