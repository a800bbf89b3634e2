"""Job metadata store (SQLite) — the reference's MySQL schema
(docs/sql/flink_web.sql) reduced to its operative tables:

- job_config    (:49-77  — name, mode, SQL script text, status, version)
- job_config_history (:82-101 — versioned script copies)
- job_run_log   (:106-127 — per-launch log + query ids)
- savepoint_backup (:132-145 — checkpoint-location registry; Spark's
  checkpointLocation plays the savepoint role, SURVEY §1.3)
- alart_log     (:10-26)

Status state machine mirrors JobConfigStatus.java:12-25:
FAIL(-1) STOP(0) RUN(1) STARTING(2) SUCCESS(3) UNKNOWN(-2).
Optimistic locking on job_config.version as in the reference
(updateStatusByStart uses version compare-and-set).
"""

from __future__ import annotations

import json
import sqlite3
import time
from dataclasses import dataclass

STATUS = {"FAIL": -1, "STOP": 0, "RUN": 1, "STARTING": 2, "SUCCESS": 3,
          "UNKNOWN": -2}
_STATUS_NAME = {v: k for k, v in STATUS.items()}

_SCHEMA = """
CREATE TABLE IF NOT EXISTS job_config (
  id INTEGER PRIMARY KEY AUTOINCREMENT,
  job_name TEXT UNIQUE NOT NULL,
  job_type TEXT NOT NULL DEFAULT 'streaming',
  deploy_mode TEXT NOT NULL DEFAULT 'LOCAL',
  sql_script TEXT NOT NULL,
  checkpoint_dir TEXT,
  status INTEGER NOT NULL DEFAULT 0,
  version INTEGER NOT NULL DEFAULT 0,
  is_open INTEGER NOT NULL DEFAULT 1,
  created_at REAL, updated_at REAL
);
CREATE TABLE IF NOT EXISTS job_config_history (
  id INTEGER PRIMARY KEY AUTOINCREMENT,
  job_id INTEGER NOT NULL, version INTEGER NOT NULL,
  sql_script TEXT NOT NULL, created_at REAL
);
CREATE TABLE IF NOT EXISTS job_run_log (
  id INTEGER PRIMARY KEY AUTOINCREMENT,
  job_id INTEGER NOT NULL, started_at REAL, finished_at REAL,
  status TEXT, query_ids TEXT, message TEXT
);
CREATE TABLE IF NOT EXISTS savepoint_backup (
  id INTEGER PRIMARY KEY AUTOINCREMENT,
  job_id INTEGER NOT NULL, checkpoint_location TEXT NOT NULL,
  created_at REAL
);
CREATE TABLE IF NOT EXISTS alart_log (
  id INTEGER PRIMARY KEY AUTOINCREMENT,
  job_id INTEGER, alarm_type TEXT, message TEXT, created_at REAL
);
"""


@dataclass
class JobConfig:
    id: int
    job_name: str
    job_type: str
    deploy_mode: str
    sql_script: str
    checkpoint_dir: str | None
    status: int
    version: int
    is_open: bool

    @property
    def status_name(self) -> str:
        return _STATUS_NAME.get(self.status, "UNKNOWN")


class JobStore:
    def __init__(self, path: str = ":memory:") -> None:
        self._db = sqlite3.connect(path, check_same_thread=False)
        self._db.executescript(_SCHEMA)

    # -- job_config -----------------------------------------------------

    def add_job(
        self,
        job_name: str,
        sql_script: str,
        job_type: str = "streaming",
        deploy_mode: str = "LOCAL",
        checkpoint_dir: str | None = None,
    ) -> int:
        now = time.time()
        cur = self._db.execute(
            "INSERT INTO job_config (job_name, job_type, deploy_mode,"
            " sql_script, checkpoint_dir, created_at, updated_at)"
            " VALUES (?,?,?,?,?,?,?)",
            (job_name, job_type, deploy_mode, sql_script, checkpoint_dir,
             now, now),
        )
        job_id = cur.lastrowid
        self._db.execute(
            "INSERT INTO job_config_history (job_id, version, sql_script,"
            " created_at) VALUES (?,?,?,?)",
            (job_id, 0, sql_script, now),
        )
        self._db.commit()
        return job_id

    def update_script(self, job_id: int, sql_script: str) -> None:
        job = self.get_job(job_id)
        self._db.execute(
            "UPDATE job_config SET sql_script=?, version=version+1,"
            " updated_at=? WHERE id=?",
            (sql_script, time.time(), job_id),
        )
        self._db.execute(
            "INSERT INTO job_config_history (job_id, version, sql_script,"
            " created_at) VALUES (?,?,?,?)",
            (job_id, job.version + 1, sql_script, time.time()),
        )
        self._db.commit()

    def get_job(self, job_id: int) -> JobConfig:
        row = self._db.execute(
            "SELECT id, job_name, job_type, deploy_mode, sql_script,"
            " checkpoint_dir, status, version, is_open FROM job_config"
            " WHERE id=?",
            (job_id,),
        ).fetchone()
        if row is None:
            raise KeyError(f"no job with id {job_id}")
        return JobConfig(*row[:8], bool(row[8]))

    def list_jobs(self) -> list[JobConfig]:
        rows = self._db.execute(
            "SELECT id FROM job_config ORDER BY id"
        ).fetchall()
        return [self.get_job(r[0]) for r in rows]

    def set_status(
        self, job_id: int, status: str, expect_version: int | None = None
    ) -> bool:
        """Optimistic-lock status transition (reference:
        updateStatusByStart, JobConfigServiceImpl). Returns False if
        the version moved underneath us."""
        if expect_version is not None:
            cur = self._db.execute(
                "UPDATE job_config SET status=?, version=version+1,"
                " updated_at=? WHERE id=? AND version=?",
                (STATUS[status], time.time(), job_id, expect_version),
            )
        else:
            cur = self._db.execute(
                "UPDATE job_config SET status=?, updated_at=? WHERE id=?",
                (STATUS[status], time.time(), job_id),
            )
        self._db.commit()
        return cur.rowcount == 1

    def history(self, job_id: int) -> list[tuple[int, str]]:
        return self._db.execute(
            "SELECT version, sql_script FROM job_config_history"
            " WHERE job_id=? ORDER BY version",
            (job_id,),
        ).fetchall()

    # -- run log ----------------------------------------------------------

    def log_run(
        self, job_id: int, status: str, query_ids: list[str],
        message: str = "",
    ) -> int:
        cur = self._db.execute(
            "INSERT INTO job_run_log (job_id, started_at, status,"
            " query_ids, message) VALUES (?,?,?,?,?)",
            (job_id, time.time(), status, json.dumps(query_ids), message),
        )
        self._db.commit()
        return cur.lastrowid

    def finish_run(self, run_id: int, status: str, message: str = "") -> None:
        self._db.execute(
            "UPDATE job_run_log SET finished_at=?, status=?, message=?"
            " WHERE id=?",
            (time.time(), status, message, run_id),
        )
        self._db.commit()

    def runs(self, job_id: int) -> list[tuple]:
        return self._db.execute(
            "SELECT id, status, query_ids, message FROM job_run_log"
            " WHERE job_id=? ORDER BY id",
            (job_id,),
        ).fetchall()

    # -- savepoints (checkpoint-location registry) -------------------------

    def add_savepoint(self, job_id: int, checkpoint_location: str) -> None:
        self._db.execute(
            "INSERT INTO savepoint_backup (job_id, checkpoint_location,"
            " created_at) VALUES (?,?,?)",
            (job_id, checkpoint_location, time.time()),
        )
        self._db.commit()

    def savepoints(self, job_id: int) -> list[str]:
        return [
            r[0]
            for r in self._db.execute(
                "SELECT checkpoint_location FROM savepoint_backup"
                " WHERE job_id=? ORDER BY id",
                (job_id,),
            ).fetchall()
        ]

    # -- alarms -----------------------------------------------------------

    def log_alarm(self, job_id: int, alarm_type: str, message: str) -> None:
        self._db.execute(
            "INSERT INTO alart_log (job_id, alarm_type, message,"
            " created_at) VALUES (?,?,?,?)",
            (job_id, alarm_type, message, time.time()),
        )
        self._db.commit()

    def alarms(self, job_id: int) -> list[tuple[str, str]]:
        return self._db.execute(
            "SELECT alarm_type, message FROM alart_log WHERE job_id=?"
            " ORDER BY id",
            (job_id,),
        ).fetchall()
