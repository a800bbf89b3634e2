"""Job metadata store (SQLite) — the reference's MySQL schema
(docs/sql/flink_web.sql) reduced to its operative tables:

- job_config    (:49-77  — name, mode, SQL script text, status, version)
- job_config_history (:82-101 — versioned script copies)
- job_run_log   (:106-127 — per-launch log + query ids)
- savepoint_backup (:132-145 — checkpoint-location registry; Spark's
  checkpointLocation plays the savepoint role, SURVEY §1.3)
- alart_log     (:10-26)
- user          (:171-187 — salted-digest login for the REST facade)
- job_alarm_config (:190-204 — per-job alarm channel selection,
  AlarmTypeEnum.java:13-15: DINGDING / CALLBACK_URL / AUTO_START_JOB)
- system_config (:152-164 — k/v: alarm URLs etc., SysConfigEnum keys)
- ip_status     (:31-44 — instance heartbeat; leader = lowest live ip)

Status state machine mirrors JobConfigStatus.java:12-25:
FAIL(-1) STOP(0) RUN(1) STARTING(2) SUCCESS(3) UNKNOWN(-2).
Optimistic locking on job_config.version as in the reference
(updateStatusByStart uses version compare-and-set).

Thread-safety: one RLock serializes every execute+commit pair — the
REST facade's ThreadingHTTPServer shares this store across request
threads, and sqlite's autocommit window would otherwise let one
thread's commit publish another's half-done multi-statement write.
"""

from __future__ import annotations

import hashlib
import json
import secrets
import sqlite3
import threading
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
CREATE TABLE IF NOT EXISTS user (
  id INTEGER PRIMARY KEY AUTOINCREMENT,
  username TEXT UNIQUE NOT NULL,
  salt TEXT NOT NULL, digest TEXT NOT NULL,
  status INTEGER NOT NULL DEFAULT 1, created_at REAL
);
CREATE TABLE IF NOT EXISTS job_alarm_config (
  id INTEGER PRIMARY KEY AUTOINCREMENT,
  job_id INTEGER NOT NULL, alarm_type TEXT NOT NULL,
  UNIQUE (job_id, alarm_type)
);
CREATE TABLE IF NOT EXISTS system_config (
  id INTEGER PRIMARY KEY AUTOINCREMENT,
  key TEXT UNIQUE NOT NULL, val TEXT
);
CREATE TABLE IF NOT EXISTS ip_status (
  id INTEGER PRIMARY KEY AUTOINCREMENT,
  ip TEXT UNIQUE NOT NULL, last_time REAL
);
"""

# AlarmTypeEnum.java:13-15
ALARM_TYPES = ("DINGDING", "CALLBACK_URL", "AUTO_START_JOB")


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
        self._lock = threading.RLock()
        self._tokens: dict[str, str] = {}  # token → username

    def _write(self, sql: str, params: tuple = ()) -> sqlite3.Cursor:
        with self._lock:
            cur = self._db.execute(sql, params)
            self._db.commit()
            return cur

    def _read(self, sql: str, params: tuple = ()) -> list[tuple]:
        with self._lock:
            return self._db.execute(sql, params).fetchall()

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
        with self._lock:
            cur = self._db.execute(
                "INSERT INTO job_config (job_name, job_type, deploy_mode,"
                " sql_script, checkpoint_dir, created_at, updated_at)"
                " VALUES (?,?,?,?,?,?,?)",
                (job_name, job_type, deploy_mode, sql_script,
                 checkpoint_dir, now, now),
            )
            job_id = cur.lastrowid
            self._db.execute(
                "INSERT INTO job_config_history (job_id, version,"
                " sql_script, created_at) VALUES (?,?,?,?)",
                (job_id, 0, sql_script, now),
            )
            self._db.commit()
        return job_id

    def update_script(self, job_id: int, sql_script: str) -> None:
        with self._lock:
            job = self.get_job(job_id)
            self._db.execute(
                "UPDATE job_config SET sql_script=?, version=version+1,"
                " updated_at=? WHERE id=?",
                (sql_script, time.time(), job_id),
            )
            self._db.execute(
                "INSERT INTO job_config_history (job_id, version,"
                " sql_script, created_at) VALUES (?,?,?,?)",
                (job_id, job.version + 1, sql_script, time.time()),
            )
            self._db.commit()

    def get_job(self, job_id: int) -> JobConfig:
        rows = self._read(
            "SELECT id, job_name, job_type, deploy_mode, sql_script,"
            " checkpoint_dir, status, version, is_open FROM job_config"
            " WHERE id=?",
            (job_id,),
        )
        if not rows:
            raise KeyError(f"no job with id {job_id}")
        row = rows[0]
        return JobConfig(*row[:8], bool(row[8]))

    def list_jobs(self) -> list[JobConfig]:
        rows = self._read("SELECT id FROM job_config ORDER BY id")
        return [self.get_job(r[0]) for r in rows]

    def set_open(self, job_id: int, is_open: bool) -> None:
        """open/close verbs (JobConfigApiController.java:89-415)."""
        self.get_job(job_id)  # raise on unknown id
        self._write(
            "UPDATE job_config SET is_open=?, updated_at=? WHERE id=?",
            (int(is_open), time.time(), job_id),
        )

    def delete_job(self, job_id: int) -> None:
        """Delete the config + its dependents (reference: delete
        verb). alart_log rows are deliberately RETAINED — the alarm
        trail is an audit log that must survive config deletion (ids
        are AUTOINCREMENT and never reused within a store file)."""
        self.get_job(job_id)
        with self._lock:
            for table in (
                "job_config_history",
                "job_run_log",
                "savepoint_backup",
                "job_alarm_config",
            ):
                self._db.execute(
                    f"DELETE FROM {table} WHERE job_id=?", (job_id,)
                )
            self._db.execute(
                "DELETE FROM job_config WHERE id=?", (job_id,)
            )
            self._db.commit()

    def copy_job(self, job_id: int, new_name: str | None = None) -> int:
        """copyConfig verb: duplicate a config under a new name."""
        job = self.get_job(job_id)
        return self.add_job(
            new_name or f"{job.job_name}-copy",
            job.sql_script,
            job_type=job.job_type,
            deploy_mode=job.deploy_mode,
            checkpoint_dir=job.checkpoint_dir,
        )

    def set_status(
        self, job_id: int, status: str, expect_version: int | None = None
    ) -> bool:
        """Optimistic-lock status transition (reference:
        updateStatusByStart, JobConfigServiceImpl). Returns False if
        the version moved underneath us."""
        if expect_version is not None:
            cur = self._write(
                "UPDATE job_config SET status=?, version=version+1,"
                " updated_at=? WHERE id=? AND version=?",
                (STATUS[status], time.time(), job_id, expect_version),
            )
        else:
            cur = self._write(
                "UPDATE job_config SET status=?, updated_at=? WHERE id=?",
                (STATUS[status], time.time(), job_id),
            )
        return cur.rowcount == 1

    def set_status_if(
        self, job_id: int, status: str, expect_status: str
    ) -> bool:
        """Compare-and-swap on the CURRENT status: the submission
        window's terminal transition may only promote STARTING→
        RUN/SUCCESS — a stop() acknowledged during the (possibly
        minutes-long) submission wrote STOP, and overwriting it back
        to RUN would keep an acknowledged-stopped job running forever
        (ADVICE r03 medium). The version column can't carry this CAS
        because versionless status writes don't bump it."""
        cur = self._write(
            "UPDATE job_config SET status=?, updated_at=?"
            " WHERE id=? AND status=?",
            (
                STATUS[status],
                time.time(),
                job_id,
                STATUS[expect_status],
            ),
        )
        return cur.rowcount == 1

    def history(self, job_id: int) -> list[tuple[int, str]]:
        return self._read(
            "SELECT version, sql_script FROM job_config_history"
            " WHERE job_id=? ORDER BY version",
            (job_id,),
        )

    def history_detail(self, job_id: int, version: int) -> str:
        """jobConfigHistoryDetail verb: one version's full script."""
        rows = self._read(
            "SELECT sql_script FROM job_config_history"
            " WHERE job_id=? AND version=?",
            (job_id, version),
        )
        if not rows:
            raise KeyError(f"no history v{version} for job {job_id}")
        return rows[0][0]

    # -- run log ----------------------------------------------------------

    def log_run(
        self, job_id: int, status: str, query_ids: list[str],
        message: str = "",
    ) -> int:
        cur = self._write(
            "INSERT INTO job_run_log (job_id, started_at, status,"
            " query_ids, message) VALUES (?,?,?,?,?)",
            (job_id, time.time(), status, json.dumps(query_ids), message),
        )
        return cur.lastrowid

    def finish_run(self, run_id: int, status: str, message: str = "") -> None:
        self._write(
            "UPDATE job_run_log SET finished_at=?, status=?, message=?"
            " WHERE id=?",
            (time.time(), status, message, run_id),
        )

    def runs(self, job_id: int) -> list[tuple]:
        return self._read(
            "SELECT id, status, query_ids, message FROM job_run_log"
            " WHERE job_id=? ORDER BY id",
            (job_id,),
        )

    # -- savepoints (checkpoint-location registry) -------------------------

    def add_savepoint(self, job_id: int, checkpoint_location: str) -> None:
        self._write(
            "INSERT INTO savepoint_backup (job_id, checkpoint_location,"
            " created_at) VALUES (?,?,?)",
            (job_id, checkpoint_location, time.time()),
        )

    def savepoints(self, job_id: int) -> list[str]:
        return [p for _, p in self.savepoints_with_ids(job_id)]

    def savepoints_with_ids(self, job_id: int) -> list[tuple[int, str]]:
        """(savepoint row id, checkpoint location) pairs — the id is
        what restore-by-savepoint verbs reference (savepoint_backup.id,
        flink_web.sql:132-145)."""
        return [
            (r[0], r[1])
            for r in self._read(
                "SELECT id, checkpoint_location FROM savepoint_backup"
                " WHERE job_id=? ORDER BY id",
                (job_id,),
            )
        ]

    # -- alarms -----------------------------------------------------------

    def log_alarm(self, job_id: int, alarm_type: str, message: str) -> None:
        self._write(
            "INSERT INTO alart_log (job_id, alarm_type, message,"
            " created_at) VALUES (?,?,?,?)",
            (job_id, alarm_type, message, time.time()),
        )

    def alarms(self, job_id: int) -> list[tuple[str, str]]:
        return self._read(
            "SELECT alarm_type, message FROM alart_log WHERE job_id=?"
            " ORDER BY id",
            (job_id,),
        )

    # -- per-job alarm channels (job_alarm_config, flink_web.sql:190-204) --

    def set_alarm_types(self, job_id: int, types: list[str]) -> None:
        bad = [t for t in types if t not in ALARM_TYPES]
        if bad:
            raise ValueError(f"unknown alarm types {bad}; use {ALARM_TYPES}")
        with self._lock:
            self._db.execute(
                "DELETE FROM job_alarm_config WHERE job_id=?", (job_id,)
            )
            for t in types:
                self._db.execute(
                    "INSERT INTO job_alarm_config (job_id, alarm_type)"
                    " VALUES (?,?)",
                    (job_id, t),
                )
            self._db.commit()

    def alarm_types(self, job_id: int) -> list[str]:
        return [
            r[0]
            for r in self._read(
                "SELECT alarm_type FROM job_alarm_config WHERE job_id=?"
                " ORDER BY id",
                (job_id,),
            )
        ]

    # -- system_config (k/v; SysConfigEnum.java:19-54 keys) ----------------

    def set_config(self, key: str, val: str) -> None:
        self._write(
            "INSERT INTO system_config (key, val) VALUES (?,?)"
            " ON CONFLICT(key) DO UPDATE SET val=excluded.val",
            (key, val),
        )

    def get_config(self, key: str, default: str | None = None) -> str | None:
        rows = self._read(
            "SELECT val FROM system_config WHERE key=?", (key,)
        )
        return rows[0][0] if rows else default

    # -- users + login tokens (user table, flink_web.sql:171-187) ----------

    def add_user(self, username: str, password: str) -> int:
        salt = secrets.token_hex(8)
        digest = hashlib.sha256((salt + password).encode()).hexdigest()
        cur = self._write(
            "INSERT INTO user (username, salt, digest, created_at)"
            " VALUES (?,?,?,?)",
            (username, salt, digest, time.time()),
        )
        return cur.lastrowid

    def has_users(self) -> bool:
        return bool(self._read("SELECT 1 FROM user LIMIT 1"))

    def login(self, username: str, password: str) -> str:
        """Check credentials; return a bearer token for the REST tier."""
        rows = self._read(
            "SELECT salt, digest FROM user WHERE username=? AND status=1",
            (username,),
        )
        if not rows:
            raise PermissionError("bad credentials")
        salt, digest = rows[0]
        import hmac

        if not hmac.compare_digest(
            hashlib.sha256((salt + password).encode()).hexdigest(), digest
        ):
            raise PermissionError("bad credentials")
        token = secrets.token_hex(16)
        with self._lock:
            # one live token per user: re-login rotates, which bounds
            # the token dict AND invalidates a previously-leaked token
            self._tokens = {
                t: u for t, u in self._tokens.items() if u != username
            }
            self._tokens[token] = username
        return token

    def check_token(self, token: str | None) -> str | None:
        with self._lock:
            return self._tokens.get(token or "")

    def logout(self, token: str) -> None:
        with self._lock:
            self._tokens.pop(token, None)

    # -- ip_status heartbeat / leader (flink_web.sql:31-44) ----------------

    def heartbeat(self, ip: str) -> None:
        self._write(
            "INSERT INTO ip_status (ip, last_time) VALUES (?,?)"
            " ON CONFLICT(ip) DO UPDATE SET last_time=excluded.last_time",
            (ip, time.time()),
        )

    def is_leader(self, ip: str, liveness_sec: float = 120.0) -> bool:
        """Leader = lexicographically-smallest live instance (the
        reference gates its scheduler the same way so only one web
        instance sweeps — IpStatusService.isLeader)."""
        rows = self._read(
            "SELECT ip FROM ip_status WHERE last_time >= ? ORDER BY ip"
            " LIMIT 1",
            (time.time() - liveness_sec,),
        )
        return bool(rows) and rows[0][0] == ip
