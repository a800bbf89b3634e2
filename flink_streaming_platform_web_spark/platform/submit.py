"""spark-submit command builder — ``CommandUtil`` rebuilt
(flink-streaming-web-common/src/main/java/com/flink/streaming/web/common/util/CommandUtil.java:29-114).

The reference shells out ``flink run -d [-s savepoint] [-C extjar]
-c <main> <core jar> -sql <file> <ckpt args> -type <n>`` and scrapes
stdout for the job id. Here: a pure builder for the spark-submit
argv (LOCAL mode runs in-process and never shells out), with the
reference's CLI whitelist idea applied to spark-submit flags
(CliConfigUtil.checkFlinkRunConfigForYarn:35-49).
"""

from __future__ import annotations

import atexit
import shlex
import shutil as _shutil

# staging dirs created by build_submit_command, awaiting cleanup.
# spark-submit copies --py-files payloads into its own staging area
# at launch, so the dir is only needed until the child process has
# started; a long-lived manager calls cleanup_staging() after each
# child exits (ADVICE r04), and atexit sweeps whatever remains.
_STAGING_DIRS: list[str] = []


def cleanup_staging(min_age_seconds: float = 0.0) -> int:
    """Delete staging dirs older than ``min_age_seconds``; returns the
    count removed. The age guard lets a reconcile sweep run safely
    while another job's spark-submit child is still shipping its
    freshly-staged zip."""
    import os
    import time

    n = 0
    keep: list[str] = []
    while _STAGING_DIRS:
        d = _STAGING_DIRS.pop()
        try:
            age = time.time() - os.path.getmtime(d)
        except OSError:
            n += 1  # already gone
            continue
        if age >= min_age_seconds:
            _shutil.rmtree(d, ignore_errors=True)
            n += 1
        else:
            keep.append(d)
    _STAGING_DIRS.extend(keep)
    return n


atexit.register(cleanup_staging)

# spark-submit analog of the reference's -p/-yjm/-ytm/-ys/-yqu/-yD
# whitelist (CliConfigUtil.java:138-150)
ALLOWED_FLAGS = {
    "--num-executors",
    "--executor-memory",
    "--executor-cores",
    "--driver-memory",
    "--queue",
    "--conf",
}


class SubmitConfigError(ValueError):
    pass


def check_run_config(extra_args: list[str]) -> None:
    """Whitelist validation, reference-style: unknown flags are
    rejected up front rather than surfacing as submit failures."""
    for a in extra_args:
        if a.startswith("--") and a.split("=", 1)[0] not in ALLOWED_FLAGS:
            raise SubmitConfigError(f"flag not allowed: {a!r}")


def build_submit_command(
    sql_file: str,
    job_type: str = "streaming",
    master: str = "yarn",
    checkpoint_dir: str | None = None,
    restore_checkpoint: str | None = None,
    extra_args: list[str] | None = None,
    ext_jars: list[str] | None = None,
    py_files: list[str] | None = None,
) -> list[str]:
    """argv for cluster-mode submission of a SQL job script. The
    restore path maps the reference's ``-s <savepointPath>``
    (CommandUtil.java:34-36) to re-using a checkpoint location;
    ``ext_jars`` maps its custom-connector ``-C <url>`` classpath
    append (CommandUtil.java:42-47) to ``--jars``, and ``py_files``
    ships Python connector plugins (sources/registry.py plugin
    registry) to the executors."""
    import shutil
    import tempfile
    from pathlib import Path

    extra = list(extra_args or [])
    check_run_config(extra)
    cmd = [
        "spark-submit",
        "--master", master,
        "--deploy-mode", "cluster",
    ]
    if ext_jars:
        cmd += ["--jars", ",".join(ext_jars)]
    # cluster deploy-mode runs the driver on a cluster node: BOTH the
    # engine package and the SQL script must ship with the submission
    # — without them the launcher dies with ModuleNotFoundError /
    # FileNotFoundError on any non-shared-filesystem cluster. The
    # package ships as a zip on --py-files; the script ships via
    # --files and is referenced by basename (YARN localizes it into
    # the driver's working directory).
    pkg_dir = Path(__file__).resolve().parents[1]
    # unique per-call staging dir: a fixed shared-tempdir name let a
    # concurrent submission overwrite the archive while another
    # spark-submit was still shipping it (truncated --py-files
    # payload), and a predictable /tmp path is tamperable on
    # multi-user hosts (ADVICE r03)
    stage = tempfile.mkdtemp(prefix="sspw_submit_")
    _STAGING_DIRS.append(stage)
    pkg_zip = shutil.make_archive(
        str(Path(stage) / pkg_dir.name), "zip", pkg_dir.parent, pkg_dir.name
    )
    cmd += ["--py-files", ",".join([pkg_zip, *(py_files or [])])]
    cmd += ["--files", sql_file]
    launcher = str(Path(__file__).resolve().parent / "launcher.py")
    cmd += [
        *extra,
        launcher,
        "run",
        "--sql-file", Path(sql_file).name,
        "--job-type", job_type,
    ]
    ckpt = restore_checkpoint or checkpoint_dir
    if ckpt:
        cmd += ["--checkpoint-dir", ckpt]
    return cmd


def build_local_submit_command(
    sql_file: str,
    job_type: str = "streaming",
    master: str = "local[2]",
    checkpoint_dir: str | None = None,
    restore_checkpoint: str | None = None,
    extra_args: list[str] | None = None,
    drain: bool = True,
    stop_file: str | None = None,
) -> list[str]:
    """argv for a LOCAL submission that still execs a real
    ``spark-submit`` child — the reference's LOCAL deploy mode also
    shells out (``flink run`` via Runtime.exec,
    CommandRpcClinetAdapterImpl.java:48-70); only the cluster is
    absent. The child prints a structured JSON handshake line
    (``{"marker": "job-submitted-success", ...}`` — the typed analog
    of the reference's scraped ``job-submitted-success:<jobID>``
    stdout marker, SystemConstant.java:29-31) which the manager
    parses instead of scraping free text.

    ``drain`` adds ``--await``: the child processes all available
    input and exits 0 — the deterministic-test mode; without it the
    child blocks on awaitAnyTermination like a long-running job."""
    extra = list(extra_args or [])
    check_run_config(extra)
    from pathlib import Path

    launcher = str(Path(__file__).resolve().parent / "launcher.py")
    cmd = [
        "spark-submit",
        "--master", master,
        *extra,
        launcher,
        "run",
        "--sql-file", sql_file,
        "--job-type", job_type,
    ]
    if drain:
        cmd.append("--await")
    if stop_file:
        # cooperative stop channel for no-await children: SIGTERM to
        # spark-submit kills the python driver without running any
        # handler, so Flink-`stop`-style draining needs a marker the
        # child polls (the RPC analog of `flink stop <jobId>`)
        cmd += ["--stop-file", stop_file]
    ckpt = restore_checkpoint or checkpoint_dir
    if ckpt:
        cmd += ["--checkpoint-dir", ckpt]
    return cmd


def render(cmd: list[str]) -> str:
    return " ".join(shlex.quote(c) for c in cmd)
