"""Alarm channels — flink-streaming-web-alarm rebuilt.

- webhook: DingDing-style JSON text message POST
  (DingDingAlarmImpl.send:29-56 — payload shape preserved)
- callback: GET/POST to a user URL with (appId, jobName, deployMode)
  (ApiController.alarmCallback:29-33; manual docs/manual-sql.md §3.b)
- AUTO_START_JOB is a manager-level policy flag, not a channel
  (AlarmTypeEnum.java:13-15)
"""

from __future__ import annotations

import json
import urllib.error
import urllib.request


def send_webhook(url: str, content: str, timeout: float = 5.0) -> bool:
    """DingDing-compatible text message."""
    payload = json.dumps(
        {"msgtype": "text", "text": {"content": content}}
    ).encode()
    req = urllib.request.Request(
        url, data=payload, headers={"Content-Type": "application/json"}
    )
    try:
        with urllib.request.urlopen(req, timeout=timeout) as resp:
            return 200 <= resp.status < 300
    except (urllib.error.URLError, OSError):
        return False


def send_callback(
    url: str,
    app_id: str,
    job_name: str,
    deploy_mode: str,
    method: str = "POST",
    timeout: float = 5.0,
) -> bool:
    params = {"appId": app_id, "jobName": job_name, "deployMode": deploy_mode}
    try:
        if method.upper() == "GET":
            from urllib.parse import urlencode

            with urllib.request.urlopen(
                f"{url}?{urlencode(params)}", timeout=timeout
            ) as resp:
                return 200 <= resp.status < 300
        req = urllib.request.Request(
            url,
            data=json.dumps(params).encode(),
            headers={"Content-Type": "application/json"},
        )
        with urllib.request.urlopen(req, timeout=timeout) as resp:
            return 200 <= resp.status < 300
    except (urllib.error.URLError, OSError):
        return False
