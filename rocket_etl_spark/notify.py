"""Run notifications — the engine's analog of the reference's
``engine/notify.py`` [U] (per-run Slack success/failure messages).

A notifier is any callable ``(event: dict) -> None``.  The engine calls
it with ``{"kind": "job"|"epoch"|"stream", "name", "status":
"success"|"failure", ...stats}`` — job completion from ``run_job``,
per-epoch commits and stream completion from ``replay_stream``.
Notification failures never fail the run (exactly the reference's
``mute``-tolerant behavior): they are swallowed after a best-effort
stderr note.

``FileNotifier`` is the offline default sink (JSON lines, easy to tail
or assert on).  ``webhook_notifier`` is the Slack-shaped production
transport, socket-gated like every network touchpoint in this repo.
"""

from __future__ import annotations

import json
import sys
from pathlib import Path
from typing import Callable

Notifier = Callable[[dict], None]


class FileNotifier:
    """Append one JSON line per event to a local file."""

    def __init__(self, path: str | Path):
        self.path = Path(path)
        self.path.parent.mkdir(parents=True, exist_ok=True)

    def __call__(self, event: dict) -> None:
        with open(self.path, "a") as f:
            f.write(json.dumps(event, default=str) + "\n")


def webhook_notifier(url: str) -> Notifier:
    """POST each event as JSON to a webhook (Slack-compatible shape).
    The socket call is the only transport-bound line."""

    def notify(event: dict) -> None:
        import urllib.request

        req = urllib.request.Request(
            url,
            data=json.dumps(event, default=str).encode(),
            headers={"Content-Type": "application/json"},
        )
        urllib.request.urlopen(req, timeout=30)  # noqa: S310 - caller-chosen URL

    return notify


def safe_notify(notifier: Notifier | None, event: dict) -> None:
    """Deliver best-effort: a broken notifier must never fail the run."""
    if notifier is None:
        return
    try:
        notifier(event)
    except Exception as e:  # noqa: BLE001 - deliberately broad: notify-only path
        print(f"[rocket_etl_spark] notifier failed (ignored): {e}", file=sys.stderr)
