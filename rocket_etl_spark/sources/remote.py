"""Remote connectors: HTTP(S) / SFTP fetch-to-dir, then ``spark.read``.

The reference's most-used source type is a remote file (upstream
``HTTPConnector`` / ``RemoteFileConnector`` / ``SFTPConnector`` in
``pipeline/connectors.py`` [U], SURVEY.md §2.1 S2/S3): download to a
local temp file on the driver, then extract.  The engine keeps that
exact shape — a remote source is a *driver-side staging step* ahead of a
distributed ``spark.read`` — because executors must all see the data,
and a once-per-job download is not the bottleneck of a 10^10-event
pipeline (the change stream itself arrives via the streaming source,
not this path).

Transport isolation: everything except the socket is plain code, so
``file://`` URLs exercise the full fetch → checksum → read pipeline in
tests; only ``_open_http`` / ``_open_sftp`` touch the network and fail
cleanly in this offline sandbox (SURVEY.md §0: no network).
"""

from __future__ import annotations

import shutil
import urllib.parse
import urllib.request
from pathlib import Path

from rocket_etl_spark.sources.readers import source_checksum


def _open_http(url: str):
    """The HTTP transport boundary — the ONLY line that needs a network.
    urllib is stdlib; auth/retry policy would wrap here."""
    return urllib.request.urlopen(url, timeout=60)  # noqa: S310 (scheme checked by caller)


def _open_sftp(url: str):
    """SFTP transport boundary — import-gated on paramiko (absent here)."""
    try:
        import paramiko  # noqa: F401
    except ImportError as e:  # pragma: no cover - env-dependent
        raise NotImplementedError(
            "sftp connector needs paramiko (not installed in this sandbox)"
        ) from e
    raise NotImplementedError("sftp transport wiring requires a reachable host")


def fetch_to_dir(url: str, dest_dir: str | Path, filename: str | None = None) -> dict:
    """Fetch ``url`` into ``dest_dir``; returns ``{path, checksum, bytes}``.

    ``file://`` (and bare local paths) copy locally — the test transport;
    ``http(s)://`` streams via urllib; ``sftp://`` is paramiko-gated.
    The checksum lands in lineage-adjacent metadata exactly like the
    reference's per-run input checksum (upstream connectors.py [U]).
    """
    parsed = urllib.parse.urlparse(str(url))
    dest_dir = Path(dest_dir)
    dest_dir.mkdir(parents=True, exist_ok=True)
    name = filename or Path(parsed.path).name or "fetched"
    dest = dest_dir / name

    if parsed.scheme in ("", "file"):
        src = Path(parsed.path if parsed.scheme == "file" else str(url))
        if src.is_dir():
            if dest.exists():
                shutil.rmtree(dest)
            shutil.copytree(src, dest)
        else:
            shutil.copy2(src, dest)
    elif parsed.scheme in ("http", "https"):
        with _open_http(str(url)) as resp, open(dest, "wb") as out:
            shutil.copyfileobj(resp, out)
    elif parsed.scheme == "sftp":
        _open_sftp(str(url))
    else:
        raise ValueError(f"unsupported remote scheme {parsed.scheme!r}")

    return {"path": str(dest), "checksum": source_checksum(dest), "bytes": _size(dest)}


def _size(p: Path) -> int:
    if p.is_dir():
        return sum(f.stat().st_size for f in p.rglob("*") if f.is_file())
    return p.stat().st_size
