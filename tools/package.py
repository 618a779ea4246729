"""Build the spark-submit --py-files artifact: rocket_etl_spark.zip.

The north rule ships the engine as a ``--py-files`` package; this is the
one-command builder.  The zip contains only the package sources (no
tests/tools), rooted so ``import rocket_etl_spark`` resolves when Spark
adds the archive to every executor's sys.path.

Usage: python tools/package.py [out.zip]   (default: dist/rocket_etl_spark.zip)
"""

from __future__ import annotations

import sys
import zipfile
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent


def build(out: str | Path | None = None) -> Path:
    out = Path(out) if out else REPO / "dist" / "rocket_etl_spark.zip"
    out.parent.mkdir(parents=True, exist_ok=True)
    pkg = REPO / "rocket_etl_spark"
    with zipfile.ZipFile(out, "w", zipfile.ZIP_DEFLATED) as z:
        for f in sorted(pkg.rglob("*.py")):
            z.write(f, f.relative_to(REPO))
    return out


if __name__ == "__main__":
    print(build(sys.argv[1] if len(sys.argv) > 1 else None))
