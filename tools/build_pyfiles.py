"""Build the --py-files archive for cluster submission.

spark-submit ships Python dependencies to executors via a zip on PYTHONPATH
(`--py-files`). This packages the engine package — sources only, no tests,
no caches — deterministically (fixed timestamps, sorted entries) so the
artifact hash is stable for a given tree.

Usage: python tools/build_pyfiles.py [out.zip]   (default: dist/enpa_spark.zip)
"""

from __future__ import annotations

import os
import sys
import zipfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
PKG = "exposure_notifications_private_analytics_ingestion_spark"


def build(out_path: str) -> str:
    os.makedirs(os.path.dirname(out_path) or ".", exist_ok=True)
    entries = []
    for root, dirs, files in os.walk(os.path.join(REPO, PKG)):
        dirs[:] = sorted(d for d in dirs if d != "__pycache__")
        for f in sorted(files):
            if f.endswith(".py"):
                full = os.path.join(root, f)
                entries.append((os.path.relpath(full, REPO), full))
    with zipfile.ZipFile(out_path, "w", zipfile.ZIP_DEFLATED) as z:
        for arcname, full in entries:
            with open(full, "rb") as fh:
                data = fh.read()
            # fixed date_time → byte-identical archive for identical sources
            info = zipfile.ZipInfo(arcname, date_time=(2020, 1, 1, 0, 0, 0))
            info.compress_type = zipfile.ZIP_DEFLATED
            info.external_attr = 0o644 << 16
            z.writestr(info, data)
    return out_path


if __name__ == "__main__":
    out = sys.argv[1] if len(sys.argv) > 1 else os.path.join(REPO, "dist", "enpa_spark.zip")
    print(build(out))
