"""Thin spark-submit driver script.

spark-submit takes a script path (not ``-m``), so this forwards argv to the
packaged CLI. The engine package arrives on executors via
``--py-files enpa_spark.zip`` (build with tools/build_pyfiles.py); on the
driver, spark-submit puts the same zip on sys.path before this runs.

  spark-submit --master spark://... --py-files dist/enpa_spark.zip \
      tools/submit_job.py ingest --input ... --output ... --window-start ...
"""

from __future__ import annotations

import sys

from exposure_notifications_private_analytics_ingestion_spark.cli import main

if __name__ == "__main__":
    sys.exit(main(sys.argv[1:]))
