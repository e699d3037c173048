"""PySpark worker daemon wrapper that exits quietly on shutdown races.

The stock ``pyspark.daemon`` occasionally dies with an uncaught
``BrokenPipeError`` traceback on stderr when the JVM closes a worker
socket mid-write (idle-kill / executor teardown race).  The job outcome
is unaffected — the worker was being discarded — but the traceback lands
in archived benchmark logs and reads like a failure.  This module is a
pure delegation to ``pyspark.daemon.manager`` that turns exactly that
benign EPIPE into a clean exit; every other exception propagates
unchanged.  Enabled via ``spark.python.daemon.module`` in
``knowledgegraph_spark.get_spark`` (the package is on the worker
PYTHONPATH in local mode and shipped like any other dependency on a
cluster).
"""

from __future__ import annotations

import sys

if __name__ == "__main__":
    from pyspark.daemon import manager

    try:
        manager()
    except BrokenPipeError:
        sys.exit(0)
