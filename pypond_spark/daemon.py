"""Custom PySpark worker daemon that preloads heavy modules.

Spark kills idle Python workers after a HARD-CODED one minute
(``PythonWorkerFactory.IDLE_WORKER_TIMEOUT_NS``), so any Python stage
arriving more than a minute after the previous one pays a full
fork-and-import storm: N fresh workers each importing numpy/pandas/
pyarrow (plus this package) before the first Arrow batch moves.
Measured on the bench host: a trivial 32-partition ``mapInPandas``
costs ~5 s with cold workers and ~0.3 s with warm ones.

The daemon process forks every worker, and ``fork()`` inherits the
parent's imported modules copy-on-write — so importing the heavy
modules HERE, once per executor, makes every subsequent worker fork
inherit them at zero cost.  This is the documented purpose of
``spark.python.daemon.module`` (pyspark ships the plain
``pyspark.daemon``; pointing the conf at a wrapper that preloads and
then delegates to ``pyspark.daemon.manager`` is the standard recipe).

Set via ``spark.python.daemon.module=pypond_spark.daemon`` (see
``session.py``, overridable with ``$SPARK_GRAFT_DAEMON``).  The
module must be importable from the worker's static ``PYTHONPATH`` —
``session.py`` appends this package's parent directory to
``spark.executorEnv.PYTHONPATH`` for exactly that reason.  Preload
failures are non-fatal: a worker that needs a module the daemon could
not import simply imports it itself, as before.
"""

from __future__ import annotations

import importlib

for _mod in (
    "numpy",
    "pandas",
    "pyarrow",
    # the serializer path every Arrow stage touches
    "pyspark.sql.pandas.serializers",
    "pyspark.sql.pandas.types",
    # this package's heavy per-row operator modules (codecs pull in
    # numpy and each other); workers otherwise import them per fork.
    # Guarded: on a deployment where the package reaches workers only
    # via the shipped zip (not the static PYTHONPATH) these fail
    # harmlessly and workers import from the zip as before.
    "pypond_spark.datapipe.multimodal",
    "pypond_spark.datapipe.jpeg",
    "pypond_spark.datapipe.y4m",
    "pypond_spark.datapipe.pdf",
    "pypond_spark.datapipe.tarshard",
    "pypond_spark.datapipe.flac",
    "pypond_spark.datapipe.tiff",
    "pypond_spark.datapipe.zipdoc",
):
    try:
        importlib.import_module(_mod)
    except Exception:  # pragma: no cover - absent optional dep
        pass

from pyspark.daemon import manager  # noqa: E402

if __name__ == "__main__":
    manager()
