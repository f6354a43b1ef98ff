"""Runtime-environment compatibility shims.

``transformWithStateInPandas`` (Spark 4's arbitrary-state API v2)
talks to the JVM state server over protobuf, so the Python *driver and
workers* must import ``google.protobuf``. This sandbox has no pip
protobuf, but the Google Cloud SDK ships a pure-python protobuf
runtime (Apache-bundled, BSD-licensed) at a well-known path. Spark's
generated ``StateMessage_pb2`` was built with a marginally newer
gencode (6.33 vs runtime 6.32); protobuf's own escape hatch for
exactly this situation is the documented
``TEMPORARILY_DISABLE_PROTOBUF_VERSION_CHECK`` env var (see
``google/protobuf/runtime_version.py:ValidateProtobufRuntimeVersion``)
— minor-version wire compatibility is guaranteed, only the
conservative "runtime older than gencode" check trips.

Both halves must reach the PYTHON WORKERS, not just the driver:
``ensure_protobuf_env(spark)`` injects them into
``sc.environment``, which pyspark snapshots into every
``SimplePythonFunction``'s ``envVars`` at UDF-creation time
(``pyspark/core/rdd.py:_prepare_for_python_RDD``) and the worker
factory applies to the worker daemon's environment — so it works even
on a SparkSession created by a foreign harness before this module
loaded. Everything here is import-try-gated: when no protobuf runtime
exists on the host, :func:`has_tws_support` returns False and callers
fall back to the ``applyInPandasWithState`` twins.
"""

from __future__ import annotations

import os
import sys

#: Pure-python protobuf runtimes known to exist on this class of host,
#: in preference order (newest first).
_PROTOBUF_PATH_CANDIDATES = (
    "/usr/lib/google-cloud-sdk/platform/google_appengine",
)

_VERSION_CHECK_VAR = "TEMPORARILY_DISABLE_PROTOBUF_VERSION_CHECK"


def _find_protobuf_path() -> str | None:
    try:
        import google.protobuf  # noqa: F401

        return None  # already importable, no path injection needed
    except ImportError:
        pass
    for p in _PROTOBUF_PATH_CANDIDATES:
        if os.path.isdir(os.path.join(p, "google", "protobuf")):
            return p
    return None


def ensure_protobuf_env(spark) -> bool:
    """Make ``google.protobuf`` importable in this driver AND in the
    python workers of ``spark``'s context; returns True when the
    TWS protobuf dependency is satisfied.

    Idempotent; safe to call per-query. Mutating ``sc.environment``
    only affects UDFs created afterwards, which is exactly the
    contract the TWS query builders rely on.
    """
    path = _find_protobuf_path()
    if path is not None and path not in sys.path:
        sys.path.append(path)  # appended: only fills the google.* gap
    os.environ.setdefault(_VERSION_CHECK_VAR, "true")
    try:
        import google.protobuf  # noqa: F401
    except ImportError:
        return False

    env = spark.sparkContext.environment
    env[_VERSION_CHECK_VAR] = "true"
    if path is not None:
        worker_pp = env.get("PYTHONPATH", "")
        if path not in worker_pp.split(os.pathsep):
            env["PYTHONPATH"] = (
                worker_pp + os.pathsep + path if worker_pp else path
            )
    return True


def has_tws_support(spark) -> bool:
    """True when ``transformWithStateInPandas`` can run here: the
    protobuf runtime resolves (driver + workers) and pyspark exposes
    the API."""
    if not ensure_protobuf_env(spark):
        return False
    try:
        from pyspark.sql.streaming.stateful_processor import (  # noqa: F401
            StatefulProcessor,
        )
    except ImportError:
        return False
    return True
