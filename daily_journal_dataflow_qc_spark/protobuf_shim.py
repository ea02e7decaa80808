"""Activate the vendored pure-Python protobuf runtime when needed.

PySpark's transformWithStateInPandas workers speak protobuf to the JVM
state server (pyspark/sql/streaming/proto/StateMessage_pb2.py). If a real
``google.protobuf`` is importable it always wins; otherwise the _vendor
shim directory is appended to ``sys.path``. Called from the package
__init__, so it runs wherever the package is imported — driver AND Python
workers (the worker unpickles the stateful processor, which imports this
package from the shipped zip before any state-server call; sys.path entries
pointing inside a zip are served by zipimport).
"""

from __future__ import annotations

import importlib
import os
import sys

_VENDOR_DIR = os.path.join(os.path.dirname(os.path.abspath(__file__)), "_vendor")


def ensure_protobuf() -> str:
    """Make ``google.protobuf`` importable; returns 'real' or 'vendored'."""
    try:
        importlib.import_module("google.protobuf")
        return "real"
    except ImportError:
        pass
    if _VENDOR_DIR not in sys.path:
        sys.path.append(_VENDOR_DIR)
    importlib.invalidate_caches()
    # a previously-failed partial 'google' import must not shadow the vendor
    mod = sys.modules.get("google")
    if mod is not None and not hasattr(mod, "protobuf"):
        del sys.modules["google"]
    importlib.import_module("google.protobuf")
    # PySpark's transformWithStateInPandas pre-init runner is a bare Python
    # process the JVM spawns BEFORE any user module loads (the stateful
    # processor arrives pickled by value, so this package never imports
    # there). Workers inherit PYTHONPATH from the JVM, and the JVM inherits
    # it from this process at gateway launch — exporting the vendor dir here
    # (package import always precedes SparkSession creation) makes
    # google.protobuf resolvable in every spawned worker.
    existing = os.environ.get("PYTHONPATH", "")
    parts = existing.split(os.pathsep) if existing else []
    if _VENDOR_DIR not in parts:
        os.environ["PYTHONPATH"] = (
            _VENDOR_DIR + (os.pathsep + existing if existing else "")
        )
    return "vendored"
