"""Auto-loaded by Python's site machinery when this directory is on
$PYTHONPATH — which is how Spark's forked Python WORKERS (pyspark.daemon)
get the protobuf bridge too, not just the driver process.

This container has no protobuf wheel and installs are forbidden, but a
protobuf runtime (6.32) already sits on disk inside the installed
google-cloud-sdk. PySpark's generated StateMessage_pb2 (gencode 6.33)
refuses a runtime one minor older via its strict version gate even though
adjacent minors are wire-compatible, so when — and only when — the real
wheel is absent, this shim appends the SDK runtime to sys.path and
no-ops the gate. On any normally-provisioned cluster the real wheel wins
and this file does nothing.

Enabled by autonomous_orchestrator_ai_spark.testing.pbcompat — see the
caveats there (the bypass is scoped to this sandbox; a production deploy
should `pip install protobuf>=4` instead).
"""

import os
import sys

_SDK = "/usr/lib/google-cloud-sdk/platform/google_appengine"

try:
    try:
        import google.protobuf as _pb
    except Exception:
        if not os.path.isdir(_SDK):
            raise
        sys.path.append(_SDK)  # append: never shadow real site-packages
        import google.protobuf as _pb
    # no-op the strict gencode/runtime gate ONLY when the import resolved
    # to the SDK bundle (a real wheel keeps its gate)
    if os.path.abspath(_pb.__file__).startswith(_SDK):
        import google.protobuf.runtime_version as _rv

        _rv.ValidateProtobufRuntimeVersion = lambda *a, **k: None
except Exception:
    pass  # leave the environment as found; callers re-check
