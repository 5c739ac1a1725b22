"""Worker-side protobuf shim (see culvert_spark/pbshim.py).

This directory is put on PYTHONPATH (via os.environ before session
launch, or sc.environment afterwards — both reach the worker's env) so
every Python worker the JVM spawns runs this at interpreter startup
(site.py imports the first ``sitecustomize`` on the path). It is
dependency-free by design: workers may not have culvert_spark importable.

Gotcha this guards against: ``import google.protobuf`` SUCCEEDS even
with no runtime installed, because the spark-core jar sits on the worker
sys.path and its ``google/protobuf/*.class`` resources form an empty
NAMESPACE package — so presence is probed via ``find_spec().origin``
(``None`` for a namespace portion, ``.../__init__.py`` for the real
runtime), and stale namespace entries are evicted from sys.modules
before re-import.
"""

import importlib.util
import os
import sys


def _real_runtime_present() -> bool:
    try:
        spec = importlib.util.find_spec("google.protobuf")
    except (ImportError, ValueError):
        return False
    return spec is not None and spec.origin is not None


def _activate() -> None:
    if _real_runtime_present():
        return
    for d in ["/usr/lib/google-cloud-sdk/platform/google_appengine"]:
        if not os.path.isfile(
            os.path.join(d, "google", "protobuf", "internal", "builder.py")
        ):
            continue
        if d not in sys.path:
            sys.path.append(d)
        # find_spec above may have cached 'google' (and children) as a
        # jar-backed namespace package; evict so the re-import sees the
        # regular package that is now reachable.
        for m in [k for k in sys.modules if k == "google"
                  or k.startswith("google.")]:
            del sys.modules[m]
        try:
            from google.protobuf import runtime_version as _rv
        except ImportError:
            return
        _rv.ValidateProtobufRuntimeVersion = lambda *a, **k: None
        return


_activate()
