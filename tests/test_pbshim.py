"""pbshim unit tests: protobuf-runtime discovery for the
transformWithStateInPandas state-server protocol (SURVEY §12 item 2).

These run without a SparkSession except where noted; the end-to-end
proof (a real TWS query through driver + workers) lives in
tests/test_streaming.py.
"""

from __future__ import annotations

import os
import types

import pytest

from culvert_spark import pbshim


def test_real_runtime_probe_rejects_namespace_packages():
    """_real_runtime_present must key on find_spec().origin: the
    spark-core jar's google/protobuf class resources import fine as an
    EMPTY namespace package (origin None), which is exactly the false
    positive that broke the first worker-side shim."""
    ok = pbshim._real_runtime_present()
    if ok:
        import google.protobuf as gp

        # A regular package has a real __init__ location.
        assert gp.__file__ is not None
    else:
        # No runtime yet: a plain import either fails or yields a
        # namespace package — both count as "not present".
        try:
            import google.protobuf as gp
        except ImportError:
            pass
        else:
            assert gp.__file__ is None


def test_ensure_protobuf_discovers_runtime_and_roundtrips():
    """On a host with a bundled runtime, ensure_protobuf() must make the
    REAL package importable and pyspark's TWS pb2 module usable
    (gencode may be a minor ahead of the discovered runtime — the pin is
    relaxed)."""
    if not pbshim.ensure_protobuf(worker_env=False):
        pytest.skip("no google.protobuf runtime available on this host")
    import google.protobuf as gp

    assert gp.__file__ is not None  # regular package, not a namespace
    from pyspark.sql.streaming.proto import StateMessage_pb2 as sm

    msg = sm.StateRequest(version=2)
    assert sm.StateRequest.FromString(msg.SerializeToString()).version == 2


def test_ensure_protobuf_is_idempotent():
    first = pbshim.ensure_protobuf(worker_env=False)
    assert pbshim.ensure_protobuf(worker_env=False) == first


def test_ensure_worker_env_prepends_shim_dir_once():
    """ensure_worker_env must add the sitecustomize dir to the context's
    worker environment exactly once (sc.environment entries merge into
    every later-launched Python worker's env)."""
    if not pbshim.ensure_protobuf(worker_env=False):
        pytest.skip("no google.protobuf runtime available on this host")
    fake = types.SimpleNamespace(
        sparkContext=types.SimpleNamespace(environment={})
    )
    pbshim.ensure_worker_env(fake)
    pp = fake.sparkContext.environment.get("PYTHONPATH", "")
    assert pbshim._SITE_DIR in pp.split(os.pathsep)
    pbshim.ensure_worker_env(fake)  # second call: no duplicate entry
    assert (
        fake.sparkContext.environment["PYTHONPATH"].split(os.pathsep).count(
            pbshim._SITE_DIR
        )
        == 1
    )


def test_sitecustomize_is_dependency_free():
    """The worker-side shim must not import anything outside the stdlib
    (workers may not have culvert_spark on their path)."""
    path = os.path.join(pbshim._SITE_DIR, "sitecustomize.py")
    src = open(path).read()
    for line in src.splitlines():
        line = line.strip()
        if line.startswith(("import ", "from ")) and "google.protobuf" not in line:
            mod = line.split()[1].split(".")[0]
            assert mod in ("importlib", "os", "sys"), line
