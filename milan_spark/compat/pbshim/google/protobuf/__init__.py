"""Redirect ``google.protobuf`` to a vendored pure-python protobuf runtime.

Spark's ``transformWithStateInPandas`` talks to the JVM state server over a
protobuf protocol (``pyspark/sql/streaming/proto/StateMessage_pb2.py``) and
hard-requires ``google.protobuf`` in the driver worker and every executor
worker. Containers without a pip-installed protobuf can still carry one: the
Google Cloud SDK ships a vendored pure-python runtime with imports rewritten
to ``cloudsdk.google.protobuf``. This package, when placed on ``sys.path``
(only ever done when the real package is absent — see
``milan_spark.session.ensure_protobuf``), loads that vendored runtime and
registers it as ``google.protobuf``.

Two gaps are bridged:
- submodule imports (``google.protobuf.descriptor`` …) resolve through a
  meta-path finder to the ``cloudsdk.``-prefixed modules, so every module is
  loaded exactly once under its canonical vendored name (no duplicate class
  identities);
- protobuf >= 5 generated code validates the runtime version via
  ``google.protobuf.runtime_version``, which the vendored 4.x runtime
  predates; a permissive stand-in is registered (the wire format of the
  StateMessage protocol is plain proto3, which the 4.x runtime parses fine —
  verified end-to-end by tests/test_stateful_tws.py).
"""
import importlib
import importlib.machinery
import sys
import types

_THIRD = "/usr/lib/google-cloud-sdk/lib/third_party"
if _THIRD not in sys.path:
    sys.path.append(_THIRD)

from cloudsdk.google import protobuf as _pb  # noqa: E402


class _Loader:
    def __init__(self, mod):
        self._mod = mod

    def create_module(self, spec):
        return self._mod

    def exec_module(self, mod):
        pass


class _Finder:
    def find_spec(self, fullname, path=None, target=None):
        if not fullname.startswith("google.protobuf."):
            return None
        try:
            mod = importlib.import_module("cloudsdk." + fullname)
        except ImportError:
            return None
        return importlib.machinery.ModuleSpec(fullname, _Loader(mod))


sys.meta_path.insert(0, _Finder())

_rv = types.ModuleType("google.protobuf.runtime_version")


class _Domain:
    GOOGLE_INTERNAL = 1
    PUBLIC = 2


_rv.Domain = _Domain
_rv.ValidateProtobufRuntimeVersion = lambda *a, **k: None
sys.modules["google.protobuf.runtime_version"] = _rv
sys.modules["cloudsdk.google.protobuf.runtime_version"] = _rv
_pb.runtime_version = _rv

# future lookups of google.protobuf resolve to the vendored module itself
sys.modules[__name__] = _pb
