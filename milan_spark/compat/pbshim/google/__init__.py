# Shim root for the vendored-protobuf redirect (see protobuf/__init__.py).
# This directory is only placed on sys.path / PYTHONPATH when no real
# google.protobuf is importable (milan_spark.session.ensure_protobuf), so it
# never shadows an actual protobuf installation.
