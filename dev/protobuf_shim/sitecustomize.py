"""DEV/TEST-ONLY protobuf shim for containers without pip access.

Makes a vendored pure-Python protobuf runtime (the google-cloud-sdk
appengine platform ships 6.32.0 as namespace-style ``google/protobuf``)
importable, and no-ops the gencode/runtime version gate (pyspark 4.1's
generated state-server protos are gencode 6.33 — one minor ahead; the
pure-Python runtime is compatible for the messages involved).

Two traps this handles (both observed in Spark python workers):
- probing with ``import google.protobuf`` is NOT enough — jars on the
  worker's PYTHONPATH (spark-core bundles protobuf-java's resource dirs)
  provide EMPTY ``google/protobuf`` namespace portions, so the bare
  import succeeds while every real module inside is missing. Probe for
  ``descriptor`` instead.
- a failed/empty probe leaves namespace modules cached in sys.modules
  whose __path__ predates our append — purge ``google*`` before
  retrying so the appengine portion merges in.

Usage — the shim must reach the WORKERS, so set both:

    PYTHONPATH=dev/protobuf_shim \
    pytest tests/test_streaming_stateful.py  # driver picks it up
    # workers: spark.executorEnv.PYTHONPATH must include the shim dir
    # (tests/conftest.py does this automatically when the shim resolves)

Production installs get a real protobuf via the ``streaming-state``
extra (pyproject.toml); this shim exists so the
transformWithStateInPandas E2E can execute in pip-less sandboxes.
"""

import os
import sys

_SRC = os.environ.get(
    "PROTOBUF_SHIM_SRC", "/usr/lib/google-cloud-sdk/platform/google_appengine"
)
try:
    from google.protobuf import descriptor  # noqa: F401  (real runtime)
except ImportError:
    if os.path.isdir(os.path.join(_SRC, "google", "protobuf")):
        for _k in [
            k for k in list(sys.modules)
            if k == "google" or k.startswith("google.")
        ]:
            del sys.modules[_k]
        if _SRC not in sys.path:
            sys.path.append(_SRC)  # append: never shadow real installs
        import importlib

        importlib.invalidate_caches()
        try:
            from google.protobuf import runtime_version as _rv

            _rv.ValidateProtobufRuntimeVersion = lambda *a, **k: None
        except Exception:
            pass
