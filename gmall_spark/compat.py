"""Container-environment shims. Nothing is installed — these only wire up
libraries the image already ships but doesn't expose on sys.path."""

from __future__ import annotations

import importlib.util
import os
import sys

#: the machine's gcloud SDK vendors a modern pure-python protobuf runtime
#: (6.32) that the image's site-packages lacks
_GCLOUD_APPENGINE = "/usr/lib/google-cloud-sdk/platform/google_appengine"


def ensure_protobuf() -> bool:
    """Make ``google.protobuf`` importable when the image lacks it, using the
    gcloud-vendored pure-python runtime. pyspark 4's generated TWS state
    stubs are gencode 6.33; the vendored runtime is 6.32 — one minor behind,
    which protobuf's runtime check flags conservatively. The descriptor and
    (de)serialization paths the transformWithStateInPandas protocol uses are
    unaffected by that skew (the equivalence tests this enables exercise the
    full round-trip), so the check is relaxed via protobuf's own documented
    escape hatch. Must run BEFORE the first Python worker spawns: workers
    inherit this process's env in local mode (executorEnv carries the same
    vars on a real cluster). Returns False when neither a real install nor
    the vendored copy is available (tests then skip as before)."""
    try:
        if importlib.util.find_spec("google.protobuf") is not None:
            return True
    except ModuleNotFoundError:  # no 'google' namespace at all
        pass
    if not os.path.isdir(os.path.join(_GCLOUD_APPENGINE, "google", "protobuf")):
        return False
    os.environ.setdefault("TEMPORARILY_DISABLE_PROTOBUF_VERSION_CHECK", "true")
    if _GCLOUD_APPENGINE not in sys.path:
        sys.path.insert(0, _GCLOUD_APPENGINE)
    pp = os.environ.get("PYTHONPATH", "")
    if _GCLOUD_APPENGINE not in pp.split(os.pathsep):
        os.environ["PYTHONPATH"] = _GCLOUD_APPENGINE + (os.pathsep + pp if pp else "")
    try:
        import google.protobuf  # noqa: F401

        return True
    except Exception:
        # a 'google' namespace package cached BEFORE the path insert (any
        # earlier failed import in the same process) can shadow the vendored
        # tree; drop ONLY the stale namespace root and the protobuf subtree
        # and retry once. Unrelated google.* subpackages (google.cloud etc.)
        # stay cached — evicting them would leave any module already holding
        # a reference on the old objects while later imports build fresh
        # ones (split-brain module state).
        for mod in [
            m
            for m in list(sys.modules)
            if m in ("google", "google.protobuf") or m.startswith("google.protobuf.")
        ]:
            del sys.modules[mod]
        try:
            import google.protobuf  # noqa: F401

            return True
        except Exception:
            return False
