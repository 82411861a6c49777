"""Ship this package to executor Python workers at runtime.

Local-mode sessions created by get_spark() inherit PYTHONPATH, but a session
created by an external harness (the driver contract) may have launched its
JVM before this package was importable. sc.addPyFile() is the
post-JVM-start mechanism Spark provides: the zip is distributed to every
worker and prepended to their sys.path — the same thing spark-submit
--py-files does at submit time.

The zip name embeds a content hash so edits during a session produce a new
artifact instead of a stale cache hit.
"""

from __future__ import annotations

import uuid

import hashlib
import os
import tempfile
import zipfile

_SHIPPED: set[tuple[str, str]] = set()  # (app id, zip path)


def _package_zip() -> str:
    pkg_dir = os.path.dirname(os.path.abspath(__file__))
    root = os.path.dirname(pkg_dir)
    sources = []
    for dirpath, _dirnames, filenames in os.walk(pkg_dir):
        for name in sorted(filenames):
            if name.endswith(".py"):
                sources.append(os.path.join(dirpath, name))
    h = hashlib.md5()
    for p in sorted(sources):
        h.update(p.encode())
        with open(p, "rb") as f:
            h.update(f.read())
    zpath = os.path.join(
        tempfile.gettempdir(), f"blogparser_spark-{h.hexdigest()[:12]}.zip"
    )
    if not os.path.exists(zpath):
        # uuid-suffixed tmp name: two sessions building the zip concurrently
        # (pytest workers, bench + oracle check) must not truncate each
        # other's half-written archive; os.replace publishes atomically
        tmp = f"{zpath}.tmp.{uuid.uuid4().hex[:8]}"
        try:
            with zipfile.ZipFile(tmp, "w") as z:
                for p in sources:
                    z.write(p, os.path.relpath(p, root))
            os.replace(tmp, zpath)
        finally:
            if os.path.exists(tmp):
                os.unlink(tmp)
    return zpath


def ensure_shipped(spark) -> None:
    """Idempotent per (session, package-content): add the package zip to the
    session's Python worker path."""
    try:
        sc = spark.sparkContext
        key = (sc.applicationId, _package_zip())
        if key in _SHIPPED:
            return
        sc.addPyFile(key[1])
        _SHIPPED.add(key)
    except Exception:
        pass  # e.g. Spark Connect without addPyFile — PYTHONPATH must cover it
