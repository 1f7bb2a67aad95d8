"""Ship the engine package to Spark workers (the --py-files story).

Python workers deserialize cloudpickled applyInPandas/mapInPandas
functions that reference ``engine.*`` modules, so the package must be
importable on every worker. On a real cluster that's
``spark-submit --py-files engine.zip``; for a session we didn't launch
(the driver harness hands us one), ``ensure_shipped`` zips this package
deterministically and registers it with ``SparkContext.addPyFile`` —
idempotent per content hash, works mid-session in local and cluster
mode alike.
"""

from __future__ import annotations

import hashlib
import os
import tempfile
import uuid
import zipfile

from pyspark.sql import SparkSession

_shipped: set[tuple[str, str]] = set()


def build_zip(dest_dir: str | None = None) -> str:
    """Create a content-addressed zip of the engine package."""
    pkg_dir = os.path.dirname(os.path.abspath(__file__))
    files = sorted(
        f for f in os.listdir(pkg_dir) if f.endswith(".py")
    )
    h = hashlib.sha256()
    for f in files:
        with open(os.path.join(pkg_dir, f), "rb") as fh:
            h.update(f.encode())
            h.update(fh.read())
    dest_dir = dest_dir or tempfile.gettempdir()
    zpath = os.path.join(dest_dir, f"engine-{h.hexdigest()[:16]}.zip")
    if not os.path.exists(zpath):
        # uuid-suffixed tmp: a FIXED tmp name let two concurrent
        # builders truncate each other's partial archive and install a
        # corrupt zip at the content-addressed (cached-forever) path
        tmp = f"{zpath}.tmp.{uuid.uuid4().hex[:8]}"
        with zipfile.ZipFile(tmp, "w", zipfile.ZIP_DEFLATED) as z:
            for f in files:
                z.write(os.path.join(pkg_dir, f), arcname=f"engine/{f}")
        os.replace(tmp, zpath)  # atomic; concurrent builders converge
    return zpath


def ensure_shipped(spark: SparkSession) -> None:
    zpath = build_zip()
    # key on applicationId, NOT id(sparkContext): CPython can reuse a
    # stopped context's address for a new one, which would silently
    # skip the addPyFile and break every worker import
    key = (spark.sparkContext.applicationId, zpath)
    if key in _shipped:
        return
    spark.sparkContext.addPyFile(zpath)
    _shipped.add(key)
