"""Deployment helpers.

``ship_package`` is the programmatic equivalent of
``spark-submit --py-files fast_pdf_parser_spark.zip`` (the north-rule run
mode): it zips this package (code + the vocab data file) and registers the
archive with the SparkContext so every executor's Python worker can import
it, regardless of the driver's cwd/sys.path.
"""

from __future__ import annotations

import os
import tempfile
import zipfile

_SHIPPED: set[int] = set()


def package_root() -> str:
    return os.path.dirname(os.path.abspath(__file__))


def build_package_zip(dest_dir: str | None = None) -> str:
    """Zip the package importably (fast_pdf_parser_spark/** at archive root).

    Written to a unique temp name then atomically renamed into place, so
    concurrent driver processes (multiple local JVMs, parallel test runs)
    never observe a half-written archive — each writer produces a complete
    zip and os.replace is atomic within the same filesystem.
    """
    root = package_root()
    parent = os.path.dirname(root)
    dest_dir = dest_dir or tempfile.gettempdir()
    zip_path = os.path.join(dest_dir, "fast_pdf_parser_spark.zip")
    fd, tmp_path = tempfile.mkstemp(suffix=".zip", dir=dest_dir)
    os.close(fd)
    try:
        with zipfile.ZipFile(tmp_path, "w", zipfile.ZIP_DEFLATED) as zf:
            for dirpath, dirnames, filenames in os.walk(root):
                dirnames[:] = [d for d in dirnames if d != "__pycache__"]
                for name in filenames:
                    if name.endswith(".pyc"):
                        continue
                    full = os.path.join(dirpath, name)
                    zf.write(full, os.path.relpath(full, parent))
        os.replace(tmp_path, zip_path)
    finally:
        if os.path.exists(tmp_path):
            os.unlink(tmp_path)
    return zip_path


def ship_package(spark) -> None:
    """Make this package importable on all executors (idempotent per context)."""
    sc = spark.sparkContext
    key = id(sc)
    if key in _SHIPPED:
        return
    sc.addPyFile(build_package_zip())
    _SHIPPED.add(key)
