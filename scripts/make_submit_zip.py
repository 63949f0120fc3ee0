"""Build the spark-submit --py-files artifact.

The north rule's launch mode is ``spark-submit --py-files
eo_tools_spark.zip job.py`` on a multi-executor cluster: the driver and
every executor resolve the package from the shipped zip, so the package
must be importable from a zip path (no ``__file__``-relative data
loading, no import-time filesystem access). This script builds that zip
deterministically (sorted entries, zeroed timestamps → identical bytes
for identical sources, so cluster caches / checksum-based deploy tools
see an unchanged artifact when nothing changed).

Usage:
    python scripts/make_submit_zip.py [out.zip]   # default dist/eo_tools_spark.zip
"""

from __future__ import annotations

import os
import sys
import zipfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def build(out_path: str) -> str:
    pkg_root = os.path.join(REPO, "eo_tools_spark")
    entries = []
    for dirpath, dirnames, filenames in os.walk(pkg_root):
        dirnames[:] = [d for d in dirnames if d != "__pycache__"]
        for fn in filenames:
            if fn.endswith(".py"):
                full = os.path.join(dirpath, fn)
                entries.append((os.path.relpath(full, REPO), full))
    entries.sort()
    os.makedirs(os.path.dirname(os.path.abspath(out_path)), exist_ok=True)
    with zipfile.ZipFile(out_path, "w", zipfile.ZIP_DEFLATED) as z:
        for arcname, full in entries:
            info = zipfile.ZipInfo(arcname, date_time=(1980, 1, 1, 0, 0, 0))
            info.compress_type = zipfile.ZIP_DEFLATED
            info.external_attr = 0o644 << 16
            with open(full, "rb") as f:
                z.writestr(info, f.read())
    return out_path


if __name__ == "__main__":
    out = sys.argv[1] if len(sys.argv) > 1 else os.path.join(
        REPO, "dist", "eo_tools_spark.zip"
    )
    path = build(out)
    print(path, os.path.getsize(path), "bytes")
