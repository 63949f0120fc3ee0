#!/usr/bin/env python
"""Build dist/eo_tools_spark.zip for spark-submit --py-files.

Thin CLI kept for the documented `python scripts/make_pyfiles.py`
workflow (scripts/flagship_job.py header); the actual builder is
make_submit_zip.build — deterministic entries (sorted, zeroed
timestamps) so identical sources produce identical artifact bytes.
"""

import os

from make_submit_zip import build

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def main() -> None:
    print(build(os.path.join(ROOT, "dist", "eo_tools_spark.zip")))


if __name__ == "__main__":
    main()
