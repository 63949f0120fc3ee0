"""spark-submit --py-files launchability (north rule): the package must
run driver AND executor side when resolved ONLY from the built zip —
the sandbox's faithful local[] version of shipping the package to a
multi-executor cluster via --py-files. The child process gets a scratch
cwd and a sys.path whose only eo_tools_spark source is the zip; the job
crosses a Python-worker stage (mapInPandas langid) so worker processes
must import package code through the shipped artifact too."""

import os
import subprocess
import sys
import zipfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

CHILD = """
import sys
zip_path = sys.argv[1]
# the zip is the ONLY way to reach the package (repo dir scrubbed)
sys.path[:] = [p for p in sys.path if "repo" not in p]
sys.path.insert(0, zip_path)
import eo_tools_spark
assert zip_path in eo_tools_spark.__file__, eo_tools_spark.__file__

from eo_tools_spark.session import get_spark
spark = get_spark("submit-zip", cores=2, shuffle_partitions=2)
spark.sparkContext.setLogLevel("ERROR")
# --py-files analog: ship the zip to executors' python workers
spark.sparkContext.addPyFile(zip_path)

import numpy as np
from eo_tools_spark.operators.tiles import raster_to_tiles, tiles_map, tiles_to_raster

# mapInPandas kernel: its closure references module-level package
# globals (_decode / TILE_SCHEMA), so executor python workers must
# import eo_tools_spark.operators.tiles — resolvable only via the
# shipped zip (the --py-files contract)
arr = (np.arange(64 * 64).reshape(64, 64) - 2000).astype(np.float32)
tiles = raster_to_tiles(spark, arr, "r", 32)
out = tiles_map(tiles, np.abs, "f4", "amp")
got = tiles_to_raster(out, 32)
assert np.array_equal(got, np.abs(arr)), "executor-side op wrong"
spark.stop()
print("ZIP_JOB_OK")
"""


def test_job_runs_from_zip_only(tmp_path):
    sys.path.insert(0, os.path.join(REPO, "scripts"))
    from make_submit_zip import build

    zip_path = build(str(tmp_path / "eo_tools_spark.zip"))
    # sanity: all package modules are in the artifact
    names = zipfile.ZipFile(zip_path).namelist()
    assert "eo_tools_spark/__init__.py" in names
    assert any(n.startswith("eo_tools_spark/operators/") for n in names)

    script = tmp_path / "job.py"
    script.write_text(CHILD)
    env = {k: v for k, v in os.environ.items() if k != "PYTHONPATH"}
    out = subprocess.run(
        [sys.executable, str(script), zip_path],
        cwd=str(tmp_path), env=env, capture_output=True, text=True, timeout=300,
    )
    assert out.returncode == 0, out.stderr[-3000:]
    assert "ZIP_JOB_OK" in out.stdout


def test_zip_is_deterministic(tmp_path):
    sys.path.insert(0, os.path.join(REPO, "scripts"))
    from make_submit_zip import build

    a = build(str(tmp_path / "a.zip"))
    b = build(str(tmp_path / "b.zip"))
    assert open(a, "rb").read() == open(b, "rb").read()
