"""spark-submit --py-files packaging smoke (VERDICT r4 ask #8).

The north rule names ``spark-submit --py-files`` as the deployment
contract (BASELINE.json). BENCH's scaling harness already exercises it
for throughput; this test runs a DRIVER-GRADED correctness query
through the same packaged artifact: zip ``profet_spark`` →
``spark-submit --py-files profet_spark.zip job.py`` from a scratch cwd
with a scrubbed ``PYTHONPATH`` → the job imports the package FROM THE
ZIP, loads ``__spark_entry__`` by absolute path, runs the
``d1d7_exact_dedup`` graded query at sf0.001, and prints its row count
and fingerprint-sum — compared here against the same query run
in-process. A packaging break (missing module in the zip, import that
only works from the repo checkout, zip-path-hostile resource access)
fails THIS test instead of a production submit."""

import importlib.util
import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SF = "/root/testdata/sf0.001"

_JOB = """
import importlib.util
import json
import sys

# the zip is the ONLY way to reach profet_spark here: cwd is a scratch
# dir and PYTHONPATH was scrubbed by the launcher
spec = importlib.util.spec_from_file_location(
    "__spark_entry__", {entry!r})
mod = importlib.util.module_from_spec(spec)
spec.loader.exec_module(mod)

import profet_spark

assert "profet_spark.zip" in profet_spark.__file__, (
    "package resolved outside the zip: " + profet_spark.__file__)

from pyspark.sql import SparkSession, functions as F

spark = (SparkSession.builder
         .config("spark.sql.shuffle.partitions", "8")
         .config("spark.sql.session.timeZone", "UTC")
         .config("spark.ui.enabled", "false").getOrCreate())
df = mod.queries()["d1d7_exact_dedup"](spark, {sf!r})
row = df.agg(
    F.count("*").alias("n"),
    F.sum(F.crc32(F.concat_ws("|", *sorted(df.columns)))).alias("fp"),
).collect()[0]
print("SMOKE_RESULT " + json.dumps({{"n": row["n"], "fp": int(row["fp"])}}))
spark.stop()
"""


def _load_run_scaling():
    spec = importlib.util.spec_from_file_location(
        "run_scaling", os.path.join(REPO, "BENCH", "run_scaling.py"))
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod



def test_spark_submit_py_files_runs_graded_query(spark, tmp_path):
    rs = _load_run_scaling()
    zpath = rs.build_zip()

    # expected values from the in-process session (repo import path)
    from pyspark.sql import functions as F
    entry_spec = importlib.util.spec_from_file_location(
        "__spark_entry___smoke", os.path.join(REPO, "__spark_entry__.py"))
    entry = importlib.util.module_from_spec(entry_spec)
    entry_spec.loader.exec_module(entry)
    edf = entry.queries()["d1d7_exact_dedup"](spark, SF)
    want = edf.agg(
        F.count("*").alias("n"),
        F.sum(F.crc32(F.concat_ws("|", *sorted(edf.columns)))).alias("fp"),
    ).collect()[0]

    job = tmp_path / "job.py"
    job.write_text(_JOB.format(
        entry=os.path.join(REPO, "__spark_entry__.py"), sf=SF))
    env = {k: v for k, v in os.environ.items() if k != "PYTHONPATH"}
    env.setdefault("PYSPARK_PYTHON", sys.executable)
    env.setdefault("PYSPARK_DRIVER_PYTHON", sys.executable)
    out = subprocess.run(
        [rs.spark_submit_bin(), "--master", "local[4]",
         "--py-files", zpath, str(job)],
        capture_output=True, text=True, timeout=600,
        cwd=str(tmp_path), env=env)
    assert out.returncode == 0, out.stderr[-3000:]
    lines = [ln for ln in out.stdout.splitlines()
             if ln.startswith("SMOKE_RESULT ")]
    assert lines, f"no SMOKE_RESULT line in stdout:\n{out.stdout[-2000:]}"
    got = json.loads(lines[-1].split(" ", 1)[1])
    assert got["n"] == want["n"] > 0
    assert got["fp"] == int(want["fp"])
