"""north_rule letter: jobs run via ``spark-submit --py-files`` — build
the package zip and submit a job whose ONLY access to the library is
that zip (no repo on PYTHONPATH, neutral cwd)."""

import os
import subprocess
import sys

DRIVER = r"""
import sys
from pyspark.sql import SparkSession
spark = (SparkSession.builder.getOrCreate())
spark.sparkContext.setLogLevel("ERROR")
assert not any("repo" in p for p in sys.path if p), sys.path
from gr_tdigest_spark.operators import tdigest_agg
import gr_tdigest_spark.functions as Fn
li = spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet")
dg = tdigest_agg(li, ["l_returnflag"], "l_quantity", max_size=20000,
                 policy="off")
rows = dg.select("l_returnflag",
                 Fn.tdigest_count("tdigest").alias("n")).collect()
total = int(sum(r["n"] for r in rows))
print(f"SUBMIT_OK rows={len(rows)} total={total}")
spark.stop()
"""


def test_spark_submit_pyfiles(tmp_path):
    sys.path.insert(0, "/root/repo")
    from tools.package_pyfiles import build

    zip_path = build(str(tmp_path / "gr_tdigest_spark.zip"))
    driver = tmp_path / "job.py"
    driver.write_text(DRIVER)
    env = {k: v for k, v in os.environ.items()
           if k not in ("PYTHONPATH",)}
    out = subprocess.run(
        ["/opt/spark/bin/spark-submit", "--master", "local[2]",
         "--py-files", zip_path, str(driver)],
        capture_output=True, text=True, timeout=300, cwd=str(tmp_path),
        env=env,
    )
    assert "SUBMIT_OK" in out.stdout, out.stderr[-3000:]
    line = [l for l in out.stdout.splitlines() if "SUBMIT_OK" in l][0]
    assert "rows=3" in line and "total=" in line
