"""Build the ``--py-files`` zip for cluster submission (north_rule:
"run via spark-submit --py-files").

    python tools/package_pyfiles.py [out.zip]
    spark-submit --py-files out.zip your_job.py
"""

from __future__ import annotations

import os
import sys
import zipfile


def build(out: str = "/tmp/gr_tdigest_spark.zip") -> str:
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    pkg = os.path.join(root, "gr_tdigest_spark")
    with zipfile.ZipFile(out, "w", zipfile.ZIP_DEFLATED) as z:
        for dirpath, _dirs, files in os.walk(pkg):
            if "__pycache__" in dirpath:
                continue
            for f in sorted(files):
                if f.endswith(".py"):
                    p = os.path.join(dirpath, f)
                    z.write(p, os.path.relpath(p, root))
    return out


if __name__ == "__main__":
    dest = sys.argv[1] if len(sys.argv) > 1 else "/tmp/gr_tdigest_spark.zip"
    print(build(dest))
