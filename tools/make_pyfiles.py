"""Package the engine for `spark-submit --py-files`.

Produces a single zip of the pds_hw2_mpi_connected_components_spark package
(sources only) that executors can import, per the north rule's deployment
contract:

    python tools/make_pyfiles.py [out.zip]
    spark-submit --master yarn --py-files pds_spark.zip your_job.py
"""

from __future__ import annotations

import os
import sys
import zipfile

PKG = "pds_hw2_mpi_connected_components_spark"


def build(out: str = "pds_spark.zip") -> str:
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    pkg_dir = os.path.join(root, PKG)
    with zipfile.ZipFile(out, "w", zipfile.ZIP_DEFLATED) as z:
        for dirpath, _dirs, files in os.walk(pkg_dir):
            if "__pycache__" in dirpath:
                continue
            for f in sorted(files):
                if f.endswith(".py"):
                    full = os.path.join(dirpath, f)
                    z.write(full, os.path.relpath(full, root))
    return out


if __name__ == "__main__":
    print(build(sys.argv[1] if len(sys.argv) > 1 else "pds_spark.zip"))
