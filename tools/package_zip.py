"""Build the --py-files artifact for cluster submission.

The north rule runs the engine via
``spark-submit --py-files igraph_spark.zip job.py`` on a multi-executor
cluster; this zips the package (source only, no tests) so executors can
import it.

Usage: python tools/package_zip.py [out.zip]
"""

from __future__ import annotations

import os
import sys
import zipfile

HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def main() -> None:
    out = sys.argv[1] if len(sys.argv) > 1 else os.path.join(
        HERE, "dist", "igraph_spark.zip")
    os.makedirs(os.path.dirname(out), exist_ok=True)
    pkg = os.path.join(HERE, "igraph_spark")
    with zipfile.ZipFile(out, "w", zipfile.ZIP_DEFLATED) as zf:
        for root, _dirs, files in os.walk(pkg):
            if "__pycache__" in root:
                continue
            for f in sorted(files):
                if not f.endswith(".py"):
                    continue
                full = os.path.join(root, f)
                zf.write(full, os.path.relpath(full, HERE))
    print(out)


if __name__ == "__main__":
    main()
