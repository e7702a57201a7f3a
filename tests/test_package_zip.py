"""The spark-submit --py-files artifact must track the source tree.

The north rule runs the engine via ``spark-submit --py-files
dist/igraph_spark.zip``; a zip missing a module fails only at
executor-import time on a real cluster, which local tests would never
catch.  dist/ is build-on-demand (gitignored), so this test BUILDS the
artifact with the real tool and then asserts it is complete and
byte-identical to the working tree — a packaging bug (walk filter,
path layout, stale exclusion) fails here instead of on the cluster.
"""

import os
import subprocess
import sys
import zipfile

import pytest

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
PKG = os.path.join(ROOT, "igraph_spark")


def _source_modules():
    out = []
    for root, _dirs, files in os.walk(PKG):
        if "__pycache__" in root:
            continue
        for f in sorted(files):
            if f.endswith(".py"):
                full = os.path.join(root, f)
                out.append(os.path.relpath(full, ROOT))
    return out


@pytest.fixture(scope="module")
def built_zip(tmp_path_factory):
    out = str(tmp_path_factory.mktemp("dist") / "igraph_spark.zip")
    subprocess.run(
        [sys.executable, os.path.join(ROOT, "tools", "package_zip.py"),
         out],
        check=True, capture_output=True)
    return out


def test_zip_contains_every_source_module(built_zip):
    with zipfile.ZipFile(built_zip) as z:
        names = set(z.namelist())
    missing = [m for m in _source_modules() if m not in names]
    assert not missing, f"package_zip.py dropped modules: {missing}"
    stray = [n for n in names if not n.startswith("igraph_spark/")]
    assert not stray, f"unexpected zip roots: {stray}"


def test_zip_modules_match_source_bytes(built_zip):
    """Not just present: byte-identical to the working tree."""
    with zipfile.ZipFile(built_zip) as z:
        for m in _source_modules():
            with open(os.path.join(ROOT, m), "rb") as fh:
                src = fh.read()
            assert z.read(m) == src, (
                f"{m} in the built zip differs from the source tree")
