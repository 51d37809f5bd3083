"""VERDICT r2 #10: the committed driver-oracle goldens must equal a fresh
regeneration — a semantic drift in kgre/pyoracle can't silently stale the
correctness gate."""

import os
import subprocess
import sys

import pyarrow.parquet as pq

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
COMMITTED = os.path.join(REPO, "goldens", "sf0.01")


def test_goldens_match_regenerated(tmp_path):
    out = str(tmp_path / "goldens")
    subprocess.run(
        [sys.executable, os.path.join(REPO, "tools", "make_goldens.py"),
         "/root/testdata/sf0.01", out],
        check=True, cwd=REPO, capture_output=True)
    names = sorted(os.listdir(COMMITTED))
    assert names == sorted(os.listdir(out))
    for n in names:
        a = pq.read_table(os.path.join(COMMITTED, n))
        b = pq.read_table(os.path.join(out, n))
        assert a.schema.equals(b.schema), n
        # column-value equality (parquet file bytes may differ in
        # metadata; the driver compares values)
        assert a.equals(b), f"golden drift in {n} — pyoracle semantics " \
            "changed without `python tools/make_goldens.py`"
