#!/usr/bin/env python
"""Extra measurement harness for the optimization rounds (bench.py is
frozen as the driver contract; this file holds the guide §1.4 noop-sink
isolation runs cited in OPTIMIZATION_r*.md).

Usage:
  python bench_extra.py q_name [q_name ...]   # min-of-N per query
  SPARK_GRAFT_PASSES=4 python bench_extra.py q_kg_flagship

Prints one JSON line: {"queries": {name: min_sec}, "passes": {...}}.
Same session/protocol as bench.py (warm worker pool, noop sink, min of
N passes) so numbers are comparable to the headline bench.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

os.environ.setdefault("KGRE_DRIVER_MEM", "32g")

import __spark_entry__ as entry_mod  # noqa: E402
from kgre.session import get_spark  # noqa: E402


def _force(df) -> None:
    df.write.format("noop").mode("overwrite").save()


def main() -> None:
    names = sys.argv[1:]
    if not names:
        print("usage: bench_extra.py q_name [q_name ...]", file=sys.stderr)
        sys.exit(2)
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    passes = int(os.environ.get("SPARK_GRAFT_PASSES", "3"))
    spark = get_spark("kgre-bench-extra", master=f"local[{cpus}]",
                      shuffle_partitions=cpus)
    qs = entry_mod.queries()
    # same warm-up as bench.py: JVM + Arrow + python worker pool
    spark.sparkContext.setJobDescription("warmup")
    _force(qs["q_kg_candidates"](spark, sf_dir))
    all_passes: dict[str, list] = {n: [] for n in names}
    for _ in range(passes):
        for name in names:
            spark.sparkContext.setJobDescription(name)
            t0 = time.perf_counter()
            _force(qs[name](spark, sf_dir))
            all_passes[name].append(round(time.perf_counter() - t0, 3))
    print(json.dumps({
        "queries": {n: min(w) for n, w in all_passes.items()},
        "passes": all_passes,
        "sf_dir": sf_dir,
        "agg": f"min-of-{passes}",
    }))
    spark.stop()


if __name__ == "__main__":
    main()
