"""Deterministic hash-based sampling and dataset splitting (engine
extension): train/val/test assignment and subsampling that is a pure
function of the row id — reproducible across engines, cluster sizes,
partitionings and reruns, unlike ``rand()`` (whose stream depends on
partition layout) or ``df.sample`` (seeded per-partition).

Everything is one md5 projection — map-only, zero shuffles, zero
Python; the same arithmetic is reproducible in DuckDB, so every split
is oracle-checkable.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# hash granularity: ~10k distinguishable weights is plenty for corpus
# splits, and 8 hex digits (32 bits) of md5 keep the conv() exact
_BUCKETS = 10_000


def hash_frac(id_col, salt: str = "") -> Column:
    """Uniform bucket in [0, 10000) from md5 of the id's decimal string
    (salted so independent splits/samples decorrelate)."""
    c = F.col(id_col) if isinstance(id_col, str) else id_col
    return (F.conv(F.substring(
        F.md5(F.concat(c.cast("string"), F.lit(salt))), 1, 8), 16, 10)
        .cast("long") % _BUCKETS)


def split_by_hash(df: DataFrame, id_col: str = "doc_id",
                  weights: dict[str, float] | None = None,
                  salt: str = "") -> DataFrame:
    """Add a ``split`` column assigning each row to a named split with
    the given weights (default 90/5/5 train/val/test).  Assignment is
    per-row deterministic: moving a row between partitions or growing
    the cluster never changes its split."""
    weights = weights or {"train": 0.9, "val": 0.05, "test": 0.05}
    if abs(sum(weights.values()) - 1.0) > 1e-9:
        raise ValueError("split weights must sum to 1")
    frac = hash_frac(id_col, salt)
    expr = None
    acc = 0.0
    names = list(weights)
    for name in names[:-1]:
        acc += weights[name]
        cond = frac < int(round(acc * _BUCKETS))
        expr = F.when(cond, name) if expr is None else \
            expr.when(cond, name)
    expr = (F.lit(names[-1]) if expr is None
            else expr.otherwise(names[-1]))
    return df.withColumn("split", expr)


def hash_sample(df: DataFrame, rate: float, id_col: str = "doc_id",
                salt: str = "") -> DataFrame:
    """Keep a deterministic ~``rate`` fraction of rows (id-hash < rate
    cutoff) — the reproducible twin of ``df.sample(rate)``."""
    if not 0.0 <= rate <= 1.0:
        raise ValueError("rate must be in [0, 1]")
    return df.filter(hash_frac(id_col, salt) < int(round(rate * _BUCKETS)))
