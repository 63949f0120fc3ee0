"""Deterministic dataset splitting for training pipelines (engine
addition — the reference has no sampling ops; a 100 TB training corpus
needs reproducible train/val/test assignment that never moves data).

Two methods with an explicit scale trade-off:

- ``method="hash"`` (default, the 100 TB path): split by a
  deterministic hash of the id — ZERO shuffle, zero state, every
  executor computes its rows' assignment independently, and the
  assignment of a row never changes when the corpus grows (stable under
  incremental ingestion). Fractions hold in expectation with binomial
  concentration (±0.1 pp at 10⁸ rows/stratum).
- ``method="exact"``: exact per-stratum row counts via hash-ordered
  row_number over a window partitioned by stratum. One shuffle, and a
  single stratum's rows land in ONE window task — correct at any size
  but only sensible when every stratum fits an executor (e.g. splitting
  a benchmark table, not the corpus). The docstring is the guard rail;
  the hash path is the production default.

The hash uses the dual-dialect md5 family (functions/text.md5_bigint)
so the driver query's DuckDB oracle reproduces the exact assignment —
determinism here is not just test convenience, it is the property that
makes a split auditable after the fact.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

#: denominator for hash bucketing — fine enough that fraction rounding
#: error is < 1e-6 of the corpus
_BUCKETS = 1_000_000


def _validate_fractions(fractions: dict[str, float]) -> list[tuple[str, int]]:
    """→ cumulative (split_name, upper_bucket_bound) thresholds."""
    if not fractions:
        raise ValueError("fractions must name at least one split")
    total = sum(fractions.values())
    if abs(total - 1.0) > 1e-9:
        raise ValueError(f"fractions must sum to 1.0 (got {total})")
    if any(v < 0 for v in fractions.values()):
        raise ValueError("fractions must be non-negative")
    bounds, acc = [], 0.0
    items = list(fractions.items())
    for name, frac in items[:-1]:
        acc += frac
        bounds.append((name, int(round(acc * _BUCKETS))))
    bounds.append((items[-1][0], _BUCKETS))  # last split absorbs rounding
    return bounds


def split_assign(
    df: DataFrame,
    fractions: dict[str, float],
    id_col: str = "doc_id",
    strata_col: str | None = None,
    method: str = "hash",
    salt: str = "split",
    split_col: str = "split",
) -> DataFrame:
    """Append a ``split_col`` assigning each row to one of
    ``fractions``' splits (e.g. ``{"train": .95, "val": .03,
    "test": .02}``), deterministically in ``(salt, id)``.

    ``method="hash"``: bucket = md5-hash(salt ‖ id) mod 1e6, compared
    against cumulative fraction thresholds — a pure per-row projection
    (whole-stage codegen, zero exchange). ``strata_col`` is ignored:
    hash assignment is independent of any stratum by construction, so
    per-stratum fractions hold in expectation automatically.

    ``method="exact"``: exact row counts per stratum (row_number over
    hash order within each stratum, thresholded at cumulative
    fractions of the stratum size). Requires ``strata_col`` (use a
    constant column for a global exact split). One shuffle; each
    stratum is a single window task — see module docstring for when
    that is acceptable.
    """
    import re

    from eo_tools_spark.functions.text import md5_bigint

    bounds = _validate_fractions(fractions)
    if method not in ("hash", "exact"):
        raise ValueError(f"unknown method {method!r} (hash | exact)")
    # salt is interpolated into a SQL string literal — restrict it to
    # identifier-ish characters instead of trying to escape quotes
    if not re.fullmatch(r"[A-Za-z0-9_.\-]+", salt):
        raise ValueError(
            f"salt {salt!r} must match [A-Za-z0-9_.-]+ (it is embedded "
            "in a SQL literal)"
        )
    # NULL ids would hash to NULL and silently fall through every WHEN
    # into the otherwise-arm (the LAST split — typically the eval
    # holdout) — refuse loudly at execution instead
    hx = md5_bigint(
        f"CASE WHEN {id_col} IS NULL THEN "
        f"raise_error('split_assign: NULL {id_col}') "
        f"ELSE concat('{salt}_', CAST({id_col} AS STRING)) END",
        "spark",
    )

    def fold_case(key, threshold):
        """Ascending-threshold WHEN chain; the last split is the
        otherwise-arm (absorbs rounding)."""
        expr = None
        for name, ub in bounds[:-1]:
            cond = threshold(key, ub)
            expr = F.when(cond, name) if expr is None else expr.when(cond, name)
        return (
            F.lit(bounds[-1][0]) if expr is None
            else expr.otherwise(bounds[-1][0])
        )

    if method == "hash":
        bucket = F.pmod(F.expr(hx), F.lit(_BUCKETS))
        return df.withColumn(
            split_col, fold_case(bucket, lambda b, ub: b < ub)
        )

    if strata_col is None:
        raise ValueError("method='exact' requires strata_col")
    from pyspark.sql import Window

    w = Window.partitionBy(strata_col).orderBy(F.expr(hx), F.col(id_col))
    wn = Window.partitionBy(strata_col)
    rn = F.row_number().over(w)
    n = F.count(F.lit(1)).over(wn)
    # integer arithmetic: rn*1e6 <= ub*n — the float form (ub/1e6)*n
    # loses exactness at boundaries (e.g. 580000/1e6*50 = 28.999…,
    # assigning 28 of the promised 29 rows). The row_number side is
    # promoted to LONG before multiplying: IntegerType×IntegerType
    # overflows int32 for any stratum > 2147 rows (ANSI crash /
    # non-ANSI silent mis-assignment).
    return df.withColumn(
        split_col,
        fold_case(
            rn, lambda r, ub: r.cast("long") * _BUCKETS <= F.lit(ub) * n
        ),
    )
