"""Run the full driver contract (queries() vs oracle_sql()) at any
scale factor — the same compare the round driver performs at sf0.01,
promoted to a script so it can also be run at sf0.1.

The larger scale matters: thresholds and dedup paths that are
unreachable on the small table get exercised (the sf0.1 sweep caught
aoi_footprint_join's pre-refine dropDuplicates keeping an arbitrary —
possibly non-intersecting — survivor per id, which the sf0.01 gate
could not see).

Run: python scripts/verify_contract.py [sf_dir] [--only=q1,q2,...]
     python scripts/verify_contract.py [sf_dir] --stability
Exit code 1 on any mismatch.

--stability runs every query under TWO Spark configs (cores 16/
shuffle 16, then cores 3/shuffle 7) and requires identical sorted
results — the cross-parallelism determinism gate the fixture-pinning
scripts apply to InSAR queries, extended to the whole contract.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


def main() -> int:
    import duckdb

    import __spark_entry__ as m
    from eo_tools_spark.session import get_spark

    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    sf = args[0] if args else "/root/testdata/sf0.01"
    only = None
    for a in sys.argv[1:]:
        if a.startswith("--only"):
            only = set(a.split("=", 1)[1].split(","))

    spark = get_spark("verify-contract", cores=16, shuffle_partitions=16)
    spark.sparkContext.setLogLevel("ERROR")
    con = duckdb.connect()
    for t in TABLES:
        con.sql(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf}/{t}.parquet')"
        )
    oracles = m.oracle_sql()
    fails: list[tuple[str, str]] = []
    n = 0
    for name, q in m.queries().items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            sp = q(spark, sf).toPandas()
        except Exception as e:  # noqa: BLE001 — report, keep sweeping
            fails.append((name, f"EXC {type(e).__name__}: {e}"[:160]))
            print(name, "EXC", type(e).__name__, flush=True)
            continue
        n += 1
        if name not in oracles:
            print(name, "rows-only", len(sp), round(time.time() - t0, 1), flush=True)
            continue
        du = con.sql(oracles[name]).df()
        cols = sorted(sp.columns)
        a = sp[cols].sort_values(cols).reset_index(drop=True)
        try:
            b = (
                du[cols].sort_values(cols).reset_index(drop=True)
                .astype(a.dtypes.to_dict())
            )
            ok = a.equals(b)
        except Exception:  # dtype/shape divergence is a mismatch too
            ok = False
        if not ok:
            fails.append((name, f"{len(a)} vs {len(du)} rows"))
        print(name, len(sp), len(du), "exact:", ok, round(time.time() - t0, 1),
              flush=True)
    print(f"TOTAL: {n}  FAILS: {fails}")
    spark.stop()
    return 1 if fails else 0


def stability() -> int:
    import __spark_entry__ as m
    from eo_tools_spark.session import get_spark

    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    sf = args[0] if args else "/root/testdata/sf0.01"
    first: dict = {}
    fails: list[str] = []
    for tag, cores, shuf in (("A", 16, 16), ("B", 3, 7)):
        spark = get_spark(f"stability-{tag}", cores=cores, shuffle_partitions=shuf)
        spark.sparkContext.setLogLevel("ERROR")
        for name, q in m.queries().items():
            t0 = time.time()
            pdf = q(spark, sf).toPandas()
            cols = sorted(pdf.columns)
            got = pdf[cols].sort_values(cols).reset_index(drop=True)
            if tag == "A":
                first[name] = got
            else:
                ok = got.equals(first[name])
                if not ok:
                    fails.append(name)
                print(name, "stable:", ok, round(time.time() - t0, 1), flush=True)
        spark.stop()
    print(f"STABILITY FAILS: {fails}")
    return 1 if fails else 0


if __name__ == "__main__":
    raise SystemExit(
        stability() if "--stability" in sys.argv else main()
    )
