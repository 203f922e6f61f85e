"""Driver-strictness sweep over the WHOLE registry (r5).

tests/test_driver_window.py holds the 50-query driver window to exact value
equality; this script runs the same comparison over all registered queries
and prints one line per query: EXACT (bit-identical after the driver's
canonicalization), ROUND9 (passes the round-9 parity gate but differs in
low-order double bits — would be a driver-hash risk if rotated in), or
FAIL.  Output feeds the promotion list in tests/test_driver_window.py so
the strict gate covers every query that can honestly hold it.

Run: python scripts/exact_sweep.py [start [end]]
"""

from __future__ import annotations

import math
import sys
from decimal import Decimal as _Decimal

sys.path.insert(0, "/root/repo")

import duckdb  # noqa: E402

SF = "/root/testdata/sf0.01"
TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings"
).split()


def _exact(v):
    if hasattr(v, "item"):
        v = v.item()
    if isinstance(v, _Decimal):
        v = float(v)
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        if v == 0.0:
            return "-0.0" if math.copysign(1.0, v) < 0 else "+0.0"
        return v
    return v


def _round9(v):
    v = _exact(v)
    if isinstance(v, float):
        return round(v, 9)
    return v


def _canon(cols, rows, norm):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    shaped = [tuple(norm(r[i]) for i in order) for r in rows]
    return sorted(
        shaped,
        key=lambda r: tuple(
            (v is None, type(v).__name__, v if v is not None else 0) for v in r
        ),
    )


def main() -> None:
    from pyspark.sql import SparkSession

    import __spark_entry__ as e

    start = int(sys.argv[1]) if len(sys.argv) > 1 else 0
    end = int(sys.argv[2]) if len(sys.argv) > 2 else 10**9

    spark = (
        SparkSession.builder.master("local[8]")
        .config("spark.sql.shuffle.partitions", "8")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF}/{t}.parquet')"
        )
    qs, osql = e.queries(), e.oracle_sql()
    names = list(qs)[start:end]
    counts = {"EXACT": 0, "ROUND9": 0, "FAIL": 0, "ERROR": 0}
    for name in names:
        try:
            sdf = qs[name](spark, SF)
            s_cols = [c.lower() for c in sdf.columns]
            s_rows = [tuple(r) for r in sdf.collect()]
            res = con.execute(osql[name])
            d_cols = [d[0].lower() for d in res.description]
            d_rows = res.fetchall()
            if sorted(s_cols) != sorted(d_cols) or len(s_rows) != len(d_rows):
                status, detail = "FAIL", "cols/rows"
            elif _canon(s_cols, s_rows, _exact) == _canon(d_cols, d_rows, _exact):
                status, detail = "EXACT", ""
            elif _canon(s_cols, s_rows, _round9) == _canon(d_cols, d_rows, _round9):
                status, detail = "ROUND9", ""
            else:
                a, b = _canon(s_cols, s_rows, _exact), _canon(d_cols, d_rows, _exact)
                diffs = [(x, y) for x, y in zip(a, b) if x != y]
                status, detail = "FAIL", f"{len(diffs)} diffs e.g. {diffs[:1]}"
        except Exception as exc:  # keep sweeping
            status, detail = "ERROR", str(exc)[:160].replace("\n", " ")
        counts[status] += 1
        print(f"{status:7s} {name} {detail}", flush=True)
    print("SUMMARY", counts, flush=True)


if __name__ == "__main__":
    main()
