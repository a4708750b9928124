"""Driver-shaped self-check over the exact 50-query PRIORITY window.

The external driver canonicalizes each query's output as a pandas frame
(column-sorted, row-sorted, value-hashed).  That contract is stricter
than tests/oracle_harness.py's tuple canonicalization: pandas sorting /
``pd.util.hash_pandas_object`` raise ``TypeError`` on ``list`` and
``bytearray`` cells, which is exactly how v06/m01/m02 went driver-red in
round 3 while passing the local harness.  This check replays BOTH
contracts on every window entry, executing each side exactly ONCE:

1. canonicalizability — the Spark output AND the DuckDB oracle output
   must survive pandas column-sort + row-sort + hash (the driver's
   ``_canon`` shape);
2. value match — tests/oracle_harness.py's row-count/columns/value
   comparison, fed the same fetched rows;
3. BITWISE hash match — ``pd.util.hash_pandas_object`` digests of both
   canonicalized frames must agree.  Tuple equality (check 2) treats
   ``0.0 == -0.0`` as equal; the driver's pandas hash is bitwise and
   does not — exactly how ml04 passed both local gates and failed the
   round-8 driver (a -1.27e-07 coefficient rounds to -0.0 in DuckDB,
   +0.0 in Spark).  Engine representation trivia (int32 vs int64, µs vs
   ns timestamps, date objects vs datetime64) are normalized first so
   only value-level bit divergence fails.

Any failure (including a missing oracle: the window policy is that every
slot is value-checkable) exits non-zero.  Runs at sf0.001 by default for
speed; pass the sf0.01 dir to mirror the driver's scale exactly.

Usage: python tools/selfcheck_window.py [sf_dir]  (any CWD)
"""

from __future__ import annotations

import os
import sys

import duckdb
import pandas as pd

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _REPO)
sys.path.insert(0, os.path.join(_REPO, "tests"))
# Executor Python workers import the package from PYTHONPATH (driver
# sys.path does not propagate) — required by the mapInPandas kernels
# (m01/m02) when this tool runs from a foreign CWD.
os.environ["PYTHONPATH"] = _REPO + os.pathsep + os.environ.get("PYTHONPATH", "")

from realtimechurnpredictiondataengineering_spark.plans.inventory import PRIORITY, REGISTRY  # noqa: E402
from realtimechurnpredictiondataengineering_spark.sources.batch import TABLES  # noqa: E402


def driver_canon_probe(pdf: pd.DataFrame) -> str | None:
    """Replicate the driver's canonicalization; return an error string if
    the frame cannot be canonicalized (unsortable/unhashable cells)."""
    try:
        cols = sorted(pdf.columns)
        out = pdf[cols].sort_values(by=cols).reset_index(drop=True)
        pd.util.hash_pandas_object(out, index=False)
    except Exception as exc:  # noqa: BLE001 - the probe's whole job
        return f"{type(exc).__name__}: {exc}"
    return None


def bitwise_row_hashes(pdf: pd.DataFrame) -> "pd.Series":
    """The driver's value-hash contract: canonicalize (column-sort,
    row-sort, reset index) then ``pd.util.hash_pandas_object`` per row.
    Floats hash by BIT PATTERN, so ``-0.0 != +0.0`` — the distinction
    tuple equality misses.  Cross-engine representation trivia normalize
    first: ints → int64, floats → float64 (bits untouched), datetimes →
    ns, object columns holding ``date``/``datetime`` values → ns."""
    import datetime as _dt

    out = {}
    for c in sorted(pdf.columns):
        s = pdf[c].reset_index(drop=True)
        if pd.api.types.is_bool_dtype(s):
            s = s.astype("bool")
        elif pd.api.types.is_integer_dtype(s):
            s = s.astype("int64")
        elif pd.api.types.is_float_dtype(s):
            s = s.astype("float64")
        elif pd.api.types.is_datetime64_any_dtype(s):
            s = s.astype("datetime64[ns]")
        elif s.dtype == object:
            vals = s.dropna()
            if len(vals) and all(isinstance(v, _dt.date) for v in vals):
                s = pd.to_datetime(s).astype("datetime64[ns]")
        out[c] = s
    frame = pd.DataFrame(out)
    cols = list(frame.columns)
    if cols and len(frame):
        frame = frame.sort_values(by=cols).reset_index(drop=True)
    return pd.util.hash_pandas_object(frame, index=False)


def bitwise_hash_mismatch(spdf: pd.DataFrame, dpdf: pd.DataFrame) -> str | None:
    """Compare the driver's bitwise row-hash multisets; None if they
    agree, else a diagnostic naming the first differing canonical rows."""
    sh = bitwise_row_hashes(spdf)
    dh = bitwise_row_hashes(dpdf)
    if list(sh) == list(dh):
        return None
    bad = [i for i, (a, b) in enumerate(zip(sh, dh)) if a != b][:3]
    return (
        "bitwise hash mismatch (tuple-equal values can still differ in bit "
        f"pattern, e.g. -0.0 vs +0.0): canonical rows {bad or 'length-diff'}"
    )


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    from oracle_harness import compare_fetched  # noqa: E402

    from realtimechurnpredictiondataengineering_spark.session import get_spark

    spark = get_spark(app_name="selfcheck-window", shuffle_partitions=8)
    spark.sparkContext.setLogLevel("ERROR")
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )

    n_bad = 0
    for name in PRIORITY:
        fn, sql = REGISTRY[name]
        if callable(sql):
            sql = sql()
        errs: list[str] = []
        spark_cols: list[str] = []
        spark_rows: list[tuple] = []
        if sql is None:
            errs.append("no_oracle (window slots must be value-checkable)")
        try:
            sdf = fn(spark, sf_dir)
            spark_cols = [c.lower() for c in sdf.columns]
            rows = sdf.collect()
            spark_rows = [tuple(r) for r in rows]
            # The driver canonicalizes a TYPED frame (toPandas), not
            # object-dtype tuples: re-materialize the collected rows
            # through the query's own schema so the probe sees the same
            # dtype-dependent sort/hash behavior (timestamps, decimals,
            # arrays) WITHOUT re-executing the plan.
            spdf = spark.createDataFrame(rows, sdf.schema).toPandas()
            if (probe := driver_canon_probe(spdf)) is not None:
                errs.append(f"spark output uncanonicalizable: {probe}")
        except Exception as exc:  # noqa: BLE001 - report, don't abort the sweep
            errs.append(f"spark EXCEPTION: {type(exc).__name__}: {exc}")
        if sql is not None and not errs:
            try:
                res = con.execute(sql)
                duck_cols = [d[0].lower() for d in res.description]
                duck_rows = res.fetchall()
                # Same typed-frame probe on the oracle side: .df() gives
                # the dtype-true frame (the fetchall rows feed the value
                # compare; DuckDB re-execution is ms at these scales).
                dpdf = con.execute(sql).df()
                if (probe := driver_canon_probe(dpdf)) is not None:
                    errs.append(f"oracle output uncanonicalizable: {probe}")
                else:
                    ok, msg = compare_fetched(spark_cols, spark_rows, duck_cols, duck_rows)
                    if not ok:
                        errs.append(msg)
                    elif (bit := bitwise_hash_mismatch(spdf, dpdf)) is not None:
                        errs.append(bit)
            except Exception as exc:  # noqa: BLE001
                errs.append(f"oracle EXCEPTION: {type(exc).__name__}: {exc}")
        if errs:
            n_bad += 1
            print(f"FAIL {name}: {'; '.join(errs)}")
        else:
            print(f"PASS {name}")
    print(f"\n{len(PRIORITY) - n_bad}/{len(PRIORITY)} window entries clean")
    return 1 if n_bad else 0


if __name__ == "__main__":
    sys.exit(main())
