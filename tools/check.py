"""Local correctness harness mirroring the driver's t2 gate.

Runs every registry query on Spark and its oracle SQL on DuckDB over the
same sf directory, canonicalizes both results, and compares row-count +
column set + order-insensitive value-hash. Exit non-zero on any mismatch.

Canonicalization deliberately models the *driver's* observed behaviour
(round-1 forensics, VERDICT.md "What's wrong"):

- the Spark side is extracted via ``df.toPandas()`` — DecimalType survives
  as ``decimal.Decimal`` objects and is stringified verbatim (trailing
  zeros preserved: ``153457.00``);
- the DuckDB side is extracted via ``res.df()`` — DuckDB DECIMAL becomes
  float64 there, which stringifies as ``repr`` (``153457.0``).

That asymmetry is exactly what made the round-1 driver hash-fail
``b22_grouped_agg``/``b25_rollup`` (integral-valued decimal sums) while
6-decimal rounding here masked it.  Consequence for query authors: never
emit a DECIMAL column in a query result — aggregate in decimal for
exactness, then emit BIGINT centi-units or cast to DOUBLE identically on
both engines.  Floats are compared at full ``repr`` precision
(bit-identical or bust), which round-1 showed the driver requires.

Usage: python -m tools.check [sf_dir] [name_substring ...]
"""

from __future__ import annotations

import hashlib
import math
import os
import sys
import time
from datetime import date, datetime
from decimal import Decimal

import duckdb

from smallquery_spark.queries import REGISTRY, load_all
from smallquery_spark.session import get_session
from smallquery_spark.sources import TABLES

NULL = "\x00NULL"


def canon_value(v) -> str:
    import numpy as np
    import pandas as pd

    if v is None:
        return NULL
    if isinstance(v, (bool, np.bool_)):
        return "true" if v else "false"
    if isinstance(v, (int, np.integer)):
        return str(int(v))
    if isinstance(v, (float, np.floating)):
        f = float(v)
        if math.isnan(f):
            return NULL  # NULL doubles surface as NaN through pandas
        # Full shortest-round-trip repr: bit-identical or mismatch.
        return repr(f)
    if isinstance(v, Decimal):
        # Verbatim, trailing zeros preserved — models the driver's
        # Spark-side Decimal stringification (the round-1 trap).
        return str(v)
    if isinstance(v, (pd.Timestamp, datetime)):
        if pd.isna(v):  # NaT subclasses datetime
            return NULL
        return v.strftime("%Y-%m-%d %H:%M:%S.%f")
    if isinstance(v, date):
        # date and midnight-timestamp conflate on purpose: pandas
        # extraction renders DATE columns either way per engine.
        return v.isoformat() + " 00:00:00.000000"
    if isinstance(v, (list, tuple)):
        return "[" + ",".join(canon_value(x) for x in v) + "]"
    if isinstance(v, np.ndarray):
        return "[" + ",".join(canon_value(x) for x in v.tolist()) + "]"
    if isinstance(v, bytes):
        return v.hex()
    try:
        if pd.isna(v):  # NaT and pandas NA scalars
            return NULL
    except (TypeError, ValueError):
        pass
    return str(v)


_HASH_MOD = 1 << 256
_PARALLEL_MIN_ROWS = 200_000


def _hash_chunk(pdf, order) -> tuple[int, int]:
    """Multiset-hash a DataFrame chunk: sum of per-row sha256 values.

    Equal row-multisets give equal sums regardless of order, so the
    global sort of the old scheme is unnecessary; the per-value
    canonicalization (canon_value) is unchanged and stays the exact
    contract the driver's compare demands.
    """
    total = 0
    for r in pdf.itertuples(index=False, name=None):
        s = "\x01".join(canon_value(r[i]) for i in order)
        total += int.from_bytes(hashlib.sha256(s.encode()).digest(), "big")
    return len(pdf), total % _HASH_MOD


def canon_pdf(pdf) -> tuple[int, str]:
    """Row-count + order-insensitive value hash of a pandas frame.

    Large results (gen-sf10 queries legitimately return 60M rows) fan
    the per-row canonicalization out over a fork pool — pandas slices
    pickle as numpy blocks, so the send cost is bytes, not 60M boxed
    tuples. Falls back to serial on any pool failure.
    """
    cols = list(pdf.columns)
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    n = len(pdf)
    if n >= _PARALLEL_MIN_ROWS:
        try:
            import multiprocessing as mp
            from concurrent.futures import ProcessPoolExecutor

            workers = min(32, os.cpu_count() or 4)
            chunk = max(100_000, -(-n // (workers * 2)))
            # spawn, not fork: this runs inside the PySpark driver, which
            # is multithreaded (py4j gateway threads) — fork() from a
            # multithreaded parent can deadlock the child on a lock held
            # at fork time, and the serial fallback below only catches
            # raised exceptions, not hangs. The per-future timeout is the
            # backstop that turns any residual hang into the fallback.
            with ProcessPoolExecutor(
                max_workers=workers, mp_context=mp.get_context("spawn")
            ) as ex:
                futs = [
                    ex.submit(_hash_chunk, pdf.iloc[a : a + chunk], order)
                    for a in range(0, n, chunk)
                ]
                total = 0
                for f in futs:
                    _, part = f.result(timeout=900)
                    total = (total + part) % _HASH_MOD
            return n, f"{total:064x}"[:16]
        except Exception:  # noqa: BLE001 — pool trouble: do it serially
            pass
    _, total = _hash_chunk(pdf, order)
    return n, f"{total:064x}"[:16]


def run_spark(qd, spark, sf_dir):
    df = qd.fn(spark, sf_dir)
    pdf = df.toPandas()
    return list(pdf.columns), pdf


def run_duckdb(sql: str, con):
    pdf = con.execute(sql).df()
    return list(pdf.columns), pdf


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    name_filters = sys.argv[2:]
    load_all()

    spark = get_session("smallquery-check")
    con = duckdb.connect()
    for tbl in TABLES:
        p = os.path.join(sf_dir, f"{tbl}.parquet")
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {tbl} AS SELECT * FROM read_parquet('{p}')")

    failures, passed, rows_only = [], 0, 0
    for name, qd in sorted(REGISTRY.items()):
        if name_filters and not any(f in name for f in name_filters):
            continue
        t0 = time.time()
        try:
            cols_s, pdf_s = run_spark(qd, spark, sf_dir)
        except Exception as e:  # noqa: BLE001
            failures.append((name, f"SPARK ERROR: {type(e).__name__}: {e}"))
            print(f"FAIL  {name}: spark error: {e}")
            continue
        if qd.oracle is None:
            rows_only += 1
            print(f"rows  {name}: {len(pdf_s)} rows (no oracle) [{time.time()-t0:.1f}s]")
            continue
        try:
            cols_d, pdf_d = run_duckdb(qd.oracle, con)
        except Exception as e:  # noqa: BLE001
            failures.append((name, f"DUCKDB ERROR: {type(e).__name__}: {e}"))
            print(f"FAIL  {name}: duckdb error: {e}")
            continue
        n_s, h_s = canon_pdf(pdf_s)
        n_d, h_d = canon_pdf(pdf_d)
        del pdf_s, pdf_d
        if sorted(cols_s) != sorted(cols_d):
            failures.append((name, f"COLUMNS: spark={sorted(cols_s)} duckdb={sorted(cols_d)}"))
            print(f"FAIL  {name}: column mismatch {sorted(cols_s)} vs {sorted(cols_d)}")
        elif n_s != n_d:
            failures.append((name, f"ROWCOUNT: spark={n_s} duckdb={n_d}"))
            print(f"FAIL  {name}: rowcount {n_s} vs {n_d}")
        elif h_s != h_d:
            failures.append((name, f"HASH: spark={h_s} duckdb={h_d} ({n_s} rows)"))
            print(f"FAIL  {name}: value hash mismatch ({n_s} rows)")
        else:
            passed += 1
            print(f"ok    {name}: {n_s} rows [{time.time()-t0:.1f}s]")

    print(
        f"\n{passed} oracle-matched, {rows_only} rows-only, {len(failures)} failed"
        f" (of {len([n for n in REGISTRY if not name_filters or any(f in n for f in name_filters)])})"
    )
    for name, why in failures:
        print(f"  FAIL {name}: {why}")
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main())
