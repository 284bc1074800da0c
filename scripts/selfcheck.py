"""Mirror of the driver's correctness gate: run every registry query
on Spark AND its DuckDB oracle at a given SF, compare row count,
column names, and an order-insensitive value hash.

Usage: python scripts/selfcheck.py [sf_dir] [query ...]
"""

from __future__ import annotations

import hashlib
import math
import sys
import time
import traceback

import duckdb

sys.path.insert(0, "/root/repo")

from etl_btc_spark.operators.dedup import release_scoped_caches  # noqa: E402
from etl_btc_spark.operators.ann_index import release_scoped_broadcasts  # noqa: E402
from etl_btc_spark.plans.queries import REGISTRY  # noqa: E402
from etl_btc_spark.session import get_spark  # noqa: E402
from etl_btc_spark.tables import TABLE_NAMES, table_path  # noqa: E402


def canon(v) -> str:
    if v is None:
        return "NULL"
    if isinstance(v, bool):
        return "true" if v else "false"
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        if v == int(v) and abs(v) < 1e15:
            return str(int(v))
        return repr(v)
    return str(v)


def table_hash(cols: list[str], rows: list[tuple]) -> tuple[str, int]:
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    lines = sorted("\x1f".join(canon(r[i]) for i in order) for r in rows)
    h = hashlib.sha256("\n".join(lines).encode()).hexdigest()[:16]
    return h, len(rows)


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    # resolve each requested name to an exact registry key or a
    # unique prefix; REFUSE silently-matching-nothing (r15: short
    # names like "q99bj" used to filter out everything and print a
    # vacuous "0 failures")
    only: set[str] = set()
    for arg in sys.argv[2:]:
        if arg in REGISTRY:
            only.add(arg)
            continue
        pref = [n for n in REGISTRY if n.startswith(arg)]
        if len(pref) != 1:
            raise SystemExit(
                f"selfcheck: {arg!r} matches {len(pref)} registry names "
                f"({pref[:5]}) — pass an exact or uniquely-prefixed name"
            )
        only.add(pref[0])
    spark = get_spark("selfcheck")
    con = duckdb.connect()
    for t in TABLE_NAMES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{table_path(sf_dir, t)}')"
        )
    failures = []
    for name, q in sorted(REGISTRY.items()):
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            sdf = q.fn(spark, sf_dir)
            scols = sdf.columns
            srows = [tuple(r) for r in sdf.collect()]
            sh, sn = table_hash(scols, srows)
        except Exception:
            print(f"FAIL  {name}: SPARK ERROR")
            traceback.print_exc(limit=5)
            failures.append(name)
            continue
        finally:
            # in finally, not the happy path: a failed query must not
            # leak its scoped caches/broadcasts into the rest of the run
            release_scoped_caches()
            release_scoped_broadcasts()
        if q.oracle is None:
            print(f"rows  {name}: {sn} rows (no oracle) [{time.time()-t0:.1f}s]")
            continue
        try:
            res = con.execute(q.oracle)
            ocols = [d[0] for d in res.description]
            orows = res.fetchall()
            oh, on = table_hash(ocols, orows)
        except Exception:
            print(f"FAIL  {name}: ORACLE ERROR")
            traceback.print_exc(limit=5)
            failures.append(name)
            continue
        if sorted(scols) != sorted(ocols):
            print(f"FAIL  {name}: columns spark={sorted(scols)} oracle={sorted(ocols)}")
            failures.append(name)
        elif sn != on:
            print(f"FAIL  {name}: rowcount spark={sn} oracle={on}")
            failures.append(name)
        elif sh != oh:
            print(f"FAIL  {name}: hash mismatch ({sn} rows)")
            # show a few differing lines for debugging
            sset = {tuple(canon(v) for v in r) for r in srows}
            oset = {tuple(canon(v) for v in r) for r in orows}
            sorder = sorted(range(len(scols)), key=lambda i: scols[i])
            oorder = sorted(range(len(ocols)), key=lambda i: ocols[i])
            sset = {tuple(r[i] for i in sorder) for r in ({tuple(canon(v) for v in row) for row in srows})}
            oset = {tuple(r[i] for i in oorder) for r in ({tuple(canon(v) for v in row) for row in orows})}
            for d in list(sset - oset)[:3]:
                print("   spark-only:", d)
            for d in list(oset - sset)[:3]:
                print("   oracle-only:", d)
            failures.append(name)
        else:
            print(f"OK    {name}: {sn} rows, hash {sh} [{time.time()-t0:.1f}s]")
    print(f"\n{len(failures)} failures" + (f": {failures}" if failures else ""))
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
