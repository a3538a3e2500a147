"""Local replica of the driver's correctness gate.

Runs every queries() entry on Spark and its oracle_sql() on DuckDB at the
given sf dir, compares row count, column names, and an order-insensitive
value hash (columns sorted by name, rows sorted, values canonicalized).

Usage: python scripts/check_oracle.py [sf_dir] [query ...]
"""

from __future__ import annotations

import math
import sys

sys.path.insert(0, ".")


def canon(v):
    # STRICT typing: a float that happens to hold an integer value must NOT
    # collapse to the int representation — the driver's Arrow fetch turns
    # DuckDB HUGEINT (window SUM) into float64, and int-coercion here hid
    # that "3.0" vs "3" mismatch in round 1 (VERDICT "What's wrong" #1).
    if v is None:
        return "NULL"
    if isinstance(v, bool):
        return str(v).lower()
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return repr(round(v, 9))
    if isinstance(v, (list, tuple)):
        return "[" + ",".join(canon(x) for x in v) + "]"
    import decimal

    if isinstance(v, decimal.Decimal):
        f = float(v)
        return canon(f)
    return str(v)


def table_hash(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    lines = sorted("|".join(canon(r[i]) for i in order) for r in rows)
    import hashlib

    h = hashlib.sha256()
    for line in lines:
        h.update(line.encode())
        h.update(b"\n")
    return h.hexdigest()


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    import duckdb

    from __spark_entry__ import oracle_sql, queries
    from vector_spark.session import get_spark
    from vector_spark.tables import TABLE_NAMES

    spark = get_spark("oracle-check")
    con = duckdb.connect()
    for t in TABLE_NAMES:
        con.sql(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'"
        )

    qs, oracles = queries(), oracle_sql()
    failed, passed, rows_only = [], [], []
    for name, fn in qs.items():
        if only and name not in only:
            continue
        try:
            sdf = fn(spark, sf_dir)
            srows = sdf.collect()
            scols = sdf.columns
        except Exception as e:
            failed.append((name, f"spark error: {e}"))
            print(f"FAIL {name}: spark error: {e}")
            continue
        if name not in oracles:
            rows_only.append((name, len(srows)))
            print(f"ROWS-ONLY {name}: {len(srows)} rows")
            continue
        try:
            rel = con.sql(oracles[name])
            dcols = [d[0] for d in rel.description]
            # Fetch via Arrow to mirror the driver's canonicalization path:
            # HUGEINT/DECIMAL surface as the same Python types the driver sees.
            atbl = rel.fetch_arrow_table()
            drows = [
                tuple(d[c] for c in dcols) for d in atbl.to_pylist()
            ]
        except Exception as e:
            failed.append((name, f"duckdb error: {e}"))
            print(f"FAIL {name}: duckdb error: {e}")
            continue
        problems = []
        if len(srows) != len(drows):
            problems.append(f"rowcount spark={len(srows)} duckdb={len(drows)}")
        if sorted(scols) != sorted(dcols):
            problems.append(f"cols spark={sorted(scols)} duckdb={sorted(dcols)}")
        if not problems:
            sh = table_hash(scols, [tuple(r) for r in srows])
            dh = table_hash(dcols, drows)
            if sh != dh:
                problems.append("value hash mismatch")
                # show first few diffs
                so = sorted(
                    "|".join(canon(x) for x in r) for r in
                    [tuple(r[c] for c in sorted(scols)) for r in srows]
                )
                do = sorted(
                    "|".join(canon(x) for x in r) for r in
                    [tuple(r[dcols.index(c)] for c in sorted(dcols)) for r in drows]
                )
                diffs = [(a, b) for a, b in zip(so, do) if a != b][:3]
                for a, b in diffs:
                    print(f"  spark : {a[:200]}")
                    print(f"  duckdb: {b[:200]}")
        if problems:
            failed.append((name, "; ".join(problems)))
            print(f"FAIL {name}: {'; '.join(problems)}")
        else:
            passed.append(name)
            print(f"PASS {name} ({len(srows)} rows)")

    print(
        f"\n{len(passed)} passed, {len(failed)} failed, {len(rows_only)} rows-only"
    )
    if failed:
        print("FAILED QUERIES:")
        for name, why in failed:
            print(f"  {name}: {why[:300]}")
        sys.exit(1)


if __name__ == "__main__":
    main()
