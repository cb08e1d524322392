#!/usr/bin/env python3
"""Local replica of the driver's correctness gate (dev tool only).

Runs each oracle_sql.json query in DuckDB over the same parquet tables and
compares against the Verify parquet dumps: schema (column names), row count,
types (the driver's hash is TYPE-SENSITIVE: a DuckDB HUGEINT from
SUM(BIGINT) vs a Spark int64, or an int32 ntile vs a BIGINT oracle, fails
the gate even when every value is bit-identical — so we compare the typed
DuckDB schema of the oracle result against the typed schema of the Verify
parquet, per column, before looking at values), and values (columns sorted
by name, rows sorted, doubles compared exactly after both sides' explicit
rounding).
"""
import json, math, sys
import duckdb
import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    def norm(v):
        if v is None or (isinstance(v, float) and math.isnan(v)):
            return None
        if hasattr(v, "to_pydatetime"):
            v = v.to_pydatetime()
        # floats compare EXACTLY (bitwise): verified 2026-08-12 that every
        # oracle matches with no tolerance — keep it that strict so value
        # drift is caught before the driver's hash compare sees it
        if hasattr(v, "item"):
            v = v.item()
        return v
    rows = [tuple(norm(v) for v in row) for row in df.itertuples(index=False)]
    rows.sort(key=lambda r: tuple((x is None, str(type(x)), str(x)) for x in r))
    return rows

# Types Spark cannot emit to parquet — their appearance in an oracle result
# means the oracle SQL needs an explicit CAST (the pandas .df() path silently
# flattens them to int64, which is why value comparison alone misses this).
_UNREACHABLE = {"HUGEINT", "UHUGEINT", "UBIGINT", "UINTEGER", "USMALLINT",
                "UTINYINT"}

def type_mismatches(con, sql, parquet_path):
    """Per-column typed-schema diff between the oracle result and the Verify
    parquet, as DuckDB sees both. Returns a list of problem strings."""
    rel = con.sql(sql)
    oracle_types = dict(zip(rel.columns, (str(t) for t in rel.types)))
    prel = con.sql(f"SELECT * FROM '{parquet_path}/*.parquet'")
    got_types = dict(zip(prel.columns, (str(t) for t in prel.types)))
    probs = []
    for c in sorted(set(oracle_types) & set(got_types)):
        ot, gt = oracle_types[c], got_types[c]
        if ot in _UNREACHABLE:
            probs.append(f"{c}: oracle {ot} (unreachable from Spark — add CAST)")
        elif ot != gt:
            probs.append(f"{c}: oracle {ot} vs spark {gt}")
    return probs

def main(sf_dir: str, out_dir: str):
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    ok = fail = 0
    for name, sql in sorted(oracle.items()):
        try:
            exp = con.sql(sql).df()
        except Exception as e:
            print(f"FAIL {name}: oracle error: {str(e)[:200]}")
            fail += 1
            continue
        try:
            got = pd.read_parquet(f"{out_dir}/{name}")
        except Exception as e:
            print(f"FAIL {name}: result missing: {str(e)[:120]}")
            fail += 1
            continue
        if sorted(exp.columns) != sorted(got.columns):
            print(f"FAIL {name}: columns {sorted(got.columns)} vs oracle {sorted(exp.columns)}")
            fail += 1
            continue
        if len(exp) != len(got):
            print(f"FAIL {name}: rows {len(got)} vs oracle {len(exp)}")
            fail += 1
            continue
        probs = type_mismatches(con, sql, f"{out_dir}/{name}")
        if probs:
            print(f"FAIL {name}: type mismatch: {'; '.join(probs)}")
            fail += 1
            continue
        ce, cg = canon(exp), canon(got)
        if ce != cg:
            bad = sum(1 for a, b in zip(ce, cg) if a != b)
            print(f"FAIL {name}: {bad}/{len(ce)} rows differ")
            for a, b in list(zip(ce, cg))[:500]:
                if a != b:
                    print(f"   oracle: {a}\n   got   : {b}")
                    break
            fail += 1
        else:
            ok += 1
            print(f"ok   {name} ({len(ce)} rows)")
    print(f"\n{ok} ok, {fail} fail"
          f" ({len(json.load(open(f'{out_dir}/oracle_sql.json')))} oracles)")
    return 1 if fail else 0

if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
