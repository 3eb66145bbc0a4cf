#!/usr/bin/env python3
"""Local replica of the driver's correctness gate.

Usage: python3 tools/check.py <sfDir> <verifyOutDir>

Reads <verifyOutDir>/oracle_sql.json (written by graft.Verify), registers each
<sfDir>/<table>.parquet as a DuckDB view under its bare name, runs every
oracle, and compares against <verifyOutDir>/<name>/ parquet: column names
(sorted), row count, and a hash over values with columns sorted by name —
mirroring the driver's described compare. Exit 1 on any mismatch.

Dev-side tool only; NOT part of the engine (driver-side python is allowed
for the oracle per the environment notes).
"""
import hashlib
import json
import math
import sys
from pathlib import Path

import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def canon(v):
    if v is None:
        return "NULL"
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        # normalize -0.0 and print with fixed repr
        if v == 0.0:
            v = 0.0
        return repr(round(v, 9))
    if isinstance(v, (list, tuple)):
        return "[" + ",".join(canon(x) for x in v) + "]"
    if isinstance(v, bytes):
        return v.hex()
    return str(v)


def frame_sig(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    lines = ["\x1f".join(canon(r[i]) for i in order) for r in rows]
    h = hashlib.sha256()
    for ln in lines:  # preserve row order: queries must be self-ordered
        h.update(ln.encode())
        h.update(b"\x1e")
    return h.hexdigest()


def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    con = duckdb.connect()
    con.execute("SET TimeZone='UTC'")
    for t in TABLES:
        p = Path(sf_dir) / f"{t}.parquet"
        if p.exists():
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")

    oracle = json.loads((Path(out_dir) / "oracle_sql.json").read_text())
    failures = []
    for name, sql in sorted(oracle.items()):
        res_dir = Path(out_dir) / name
        if not res_dir.exists():
            failures.append((name, "no spark result dir"))
            continue
        try:
            got = con.execute(
                f"SELECT * FROM read_parquet('{res_dir}/*.parquet')").fetchall()
            got_cols = [d[0] for d in con.description]
            want = con.execute(sql).fetchall()
            want_cols = [d[0] for d in con.description]
        except Exception as e:
            failures.append((name, f"exec error: {e}"))
            continue
        # HUGEINT lint (r12 post-mortem): fetchall() coerces HUGEINT to int so
        # this script CANNOT reproduce the driver's canonicalization divergence
        # ("0.0" vs "0" via a float64 arrow/pandas fetch path). Any oracle
        # emitting a HUGEINT column fails here with a direct instruction.
        try:
            rel = con.sql(sql)
            hug = [c for c, t in zip(rel.columns, rel.types)
                   if "HUGEINT" in str(t).upper()]
        except Exception:
            hug = []
        if hug:
            failures.append((name, f"oracle emits HUGEINT column(s) {hug}: "
                             "CAST(... AS BIGINT) — the driver's hasher "
                             "canonicalizes HUGEINT differently (r12)"))
            continue
        if sorted(got_cols) != sorted(want_cols):
            failures.append((name, f"cols: spark={sorted(got_cols)} oracle={sorted(want_cols)}"))
            continue
        if len(got) != len(want):
            failures.append((name, f"rows: spark={len(got)} oracle={len(want)}"))
            continue
        gs, ws = frame_sig(got_cols, got), frame_sig(want_cols, want)
        if gs != ws:
            # show first differing row for debugging
            order_g = sorted(range(len(got_cols)), key=lambda i: got_cols[i])
            order_w = sorted(range(len(want_cols)), key=lambda i: want_cols[i])
            diff = ""
            for i, (g, w) in enumerate(zip(got, want)):
                gg = [canon(g[j]) for j in order_g]
                ww = [canon(w[j]) for j in order_w]
                if gg != ww:
                    diff = f" first diff row {i}: spark={gg} oracle={ww}"
                    break
            failures.append((name, "value hash mismatch" + diff))
        else:
            print(f"  OK   {name} ({len(got)} rows)")
    for name, why in failures:
        print(f"  FAIL {name}: {why}")
    # queries with no oracle entry: weaker rows-only presence check
    for d in sorted(Path(out_dir).iterdir()):
        if d.is_dir() and d.name not in oracle:
            n = con.execute(
                f"SELECT count(*) FROM read_parquet('{d}/*.parquet')").fetchone()[0]
            status = "ok" if n > 0 else "EMPTY"
            print(f"  ROWS {d.name}: {n} ({status})")
            if n == 0:
                failures.append((d.name, "rows-only check: 0 rows"))
    # every declared query key must have produced a result dir, oracle or not
    # (a broken non-SQL-expressible op must not silently pass — ADVICE r1)
    keys_file = Path(out_dir) / "query_keys.json"
    if keys_file.exists():
        for k in json.loads(keys_file.read_text()):
            if not (Path(out_dir) / k).exists():
                failures.append((k, "declared query produced no result dir"))
    print(f"{len(oracle) - sum(1 for f in failures if f[0] in oracle)}/{len(oracle)} oracle-checked queries OK")
    sys.exit(1 if failures else 0)


if __name__ == "__main__":
    main()
