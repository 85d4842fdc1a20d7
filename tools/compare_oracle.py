#!/usr/bin/env python3
"""Dev-only oracle cross-check (mirrors the driver's DuckDB compare).

Usage: python3 tools/compare_oracle.py <sfDir> <verifyOutDir>

Registers each parquet table from sfDir under its bare name, runs every
oracle_sql.json entry in DuckDB, and compares row count / column names /
values against the Spark result parquet written by graft.Verify.
"""
import sys, json, math
import duckdb

sfdir, outdir = sys.argv[1], sys.argv[2]
con = duckdb.connect()
for t in ["region","nation","customer","supplier","part","orders","lineitem",
          "events","documents","embeddings"]:
    con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sfdir}/{t}.parquet'")

oracle = json.load(open(f"{outdir}/oracle_sql.json"))
ok = fail = 0
for name, sql in sorted(oracle.items()):
    try:
        exp = con.sql(sql).fetchall()
        expcols = [d[0] for d in con.sql(sql).description]
        got_rel = con.sql(f"SELECT * FROM '{outdir}/{name}/*.parquet'")
        gotcols = [d[0] for d in got_rel.description]
        got = got_rel.fetchall()
        status = []
        if sorted(expcols) != sorted(gotcols):
            status.append(f"cols: oracle={expcols} spark={gotcols}")
        if len(exp) != len(got):
            status.append(f"rows: oracle={len(exp)} spark={len(got)}")
        if not status:
            # compare with columns sorted by name, rows sorted
            ei = [expcols.index(c) for c in sorted(expcols)]
            gi = [gotcols.index(c) for c in sorted(gotcols)]
            def norm(v):
                if isinstance(v, float):
                    return round(v, 9)
                return v
            erows = sorted([tuple(norm(r[i]) for i in ei) for r in exp])
            grows = sorted([tuple(norm(r[i]) for i in gi) for r in got])
            bad = [(a, b) for a, b in zip(erows, grows) if a != b]
            if bad:
                status.append(f"values: {len(bad)} mismatched rows; first: oracle={bad[0][0]} spark={bad[0][1]}")
        if status:
            fail += 1
            print(f"FAIL {name}: " + " | ".join(status))
        else:
            ok += 1
            print(f"OK   {name} ({len(exp)} rows)")
    except Exception as e:
        fail += 1
        print(f"ERR  {name}: {str(e)[:300]}")
print(f"\n{ok} ok, {fail} fail")
sys.exit(1 if fail else 0)
