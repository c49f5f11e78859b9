#!/usr/bin/env python3
"""Local pre-check of the driver's correctness gate.

Usage: dev/check.py <verify_out_dir> <sf_dir> [query...]

Loads each <out>/<name> parquet (Spark result), runs the matching oracle
SQL from oracle_sql.json in DuckDB with the sf tables registered, and
compares: row count, sorted column names, and a hash over all values
(rows sorted, columns sorted by name, floats rounded to 9 significant-ish
decimals -- approximating whatever the driver does, but stricter).
"""
import sys, json, glob, math
import duckdb

TABLES = ["region","nation","customer","supplier","part","orders","lineitem",
          "events","documents","embeddings"]

def canon(v):
    if v is None: return "\x00NULL"
    if isinstance(v, float):
        if math.isnan(v): return "NaN"
        return f"{v:.9g}"
    if isinstance(v, bool): return str(int(v))
    return str(v)

def table_digest(cols, rows):
    idx = sorted(range(len(cols)), key=lambda i: cols[i])
    lines = sorted("\x01".join(canon(r[i]) for i in idx) for r in rows)
    import hashlib
    h = hashlib.md5()
    for ln in lines: h.update(ln.encode()); h.update(b"\n")
    return h.hexdigest()

def main():
    out_dir, sf_dir = sys.argv[1], sys.argv[2]
    only = set(sys.argv[3:])
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    n_pass = n_fail = 0
    for name, sql in sorted(oracle.items()):
        if only and name not in only: continue
        files = glob.glob(f"{out_dir}/{name}/*.parquet")
        if not files:
            print(f"FAIL {name}: no spark output"); n_fail += 1; continue
        try:
            sres = con.execute(f"SELECT * FROM read_parquet({files!r})")
            scols = [d[0] for d in sres.description]; srows = sres.fetchall()
            ores = con.execute(sql)
            ocols = [d[0] for d in ores.description]; orows = ores.fetchall()
        except Exception as e:
            print(f"FAIL {name}: exec error: {e}"); n_fail += 1; continue
        ok_schema = sorted(scols) == sorted(ocols)
        ok_rows = len(srows) == len(orows)
        ok_hash = ok_schema and ok_rows and \
            table_digest(scols, srows) == table_digest(ocols, orows)
        if ok_hash:
            print(f"PASS {name} ({len(srows)} rows)"); n_pass += 1
        else:
            n_fail += 1
            print(f"FAIL {name}: schema={ok_schema} rows={ok_rows}({len(srows)} vs {len(orows)}) hash={ok_hash}")
            if ok_schema and ok_rows:
                idx = sorted(range(len(scols)), key=lambda i: scols[i])
                s_sorted = sorted(tuple(canon(r[i]) for i in idx) for r in srows)
                o_sorted = sorted(tuple(canon(r[i]) for i in idx) for r in orows)
                for a, b in zip(s_sorted, o_sorted):
                    if a != b:
                        print(f"  first diff:\n   spark  {a}\n   oracle {b}")
                        break
            elif not ok_schema:
                print(f"  spark cols:  {sorted(scols)}\n  oracle cols: {sorted(ocols)}")
    # rows-only queries (no oracle)
    for d in sorted(glob.glob(f"{out_dir}/*/")):
        name = d.rstrip("/").split("/")[-1]
        if name in oracle or (only and name not in only): continue
        files = glob.glob(f"{d}/*.parquet")
        if files:
            n = con.execute(f"SELECT count(*) FROM read_parquet({files!r})").fetchone()[0]
            print(f"INFO {name}: rows-only, {n} rows")
    print(f"\n{n_pass} pass / {n_fail} fail")
    sys.exit(1 if n_fail else 0)

if __name__ == "__main__":
    main()
