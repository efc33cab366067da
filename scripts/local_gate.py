#!/usr/bin/env python3
"""Local replica of the driver's correctness gate.

Run `graft.Verify <sfDir> <outDir>` first; then this script loads each
`<outDir>/<name>` parquet result, runs the matching `oracle_sql.json`
entry in DuckDB over the same sf directory's parquet tables, and compares
row count, schema (column names sorted), and a canonical value hash.

Usage: python3 scripts/local_gate.py <sfDir> <outDir> [name ...]
"""
import sys, os, json, glob, hashlib
import duckdb
import pyarrow.parquet as pq

TABLES = ["region", "nation", "customer", "supplier", "part", "partsupp",
          "orders", "lineitem", "events", "documents", "embeddings"]

def canon(val):
    # Canonicalize a cell: floats rounded to 9 significant digits so
    # DuckDB double formatting and Spark's agree; None unified.
    if val is None:
        return ""
    if isinstance(val, float):
        if val != val:
            return "nan"
        return format(val, ".9g")
    if isinstance(val, bytes):
        return val.hex()
    if isinstance(val, list):
        return "[" + ",".join(canon(v) for v in val) + "]"
    return str(val)

def frame_hash(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    lines = sorted("|".join(canon(r[i]) for i in order) for r in rows)
    h = hashlib.sha256()
    for ln in lines:
        h.update(ln.encode("utf-8", "surrogatepass"))
        h.update(b"\n")
    return h.hexdigest()

def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    only = set(sys.argv[3:])
    oracles = json.load(open(os.path.join(out_dir, "oracle_sql.json")))
    con = duckdb.connect()
    for t in TABLES:
        p = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(p):
            con.execute(
                f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    n_pass = n_fail = n_skip = 0
    for name in sorted(oracles):
        if only and name not in only:
            continue
        res_dir = os.path.join(out_dir, name)
        files = glob.glob(os.path.join(res_dir, "*.parquet"))
        if not files:
            print(f"{name}: MISSING spark result")
            n_fail += 1
            continue
        spark_tbl = pq.read_table(files[0])
        spark_cols = list(spark_tbl.column_names)
        spark_rows = [tuple(d.values()) for d in spark_tbl.to_pylist()]
        try:
            cur = con.execute(oracles[name])
            o_cols = [d[0] for d in cur.description]
            o_rows = cur.fetchall()
        except Exception as e:
            print(f"{name}: ORACLE ERROR {e}")
            n_fail += 1
            continue
        ok_rows = len(spark_rows) == len(o_rows)
        ok_schema = sorted(spark_cols) == sorted(o_cols)
        ok_hash = (ok_rows and ok_schema and
                   frame_hash(spark_cols, spark_rows) ==
                   frame_hash(o_cols, o_rows))
        if ok_rows and ok_schema and ok_hash:
            n_pass += 1
        else:
            n_fail += 1
            print(f"{name}: rows={len(spark_rows)}/{len(o_rows)} "
                  f"schema={'ok' if ok_schema else sorted(spark_cols)}"
                  f"{'' if ok_schema else sorted(o_cols)} hash={ok_hash}")
    print(f"pass={n_pass} fail={n_fail}")
    sys.exit(1 if n_fail else 0)

if __name__ == "__main__":
    main()
