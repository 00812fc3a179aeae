#!/usr/bin/env python3
"""Local stand-in for the driver's DuckDB-oracle correctness gate.

Usage: python3 scripts/check.py <sfDir> <verifyOutDir>

Reads each <verifyOutDir>/<name>/ parquet (written by graft.Verify), runs the
matching SQL from oracle_sql.json in DuckDB with views over <sfDir>/*.parquet,
and compares: column names (sorted), dtypes, row count, and values. Stricter
than the driver so that passing here implies passing there.
"""
import json, sys, glob, os
import duckdb
import pyarrow.parquet as pq
import pyarrow as pa

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()

def norm_cell(v):
    if isinstance(v, float):
        return round(v, 9)
    return v

def table_to_rows(t: pa.Table):
    cols = sorted(t.column_names)
    data = {c: t.column(c).to_pylist() for c in cols}
    rows = [tuple(norm_cell(data[c][i]) for c in cols) for i in range(t.num_rows)]
    return cols, rows

def main(sf_dir, out_dir):
    con = duckdb.connect()
    for tbl in TABLES:
        p = f"{sf_dir}/{tbl}.parquet"
        if os.path.exists(p):
            con.sql(f"CREATE VIEW {tbl} AS SELECT * FROM '{p}'")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_pass = n_fail = 0
    for name in sorted(oracle):
        qdir = f"{out_dir}/{name}"
        files = glob.glob(f"{qdir}/*.parquet")
        if not files:
            print(f"FAIL {name}: no spark output at {qdir}")
            n_fail += 1
            continue
        got = pq.read_table(files[0]) if len(files) == 1 else pa.concat_tables([pq.read_table(f) for f in files])
        try:
            exp = con.sql(oracle[name]).arrow()
        except Exception as e:
            print(f"FAIL {name}: oracle errored: {e}")
            n_fail += 1
            continue
        gc, gr = table_to_rows(got)
        ec, er = table_to_rows(exp)
        ok = True
        if gc != ec:
            print(f"FAIL {name}: columns differ spark={gc} duck={ec}")
            ok = False
        gtypes = {f.name: str(f.type) for f in got.schema}
        etypes = {f.name: str(f.type) for f in exp.schema}
        if ok and gtypes != etypes:
            print(f"WARN {name}: dtypes differ spark={gtypes} duck={etypes}")
        if ok and len(gr) != len(er):
            print(f"FAIL {name}: rowcount spark={len(gr)} duck={len(er)}")
            ok = False
        if ok:
            for i, (a, b) in enumerate(zip(gr, er)):
                if a != b:
                    print(f"FAIL {name}: row {i} differs\n  spark={a}\n  duck ={b}")
                    ok = False
                    break
        if ok:
            print(f"PASS {name} ({len(gr)} rows)")
            n_pass += 1
        else:
            n_fail += 1
    # queries without an oracle → rows-only
    for qdir in sorted(glob.glob(f"{out_dir}/*/")):
        name = os.path.basename(qdir.rstrip("/"))
        if name in oracle:
            continue
        files = glob.glob(f"{qdir}/*.parquet")
        n = sum(pq.read_metadata(f).num_rows for f in files) if files else -1
        print(f"INFO {name}: no oracle, rows={n}")
    print(f"== {n_pass} pass / {n_fail} fail ==")
    return 1 if n_fail else 0

if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
