#!/usr/bin/env python3
"""Local replica of the driver's correctness gate: run each oracle SQL in
DuckDB against the testdata parquet tables, compare (sorted rows, columns
sorted by name) against the Spark parquet written by graft.Verify.

Usage: python3 tools/check_oracle.py <sfDir> <verifyOutDir>
"""
import sys, json, glob, os
import duckdb
import pyarrow.parquet as pq

TABLES = ["region","nation","customer","supplier","part","orders",
          "lineitem","events","documents","embeddings"]

def norm(v):
    # None → (0,) sentinel so mixed None/value columns stay totally ordered
    if v is None:
        return (0,)
    if isinstance(v, float):
        return (1, round(v, 9))
    if isinstance(v, list):
        return (1, tuple(norm(x) for x in v))
    if isinstance(v, dict):
        return (1, tuple(sorted((k, norm(x)) for k, x in v.items())))
    return (1, v)

def rows_of(table):
    cols = sorted(table.column_names)
    data = [table.column(c).to_pylist() for c in cols]
    return cols, sorted(tuple(norm(v) for v in row) for row in zip(*data))

def main(sf_dir, out_dir):
    con = duckdb.connect()
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    # optional memory cap (GB) so a heavy oracle can't OOM a shared box
    if os.environ.get("ORACLE_MEM_GB"):
        con.execute(f"SET memory_limit = '{os.environ['ORACLE_MEM_GB']}GB'")
    # optional spill dir: an in-memory duckdb has NO temp directory, so a
    # pair-join oracle that exceeds the cap aborts (or the OS OOM-kills
    # the process — seen on dd5 at sf1) instead of spilling; pointing
    # temp_directory at disk lets the heavy oracles offload
    if os.environ.get("ORACLE_TMP_DIR"):
        os.makedirs(os.environ["ORACLE_TMP_DIR"], exist_ok=True)
        con.execute(f"SET temp_directory = '{os.environ['ORACLE_TMP_DIR']}'")
        con.execute("SET max_temp_directory_size = '200GB'")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    # optional comma-separated prefix filter (3rd arg) for partial reruns
    only = sys.argv[3].split(",") if len(sys.argv) > 3 else None
    n_ok = n_bad = n_rowsonly = 0
    for name in sorted(oracle):
        if only is not None and not any(name.startswith(p) for p in only):
            continue
        spark_files = glob.glob(f"{out_dir}/{name}/*.parquet")
        if not spark_files:
            print(f"MISSING spark output: {name}"); n_bad += 1; continue
        sp = pq.read_table(spark_files[0])
        try:
            du = con.execute(oracle[name]).arrow()
        except Exception as e:
            print(f"ORACLE-ERR {name}: {e}"); n_bad += 1; continue
        sc, sr = rows_of(sp)
        dc, dr = rows_of(du)
        if sc != dc:
            print(f"COLS-MISMATCH {name}: spark={sc} duck={dc}"); n_bad += 1
        elif sr != dr:
            print(f"ROWS-MISMATCH {name}: spark {len(sr)} rows vs duck {len(dr)}")
            for a, b in list(zip(sr, dr))[:3]:
                if a != b: print(f"   spark={a}\n    duck={b}")
            if len(sr) != len(dr):
                only_s = [r for r in sr[:5] if r not in dr[:100]]
                print(f"   sample spark-only: {only_s[:2]}")
            n_bad += 1
        else:
            print(f"OK {name} ({len(sr)} rows)"); n_ok += 1
        # schema dump for eyeballing type drift
        st = {f.name: str(f.type) for f in sp.schema}
        dt = {f.name: str(f.type) for f in du.schema}
        if st != dt:
            print(f"   (schema note {name}: spark={st} duck={dt})")
    # rows-only queries (no oracle)
    for p in sorted(glob.glob(f"{out_dir}/*/")):
        name = p.rstrip("/").split("/")[-1]
        if name not in oracle:
            files = glob.glob(f"{p}/*.parquet")
            nr = pq.read_table(files[0]).num_rows if files else -1
            print(f"ROWS-ONLY {name}: {nr} rows" + (" (EMPTY!)" if nr <= 0 else ""))
            n_rowsonly += 1
    print(f"\n{n_ok} ok, {n_bad} bad, {n_rowsonly} rows-only")
    return 1 if n_bad else 0

if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
