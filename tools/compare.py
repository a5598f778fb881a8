#!/usr/bin/env python3
"""Dev tool: DuckDB-compare dumped query results (mirrors the driver's
rows/schema/hash check). Usage: compare.py <sfDir> <outDir> <name>..."""
import sys, os, glob, duckdb, pyarrow.parquet as pq

sfdir, outdir = sys.argv[1], sys.argv[2]
names = sys.argv[3:]
TABLES = ["region","nation","customer","supplier","part","orders",
          "lineitem","events","documents","embeddings"]

for name in names:
    con = duckdb.connect()
    for t in TABLES:
        # testdata ships single files; ScaleUp corpora (10x decade dirs)
        # are Spark-written DIRECTORIES — glob those
        src = f"{sfdir}/{t}.parquet"
        if os.path.isdir(src):
            src = f"{src}/*.parquet"
        try:
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{src}'")
        except Exception:
            pass
    files = glob.glob(f"{outdir}/{name}/*.parquet")
    spark_tbl = pq.read_table(files[0]) if len(files) == 1 else pq.read_table(f"{outdir}/{name}")
    sql = open(f"{outdir}/{name}.sql").read()
    ora = con.sql(sql).arrow()
    s_cols, o_cols = sorted(spark_tbl.column_names), sorted(ora.column_names)
    rows = (spark_tbl.num_rows, ora.num_rows)
    ok_rows = rows[0] == rows[1]
    ok_schema = s_cols == o_cols
    ok_hash = False
    if ok_rows and ok_schema:
        s = spark_tbl.select(s_cols).to_pylist()
        o = ora.select(o_cols).to_pylist()
        norm = lambda rs: [tuple((k, round(v, 9) if isinstance(v, float) else v)
                                 for k, v in sorted(r.items())) for r in rs]
        ok_hash = norm(s) == norm(o)
        if not ok_hash:
            for i, (a, b) in enumerate(zip(norm(s), norm(o))):
                if a != b:
                    print(f"  first diff row {i}:\n   spark {a}\n   ora   {b}")
                    break
    print(f"{name}: rows={ok_rows}({rows[0]}/{rows[1]}) schema={ok_schema} values={ok_hash}")
