#!/usr/bin/env python3
"""Local replica of the driver's t2 correctness gate.

Usage: python3 tools/oracle_check.py <sfDir> <verifyOutDir>

Reads each <out>/<name> parquet written by graft.Verify, runs the matching
oracle SQL from <out>/oracle_sql.json in DuckDB (tables = views over the
sfDir parquet), sorts columns by name + rows, and compares values.
"""
import json, math, os, sys
import duckdb

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


def canon(rows, cols):
    """Sort columns by name, then rows; normalize floats/ints."""
    order = sorted(range(len(cols)), key=lambda i: cols[i])

    def norm(v):
        if isinstance(v, bool):
            return ("b", v)
        if isinstance(v, float):
            if math.isnan(v):
                return ("f", "nan")
            return ("f", round(v, 9))
        if isinstance(v, int):
            return ("i", v)
        return ("s", str(v))

    out = [tuple(norm(r[i]) for i in order) for r in rows]
    out.sort()
    return [cols[i] for i in order], out


def main(sf_dir, out_dir, names=None):
    con = duckdb.connect()
    for t in TABLES:
        # testdata ships single files; ScaleUp corpora (10x decade dirs)
        # are Spark-written DIRECTORIES — glob those (compare.py does the
        # same), so the decade-scale certification runs with this tool
        src = f"{sf_dir}/{t}.parquet"
        if os.path.isdir(src):
            src = f"{src}/*.parquet"
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{src}')")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    # Optional name filter (mirrors graft.Verify's third arg): lets the
    # exact driver-gate replica run on a certified SLICE — e.g. the
    # decade-scale 10x corpus, where guard-boundary / recall-gate
    # entries are exempt by documented contract (SURVEY §6.7).
    if names:
        oracle = {k: v for k, v in oracle.items() if k in names}
    n_pass = n_fail = 0
    for name, sql in sorted(oracle.items()):
        try:
            gt = con.execute(
                f"SELECT * FROM read_parquet('{out_dir}/{name}/*.parquet')"
            ).arrow()
            got_cols = [f.name for f in gt.schema]
            got_rows = list(zip(*[c.to_pylist() for c in gt.columns])) \
                if gt.num_columns else []
            et = con.execute(sql).arrow()
            exp_cols = [f.name for f in et.schema]
            exp_rows = list(zip(*[c.to_pylist() for c in et.columns])) \
                if et.num_columns else []
        except Exception as e:
            print(f"FAIL {name}: {e}")
            n_fail += 1
            continue
        # Type-tag check: the driver's hasher distinguishes DuckDB HUGEINT
        # (arrow decimal128) from BIGINT — an oracle sum() over integers
        # must be cast to BIGINT or it fails the driver gate even when
        # values match (round-2 pipeline_corpus_prep lesson). i32 vs i64
        # is NOT flagged (driver passed knn_self_join's int rank).
        tytags = {f.name: str(f.type) for f in et.schema}
        wide = [c for c, t in tytags.items() if t.startswith("decimal128")]
        if wide:
            print(f"FAIL {name}: oracle returns HUGEINT column(s) {wide} "
                  f"— cast to BIGINT in the oracle SQL")
            n_fail += 1
            continue
        gc, gr = canon(got_rows, got_cols)
        ec, er = canon(exp_rows, exp_cols)
        if gc != ec:
            print(f"FAIL {name}: columns spark={gc} oracle={ec}")
            n_fail += 1
        elif gr != er:
            diffs = [i for i, (a, b) in enumerate(zip(gr, er)) if a != b]
            print(f"FAIL {name}: rows spark={len(gr)} oracle={len(er)} "
                  f"first-diffs={diffs[:3]}")
            for i in diffs[:3]:
                print(f"   spark:  {gr[i]}")
                print(f"   oracle: {er[i]}")
            if len(gr) != len(er):
                print(f"   spark[0:2]={gr[:2]}")
                print(f"   oracle[0:2]={er[:2]}")
            n_fail += 1
        else:
            print(f"PASS {name} ({len(gr)} rows)")
            n_pass += 1
    print(f"== {n_pass} pass, {n_fail} fail ==")
    return 1 if n_fail else 0


if __name__ == "__main__":
    only = set(sys.argv[3].split(",")) if len(sys.argv) > 3 else None
    sys.exit(main(sys.argv[1], sys.argv[2], only))
