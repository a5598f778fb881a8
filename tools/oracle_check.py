#!/usr/bin/env python3
"""Local replica of the driver's t2 correctness gate.

Usage: python3 tools/oracle_check.py <sfDir> <verifyOutDir> [names_csv]

Reads each <out>/<name> parquet written by graft.Verify, runs the matching
oracle SQL from <out>/oracle_sql.json in DuckDB (tables = views over the
sfDir parquet), sorts columns by name + rows, and compares values.

Parallelism (VERDICT r13 #2 — the serial compare was over half the decade
cert's wall): queries fan out over a process pool (ORACLE_JOBS, default
min(8, cpus/4)), each worker holding its own DuckDB connection with a
bounded thread count and memory share. PASS lines stream as they complete
(so a killed run still shows what it proved, same as the old serial loop);
anything the pool FAILED or never returned is re-checked serially in the
main process with an unbounded default connection before the verdict is
printed — a worker-resource failure (OOM inside a capped worker, a pool
crash) can therefore never manufacture a FAIL, only cost a retry. The
final "== N pass, M fail ==" summary line still proves the compare ran to
the end. ORACLE_JOBS=1 keeps the fully-serial behavior.
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


def connect(sf_dir, threads=None, mem_bytes=None):
    con = duckdb.connect()
    if threads:
        con.execute(f"SET threads={threads}")
    if mem_bytes:
        con.execute(f"SET memory_limit='{mem_bytes // (1 << 20)}MB'")
    for t in TABLES:
        # testdata ships single files; ScaleUp corpora (10x decade dirs)
        # are Spark-written DIRECTORIES — glob those (compare.py does the
        # same), so the decade-scale certification runs with this tool
        src = f"{sf_dir}/{t}.parquet"
        if os.path.isdir(src):
            src = f"{src}/*.parquet"
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{src}')")
    return con


def check_one(con, out_dir, name, sql):
    """Returns (ok, lines_to_print)."""
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
        return False, [f"FAIL {name}: {e}"]
    # Type-tag check: the driver's hasher distinguishes DuckDB HUGEINT
    # (arrow decimal128) from BIGINT — an oracle sum() over integers
    # must be cast to BIGINT or it fails the driver gate even when
    # values match (round-2 pipeline_corpus_prep lesson). i32 vs i64
    # is NOT flagged (driver passed knn_self_join's int rank).
    tytags = {f.name: str(f.type) for f in et.schema}
    wide = [c for c, t in tytags.items() if t.startswith("decimal128")]
    if wide:
        return False, [f"FAIL {name}: oracle returns HUGEINT column(s) "
                       f"{wide} — cast to BIGINT in the oracle SQL"]
    gc, gr = canon(got_rows, got_cols)
    ec, er = canon(exp_rows, exp_cols)
    if gc != ec:
        return False, [f"FAIL {name}: columns spark={gc} oracle={ec}"]
    if gr != er:
        diffs = [i for i, (a, b) in enumerate(zip(gr, er)) if a != b]
        lines = [f"FAIL {name}: rows spark={len(gr)} oracle={len(er)} "
                 f"first-diffs={diffs[:3]}"]
        for i in diffs[:3]:
            lines.append(f"   spark:  {gr[i]}")
            lines.append(f"   oracle: {er[i]}")
        if len(gr) != len(er):
            lines.append(f"   spark[0:2]={gr[:2]}")
            lines.append(f"   oracle[0:2]={er[:2]}")
        return False, lines
    return True, [f"PASS {name} ({len(gr)} rows)"]


# ---- worker-side state (one DuckDB connection per pool process)
_wcon = None
_wout = None


def _winit(sf_dir, out_dir, threads, mem_bytes):
    global _wcon, _wout
    _wout = out_dir
    _wcon = connect(sf_dir, threads=threads, mem_bytes=mem_bytes)


def _wcheck(item):
    name, sql = item
    return name, check_one(_wcon, _wout, name, sql)


def total_ram():
    try:
        return os.sysconf("SC_PHYS_PAGES") * os.sysconf("SC_PAGE_SIZE")
    except (ValueError, OSError):
        return 16 << 30


def main(sf_dir, out_dir, names=None):
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    # Optional name filter (mirrors graft.Verify's third arg): lets the
    # exact driver-gate replica run on a certified SLICE — e.g. the
    # decade-scale 10x corpus, where guard-boundary / recall-gate
    # entries are exempt by documented contract (SURVEY §6.7).
    if names:
        oracle = {k: v for k, v in oracle.items() if k in names}
    items = sorted(oracle.items())
    cpus = os.cpu_count() or 4
    jobs = int(os.environ.get("ORACLE_JOBS", "0")) or min(8, max(1, cpus // 4))
    results = {}
    if jobs > 1 and len(items) > 1:
        # 60% of RAM split across workers; 4 threads each — the pool's
        # aggregate stays below the box even next to a live Spark JVM
        mem_each = int(total_ram() * 0.6) // jobs
        from concurrent import futures
        try:
            with futures.ProcessPoolExecutor(
                    max_workers=jobs, initializer=_winit,
                    initargs=(sf_dir, out_dir, 4, mem_each)) as ex:
                futs = {ex.submit(_wcheck, it): it[0] for it in items}
                for f in futures.as_completed(futs):
                    try:
                        name, (ok, lines) = f.result()
                    except Exception as e:
                        results[futs[f]] = (False, [
                            f"FAIL {futs[f]}: worker error: {e}"])
                        continue
                    results[name] = (ok, lines)
                    if ok:  # stream passes; failures wait for the retry
                        print(lines[0], flush=True)
        except Exception as e:
            print(f"[oracle] pool error, falling back serial: {e}",
                  flush=True)
    # Serial pass: everything the pool failed or never returned, on a
    # fresh default connection (no thread/memory caps) — deterministic
    # mismatches re-fail identically; worker-resource casualties recover.
    retry = [it for it in items
             if it[0] not in results or not results[it[0]][0]]
    if retry:
        con = connect(sf_dir)
        for name, sql in retry:
            ok, lines = check_one(con, out_dir, name, sql)
            results[name] = (ok, lines)
            for ln in lines:
                print(ln, flush=True)
    n_pass = sum(1 for ok, _ in results.values() if ok)
    n_fail = len(results) - n_pass
    print(f"== {n_pass} pass, {n_fail} fail ==")
    return 1 if n_fail else 0


if __name__ == "__main__":
    only = set(sys.argv[3].split(",")) if len(sys.argv) > 3 else None
    sys.exit(main(sys.argv[1], sys.argv[2], only))
