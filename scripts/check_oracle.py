#!/usr/bin/env python3
"""Local replica of the driver's correctness gate.

Runs `graft.Verify` output (parquet per query + oracle_sql.json) against
DuckDB over the same sf dir and reports per-query match status. Usage:

    sbt -batch "runMain graft.Verify /root/testdata/sf0.01 /tmp/verify_out"
    python3 scripts/check_oracle.py /root/testdata/sf0.01 /tmp/verify_out

Each query runs in its own FORKED subprocess: DuckDB's memory accounting
is process-global, and one explode-heavy oracle at the 100x rehearsal
corpora (text_keywords_rake) leaves reservations behind that make ANY
later heavy query in the same process die with a bad-allocation OOM —
on a fresh connection, even after con.close(). Process isolation is the
only reliable fence (reproduced + bisected, r8).
"""
import sys, os, json, glob
import multiprocessing as mp
import duckdb
import pandas as pd
import numpy as np

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    for c in df.columns:
        if pd.api.types.is_datetime64_any_dtype(df[c]):
            df[c] = pd.to_datetime(df[c]).astype("datetime64[us]")
    return df.sort_values(by=list(df.columns), ignore_index=True)


def fresh_con(sf_dir):
    con = duckdb.connect()
    # explicit budget + spill dir: the default allocator config OOM'd
    # on explode-heavy oracles at the 100x corpora. Both knobs scale
    # down via env when several fork-isolated children run at once
    # (CHECK_ORACLE_PROCS below) so concurrent heavy oracles spill
    # instead of overcommitting the box.
    con.execute(f"SET memory_limit='{os.environ.get('CHECK_ORACLE_MEM', '100GB')}'")
    # per-PID spill dir: concurrent DuckDB instances sharing one
    # temp_directory delete each other's duckdb_temp_storage files and
    # abort with an IOException (observed at the r10 sf10skew gate)
    # DuckDB creates only the leaf temp dir — a wiped /tmp (fresh boot)
    # otherwise fails every spilling oracle with "Failed to create
    # directory" (observed at the r12 sf10cluster gate)
    os.makedirs("/tmp/duckspill", exist_ok=True)
    con.execute(f"SET temp_directory='/tmp/duckspill/{os.getpid()}'")
    # 32 threads amplify per-operator reservation on the explode-heavy
    # oracles enough to trip the limit nondeterministically
    con.execute(f"SET threads={os.environ.get('CHECK_ORACLE_THREADS', '16')}")
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.isdir(p):
            # Spark-written table (ScaleGen rehearsal): directory of
            # part files; the driver fixtures are single files
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}/*.parquet'")
        elif os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")
    return con


def check_one(args):
    """(ok, lines) for one query — runs in a fork-isolated child."""
    sf_dir, out_dir, name, sql = args
    lines = []
    res_dir = f"{out_dir}/{name}"
    con = fresh_con(sf_dir)
    try:
        got = canon(con.execute(
            f"SELECT * FROM '{res_dir}/*.parquet'").fetchdf())
        want = canon(con.execute(sql).fetchdf())
    except Exception as e:
        return False, [f"FAIL  {name}: {e}"]
    finally:
        con.close()
        # dead-pid spill dirs otherwise accumulate across gate runs
        # (2.2 GB observed) and shrink the headroom concurrent heavy
        # oracles spill into
        import shutil
        shutil.rmtree(f"/tmp/duckspill/{os.getpid()}", ignore_errors=True)
    if list(got.columns) != list(want.columns):
        return False, [
            f"FAIL  {name}: columns {list(got.columns)} vs {list(want.columns)}"]
    if len(got) != len(want):
        return False, [f"FAIL  {name}: rows {len(got)} vs {len(want)}"]
    bad_cols = []

    def kind_tag(s):
        """Coarse type class as the driver's byte-hash would see it:
        an int64 63024680400458 and a float64 6.3024680400458e13 render
        differently even though np.isclose passes. This is how the r8
        HUGEINT leak (uncast DuckDB sum() -> float64 vs Spark BIGINT)
        shipped green locally while the driver failed 4 queries."""
        k = s.dtype.kind
        if k in "iu":
            return "int"
        if k == "f":
            return "float"
        if k == "b":
            return "bool"
        if k == "O":
            # object column: HUGEINT/DECIMAL leaks can fetch as Python
            # int/Decimal objects; classify by the first non-null value
            for v in s:
                if v is None or (isinstance(v, float) and np.isnan(v)):
                    continue
                if isinstance(v, bool):
                    return "bool"
                if isinstance(v, (int, np.integer)):
                    return "int"
                if isinstance(v, float):
                    return "float"
                import decimal
                if isinstance(v, decimal.Decimal):
                    return "decimal"
                return "other"
            return "empty"
        return "other"

    for c in got.columns:
        a, b = got[c], want[c]
        ta, tb = kind_tag(a), kind_tag(b)
        # driver-faithful dtype gate (VERDICT r8 item 2): numeric class
        # mismatch = FAIL even when every value compares equal. The one
        # benign asymmetry is all-null vs all-null ("empty") columns.
        numeric = {"int", "float", "bool", "decimal"}
        if ta != tb and (ta in numeric or tb in numeric) \
                and "empty" not in (ta, tb):
            bad_cols.append((c, f"dtype {a.dtype}/{ta} vs {b.dtype}/{tb}"))
            continue
        if pd.api.types.is_float_dtype(a) or pd.api.types.is_float_dtype(b):
            af = a.astype(float).to_numpy()
            bf = b.astype(float).to_numpy()
            eq = np.isclose(af, bf, rtol=0, atol=0, equal_nan=True)
            # The driver hashes BYTES, where -0.0 != +0.0; np.isclose
            # can't see that (|a-b| == 0), which is exactly how the r7
            # embed_kmeans signed-zero defect shipped green locally.
            # Mirror the byte semantics: where both are zero, the sign
            # bit must match too.
            zero = (af == 0) & (bf == 0)
            sign_ok = ~zero | (np.signbit(af) == np.signbit(bf))
            exact = bool((eq & sign_ok).all())
            close = bool(np.isclose(af, bf,
                                    rtol=1e-9, atol=1e-9, equal_nan=True).all())
            if not exact:
                label = ("signed-zero" if bool(eq.all()) else
                         "float-exact" if close else "float-DIFF")
                bad_cols.append((c, label))
        else:
            if not a.astype(str).equals(b.astype(str)):
                bad_cols.append((c, "value"))
    # by-construction sweep (VERDICT r7 item 2): no output cell should
    # be -0.0 in EITHER engine — a matching -0.0/-0.0 pair still hashes
    # green but means a leaf is unnormalized and one engine upgrade away
    # from diverging. Warn loudly without failing the gate.
    for side, df in (("spark", got), ("oracle", want)):
        for c in df.columns:
            if pd.api.types.is_float_dtype(df[c]):
                v = df[c].to_numpy()
                nz = int(((v == 0) & np.signbit(v)).sum())
                if nz:
                    lines.append(
                        f"NEGZ  {name}: {nz} -0.0 cells in {side}.{c} "
                        f"(unnormalized rounded leaf)")
    if bad_cols:
        lines.append(f"FAIL  {name}: mismatched cols {bad_cols}")
        for c, _ in bad_cols[:2]:
            mask = got[c].astype(str) != want[c].astype(str)
            lines.append(str(got[mask].head(3)))
            lines.append(str(want[mask].head(3)))
        return False, lines
    lines.append(f"ok    {name} ({len(got)} rows)")
    return True, lines


def main(sf_dir, out_dir):
    # sweep dead-pid spill dirs at startup: the per-query cleanup in
    # check_one never runs for OOM-killed children or aborted gate runs,
    # which are exactly the runs that spill most (2.2 GB observed)
    import shutil
    for d in glob.glob("/tmp/duckspill/*"):
        pid = os.path.basename(d)
        if pid.isdigit() and not os.path.exists(f"/proc/{pid}"):
            shutil.rmtree(d, ignore_errors=True)
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    # resume support: skip queries already 'ok' in a previous (partial)
    # report — CHECK_ORACLE_SKIP=<path to that report>. Only ok lines
    # are trusted; failures re-run.
    skip = {}  # name -> the trusted ok line, re-emitted so the resumed
    # report is self-consistent (N ok lines for an "N ok" total) and a
    # second resume can chain off it
    skip_file = os.environ.get("CHECK_ORACLE_SKIP")
    if skip_file and os.path.exists(skip_file):
        for line in open(skip_file):
            if line.startswith("ok    "):
                skip[line.split()[1]] = line.rstrip("\n")
        print(f"skipping {len(skip)} already-ok queries from {skip_file}",
              file=sys.stderr)
    n_ok = n_bad = 0
    tasks = []
    for name in sorted(oracle):
        if name in skip:
            print(skip[name], flush=True)
            n_ok += 1
            continue
        if not glob.glob(f"{out_dir}/{name}/*.parquet"):
            print(f"FAIL  {name}: no spark output")
            n_bad += 1
            continue
        tasks.append((sf_dir, out_dir, name, oracle[name]))
    ctx = mp.get_context("fork")
    # maxtasksperchild=1 -> a genuinely fresh process per query (the r8
    # DuckDB reservation-leak fence). CHECK_ORACLE_PROCS>1 runs several
    # such fresh processes at once — isolation is per-process either
    # way; pair it with CHECK_ORACLE_MEM/_THREADS so n concurrent heavy
    # oracles fit the box (e.g. PROCS=4 MEM=24GB THREADS=8).
    procs = int(os.environ.get("CHECK_ORACLE_PROCS", "1"))
    # CHECK_ORACLE_UNORDERED=1 prints results as they complete instead
    # of input order, so a killed run's partial output reflects ALL
    # finished work (imap buffers everything behind the slowest
    # head-of-line query). Sort the ok-lines afterwards if a stable
    # report is needed.
    with ctx.Pool(processes=procs, maxtasksperchild=1) as pool:
        it = (pool.imap_unordered
              if os.environ.get("CHECK_ORACLE_UNORDERED") == "1"
              else pool.imap)(check_one, tasks)
        for ok, lines in it:
            for l in lines:
                print(l, flush=True)
            if ok:
                n_ok += 1
            else:
                n_bad += 1
    # queries without oracle -> rows-only
    have_oracle = set(oracle)
    con = fresh_con(sf_dir)
    for d in sorted(os.listdir(out_dir)):
        if os.path.isdir(f"{out_dir}/{d}") and d not in have_oracle:
            n = con.execute(f"SELECT count(*) FROM '{out_dir}/{d}/*.parquet'").fetchone()[0]
            print(f"rows  {d}: {n} rows (no oracle)")
    print(f"\n{n_ok} ok, {n_bad} failed")
    return 1 if n_bad else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
