#!/usr/bin/env python3
"""Local mimic of the driver's correctness gate.

Reads Verify's output dir (parquet per query + oracle_sql.json), registers the
testdata parquet tables as DuckDB views, runs each oracle SQL, and compares
row counts, column names/dtypes, and values (exact for non-floats, tolerant
then-exact-hash report for floats). Usage:

    python3 tools/selfcheck.py [--unordered] [--json OUT.json] [--timeout-sec N] [--only a,b,c] <sfDir> <verifyOutDir>

--unordered: order-INSENSITIVE comparison — both sides are canonically
  row-sorted over ALL columns before the exact compare, certifying row
  MULTISET equality. This is the deployment-shape gate: run Verify with
  SPARK_GRAFT_TERMINAL_SORT=false (terminal oracle sorts elided plan-wide,
  the production plan) and certify it computes the same rows as the DuckDB
  oracle regardless of arrival order (round-7 VERDICT next-round #1).
--json OUT.json: also write a machine-readable artifact (per-query status).
--timeout-sec N: interrupt any oracle running longer than N seconds and record
  it as `oracle_timeout` (a tractability exclusion for scale gates, not a
  verdict) — round 9, used by the 100x gate.
--only a,b,c: restrict the check to the named queries (round 11) — lets the
  100x wide gate run ONE ORACLE PER PROCESS (the round-9 lesson: a blown-up
  oracle poisons a shared DuckDB buffer manager) via a shell loop, with the
  per-query JSON artifacts merged afterwards.
--agg: AGGREGATE gate (round 13, for the 100x tail whose outputs exceed the
  full-compare row budget): instead of row-by-row compare, both sides are
  reduced to count(*) plus one order-independent aggregate per column —
  sum(CAST(x AS DECIMAL(38,6))) for numerics (exact, order-free),
  sum(length(x)) for strings, count(x) for temporal/nested — computed by
  DuckDB over the Spark parquet output AND over the oracle SQL, compared as
  strings (decimal-exact). A pass is recorded as `agg_pass`: weaker than the
  hash gate (row identity not certified) but sensitive to any dropped /
  duplicated / value-drifted row that changes a column sum.
"""
import sys, os, json, glob
import duckdb
import pandas as pd
import numpy as np

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

def canon(df):
    df = df.reindex(sorted(df.columns), axis=1)
    return df.reset_index(drop=True)

def row_sorted(df):
    """Deterministic total row order over ALL columns (multiset canon).

    Sort keys: native for numeric/bool/datetime (NaN last, stable), repr()
    for object columns (mixed None/str cells would otherwise break the
    comparison inside sort). Rows that tie on every key are identical
    rows, so order among them cannot affect the exact compare."""
    if len(df) == 0 or not len(df.columns):
        return df
    keys = pd.DataFrame({
        c: (df[c].map(repr) if df[c].dtype == object else df[c])
        for c in df.columns})
    order = keys.sort_values(by=list(df.columns), kind="mergesort").index
    return df.loc[order].reset_index(drop=True)

def agg_exprs(con, rel_sql):
    """Per-column order-independent aggregates over `rel_sql` (see --agg).

    Each column contributes BOTH a sum-style aggregate and a non-null
    count: SQL sum()/length() ignore NULLs, so without count(x) a value
    drift of NULL->0 (numeric) or NULL->'' (string) would change neither
    count(*) nor any column sum and pass silently (round-13 ADVICE #1).
    """
    cols = con.execute(f"DESCRIBE SELECT * FROM {rel_sql}").fetchall()
    exprs = []
    for name, ctype, *_ in cols:
        q = '"' + name.replace('"', '""') + '"'
        nn = f"CAST(count({q}) AS VARCHAR) || ':' || "
        t = ctype.upper()
        if any(t.startswith(p) for p in
               ("TINYINT", "SMALLINT", "INTEGER", "BIGINT", "HUGEINT",
                "UTINYINT", "USMALLINT", "UINTEGER", "UBIGINT",
                "FLOAT", "DOUBLE", "DECIMAL", "REAL")):
            exprs.append(f"{nn}CAST(sum(CAST({q} AS DECIMAL(38,6))) AS VARCHAR) AS {q}")
        elif t.startswith("VARCHAR"):
            exprs.append(f"{nn}CAST(sum(length({q})) AS VARCHAR) AS {q}")
        elif t.startswith("BOOLEAN"):
            exprs.append(f"{nn}CAST(sum(CAST({q} AS INT)) AS VARCHAR) AS {q}")
        else:  # temporal / nested: presence only
            exprs.append(f"CAST(count({q}) AS VARCHAR) AS {q}")
    return "count(*) AS __n_rows, " + ", ".join(exprs)

def main(sf_dir, out_dir, unordered=False, json_out=None, timeout_sec=None,
         only=None, agg=False):
    # Fresh connection factory (round 9): each oracle runs on its OWN
    # connection with a bounded memory_limit (override via SELFCHECK_MEM).
    # Rationale: a hex-blowup oracle at 100x exhausts the buffer manager,
    # and on a SHARED connection the failed query's reservation leaked —
    # every later oracle (even a parquet open) then malloc-failed. Per-query
    # connections make an OOM a self-contained tractability exclusion.
    def fresh_con():
        c = duckdb.connect()
        c.execute(f"SET memory_limit='{os.environ.get('SELFCHECK_MEM', '48GB')}'")
        for t in TABLES:
            p = f"{sf_dir}/{t}.parquet"
            if os.path.isdir(p):  # Spark-written dataset dir (ScaleGen output)
                p = f"{p}/*.parquet"
            elif not os.path.exists(p):
                continue
            c.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
        return c
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    if only:
        # fail fast on misspelled/renamed names (round-11 ADVICE): a silent
        # intersection would let a per-query 100x gate loop "pass" vacuously
        unknown = sorted(set(only) - set(oracle))
        if unknown:
            raise SystemExit(
                f"--only names absent from oracle_sql.json: {', '.join(unknown)}")
        oracle = {k: v for k, v in oracle.items() if k in only}
    n_pass = n_fail = 0
    report = {}
    def record(name, status, rows=None, detail=None):
        report[name] = {"status": status, "rows": rows}
        if detail:
            report[name]["detail"] = str(detail)[:500]
    for name in sorted(oracle):
        sql = oracle[name]
        pdir = f"{out_dir}/{name}"
        files = glob.glob(f"{pdir}/*.parquet")
        if not files:
            # Not-run is NOT a failure verdict (round-16 VERDICT #2: targeted
            # gate runs against a partial Verify dump recorded every absent
            # query as fail, so a green round read red). The skipped count is
            # surfaced in the headline so a partial run never reads as
            # "everything verified".
            print(f"SKIP {name}: no spark output (query not run)")
            record(name, "skipped", detail="no spark output (not run)"); continue
        con = None
        try:
            con = fresh_con()
            if agg:
                # aggregate gate (see --agg): reduce BOTH sides to count(*)
                # + per-column order-free aggregates derived from the Spark
                # output's schema; the oracle runs inside the same
                # timeout/OOM exclusion machinery as the full gate
                spark_rel = f"read_parquet('{pdir}/*.parquet')"
                aggs = agg_exprs(con, spark_rel)
                got = canon(con.execute(f"SELECT {aggs} FROM {spark_rel}").fetchdf())
                sql = f"SELECT {aggs} FROM ({sql}) __oracle"
            else:
                got = canon(pd.read_parquet(pdir))
            if timeout_sec:
                # scale-gate guard (round 9): a quadratic-at-scale oracle is
                # interrupted and recorded as oracle_timeout — an EXCLUSION
                # (tractability), never a pass/fail verdict on the engine
                import threading
                t = threading.Timer(timeout_sec, con.interrupt)
                t.start()
                try:
                    exp = canon(con.execute(sql).fetchdf())
                finally:
                    t.cancel()
            else:
                exp = canon(con.execute(sql).fetchdf())
            if unordered and not agg:
                got, exp = row_sorted(got), row_sorted(exp)
        except duckdb.InterruptException:
            print(f"TIMEOUT {name}: oracle exceeded {timeout_sec}s (excluded)")
            record(name, "oracle_timeout"); continue
        except duckdb.OutOfMemoryException as e:
            # same class of exclusion as the timeout: the ORACLE is
            # intractable at this scale within the memory budget
            print(f"OOM {name}: oracle exceeded the memory budget (excluded): {e}")
            record(name, "oracle_oom", detail=e); continue
        except Exception as e:
            if timeout_sec and "INTERRUPT" in str(e).upper():
                print(f"TIMEOUT {name}: oracle exceeded {timeout_sec}s (excluded)")
                record(name, "oracle_timeout"); continue
            print(f"FAIL {name}: {e}")
            record(name, "fail", detail=e); n_fail += 1; continue
        finally:
            if con is not None:
                con.close()
        if list(got.columns) != list(exp.columns):
            print(f"FAIL {name}: cols spark={list(got.columns)} duck={list(exp.columns)}")
            record(name, "fail", detail=f"cols spark={list(got.columns)} duck={list(exp.columns)}")
            n_fail += 1; continue
        if len(got) != len(exp):
            print(f"FAIL {name}: rows spark={len(got)} duck={len(exp)}")
            record(name, "fail", detail=f"rows spark={len(got)} duck={len(exp)}")
            n_fail += 1; continue
        bad = None
        for c in got.columns:
            g, e = got[c], exp[c]
            try:
                if g.dtype.kind == 'f' or e.dtype.kind == 'f':
                    # The driver gate hashes exact values, so exact float
                    # mismatch = FAIL here too (no tolerant tier — a tolerant
                    # selfcheck PASS would not predict a driver PASS).
                    gv, ev = g.astype(float).values, e.astype(float).values
                    nboth = np.isnan(gv) & np.isnan(ev)
                    neq = ~(nboth | (gv == ev))
                    if neq.any():
                        i = int(np.argmax(neq))
                        bad = f"col {c} row {i}: spark={gv[i]!r} duck={ev[i]!r}"
                        break
                elif g.dtype == object:
                    # The driver's hash-compare dies on array cells
                    # (unhashable ndarray) — reproduce that as a FAIL instead
                    # of tuple-normalizing them (round-1 ADVICE: that
                    # divergence hid the group_collect failure).
                    if any(isinstance(v, (list, np.ndarray)) for v in g.head(50)) or \
                       any(isinstance(v, (list, np.ndarray)) for v in e.head(50)):
                        bad = (f"col {c}: array-typed cells — driver hash gate "
                               "cannot hash these (emit a joined string instead)")
                        break
                    if not all(a == b for a, b in zip(g, e)):
                        for i, (a, b) in enumerate(zip(g, e)):
                            if a != b:
                                bad = f"col {c} row {i}: spark={a!r} duck={b!r}"; break
                        break
                else:
                    if not (g.values == e.values).all():
                        neq = g.values != e.values
                        i = int(np.argmax(neq))
                        bad = f"col {c} row {i}: spark={g.values[i]!r} duck={e.values[i]!r} (dtypes {g.dtype}/{e.dtype})"
                        break
                if str(g.dtype) != str(e.dtype):
                    print(f"  note {name}.{c}: dtype spark={g.dtype} duck={e.dtype}")
            except Exception as ex:
                bad = f"col {c}: compare error {ex}"; break
        if bad:
            print(f"FAIL {name}: {bad}"); record(name, "fail", len(got), bad); n_fail += 1
        elif agg:
            n_rows = int(got["__n_rows"].iloc[0])
            print(f"AGG_PASS {name} ({n_rows} rows, {len(got.columns) - 1} column sums)")
            record(name, "agg_pass", n_rows); n_pass += 1
        else:
            print(f"PASS {name} ({len(got)} rows)"); record(name, "pass", len(got)); n_pass += 1
    # queries without oracle: just report row counts
    for d in sorted(os.listdir(out_dir)):
        if d in oracle or not os.path.isdir(f"{out_dir}/{d}"):
            continue
        try:
            n = len(pd.read_parquet(f"{out_dir}/{d}"))
            print(f"ROWS {d}: {n}")
            record(d, "no_oracle", n)
        except Exception as e:
            print(f"ROWS {d}: unreadable {e}")
            record(d, "no_oracle", detail=f"unreadable {e}")
    # round-9 ADVICE: exclusions (oracle_timeout / oracle_oom) must be visible
    # in the headline summary, not only in the JSON artifact — a gate run that
    # skipped queries must not read as "everything verified".
    n_excl = sum(1 for r in report.values()
                 if r["status"] in ("oracle_timeout", "oracle_oom"))
    n_noracle = sum(1 for r in report.values() if r["status"] == "no_oracle")
    n_skip = sum(1 for r in report.values() if r["status"] == "skipped")
    print(f"\n{n_pass} pass / {n_fail} fail / {n_excl} excluded"
          f" / {n_noracle} no_oracle / {n_skip} skipped")
    if json_out:
        with open(json_out, "w") as f:
            json.dump({"mode": "unordered" if unordered else "ordered",
                       "sf_dir": sf_dir, "verify_dir": out_dir,
                       "n_pass": n_pass, "n_fail": n_fail,
                       "n_excluded": n_excl, "n_no_oracle": n_noracle,
                       "n_skipped": n_skip,
                       "queries": report}, f, indent=1)
        print(f"wrote {json_out}")
    return 1 if n_fail else 0

if __name__ == "__main__":
    argv = sys.argv[1:]
    unordered = "--unordered" in argv
    argv = [a for a in argv if a != "--unordered"]
    timeout_sec = None
    if "--timeout-sec" in argv:
        i = argv.index("--timeout-sec")
        timeout_sec = float(argv[i + 1]); del argv[i:i + 2]
    json_out = None
    if "--json" in argv:
        i = argv.index("--json")
        json_out = argv[i + 1]
        del argv[i:i + 2]
    only = None
    if "--only" in argv:
        i = argv.index("--only")
        only = set(argv[i + 1].split(","))
        del argv[i:i + 2]
    agg = "--agg" in argv
    argv = [a for a in argv if a != "--agg"]
    sys.exit(main(argv[0], argv[1], unordered=unordered, json_out=json_out,
                  timeout_sec=timeout_sec, only=only, agg=agg))
