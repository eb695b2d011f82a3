#!/usr/bin/env python3
"""Local mimic of the driver's correctness gate.

Reads Verify's output dir (parquet per query + oracle_sql.json), registers the
testdata parquet tables as DuckDB views, runs each oracle SQL, and compares
row counts, column names/dtypes, and values (exact for non-floats, tolerant
then-exact-hash report for floats). Usage:

    python3 tools/selfcheck.py <sfDir> <verifyOutDir>
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

def main(sf_dir, out_dir):
    con = duckdb.connect()
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_pass = n_fail = 0
    for name in sorted(oracle):
        sql = oracle[name]
        pdir = f"{out_dir}/{name}"
        files = glob.glob(f"{pdir}/*.parquet")
        if not files:
            print(f"FAIL {name}: no spark output");  n_fail += 1; continue
        try:
            got = canon(pd.read_parquet(pdir))
            exp = canon(con.execute(sql).fetchdf())
        except Exception as e:
            print(f"FAIL {name}: {e}"); n_fail += 1; continue
        if list(got.columns) != list(exp.columns):
            print(f"FAIL {name}: cols spark={list(got.columns)} duck={list(exp.columns)}")
            n_fail += 1; continue
        if len(got) != len(exp):
            print(f"FAIL {name}: rows spark={len(got)} duck={len(exp)}")
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
            print(f"FAIL {name}: {bad}"); n_fail += 1
        else:
            print(f"PASS {name} ({len(got)} rows)"); n_pass += 1
    # queries without oracle: just report row counts
    for d in sorted(os.listdir(out_dir)):
        if d in oracle or not os.path.isdir(f"{out_dir}/{d}"):
            continue
        try:
            n = len(pd.read_parquet(f"{out_dir}/{d}"))
            print(f"ROWS {d}: {n}")
        except Exception as e:
            print(f"ROWS {d}: unreadable {e}")
    print(f"\n{n_pass} pass / {n_fail} fail")
    return 1 if n_fail else 0

if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
