#!/usr/bin/env python3
"""join_fuzzy scale-gate law check (round 8).

The DuckDB oracle for join_fuzzy is a brute-force all-pairs levenshtein —
O(n^2 * |name|^2). At the 10x ScaleGen factor that is ~100x the oracle
cost (hours of CPU; confirmed intractable in the round-8 session), which
is EXACTLY the reason the engine uses deletion-neighborhood blocking. So
at scale factors the quadratic oracle can't reach, the query is certified
by three laws that together pin the full answer:

  1. SLICE EXACTNESS: the engine's 10x output restricted to replica-0 keys
     (both < ScaleGen.Stride) must equal the brute-force oracle run over
     replica-0 customers only (1/f^2 of the pairs — tractable).
  2. CROSS-REPLICA EXCLUSION: ScaleGen gives replica r names a "_r_r"
     suffix, so cross-replica pairs differ in >= 2 positions and a <=1
     answer must contain ZERO of them.
  3. LINEAR GROWTH: suffixes are identical within a replica, so each
     replica's answer is isomorphic to replica 0's; total rows must be
     exactly factor x the slice count.

Laws 2+3 cover every row the slice does not inspect: each row is either
intra-replica (counted by 3, isomorphic to a slice-checked row) or
cross-replica (forbidden by 2).

Usage: python3 tools/fuzzy_slice_law.py <scaleDir> <verifyOutDir> <factor>
"""
import sys
import duckdb
import pandas as pd

STRIDE = 100000000  # graft.ScaleGen.Stride


def main(scale_dir, out_dir, factor):
    eng = pd.read_parquet(f"{out_dir}/join_fuzzy")
    sl = eng[(eng.key_a < STRIDE) & (eng.key_b < STRIDE)] \
        .sort_values(["key_a", "key_b"]).reset_index(drop=True)
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW customer AS SELECT * FROM "
        f"read_parquet('{scale_dir}/customer.parquet/*.parquet') "
        f"WHERE c_custkey < {STRIDE}")
    exp = con.execute("""
        SELECT a.c_custkey AS key_a, b.c_custkey AS key_b,
               a.c_name AS name_a, b.c_name AS name_b,
               CAST(levenshtein(a.c_name, b.c_name) AS INT) AS dist
        FROM customer a JOIN customer b
          ON a.c_custkey < b.c_custkey
         AND levenshtein(a.c_name, b.c_name) <= 1
        ORDER BY key_a, key_b""").fetchdf()
    ok_slice = sl.equals(exp.reset_index(drop=True))
    cross = int(((eng.key_a // STRIDE) != (eng.key_b // STRIDE)).sum())
    ok_linear = len(eng) == factor * len(sl)
    print(f"slice: engine={len(sl)} oracle={len(exp)} exact={ok_slice}")
    print(f"cross-replica pairs (must be 0): {cross}")
    print(f"linear: total={len(eng)} == {factor}x{len(sl)}: {ok_linear}")
    ok = ok_slice and cross == 0 and ok_linear
    print("PASS join_fuzzy scale laws" if ok else "FAIL join_fuzzy scale laws")
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2], int(sys.argv[3])))
