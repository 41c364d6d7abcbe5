#!/usr/bin/env python3
"""Local DuckDB oracle parity check, approximating the driver's compare.

Usage: python3 tools/check_oracle.py <sfDir> <verifyOutDir>

For each query result parquet in verifyOutDir and its oracle SQL in
oracle_sql.json: run the SQL in DuckDB over the sfDir tables, sort columns
by name, sort rows, and compare cell-by-cell (exact for non-floats; exact
and abs-diff report for floats). Dev tool only — NOT part of the engine.

KNOWN BLIND SPOT (round-8 postmortem): this tool fetches BOTH sides through
pandas, so Spark and DuckDB DECIMAL columns alike coerce to float64 and
compare equal — but the DRIVER's gate fetches the Spark parquet through
arrow (Decimal('x.50') keeps its scale) and hashes STRINGIFIED cells, so a
decimal with trailing-zero fraction goes red there while passing here
(s18/st12, round 8). Use tools/driver_parity.py to replicate the driver's
asymmetric fetch; GateSchema in Verify.scala bans DecimalType on any gated
output so the hazard cannot recur.
"""
import json, math, sys
import duckdb

TABLES = ["region","nation","customer","supplier","part","orders","lineitem",
          "events","documents","embeddings"]

def canon(rows, cols):
    idx = sorted(range(len(cols)), key=lambda i: cols[i])
    out = [tuple(r[i] for i in idx) for r in rows]
    return sorted(out, key=lambda t: tuple(str(x) for x in t)), [cols[i] for i in idx]

def main():
    sf, out = sys.argv[1], sys.argv[2]
    # --partial: a filtered Verify run dumped a subset; skip (don't fail)
    # oracle entries with no output. WITHOUT the flag a missing output is a
    # FAILURE — a query that crashed in Verify must not go green.
    partial = "--partial" in sys.argv[3:]
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf}/{t}.parquet'")
    oracle = json.load(open(f"{out}/oracle_sql.json"))
    n_pass = n_fail = 0
    import os
    produced = sorted(d for d in os.listdir(out) if os.path.isdir(os.path.join(out, d)))
    missing = sorted(set(oracle) - set(produced))
    if missing and partial:
        print(f"  (skipping {len(missing)} oracle entries with no dumped output)")
        oracle = {k: v for k, v in oracle.items() if k in produced}
    elif missing:
        for name in missing:
            print(f"✗ {name}: oracle SQL present but no spark output (query crashed in Verify?)")
            n_fail += 1
    for name in produced:
        if name not in oracle:
            r = con.execute(f"SELECT count(*) FROM '{out}/{name}/*.parquet'").fetchone()[0]
            print(f"  ROWS-ONLY {name}: {r} rows")
            continue
        try:
            # Fetch through pandas so dtypes canonicalize the way the
            # driver's arrow/pandas compare does (e.g. DuckDB HUGEINT →
            # float64, which must then MISMATCH a Spark BIGINT column).
            sp_df = con.execute(f"SELECT * FROM '{out}/{name}/*.parquet'").df()
            du_df = con.execute(oracle[name]).df()
            sp_cols, sp_rows = list(sp_df.columns), [tuple(r) for r in sp_df.itertuples(index=False)]
            du_cols, du_rows = list(du_df.columns), [tuple(r) for r in du_df.itertuples(index=False)]
        except Exception as e:
            print(f"✗ {name}: ERROR {e}")
            n_fail += 1
            continue
        if sorted(sp_cols) != sorted(du_cols):
            print(f"✗ {name}: column mismatch spark={sorted(sp_cols)} duck={sorted(du_cols)}")
            n_fail += 1
            continue
        # Driver-observed behavior: int32 vs int64 hash the same (stringified
        # value), but int64 vs float64 differ ('42' vs '42.0'). Compare dtype
        # KIND (i/u one family, f, b, M, O), not exact width.
        def kind(dt):
            k = dt.kind
            return "i" if k in "iu" else k
        sp_dt = {c: kind(sp_df.dtypes[c]) for c in sp_cols}
        du_dt = {c: kind(du_df.dtypes[c]) for c in du_cols}
        dt_bad = {c: (str(sp_df.dtypes[c]), str(du_df.dtypes[c]))
                  for c in sp_cols if sp_dt[c] != du_dt[c]}
        if dt_bad:
            print(f"✗ {name}: dtype mismatch {dt_bad}")
            n_fail += 1
            continue
        a, cols = canon(sp_rows, sp_cols)
        b, _ = canon(du_rows, du_cols)
        if len(a) != len(b):
            print(f"✗ {name}: row count {len(a)} vs {len(b)}")
            n_fail += 1
            continue
        bad = None
        for i, (ra, rb) in enumerate(zip(a, b)):
            for j, (x, y) in enumerate(zip(ra, rb)):
                if x == y:
                    continue
                if x != x and y != y:
                    continue  # NaN/NaT on both sides (self-unequal values)
                if isinstance(x, float) and isinstance(y, float):
                    if math.isnan(x) and math.isnan(y):
                        continue
                    bad = (i, cols[j], x, y, abs(x - y))
                    break
                bad = (i, cols[j], x, y, None)
                break
            if bad:
                break
        if bad:
            i, c, x, y, d = bad
            extra = f" absdiff={d:.3e}" if d is not None else ""
            print(f"✗ {name}: row {i} col {c}: spark={x!r} duck={y!r}{extra}")
            n_fail += 1
        else:
            print(f"✓ {name} ({len(a)} rows)")
            n_pass += 1
    rows_only = len([n for n in produced if n not in oracle])
    print(f"\n{n_pass} pass, {n_fail} fail, {rows_only} rows-only")
    sys.exit(1 if n_fail else 0)

if __name__ == "__main__":
    main()
