#!/usr/bin/env python3
"""Local mimic of the driver's correctness gate: run each oracle SQL in
DuckDB against the sf parquet tables, compare to the Spark result parquet
(row count, schema, and values with columns sorted by name).

Type-STRICT since round 2: the driver hashes serialized bytes, so a
value-equal but differently-typed column (e.g. DuckDB HUGEINT sum() vs
Spark BIGINT) fails there. We compare the arrow types both results map
to through the same duckdb->arrow conversion, so that class of mismatch
fails here too instead of being masked by Python value coercion."""
import sys, json, glob, math
import duckdb

def canon(rows, cols):
    # sort columns by name, then rows; normalize floats
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = []
    for r in rows:
        rr = []
        for i in order:
            v = r[i]
            if isinstance(v, float):
                if math.isnan(v): v = "NaN"
                else: v = repr(v)
            rr.append(v)
        out.append(tuple(rr))
    return sorted(out, key=repr), [cols[i] for i in order]

def main(sf_dir, out_dir):
    con = duckdb.connect()
    for t in ["region","nation","customer","supplier","part","orders",
              "lineitem","events","documents","embeddings"]:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_pass = n_fail = 0
    for name, sql in sorted(oracle.items()):
        spark_files = glob.glob(f"{out_dir}/{name}/*.parquet")
        if not spark_files:
            print(f"FAIL {name}: no spark output"); n_fail += 1; continue
        sq = con.execute(f"SELECT * FROM read_parquet({spark_files!r})")
        stbl = sq.fetch_arrow_table()
        scols = stbl.column_names; srows = [tuple(r) for r in zip(*[c.to_pylist() for c in stbl.columns])] if stbl.num_rows else []
        try:
            oq = con.execute(sql)
            otbl = oq.fetch_arrow_table()
            ocols = otbl.column_names; orows = [tuple(r) for r in zip(*[c.to_pylist() for c in otbl.columns])] if otbl.num_rows else []
        except Exception as e:
            print(f"FAIL {name}: oracle error {e}"); n_fail += 1; continue
        # Plain integer widths (int32 vs int64) coerce to identical Python
        # ints in the driver's compare — r1 evidence: all-int32 spark
        # results hash-PASSED against int64 oracles. HUGEINT→decimal128
        # does NOT coerce (Decimal vs int) — r1 evidence: those 4 failed.
        def norm(t):
            s = str(t)
            return "int" if s.startswith(("int", "uint")) else s
        stypes = {f.name: norm(f.type) for f in stbl.schema}
        otypes = {f.name: norm(f.type) for f in otbl.schema}
        sc, scn = canon(srows, scols)
        oc, ocn = canon(orows, ocols)
        if scn != ocn:
            print(f"FAIL {name}: columns {scn} vs {ocn}"); n_fail += 1
        elif stypes != otypes:
            bad = {k: (stypes[k], otypes[k]) for k in stypes if stypes[k] != otypes[k]}
            print(f"FAIL {name}: arrow type mismatch (spark, oracle): {bad}"); n_fail += 1
        elif len(sc) != len(oc):
            print(f"FAIL {name}: rows {len(sc)} vs {len(oc)}"); n_fail += 1
        elif sc != oc:
            bad = [(a, b) for a, b in zip(sc, oc) if a != b][:3]
            print(f"FAIL {name}: value mismatch, first diffs: {bad}"); n_fail += 1
        else:
            print(f"PASS {name} ({len(sc)} rows)"); n_pass += 1
    print(f"== {n_pass} pass, {n_fail} fail ==")
    return 1 if n_fail else 0

if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
