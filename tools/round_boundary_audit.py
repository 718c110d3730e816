#!/usr/bin/env python3
"""Portability audit of hash-compared round()-on-float cells (round-9
verdict #2).

Engine-native `round(DOUBLE, n)` and `ln`/transcendental ulp behavior
differ ACROSS DuckDB builds (the driver's build != local 1.0.0 — the
round-9 q_graph_modularity / q_text_heaps_law lesson). A hash-compared
cell `round(f(x), 6)` flips between builds only when the PRE-ROUND value
f(x) sits within a few ulps of a rounding boundary. The dump's
post-round values destroy that distance, so this tool measures it by
PERTURBATION REPLAY: every oracle that contains `round(` is re-run with
`round(x, n)` rewritten to `round(x * (1 ± 1e-13), n)` (a DuckDB macro),
and the perturbed results are compared cell-for-cell to the unperturbed
oracle result.

If both perturbed runs are identical, every pre-round value on this data
is at least ~1e-13·|x| from its boundary — ~500x the worst cross-build
ulp drift (a few ulps ≈ 2e-16·|x| for libm-vs-JVM transcendentals). The
driver's gate hashes exactly this data (sf0.01), so an identical triple
here means NO build's rounding can flip the gate. Queries that differ
under perturbation are boundary-riders: bound-encode, floor-quantize, or
drop the round (see PARITY.md "Rounding portability").

Usage: python3 tools/round_boundary_audit.py [sfdir] [outdir]
Exit 1 if any query's oracle output moves under ±1e-13 perturbation.
"""
import json
import math
import os
import re
import sys

import duckdb
import pandas as pd

SFDIR = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
OUTDIR = sys.argv[2] if len(sys.argv) > 2 else "/tmp/verify_out"

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def norm(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    return df.sort_values(by=list(df.columns),
                          key=lambda c: c.map(str)).reset_index(drop=True)


def eq_cell(a, b):
    try:
        if pd.isna(a) and pd.isna(b):
            return True
    except (TypeError, ValueError):
        pass
    if isinstance(a, float) and isinstance(b, float):
        if math.isnan(a) and math.isnan(b):
            return True
        # signed zero is a real cross-build hazard (the heaps bug): -0.0
        # and +0.0 hash differently in the driver, so treat them unequal
        if a == 0.0 and b == 0.0:
            return math.copysign(1, a) == math.copysign(1, b)
        return a == b
    return a == b


def frames_equal(a: pd.DataFrame, b: pd.DataFrame):
    if list(a.columns) != list(b.columns) or len(a) != len(b):
        return False, "shape"
    for col in a.columns:
        av, bv = a[col].tolist(), b[col].tolist()
        for i, (x, y) in enumerate(zip(av, bv)):
            if not eq_cell(x, y):
                return False, f"{col}[{i}]: {x!r} != {y!r}"
    return True, ""


def main():
    con = duckdb.connect()
    for t in TABLES:
        p = f"{SFDIR}/{t}.parquet"
        if os.path.exists(p):
            con.execute(
                f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")

    with open(f"{OUTDIR}/oracle_sql.json") as f:
        oracles = json.load(f)

    word_round = re.compile(r"\bround\(")
    audited, skipped, flagged = 0, 0, []
    for name in sorted(oracles):
        sql = oracles[name]
        if not word_round.search(sql):
            skipped += 1
            continue
        audited += 1
        base = norm(con.execute(sql).fetchdf())
        ok = True
        for eps in (1e-13, -1e-13):
            con.execute(
                "CREATE OR REPLACE MACRO graft_round(x, n) AS "
                f"round(x * (1.0 + ({eps})), n)")
            psql = word_round.sub("graft_round(", sql)
            try:
                pert = norm(con.execute(psql).fetchdf())
            except Exception as e:
                flagged.append((name, f"perturbed-run-failed: {e}"))
                ok = False
                break
            same, why = frames_equal(base, pert)
            if not same:
                flagged.append((name, f"eps={eps:+.0e}: {why}"))
                ok = False
        print(("PASS " if ok else "FLAG ") + name)

    print(f"\n{audited} round()-bearing oracles audited "
          f"({skipped} without round() skipped)")
    if flagged:
        print("\nBOUNDARY-RIDERS (output moved under +/-1e-13 pre-round "
              "perturbation — a cross-build ulp could flip the gate):")
        for name, why in flagged:
            print(f"  {name}: {why}")
        sys.exit(1)
    print("PASS: every rounded cell has >=1e-13 relative margin to its "
          "boundary on the gate's data (~500x cross-build ulp drift)")
    sys.exit(0)


if __name__ == "__main__":
    main()
