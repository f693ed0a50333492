"""Local replica of the driver's correctness gate.

Runs every ``__spark_entry__.queries()`` entry at sf0.01 and compares it to
``oracle_sql()`` via DuckDB: row count + schema (column names) +
order-insensitive values (columns sorted by name, rows sorted).

Dtype-faithful by design (round-1 lesson): the driver hashes *serialized*
values, so bigint 1 vs float64 1.0 is a hash mismatch even though the
values compare equal. DuckDB types SUM(BIGINT) as HUGEINT, which its
pandas bridge renders float64 — any raw integer SUM in an oracle must be
CAST(... AS BIGINT). This checker therefore FAILS on int-vs-float dtype
splits instead of coercing both sides to float, and FAILS on array-typed
output columns (they crash the driver's row canonicalizer).

Usage: python tools/check_oracles.py [name-substring ...]
       python tools/check_oracles.py --json OUT.json   # full-registry report

With --json, writes a driver-format report ({name: {rows_match,
schema_match, hash_match, spark_rows, oracle_rows, err}}) covering EVERY
registry query — the local complement to the driver's 50-query window
(see COVERAGE.md "Driver-gate rotation scheme").
"""

from __future__ import annotations

import os
import sys
import time

import duckdb
import numpy as np
import pandas as pd

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].map(
                lambda v: tuple(v) if isinstance(v, (list, np.ndarray)) else v
            )
    df = df.sort_values(by=list(df.columns), ignore_index=True)
    return df


def compare(name: str, sdf: pd.DataFrame, odf: pd.DataFrame) -> list[str]:
    problems = []
    if sorted(sdf.columns) != sorted(odf.columns):
        problems.append(f"schema: spark={sorted(sdf.columns)} oracle={sorted(odf.columns)}")
        return problems
    if len(sdf) != len(odf):
        problems.append(f"rowcount: spark={len(sdf)} oracle={len(odf)}")
        return problems
    for c in sorted(sdf.columns):
        for side, df in (("spark", sdf), ("oracle", odf)):
            if df[c].dtype == object and df[c].map(
                lambda v: isinstance(v, (list, np.ndarray))
            ).any():
                problems.append(
                    f"col {c}: {side} side is an array column — crashes the "
                    "driver canonicalizer; serialize (array_join) to a string"
                )
    if problems:
        return problems
    s, o = canon(sdf), canon(odf)
    numeric = set("iuf")
    for c in s.columns:
        sv, ov = s[c].to_numpy(), o[c].to_numpy()
        sk, ok_ = sv.dtype.kind, ov.dtype.kind
        if sk in numeric and ok_ in numeric and sk != ok_ and "f" in (sk, ok_):
            problems.append(
                f"col {c}: dtype split spark={sv.dtype} oracle={ov.dtype} — "
                "driver hash is dtype-sensitive (1 != 1.0); "
                "CAST the oracle expression (e.g. SUM → BIGINT)"
            )
            continue
        if sk == "f" and ok_ == "f":
            svf = sv.astype(float)
            ovf = ov.astype(float)
            both_nan = np.isnan(svf) & np.isnan(ovf)
            if not np.all((svf == ovf) | both_nan):
                bad = np.nonzero(~((svf == ovf) | both_nan))[0][:3]
                problems.append(
                    f"col {c}: {len(bad)}+ mismatches, e.g. "
                    + ", ".join(f"[{i}] {svf[i]!r} vs {ovf[i]!r}" for i in bad)
                )
        else:
            eq = pd.Series(sv).astype(str) == pd.Series(ov).astype(str)
            if not eq.all():
                bad = np.nonzero(~eq.to_numpy())[0][:3]
                problems.append(
                    f"col {c}: {int((~eq).sum())} mismatches, e.g. "
                    + ", ".join(f"[{i}] {sv[i]!r} vs {ov[i]!r}" for i in bad)
                )
    return problems


def main() -> int:
    import __spark_entry__ as entrymod
    from dataset_dedupe_estimator_spark import get_spark

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    args = sys.argv[1:]
    json_out = None
    if "--json" in args:
        i = args.index("--json")
        json_out = args[i + 1]
        args = args[:i] + args[i + 2 :]
    filters = [a for a in args if not a.startswith("-")]

    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )

    spark = get_spark(
        app_name="oracle-check",
        shuffle_partitions=int(os.environ.get("SPARK_GRAFT_SHUFFLE", "8")),
    )
    queries = entrymod.queries()
    oracles = entrymod.oracle_sql()

    n_pass = n_fail = n_weak = 0
    report: dict[str, dict] = {}

    def record(name, *, rows_match=None, schema_match=None, hash_match=None,
               spark_rows=None, oracle_rows=None, err=None):
        report[name] = {
            "rows_match": rows_match, "schema_match": schema_match,
            "hash_match": hash_match, "spark_rows": spark_rows,
            "oracle_rows": oracle_rows, "err": err,
        }

    for name, fn in queries.items():
        if filters and not any(f in name for f in filters):
            continue
        t0 = time.time()
        try:
            sdf = fn(spark, sf_dir).toPandas()
        except Exception as e:
            print(f"FAIL  {name}: spark raised {type(e).__name__}: {str(e)[:300]}")
            record(name, err=f"spark: {type(e).__name__}: {str(e)[:200]}")
            n_fail += 1
            continue
        if name not in oracles:
            print(f"weak  {name}: rows={len(sdf)} (no oracle, rows-only) [{time.time()-t0:.1f}s]")
            record(name, rows_match=len(sdf) >= 0, spark_rows=len(sdf))
            n_weak += 1
            continue
        try:
            odf = con.execute(oracles[name]).fetchdf()
        except Exception as e:
            print(f"FAIL  {name}: oracle raised {type(e).__name__}: {str(e)[:300]}")
            record(name, spark_rows=len(sdf), err=f"oracle: {type(e).__name__}: {str(e)[:200]}")
            n_fail += 1
            continue
        problems = compare(name, sdf, odf)
        if problems:
            print(f"FAIL  {name} [{time.time()-t0:.1f}s]")
            for p in problems:
                print(f"      {p}")
            record(name, rows_match=len(sdf) == len(odf),
                   schema_match=sorted(sdf.columns) == sorted(odf.columns),
                   hash_match=False, spark_rows=len(sdf), oracle_rows=len(odf),
                   err="; ".join(problems)[:300])
            n_fail += 1
        else:
            print(f"ok    {name}: rows={len(sdf)} [{time.time()-t0:.1f}s]")
            record(name, rows_match=True, schema_match=True, hash_match=True,
                   spark_rows=len(sdf), oracle_rows=len(odf))
            n_pass += 1
    print(f"\n{n_pass} ok, {n_weak} rows-only, {n_fail} failed")
    if json_out:
        import json

        if not filters:
            # make per-round driver coverage explicit (advisor ask): the
            # external gate only attests the first 50 registry entries,
            # so record the rotation scheme and exactly which queries sit
            # in this round's driver window vs. local-only verification
            window = list(queries)[:50]
            report["_rotation"] = {
                "scheme": (
                    "external driver gate checks the FIRST 50 registry "
                    "entries per round; the window rotates each round to "
                    "never-driver-checked + stalest-green queries "
                    "(COVERAGE.md ledger); THIS file is the full-registry "
                    "local replica run every round"
                ),
                "registry_size": len(queries),
                "driver_window": window,
                "local_only_this_round": [n for n in queries if n not in window],
            }
        with open(json_out, "w") as f:
            json.dump(report, f, indent=1, sort_keys=True)
        n_queries = sum(1 for k in report if not k.startswith("_"))
        print(f"wrote {json_out} ({n_queries} queries)")
    return 1 if n_fail else 0


if __name__ == "__main__":
    raise SystemExit(main())
