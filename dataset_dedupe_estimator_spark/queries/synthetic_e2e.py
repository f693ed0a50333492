"""DataGenerator end-to-end under the oracle gate (VERDICT round 1, item 7).

The ``synthetic_*`` queries in synthetic_sql.py prove the *edit semantics*
are SQL-expressible over lineitem; this query runs the real
``operators/synthetic.py`` machinery — ``DataGenerator.generate_table`` via
mapInArrow plus every edit operator (G1–G6, reference de/synthetic.py:5-84,
de/tests/test_synthetic.py:21-34) — and reduces each variant to an exact
integer summary.

The oracle reproduces the generator bit-for-bit in DuckDB: the counter-based
SplitMix64 mix (operators/synthetic.py:_mix64) is pure 64-bit integer
arithmetic, written in SQL as xor/shift on UBIGINT plus a wrap-around
multiply emulated in HUGEINT via 32-bit limb products. The per-field base
seeds (blake2b of ``"{seed}:{path}"``) are precomputed here in Python and
embedded as constants. Float columns are excluded from the check (numpy
banker's rounding vs DuckDB half-away-from-zero); int, bool and
string-length streams are reproduced exactly.

Variant id-algebra (what the oracle enumerates): every generated value is a
pure function of (field_seed, id), and each edit operator maps to a set of
ids — delete removes position ranges, insert/append add disjoint
``id_offset`` streams, update swaps single positions for fresh ids
(including the reference's use-only-row-(i+1)·edit_size-1 quirk,
de/synthetic.py:47), update_column redirects one field's id at the edit
points.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from dataset_dedupe_estimator_spark.operators.synthetic import (
    DataGenerator,
    _field_seed,
)
from dataset_dedupe_estimator_spark.queries.base import Q

SEED = 7
N = 2000
EDIT_POINTS = [0.25, 0.75]
EDIT_SIZE = 10
APPEND_RATIO = 0.05
SCHEMA = {"a": "int", "b": "bool", "s": "str"}


def synthetic_generator_e2e(spark, sf):
    """G1–G6 end-to-end: generate, edit, summarize (integers only)."""
    gen = DataGenerator(SCHEMA, seed=SEED)
    original = gen.generate_table(spark, N)
    updated = gen.update_rows(original, spark, EDIT_POINTS, EDIT_SIZE)
    variants = {
        "appended": gen.append_rows(original, spark, APPEND_RATIO),
        "deleted": gen.delete_rows(original, EDIT_POINTS, EDIT_SIZE),
        "inserted": gen.insert_rows(original, spark, EDIT_POINTS, EDIT_SIZE),
        "original": original,
        "updated": updated,
        "updated_a": gen.update_column(original, updated, "a"),
    }
    out = None
    for name, df in variants.items():
        summary = df.agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.sum("a").alias("sum_a"),
            F.sum(F.col("b").cast("long")).alias("n_true"),
            F.sum(F.length("s")).alias("sum_len"),
        ).select(F.lit(name).alias("variant"), "*")
        out = summary if out is None else out.unionByName(summary)
    return out.select("variant", "n_rows", "sum_a", "n_true", "sum_len").orderBy(
        "variant"
    )


def _oracle_sql() -> str:
    base_a = int(_field_seed(SEED, "a"))
    base_b = int(_field_seed(SEED, "b"))
    base_s = int(_field_seed(SEED, "s"))
    c1 = 0x9E3779B97F4A7C15
    k1 = 0xBF58476D1CE4E5B9
    k2 = 0x94D049BB133111EB
    m64 = 1 << 64

    def wrapmul(z: str, k: int) -> str:
        """(z * k) mod 2^64 in HUGEINT via 32-bit limbs (z < 2^64)."""
        klo, khi = k & 0xFFFFFFFF, k >> 32
        return (
            f"(({z} % 4294967296) * {klo} + "
            f"((({z} % 4294967296) * {khi} + ({z} // 4294967296) * {klo}) "
            f"% 4294967296) * 4294967296) % {m64}::HUGEINT"
        )

    points = [int(N * p) for p in EDIT_POINTS]
    del_ranges = " AND ".join(
        f"range NOT BETWEEN {pt - EDIT_SIZE} AND {pt - 1}" for pt in points
    )
    ins_fresh = " UNION ALL ".join(
        f"SELECT 'inserted', range FROM range({10_000_000 * (i + 1)}, "
        f"{10_000_000 * (i + 1) + EDIT_SIZE})"
        for i in range(len(points))
    )
    n_append = int(APPEND_RATIO * N)
    upd_fresh_ids = [
        70_000_000 + (i + 1) * EDIT_SIZE - 1 for i in range(len(points))
    ]
    upd_fresh = ", ".join(str(i) for i in upd_fresh_ids)
    upd_not_points = ", ".join(str(p) for p in points)
    # updated_a: field 'a' reads the fresh id at edit points, b/s keep the
    # original id (update_column joins on _pos)
    upd_a_case = " ".join(
        f"WHEN field = 'a' AND id = {pt} THEN {fid}"
        for pt, fid in zip(points, upd_fresh_ids)
    )

    return f"""
WITH ids(variant, id) AS (
    SELECT 'original', range FROM range({N})
    UNION ALL SELECT 'deleted', range FROM range({N}) WHERE {del_ranges}
    UNION ALL SELECT 'inserted', range FROM range({N})
    UNION ALL {ins_fresh}
    UNION ALL SELECT 'appended', range FROM range({N})
    UNION ALL SELECT 'appended', range FROM range(90000000, {90_000_000 + n_append})
    UNION ALL SELECT 'updated', range FROM range({N}) WHERE range NOT IN ({upd_not_points})
    UNION ALL SELECT 'updated', unnest([{upd_fresh}])
    UNION ALL SELECT 'updated_a', range FROM range({N})
),
bases(field, base) AS (
    VALUES ('a', {base_a}::HUGEINT), ('b', {base_b}::HUGEINT), ('s', {base_s}::HUGEINT)
),
expanded AS (
    SELECT variant, field, base,
           CASE WHEN variant = 'updated_a' THEN (CASE {upd_a_case} ELSE id END)
                ELSE id END AS id
    FROM ids CROSS JOIN bases
),
s0 AS (SELECT variant, field, (base + id::HUGEINT * {c1}::HUGEINT) % {m64}::HUGEINT AS z FROM expanded),
s1 AS (SELECT variant, field, xor(z::UBIGINT, z::UBIGINT >> 30)::HUGEINT AS z FROM s0),
s2 AS (SELECT variant, field, {wrapmul('z', k1)} AS z FROM s1),
s3 AS (SELECT variant, field, xor(z::UBIGINT, z::UBIGINT >> 27)::HUGEINT AS z FROM s2),
s4 AS (SELECT variant, field, {wrapmul('z', k2)} AS z FROM s3),
s5 AS (SELECT variant, field, xor(z::UBIGINT, z::UBIGINT >> 31)::HUGEINT AS z FROM s4)
SELECT variant,
       CAST(COUNT(*) / 3 AS BIGINT) AS n_rows,
       CAST(SUM(CASE WHEN field = 'a' THEN (z % 1000000)::BIGINT END) AS BIGINT) AS sum_a,
       CAST(SUM(CASE WHEN field = 'b' THEN (z % 2)::BIGINT END) AS BIGINT) AS n_true,
       CAST(SUM(CASE WHEN field = 's' THEN 10 + (z % 91)::BIGINT END) AS BIGINT) AS sum_len
FROM s5
GROUP BY variant
ORDER BY variant
"""


QUERIES: dict[str, Q] = {
    "synthetic_generator_e2e": Q(spark=synthetic_generator_e2e, oracle=_oracle_sql()),
}
