import pytest

pytestmark = pytest.mark.slow  # driver-budget: deselected from the default run

"""Model-based property test for NESTED schema evolution (r10): random
sequences of append / leaf-rename / leaf-drop / leaf-widen run against
both the real table and an in-memory model; every historical version's
snapshot must equal the model's recorded rows AND struct shape for that
version — path-based column mapping is linearizable and time travel is
exact under any interleaving, not just the hand-picked sequences in
test_nested_fields.py."""

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from dataset_dedupe_estimator_spark.sources import versioned as vt

# ops: (kind, payload); tiny domains so interactions are common
_ROWS = st.lists(
    st.tuples(st.integers(0, 9), st.integers(0, 99), st.integers(0, 99)),
    min_size=1, max_size=3,
)
_OP = st.one_of(
    st.tuples(st.just("append"), _ROWS),
    st.tuples(st.just("rename_b"), st.none()),   # toggle b <-> bb
    st.tuples(st.just("rename_top"), st.none()),  # toggle m <-> mm
    st.tuples(st.just("drop_a"), st.none()),      # at most once
    st.tuples(st.just("widen_b"), _ROWS),         # int leaf -> bigint
)


@settings(
    max_examples=6,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(ops=st.lists(_OP, min_size=2, max_size=6))
def test_random_nested_histories_time_travel_exactly(
    spark, tmp_path_factory, ops
):
    root = tmp_path_factory.mktemp("nvm") / "tbl"
    top, bleaf = "m", "b"        # current LOGICAL names
    a_alive = True
    b_wide = False               # b starts int; widen_b promotes bigint
    live: list[tuple] = []       # (k, a|None, b) logical rows
    # per committed version: (rows, top, leaves tuple)
    snapshots: list[tuple] = []

    def _ddl():
        fields = []
        if a_alive:
            fields.append("a: long")
        fields.append(f"{bleaf}: {'bigint' if b_wide else 'int'}")
        return f"k: long, {top}: struct<{', '.join(fields)}>"

    def _frame(rows):
        data = [
            (k, ({"a": a, bleaf: b} if a_alive else {bleaf: b}))
            for k, a, b in rows
        ]
        return spark.createDataFrame(data, _ddl())

    def _shape():
        leaves = (["a"] if a_alive else []) + [bleaf]
        return (top, tuple(leaves))

    for kind, arg in ops:
        if kind == "append":
            if not snapshots and b_wide:
                b_wide = False  # first commit fixes the narrow type
            vt.append(root, _frame(arg), num_files=1)
            live = live + [(k, a if a_alive else None, b) for k, a, b in arg]
        elif kind == "rename_b":
            if not snapshots:
                continue
            new = "bb" if bleaf == "b" else "b"
            # renaming BACK to "b" re-takes the physical name (allowed:
            # it IS that leaf's physical name, the mapping just drops)
            vt.rename_column(root, f"{top}.{bleaf}", f"{top}.{new}")
            bleaf = new
        elif kind == "rename_top":
            if not snapshots:
                continue
            new = "mm" if top == "m" else "m"
            vt.rename_column(root, top, new)
            top = new
        elif kind == "drop_a":
            if not snapshots or not a_alive:
                continue
            vt.drop_column(root, f"{top}.a")
            a_alive = False
            live = [(k, None, b) for k, _a, b in live]
        elif kind == "widen_b":
            if not snapshots or b_wide:
                continue
            b_wide = True
            vt.append(root, _frame(arg), num_files=1,
                      allow_type_widening=True)
            live = live + [(k, a if a_alive else None, b) for k, a, b in arg]
        snapshots.append((sorted(live), _shape()))

    assert len(vt.history(root)) == len(snapshots)
    for version, (want_rows, (want_top, want_leaves)) in enumerate(snapshots):
        df = vt.read_version(spark, root, version)
        assert set(df.columns) == {"k", want_top}, (version, df.columns)
        got_fields = tuple(
            f.name for f in df.schema[want_top].dataType.fields
        )
        assert got_fields == want_leaves, (version, got_fields, want_leaves)
        got = sorted(
            (
                r["k"],
                r[want_top]["a"] if "a" in want_leaves else None,
                r[want_top][want_leaves[-1]],
            )
            for r in df.collect()
        )
        assert got == want_rows, f"version {version}: {got} != {want_rows}"


# --- depth-2 variant (r11): struct-of-struct with deep ops ------------------

_OP2 = st.one_of(
    st.tuples(st.just("append"), _ROWS),
    st.tuples(st.just("rename_x"), st.none()),     # deep leaf x <-> xx
    st.tuples(st.just("rename_inner"), st.none()),  # intermediate in <-> inn
    st.tuples(st.just("drop_y"), st.none()),       # deep leaf, at most once
    st.tuples(st.just("widen_x"), _ROWS),          # deep int leaf -> bigint
)


@settings(
    max_examples=6,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(ops=st.lists(_OP2, min_size=2, max_size=6))
def test_random_deep_nested_histories_time_travel_exactly(
    spark, tmp_path_factory, ops
):
    """Depth-2 counterpart: random append / deep-leaf rename /
    intermediate-struct rename / deep drop / deep widen sequences —
    every historical snapshot must reproduce the model's rows and the
    full recursive struct shape (arbitrary-depth path mapping is
    linearizable; the reference's synthetic schema recursion is
    unbounded, de/synthetic.py:118-128)."""
    root = tmp_path_factory.mktemp("nvm2") / "tbl"
    inner, xleaf = "in", "x"     # current LOGICAL names (depth 1 and 2)
    y_alive = True
    x_wide = False
    live: list[tuple] = []       # (k, x, y|None) logical rows
    snapshots: list[tuple] = []

    def _ddl():
        fields = [f"{xleaf}: {'bigint' if x_wide else 'int'}"]
        if y_alive:
            fields.append("y: long")
        return (
            f"k: long, o: struct<`{inner}`: "
            f"struct<{', '.join(fields)}>, w: long>"
        )

    def _frame(rows):
        data = [
            (k, {inner: ({xleaf: x, "y": y} if y_alive else {xleaf: x}),
                 "w": k})
            for k, x, y in rows
        ]
        return spark.createDataFrame(data, _ddl())

    def _shape():
        leaves = [xleaf] + (["y"] if y_alive else [])
        return (inner, tuple(leaves))

    for kind, arg in ops:
        if kind == "append":
            if not snapshots and x_wide:
                x_wide = False
            vt.append(root, _frame(arg), num_files=1)
            live = live + [(k, x, y if y_alive else None) for k, x, y in arg]
        elif kind == "rename_x":
            if not snapshots:
                continue
            new = "xx" if xleaf == "x" else "x"
            vt.rename_column(root, f"o.{inner}.{xleaf}", f"o.{inner}.{new}")
            xleaf = new
        elif kind == "rename_inner":
            if not snapshots:
                continue
            new = "inn" if inner == "in" else "in"
            vt.rename_column(root, f"o.{inner}", f"o.{new}")
            inner = new
        elif kind == "drop_y":
            if not snapshots or not y_alive:
                continue
            vt.drop_column(root, f"o.{inner}.y")
            y_alive = False
            live = [(k, x, None) for k, x, _y in live]
        elif kind == "widen_x":
            if not snapshots or x_wide:
                continue
            x_wide = True
            vt.append(root, _frame(arg), num_files=1,
                      allow_type_widening=True)
            live = live + [(k, x, y if y_alive else None) for k, x, y in arg]
        snapshots.append((sorted(live), _shape()))

    assert len(vt.history(root)) == len(snapshots)
    for version, (want_rows, (want_inner, want_leaves)) in enumerate(
        snapshots
    ):
        df = vt.read_version(spark, root, version)
        assert set(df.columns) == {"k", "o"}, (version, df.columns)
        ost = df.schema["o"].dataType
        assert tuple(f.name for f in ost.fields) == (want_inner, "w")
        got_fields = tuple(
            f.name for f in ost[want_inner].dataType.fields
        )
        assert got_fields == want_leaves, (version, got_fields, want_leaves)
        got = sorted(
            (
                r["k"],
                r["o"][want_inner][want_leaves[0]],
                r["o"][want_inner]["y"] if "y" in want_leaves else None,
            )
            for r in df.collect()
        )
        assert got == want_rows, f"version {version}: {got} != {want_rows}"
