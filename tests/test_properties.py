"""Property-based invariants (hypothesis): the chunker's contracts hold
for arbitrary byte streams, and salted aggregation is exactly equivalent
to plain aggregation."""

import numpy as np
from hypothesis import given, settings, strategies as st
from pyspark.sql import functions as F

from dataset_dedupe_estimator_spark.operators.chunker import (
    ChunkerParams,
    chunk_bytes,
)
from dataset_dedupe_estimator_spark.operators.skew import salted_agg, top_hot_keys

P = ChunkerParams()


@settings(max_examples=25, deadline=None)
@given(st.binary(min_size=0, max_size=500_000))
def test_chunker_total_coverage(data):
    chunks = chunk_bytes(data)
    assert sum(s for _, s in chunks) == len(data)
    prev_end = 0
    for off, size in chunks:
        assert off == prev_end
        assert size > 0
        prev_end = off + size


@settings(max_examples=25, deadline=None)
@given(st.binary(min_size=0, max_size=500_000))
def test_chunker_max_bound(data):
    assert all(s <= P.max_size for _, s in chunk_bytes(data))


@settings(max_examples=10, deadline=None)
@given(
    st.integers(min_value=0, max_value=255),
    st.integers(min_value=1, max_value=400_000),
)
def test_chunker_handles_constant_bytes(byte, n):
    """Degenerate inputs (all-zero pages etc.) must still chunk within
    bounds — the hot-hash case from SURVEY §4.3."""
    data = bytes([byte]) * n
    chunks = chunk_bytes(data)
    assert sum(s for _, s in chunks) == n
    assert all(s <= P.max_size for _, s in chunks)


@settings(max_examples=15, deadline=None)
@given(st.binary(min_size=1000, max_size=100_000), st.binary(min_size=1, max_size=64))
def test_chunker_prefix_stability(data, junk):
    """Appending bytes never changes chunks that ended well before the
    edit (content-defined = prefix-stable up to the last boundary)."""
    base = chunk_bytes(data)
    edited = chunk_bytes(data + junk)
    # all cuts of `base` except the final (tail) chunk must reappear
    base_cuts = {o + s for o, s in base[:-1]}
    edited_cuts = {o + s for o, s in edited}
    assert base_cuts <= edited_cuts


def test_salted_agg_equivalence(spark):
    rng = np.random.default_rng(9)
    rows = [(int(k), int(v)) for k, v in zip(rng.integers(0, 5, 2000), rng.integers(0, 100, 2000))]
    df = spark.createDataFrame(rows, "k long, v long").cache()
    plain = {
        r.k: (r.n, r.s, r.mn, r.mx)
        for r in df.groupBy("k")
        .agg(
            F.count("*").alias("n"),
            F.sum("v").alias("s"),
            F.min("v").alias("mn"),
            F.max("v").alias("mx"),
        )
        .collect()
    }
    salted = {
        r.k: (r.n, r.s, r.mn, r.mx)
        for r in salted_agg(
            df,
            ["k"],
            {"n": ("count", "*"), "s": ("sum", "v"), "mn": ("min", "v"), "mx": ("max", "v")},
        ).collect()
    }
    assert plain == salted


def test_salted_agg_rejects_non_algebraic(spark):
    df = spark.createDataFrame([(1, 2)], "k long, v long")
    import pytest

    with pytest.raises(ValueError, match="non-algebraic"):
        salted_agg(df, ["k"], {"a": ("avg", "v")})


def test_top_hot_keys(spark):
    df = spark.createDataFrame([(1,)] * 90 + [(2,)] * 10, "k long")
    rows = top_hot_keys(df, "k", 2).collect()
    assert rows[0].k == 1 and abs(rows[0].share - 0.9) < 1e-9


class TestNativeParityProperties:
    """Native C kernels ≡ numpy reference on ARBITRARY buffers, including
    the adversarial case where candidate density overflows the output
    buffer and the kernel regrows it (low mask_bits)."""

    def _numpy(self, buf, params):
        import os

        from dataset_dedupe_estimator_spark.operators import chunker, native

        os.environ["DDES_NO_NATIVE"] = "1"
        native._lib, native._tried = None, False
        try:
            return chunker._boundary_candidates(buf, params)
        finally:
            del os.environ["DDES_NO_NATIVE"]
            native._lib, native._tried = None, False

    @settings(max_examples=30, deadline=None)
    @given(
        st.binary(min_size=0, max_size=200_000),
        st.sampled_from(["window", "gear"]),
        st.sampled_from([4, 8, 12, 16]),  # 4 ⇒ 1/16 density ⇒ regrowth path
    )
    def test_boundary_parity(self, data, scheme, mask_bits):
        from dataset_dedupe_estimator_spark.operators import native
        from dataset_dedupe_estimator_spark.operators.chunker import (
            ChunkerParams,
            _boundary_candidates,
        )

        if not native.available():
            import pytest

            pytest.skip("no C compiler")
        p = ChunkerParams(scheme=scheme, mask_bits=mask_bits)
        buf = np.frombuffer(data, dtype=np.uint8)
        got = _boundary_candidates(buf, p)
        ref = self._numpy(buf, p)
        assert np.array_equal(np.sort(got), np.sort(ref))

    @settings(max_examples=30, deadline=None)
    @given(st.binary(min_size=0, max_size=200_000))
    def test_lz4_probe_bounds(self, data):
        from dataset_dedupe_estimator_spark.operators import native

        if not native.available():
            import pytest

            pytest.skip("no C compiler")
        sz = native.lz4_probe_size(data)
        # LZ4 block format worst case: n + n/255 + 16; best: tokens only
        assert 1 <= sz <= len(data) + len(data) // 255 + 16
        assert sz == native.lz4_probe_size(data)  # deterministic


@given(
    st.integers(min_value=1, max_value=65500),
    st.integers(min_value=1, max_value=65500),
    st.lists(
        st.tuples(
            st.sampled_from([0xE1, 0xE2, 0xED, 0xFE, 0xDB, 0xC4]),  # APPn/COM/DQT/DHT
            st.binary(min_size=0, max_size=200),
        ),
        max_size=6,
    ),
    st.sampled_from([0xC0, 0xC1, 0xC2, 0xC3, 0xC5, 0xC9, 0xCF]),  # any SOFn
)
@settings(max_examples=60, deadline=None)
def test_jpeg_meta_survives_arbitrary_marker_prefixes(width, height, segs, sof):
    """Property: jpeg_meta recovers (width, height) from any structurally
    valid marker stream — arbitrary APPn/COM/metadata segments (including
    payloads full of 0xFF bytes) before any SOF variant."""
    import struct

    from dataset_dedupe_estimator_spark.operators.multimodal import jpeg_meta

    out = b"\xff\xd8"
    for marker, body in segs:
        out += bytes([0xFF, marker]) + struct.pack(">H", len(body) + 2) + body
    out += bytes([0xFF, sof]) + struct.pack(">H", 10) + b"\x08" + struct.pack(
        ">HH", height, width
    ) + b"\x01\x11\x00"
    out += b"\xff\xd9"
    assert jpeg_meta(out) == (width, height)
