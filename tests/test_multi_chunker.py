"""Shared-scan multi-parameterization chunking: one read must produce
bit-identical chunks to independent per-param passes (the basis for
estimate()'s single-job default+xet path), including across streaming
block boundaries and for content that forces max-size cuts."""

import numpy as np
import pytest
from hypothesis import given, settings, strategies as st

from dataset_dedupe_estimator_spark.operators.chunker import (
    XET_PARAMS,
    ChunkerParams,
    _iter_file_chunks,
    _iter_file_chunks_multi,
    boundary_compatible,
    chunk_files_multi,
)
from dataset_dedupe_estimator_spark.plans.estimate import (
    ESTIMATE_PARAMS,
    chunk_stats,
    estimate,
)


@pytest.fixture(scope="module")
def blob_file(tmp_path_factory):
    """~20 MiB mixed blob (crosses two 8 MiB streaming blocks): random
    segments (boundary-rich), a long zero run (candidate-free, forces max
    cuts), and a repeated section (dedup)."""
    rng = np.random.default_rng(7)
    rand = rng.integers(0, 256, 9 * 1024 * 1024, dtype=np.uint8).tobytes()
    zeros = bytes(2 * 1024 * 1024)
    blob = rand + zeros + rand[: 8 * 1024 * 1024] + rand[::-1][: 1024 * 1024]
    path = tmp_path_factory.mktemp("multi") / "blob.bin"
    path.write_bytes(blob)
    return str(path)


def _collect_single(path, params):
    return list(_iter_file_chunks(path, params))


def test_multi_matches_singles_bitwise(blob_file):
    params_list = [ESTIMATE_PARAMS, XET_PARAMS]
    per_param = {i: [] for i in range(len(params_list))}
    for pi, off, chunk in _iter_file_chunks_multi(blob_file, params_list):
        per_param[pi].append((off, chunk))
    for i, p in enumerate(params_list):
        assert per_param[i] == _collect_single(blob_file, p), f"param {i}"


def test_multi_rejects_incompatible(blob_file):
    with pytest.raises(ValueError, match="boundary-compatible"):
        list(
            _iter_file_chunks_multi(
                blob_file, [ChunkerParams(), ChunkerParams(seed=99)]
            )
        )
    assert not boundary_compatible(ChunkerParams(), ChunkerParams(seed=99))
    assert boundary_compatible(ESTIMATE_PARAMS, XET_PARAMS)


@settings(max_examples=15, deadline=None)
@given(
    data=st.binary(min_size=0, max_size=300_000),
    mins=st.lists(
        st.integers(min_value=128, max_value=8 * 1024), min_size=2, max_size=4
    ),
    max_mult=st.integers(min_value=2, max_value=8),
)
def test_multi_parity_property(data, mins, max_mult):
    """For ANY content and ANY set of boundary-compatible params (random
    min sizes, shared max multiplier), the shared scan must reproduce each
    per-param pass bit-for-bit — the equivalence argument is not specific
    to the default parameterization."""
    import os
    import tempfile

    params_list = [
        ChunkerParams(min_size=m, max_size=m * max_mult, mask_bits=10)
        for m in mins
    ]
    fd, path = tempfile.mkstemp()
    try:
        with os.fdopen(fd, "wb") as f:
            f.write(data)
        per_param = {i: [] for i in range(len(params_list))}
        for pi, off, chunk in _iter_file_chunks_multi(path, params_list):
            per_param[pi].append((off, chunk))
        for i, p in enumerate(params_list):
            assert per_param[i] == list(_iter_file_chunks(path, p)), f"param {i}"
    finally:
        os.unlink(path)


def test_chunk_files_multi_matches_stats(spark, parquet_paths):
    """Spark-side: per-param slices of the multi DataFrame must reproduce
    the single-param chunk_stats exactly."""
    from dataset_dedupe_estimator_spark.operators.chunker import chunk_files

    multi = chunk_files_multi(spark, parquet_paths, [ESTIMATE_PARAMS, XET_PARAMS])
    for i, p in enumerate([ESTIMATE_PARAMS, XET_PARAMS]):
        got = chunk_stats(multi.filter(f"param_idx = {i}").drop("param_idx")).collect()
        want = chunk_stats(chunk_files(spark, parquet_paths, params=p)).collect()
        assert got == want, f"param {i}"


def test_estimate_mixed_corpus_unions_large_files(spark, parquet_paths, monkeypatch):
    """With the parallel threshold lowered so some test files count as
    'large', the shared-scan path must union the per-param large-file
    chunks into the same aggregate and produce identical metrics (hash
    uniqueness is global across the small/large split)."""
    import dataset_dedupe_estimator_spark.operators.chunker as ch

    baseline = estimate(spark, parquet_paths)
    sizes = sorted(__import__("os").path.getsize(p) for p in parquet_paths)
    monkeypatch.setattr(ch, "PARALLEL_THRESHOLD", sizes[len(sizes) // 2] + 1)
    mixed = estimate(spark, parquet_paths)
    assert mixed == baseline


def test_upload_delta_edit_resync(spark, tmp_path):
    """A small insert into a large file must transfer only the chunks the
    edit touches (CDC resync), not the whole file; an identical file must
    transfer nothing; a brand-new file transfers everything."""
    from dataset_dedupe_estimator_spark.plans.estimate import upload_delta

    rng = np.random.default_rng(5)
    base = rng.integers(0, 256, 8 * 1024 * 1024, dtype=np.uint8).tobytes()
    old = tmp_path / "old.bin"
    old.write_bytes(base)
    edited = tmp_path / "edited.bin"
    edited.write_bytes(base[: 4 * 1024 * 1024] + b"xyz" + base[4 * 1024 * 1024 :])
    same = tmp_path / "same.bin"
    same.write_bytes(base)
    fresh = tmp_path / "fresh.bin"
    fresh.write_bytes(rng.integers(0, 256, 1024 * 1024, dtype=np.uint8).tobytes())

    rows = {r.path.rsplit("/", 1)[-1]: r for r in upload_delta(
        spark, [str(old)], [str(edited), str(same), str(fresh)]
    ).collect()}
    assert rows["same.bin"].novel_bytes == 0
    assert rows["fresh.bin"].novel_bytes == rows["fresh.bin"].file_bytes
    # the edit disturbs at most a few chunks around the insertion point
    assert 0 < rows["edited.bin"].novel_bytes <= 4 * 128 * 1024


def test_estimate_shared_scan_matches_two_pass(spark, parquet_paths):
    shared = estimate(spark, parquet_paths)  # default: shared scan
    # force the two-pass path with a boundary-incompatible xet variant that
    # still produces the same cuts? No — compare against the components:
    single = estimate(spark, parquet_paths, with_xet=False)
    for k in ("total_len", "chunk_bytes", "compressed_chunk_bytes",
              "total_chunks", "unique_chunks", "dedup_ratio"):
        assert shared[k] == single[k], k
    # xet side against an independent single-param pipeline
    from dataset_dedupe_estimator_spark.operators.chunker import chunk_files
    from pyspark.sql import functions as F

    xrow = (
        chunk_files(spark, parquet_paths, params=XET_PARAMS)
        .groupBy("hash").agg(F.first("size").alias("size"))
        .agg(F.sum("size").alias("xet_bytes")).collect()[0]
    )
    assert shared["xet_bytes"] == xrow.xet_bytes


def test_fused_multi_arrays_bit_parity(tmp_path):
    """r11: the shared-scan fused array pipeline
    (`_iter_block_arrays_multi`) must equal the per-chunk multi path
    (`_iter_file_chunks_multi` + `_hash64` + `_compressed_size`)
    bit-for-bit per param — offsets, sizes, hashes, compressed."""
    from dataclasses import replace

    import numpy as np

    from dataset_dedupe_estimator_spark.operators import native
    from dataset_dedupe_estimator_spark.operators import chunker as C

    if not native.available():
        import pytest

        pytest.skip("no C compiler in environment")
    rng = np.random.default_rng(11)
    blk = rng.integers(0, 256, 1 << 20, dtype=np.uint8).tobytes()
    blob = (
        blk + b"abcdef" * 50_000 + blk
        + rng.integers(0, 256, 2 << 20, dtype=np.uint8).tobytes()
    )
    f = tmp_path / "blob.bin"
    f.write_bytes(blob)
    plist = [
        C.ChunkerParams(),
        replace(C.XET_PARAMS, compress_probe_bytes=0),
    ]
    slow, caches = [], [{}, {}]
    for pi, off, ch in C._iter_file_chunks_multi(str(f), plist):
        p = plist[pi]
        h = C._hash64(ch)
        comp = caches[pi].get(h)
        if comp is None:
            comp = C._compressed_size(
                ch, p.compress_probe_bytes, p.compress_scheme
            )
            caches[pi][h] = comp
        slow.append((pi, off, len(ch), h, comp))
    fast = []
    for pi, offs, sizes, hashes, comps in C._iter_block_arrays_multi(
        str(f), plist
    ):
        fast.extend(zip(
            [pi] * len(offs), offs.tolist(), sizes.tolist(),
            hashes.tolist(), comps.tolist(),
        ))
    from collections import defaultdict

    s_by, f_by = defaultdict(list), defaultdict(list)
    for r in slow:
        s_by[r[0]].append(r[1:])
    for r in fast:
        f_by[r[0]].append(r[1:])
    assert s_by == f_by


def test_multi_fast_gate_requires_enforce_max(spark, tmp_path):
    """Reviewed r11 bug: an enforce_max=False param with probe=0 used to
    slip past the fused-path gate, overflow the bounded carry buffer on
    a candidate-free region and silently truncate the file. The gate
    now requires enforce_max on EVERY param; full byte coverage is the
    regression pin."""
    import numpy as np

    from dataset_dedupe_estimator_spark.operators import chunker as C

    f = tmp_path / "z.bin"
    # 12 MB candidate-free (zero-filled) region: no window-sum boundary
    # fires, so an unbounded pending region grows past max_size + block
    rng = np.random.default_rng(5)
    blob = (
        rng.integers(0, 256, 1 << 20, dtype=np.uint8).tobytes()
        + b"\x00" * (12 << 20)
        + rng.integers(0, 256, 1 << 20, dtype=np.uint8).tobytes()
    )
    f.write_bytes(blob)
    p = C.ChunkerParams(compress_probe_bytes=0, enforce_max=False)
    total = (
        C.chunk_files_multi(spark, [str(f)], [p])
        .groupBy("param_idx")
        .sum("size")
        .collect()
    )
    assert total[0]["sum(size)"] == len(blob)
    # and the fused iterator itself refuses the unbounded mode outright
    import pytest

    with pytest.raises(ValueError, match="enforce_max"):
        list(C._iter_block_arrays_multi(str(f), [p]))
