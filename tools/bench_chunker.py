"""Single-core chunker throughput microbenchmark.

Measures each stage of the CDC hot path in isolation, then end-to-end,
on a synthetic 48 MiB mixed blob (random + duplicated blocks — random
bytes are the worst case for the compressibility probe). This is the
source of the per-core MB/s figures in SCALING.md §1 and of the
native-vs-numpy comparison in operators/native.py.

Usage: python tools/bench_chunker.py [MiB]
"""

from __future__ import annotations

import os
import sys
import tempfile
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from dataset_dedupe_estimator_spark.operators import native  # noqa: E402
from dataset_dedupe_estimator_spark.operators.chunker import (  # noqa: E402
    ChunkerParams,
    _boundary_candidates,
    _compressed_size,
    _hash64,
    _iter_file_chunks,
)


def _mixed_blob(mib: int) -> bytes:
    rng = np.random.default_rng(1)
    parts = []
    for i in range(mib):
        blk = rng.integers(0, 256, 1024 * 1024 // 4 * 3, dtype=np.uint8).tobytes()
        parts.append(blk)
        if i % 3 == 0:
            parts.append(blk)  # duplicate ~1/3 of blocks
    return b"".join(parts)


def _rate(nbytes: int, fn, reps: int = 3) -> float:
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        fn()
        best = min(best, time.perf_counter() - t0)
    return nbytes / best / 1e6


def main() -> None:
    mib = int(sys.argv[1]) if len(sys.argv) > 1 else 48
    data = _mixed_blob(mib)
    n = len(data)
    buf = np.frombuffer(data, dtype=np.uint8)
    print(f"blob: {n >> 20} MiB; native kernels: {native.available()}")

    for label, p in (
        ("window", ChunkerParams()),
        ("gear", ChunkerParams(scheme="gear")),
    ):
        print(f"boundary scan [{label}]: "
              f"{_rate(n, lambda: _boundary_candidates(buf, p)):.0f} MB/s")

    from dataset_dedupe_estimator_spark.operators.chunker import chunk_bytes

    chunks = [data[o: o + s] for o, s in chunk_bytes(data)]
    print(f"chunks: {len(chunks)} (avg {n / len(chunks) / 1024:.0f} KiB)")
    print(f"identity hash (sha1-64): "
          f"{_rate(n, lambda: [_hash64(c) for c in chunks]):.0f} MB/s")
    for label, scheme in (("lz4", "auto"), ("zlib1", "zlib1")):
        print(f"compress probe [{label}]: "
              f"{_rate(n, lambda: [_compressed_size(c, None, scheme) for c in chunks], reps=1):.0f} MB/s")

    # r11 fused-path stages (the real executor hot path; the per-chunk
    # stages above are the legacy/fallback pipeline)
    if native.available():
        from dataset_dedupe_estimator_spark.operators.chunker import (
            _MIX,
            _cuts_from_candidates,
            _gear_table,
        )

        p0 = ChunkerParams()
        table = _gear_table(p0.seed)
        fc = native.fused_cuts(
            buf, table, p0.mask_bits, p0.min_size, p0.max_size,
            "window", p0.window, int(_MIX),
        )
        print(
            f"fused cuts [window, min-skip]: "
            f"{_rate(n, lambda: native.fused_cuts(buf, table, p0.mask_bits, p0.min_size, p0.max_size, 'window', p0.window, int(_MIX))):.0f} MB/s"
        )
        cand = _boundary_candidates(buf, p0)
        cuts = np.asarray(
            _cuts_from_candidates(n, cand, 0, p0), dtype=np.int64
        )
        assert np.array_equal(fc, cuts), "fused cuts diverged from reference"
        rel = np.empty(len(cuts), dtype=np.int64)
        rel[0] = 0
        rel[1:] = cuts[:-1]
        sizes = cuts - rel
        idx = np.arange(len(cuts), dtype=np.int64)
        print(f"hash scan (xxh64): "
              f"{_rate(n, lambda: native.chunk_hashes(buf, cuts, 0, 42)):.0f} MB/s")
        print(f"probe scan (lz4, full): "
              f"{_rate(n, lambda: native.chunk_probes(buf, rel, sizes, idx, -1)):.0f} MB/s")
        print(f"probe scan (lz4, 16k): "
              f"{_rate(n, lambda: native.chunk_probes(buf, rel, sizes, idx, 16384)):.0f} MB/s")

    with tempfile.NamedTemporaryFile(delete=False) as f:
        f.write(data)
        path = f.name
    try:
        from dataset_dedupe_estimator_spark.operators.chunker import (
            _fast_arrays_ok,
            file_chunk_arrays,
        )

        for label, p in (
            ("window/full-probe", ChunkerParams()),
            ("window/probe16k", ChunkerParams(compress_probe_bytes=16 * 1024)),
            ("gear/full-probe", ChunkerParams(scheme="gear")),
        ):
            if _fast_arrays_ok(p):
                print(
                    f"end-to-end fused [{label}]: "
                    f"{_rate(n, lambda p=p: file_chunk_arrays(path, p), reps=3):.0f} MB/s/core"
                )

            def run(p=p):
                for _off, ch in _iter_file_chunks(path, p):
                    _hash64(ch)
                    _compressed_size(ch, p.compress_probe_bytes, p.compress_scheme)

            print(f"end-to-end per-chunk [{label}]: {_rate(n, run, reps=2):.0f} MB/s/core")
    finally:
        os.unlink(path)


if __name__ == "__main__":
    main()
