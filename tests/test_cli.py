"""CLI integration (reference de/tests/test_cli.py style): commands run
in-process against real files; exit codes and output asserted."""

import json

import numpy as np
import pytest

pytestmark = pytest.mark.slow  # driver-budget: deselected from the default run

from dataset_dedupe_estimator_spark.cli import main


@pytest.fixture(scope="module")
def data_dir(spark, tmp_path_factory):
    d = tmp_path_factory.mktemp("cli-data")
    df = spark.createDataFrame([(i, f"v{i}") for i in range(2000)], "a bigint, b string")
    df.write.mode("overwrite").parquet(str(d / "t1.parquet.dir"))
    # single files for file-oriented commands
    import glob, shutil

    part = glob.glob(str(d / "t1.parquet.dir" / "part-*.parquet"))[0]
    shutil.copy(part, d / "t1.parquet")
    shutil.copy(part, d / "t2.parquet")  # identical copy → dedup
    shutil.rmtree(d / "t1.parquet.dir")
    return d


def test_cli_dedup(capsys, data_dir, spark):
    rc = main(["dedup", str(data_dir / "t1.parquet"), str(data_dir / "t2.parquet"), "--no-xet"])
    out = capsys.readouterr().out
    assert rc == 0
    assert "files: 2" in out
    assert "dedup ratio: 50.00%" in out  # identical copies halve


def test_cli_delta(capsys, data_dir, spark):
    rc = main([
        "delta",
        "--old", str(data_dir / "t1.parquet"),
        "--new", str(data_dir / "t2.parquet"),
    ])
    out = capsys.readouterr().out
    assert rc == 0
    # t2 is an identical copy: nothing to transfer
    assert "transfer 0.0 B" in out


def test_cli_dedup_diff_html(capsys, data_dir, spark, tmp_path):
    out_html = tmp_path / "diff.html"
    rc = main([
        "dedup", str(data_dir / "t1.parquet"), str(data_dir / "t2.parquet"),
        "--no-xet", "--diff-html", str(out_html),
    ])
    assert rc == 0
    html = out_html.read_text()
    assert "t1.parquet" in html and "t2.parquet" in html


def test_cli_sql_chunk_views(capsys, data_dir, spark):
    rc = main([
        "sql",
        "SELECT COUNT(*) AS n, COUNT(DISTINCT hash) AS u FROM chunks",
        "--sf-dir", str(data_dir),
        "--chunks", str(data_dir / "t1.parquet"), str(data_dir / "t2.parquet"),
    ])
    out = capsys.readouterr().out
    assert rc == 0
    # t1/t2 identical: occurrences = 2x distinct hashes
    import re

    n, u = map(int, re.findall(r"\|(\d+)\s*\|(\d+)\s*\|", out)[0])
    assert n == 2 * u > 0


def test_cli_stats(capsys, data_dir, spark, tmp_path):
    rc = main(["stats", str(data_dir), "--out", str(tmp_path / "stats")])
    out = capsys.readouterr().out
    assert rc == 0
    assert "### combined" in out and "parquet-c=snappy" in out


def test_cli_stats_missing_dir(capsys, spark):
    rc = main(["stats", "/nonexistent-dir"])
    assert rc == 1
    assert "no parquet files" in capsys.readouterr().err


def test_cli_page_chunks(capsys, data_dir, spark):
    rc = main(["page-chunks", str(data_dir / "t1.parquet")])
    assert rc == 0
    assert "#" in capsys.readouterr().out


def test_cli_corpus(capsys, spark):
    rc = main(["corpus", "--sf-dir", "/root/testdata/sf0.001", "--limit", "3"])
    assert rc == 0
    out = capsys.readouterr().out
    assert "survival by source" in out
    assert "near-duplicate clusters" in out
    assert "exact-substring spans" in out and "duplicated tokens=" in out


def test_cli_sql(capsys, spark):
    rc = main(
        [
            "sql",
            "SELECT count(*) AS n FROM documents",
            "--sf-dir",
            "/root/testdata/sf0.001",
        ]
    )
    assert rc == 0
    assert "n" in capsys.readouterr().out


def test_cli_index_lifecycle(capsys, data_dir, spark, tmp_path):
    idx = str(tmp_path / "idx")
    rc = main(["index", "build", idx, str(data_dir / "t1.parquet")])
    assert rc == 0
    rc = main(["index", "update", idx, str(data_dir / "t1.parquet"), str(data_dir / "t2.parquet")])
    assert rc == 0
    rc = main(["index", "stats", idx])
    assert rc == 0
    out = capsys.readouterr().out
    assert "gen 0:" in out and "gen 1:" in out and "generations=2" in out
    assert "transfer" in out


def test_cli_events_report(capsys, spark):
    rc = main(["events", "--sf-dir", "/root/testdata/sf0.001"])
    assert rc == 0
    out = capsys.readouterr().out
    assert "conversion funnel" in out
    assert "retention" in out
    assert "sessions" in out


def test_cli_compact(capsys, data_dir, spark, tmp_path):
    src = tmp_path / "many"
    src.mkdir()
    df = spark.range(5000).selectExpr("id", "id * 3 AS v").repartition(8)
    df.write.mode("overwrite").parquet(str(src))
    rc = main(["compact", str(src), str(tmp_path / "few"), "--target-mb", "64"])
    assert rc == 0
    out = capsys.readouterr().out
    assert "compacted" in out and "5000 rows" in out


def test_cli_index_compact(capsys, data_dir, spark, tmp_path):
    idx = str(tmp_path / "idx")
    assert main(["index", "build", idx, str(data_dir / "t1.parquet")]) == 0
    assert main(["index", "update", idx, str(data_dir / "t2.parquet")]) == 0
    assert main(["index", "compact", idx]) == 0
    assert main(["index", "stats", idx]) == 0
    out = capsys.readouterr().out
    assert "compacted 2 generations" in out
    assert "generations=3" in out


def test_cli_quality_report(capsys, spark):
    rc = main(["quality", "--sf-dir", "/root/testdata/sf0.001", "--allow-violations"])
    assert rc == 0
    out = capsys.readouterr().out
    assert "constraints hold" in out and "FAIL" in out  # n_chars:max(300) fails by design
    # without the flag the failing constraint gates the exit code
    assert main(["quality", "--sf-dir", "/root/testdata/sf0.001"]) == 1


def test_cli_lsh_index_lifecycle(capsys, spark, tmp_path):
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    base, batch = str(tmp_path / "base"), str(tmp_path / "batch")
    docs.filter("doc_id % 3 != 0").select("doc_id", "text").write.parquet(base)
    docs.filter("doc_id % 3 = 0").select("doc_id", "text").write.parquet(batch)
    idx, pairs = str(tmp_path / "lsh"), str(tmp_path / "pairs")

    assert main(["lsh-index", "build", idx, base]) == 0
    assert main(["lsh-index", "admit", idx, batch, "--pairs-out", pairs]) == 0
    assert main(["lsh-index", "stats", idx]) == 0
    out = capsys.readouterr().out
    assert "gen 0:" in out and "gen 1:" in out and "generations=2" in out
    assert "candidate pairs" in out
    assert spark.read.parquet(pairs).columns == ["doc_a", "doc_b"]


def test_cli_lsh_index_stream(capsys, spark, tmp_path):
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    inbox = tmp_path / "inbox"
    inbox.mkdir()
    base = str(tmp_path / "base")
    docs.filter("doc_id % 3 != 0").select("doc_id", "text").write.parquet(base)
    docs.filter("doc_id % 3 = 0").select("doc_id", "text").write.parquet(
        str(inbox / "drop.parquet")
    )
    idx = str(tmp_path / "lsh")
    assert main(["lsh-index", "build", idx, base]) == 0
    rc = main(
        [
            "lsh-index",
            "stream",
            idx,
            str(inbox),
            "--checkpoint",
            str(tmp_path / "ckpt"),
            "--pairs-out",
            str(tmp_path / "pairs"),
        ]
    )
    assert rc == 0
    out = capsys.readouterr().out
    assert "1 generation(s) admitted" in out


def test_cli_pq_index(capsys, spark, tmp_path):
    idx = str(tmp_path / "pqidx")
    vecs = "/root/testdata/sf0.001/embeddings.parquet"
    rc = main(["pq-index", "build", idx, vecs, "--cells", "8", "--codes", "32"])
    assert rc == 0
    rc = main(
        ["pq-index", "search", idx, vecs, "--query-id", "5", "--nprobe", "8", "--topk", "5"]
    )
    assert rc == 0
    out = capsys.readouterr().out
    assert "indexed 500 vectors" in out
    # probing all cells, the query's own vector ranks first (min ADC =
    # its own reconstruction error)
    assert out.splitlines()[-5].startswith("vec_id=5 ")
    rc = main(["pq-index", "search", idx, vecs, "--query-id", "999999"])
    assert rc == 2


def test_cli_media(capsys, spark, tmp_path):
    """`de media`: real files of every decodable format scanned, decoded,
    censused, and feature-extracted through the CLI."""
    import numpy as np

    from dataset_dedupe_estimator_spark.operators.jpeg_codec import jpeg_encode
    from dataset_dedupe_estimator_spark.operators.multimodal import avi_encode_mjpeg
    from dataset_dedupe_estimator_spark.operators.png_codec import encode_png

    d = tmp_path / "media"
    d.mkdir()
    yy, xx = np.mgrid[0:16, 0:16]
    img = np.stack([yy * 8, xx * 8, yy + xx], axis=2).astype(np.uint8)
    (d / "a.png").write_bytes(encode_png(img))
    (d / "b.jpg").write_bytes(jpeg_encode(img, quality=90))
    (d / "c.avi").write_bytes(avi_encode_mjpeg([img, img]))
    import io
    import wave

    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(8000)
        w.writeframes(b"\x00\x01" * 256)
    (d / "d.wav").write_bytes(buf.getvalue())

    # planted near-dup: re-encoded copy of the PNG image
    (d / "a2.jpg").write_bytes(jpeg_encode(img, quality=95))
    feats = str(tmp_path / "feats.parquet")
    dups = str(tmp_path / "dups.parquet")
    rc = main(["media", str(d), "--features", feats, "--near-dups", dups])
    out = capsys.readouterr().out
    assert rc == 0
    for fmt in ("png", "jpeg", "avi", "wav"):
        assert f"{fmt:8s}n=".replace("n=", " n=").strip()[:3] in out or fmt in out
    fdf = spark.read.parquet(feats)
    assert fdf.count() == 5
    assert len(fdf.head().feature) == 16
    pdf = spark.read.parquet(dups)
    assert pdf.filter(pdf.modality == "image").count() >= 1  # the planted pair


def test_cli_bpe(capsys, spark, tmp_path):
    out_json = str(tmp_path / "merges.json")
    enc = str(tmp_path / "enc.parquet")
    rc = main(["bpe", "/root/testdata/sf0.001", "--merges", "4", "--out", out_json, "--encode", enc])
    assert rc == 0
    txt = capsys.readouterr().out
    assert "#0" in txt and "->" in txt
    import json

    merges = json.load(open(out_json))
    assert len(merges) == 4 and merges[0]["rank"] == 0
    df = spark.read.parquet(enc)
    assert {"ws_tokens", "bpe_tokens"} <= set(df.columns)
    assert df.count() > 0


def test_cli_search_and_sample(capsys, spark, tmp_path):
    import os

    from dataset_dedupe_estimator_spark.cli import main

    sf = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")
    docs = f"{sf}/documents.parquet"
    assert main(["search", docs, "vector", "window", "--top", "5"]) == 0
    out = capsys.readouterr().out
    assert out.count("score=") == 5 and "/2 terms" in out

    emb = f"{sf}/embeddings.parquet"
    assert main(
        ["search", docs, "vector", "window",
         "--vectors", emb, "--query-id", "0", "--top", "6"]
    ) == 0
    out = capsys.readouterr().out
    assert out.count("rrf=") == 6 and ("bm25 #" in out and "cosine #" in out)
    # --vectors without --query-id is a usage error
    assert main(["search", docs, "vector", "--vectors", emb]) == 2

    dest = str(tmp_path / "sample.parquet")
    assert main(["sample", docs, dest, "--per-source", "3"]) == 0
    out = capsys.readouterr().out
    assert "wrote" in out
    got = spark.read.parquet(dest).groupBy("source").count().collect()
    assert got and all(r["count"] <= 3 for r in got)


def test_cli_gram_index_lifecycle(capsys, spark, tmp_path):
    from dataset_dedupe_estimator_spark.cli import main

    idx = str(tmp_path / "gidx")
    d0 = str(tmp_path / "d0.parquet")
    d1 = str(tmp_path / "d1.parquet")
    spark.createDataFrame(
        [(0, "a b c d e f"), (1, "g h i j k l")], "doc_id long, text string"
    ).write.parquet(d0)
    spark.createDataFrame(
        [(2, "x y a b c d e f z")], "doc_id long, text string"
    ).write.parquet(d1)

    assert main(["gram-index", "build", idx, d0, "--k", "3"]) == 0
    assert "unique 3-grams indexed" in capsys.readouterr().out

    spans_out = str(tmp_path / "spans.parquet")
    assert main(["gram-index", "admit", idx, d1, "--spans-out", spans_out]) == 0
    out = capsys.readouterr().out
    assert "1 duplicate spans (6 tokens) across 1 docs" in out
    got = spark.read.parquet(spans_out).collect()
    # generation column matches the streaming sink schema (ADVICE r5)
    assert [(r.id, r.span_start, r.span_end, r.generation) for r in got] == [
        (2, 2, 8, 1)
    ]

    assert main(["gram-index", "query", idx, d1, "--spans-out", spans_out]) == 0
    assert "(read-only)" in capsys.readouterr().out
    # the query append lands in the SAME sink with a uniform schema
    regot = spark.read.parquet(spans_out)
    assert set(regot.columns) == {"id", "span_start", "span_end", "generation"}
    assert regot.count() == 2

    assert main(["gram-index", "compact", idx]) == 0
    assert "compacted" in capsys.readouterr().out

    assert main(["gram-index", "stats", idx]) == 0
    assert "k=3" in capsys.readouterr().out

    # usage errors
    assert main(["gram-index", "admit", idx]) == 2
    assert main(["gram-index", "stream", idx, d1]) == 2


def test_cli_text_index_lifecycle(capsys, spark, tmp_path, sf_dir):
    from dataset_dedupe_estimator_spark.cli import main

    idx = str(tmp_path / "tidx")
    d0 = str(tmp_path / "d0.parquet")
    d1 = str(tmp_path / "d1.parquet")
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select("doc_id", "text")
    docs.filter("doc_id % 2 = 0").write.parquet(d0)
    docs.filter("doc_id % 2 = 1").write.parquet(d1)

    assert main(["text-index", "build", idx, d0]) == 0
    assert "docs indexed" in capsys.readouterr().out
    assert main(["text-index", "admit", idx, d1]) == 0
    assert "docs admitted" in capsys.readouterr().out
    assert main(["text-index", "search", idx, "--terms", "vector,window,fast"]) == 0
    out = capsys.readouterr().out
    assert out.count("doc_id=") == 20 and "score=" in out
    assert main(["text-index", "stats", idx]) == 0
    assert "generations=2" in capsys.readouterr().out
    assert main(["text-index", "compact", idx]) == 0
    assert "compacted 2 generations" in capsys.readouterr().out
    # arg validation
    assert main(["text-index", "build", idx]) == 2
    assert main(["text-index", "search", idx]) == 2


def test_cli_rewrite_plain_and_cdc_gate(capsys, data_dir, spark, tmp_path):
    """`de rewrite` parity (reference de/cli.py:253-259): writes
    <stem>-dedup.parquet NEXT TO each input. Default is the CDC format
    (env-gated: pyarrow < 21 raises the labeled seam, exit 2 with a
    --plain hint); --plain rewrites with the vanilla writer."""
    import shutil

    from dataset_dedupe_estimator_spark.sources.formats import (
        _PYARROW_HAS_CDC,
    )

    src = tmp_path / "in.parquet"
    shutil.copy(data_dir / "t1.parquet", src)
    rc = main(["rewrite", str(src), "--plain"])
    out = capsys.readouterr().out
    dest = tmp_path / "in-dedup.parquet"
    assert rc == 0 and str(dest) in out
    assert dest.is_file()
    assert spark.read.parquet(str(dest)).count() == spark.read.parquet(
        str(src)
    ).count()
    if not _PYARROW_HAS_CDC:
        rc = main(["rewrite", str(src)])
        err = capsys.readouterr().err
        assert rc == 2
        assert "pyarrow" in err and "--plain" in err


def test_cli_render_readme(capsys, tmp_path):
    """`de render-readme` parity (reference de/cli.py:262-270): renders
    the template with an empty context and writes it next to the
    template with the final suffix stripped. Without jinja2 the
    {{ expression }} subset renders (undefined names -> '' like
    jinja2's default Undefined); {% statements %} refuse clearly."""
    t = tmp_path / "README.md.j2"
    t.write_text("# T\n\nsum: {{ 2 + 2 }}\nmissing: [{{ nope }}]\n")
    rc = main(["render-readme", str(t)])
    out = capsys.readouterr().out
    dest = tmp_path / "README.md"
    assert rc == 0 and str(dest) in out
    body = dest.read_text()
    assert "sum: 4" in body and "missing: []" in body
    try:
        import jinja2  # noqa: F401

        has_jinja = True
    except ImportError:
        has_jinja = False
    if not has_jinja:
        t2 = tmp_path / "S.md.j2"
        t2.write_text("{% for i in x %}{{ i }}{% endfor %}")
        rc = main(["render-readme", str(t2)])
        err = capsys.readouterr().err
        assert rc == 2 and "jinja2" in err
        # jinja-only expression syntax / runtime errors refuse cleanly
        t3 = tmp_path / "U.md.j2"
        t3.write_text('x: {{ "a" ~ user }}')
        rc = main(["render-readme", str(t3)])
        err = capsys.readouterr().err
        assert rc == 2 and "subset" in err
    # a suffix-less template would render onto itself: refused
    t4 = tmp_path / "README"
    t4.write_text("hello {{ 1 + 1 }}")
    rc = main(["render-readme", str(t4)])
    err = capsys.readouterr().err
    assert rc == 2 and "overwrite" in err
    assert t4.read_text() == "hello {{ 1 + 1 }}"


def test_cli_table_update_where(capsys, spark, tmp_path):
    """`de table update-where ROOT --where k:between:2,4 --set lang=de`:
    zone-map-bounded UPDATE from the CLI."""
    from dataset_dedupe_estimator_spark.sources import versioned as vt

    root = tmp_path / "t"
    df = spark.createDataFrame(
        [(i, i * 10, "en") for i in range(10)], "k long, price long, lang string"
    )
    vt.append(root, df.repartitionByRange(2, "k"), stats_columns=["k"])
    rc = main([
        "table", "update-where", str(root),
        "--where", "k:between:2,4", "--set", "lang=de", "--set", "price=0",
    ])
    out = capsys.readouterr().out
    assert rc == 0 and "3 rows updated" in out
    got = {r.k: (r.price, r.lang) for r in vt.read_version(spark, root).collect()}
    assert got[3] == (0, "de") and got[7] == (70, "en")
    # refusals surface as exit 2
    rc = main(["table", "update-where", str(root), "--set", "lang=x"])
    assert rc == 2
    rc = main(["table", "update-where", str(root), "--where", "k:==:1"])
    assert rc == 2
    # merge-on-read variant: --dv hides pre-images, appends post-images
    rc = main([
        "table", "update-where", str(root), "--dv",
        "--where", "k:==:7", "--set", "lang=fr",
    ])
    out = capsys.readouterr().out
    assert rc == 0 and "DV update: 1 rows" in out
    got = {r.k: r.lang for r in vt.read_version(spark, root).collect()}
    assert got[7] == "fr" and got[8] == "en"


def test_cli_table_replicate(capsys, spark, tmp_path):
    """`de table replicate DST SRC --checkpoint CK`: table-to-table
    streaming replication from the CLI, exactly-once across re-runs;
    --read-change-feed --keys applies row-level deletes/updates."""
    from pyspark.sql import functions as F

    from dataset_dedupe_estimator_spark.sources import versioned as vt

    src, dst, ck = tmp_path / "src", tmp_path / "dst", tmp_path / "ck"
    df = spark.createDataFrame(
        [(i, i * 10) for i in range(20)], "k long, price long"
    )
    vt.append(src, df, stats_columns=["k"])
    rc = main([
        "table", "replicate", str(dst), str(src), "--checkpoint", str(ck),
    ])
    out = capsys.readouterr().out
    assert rc == 0 and "20 live rows" in out
    # re-run with the same checkpoint: nothing new, nothing duplicated
    vt.append(src, df.withColumn("k", F.col("k") + 100))
    rc = main([
        "table", "replicate", str(dst), str(src), "--checkpoint", str(ck),
    ])
    out = capsys.readouterr().out
    assert rc == 0 and "40 live rows" in out
    assert vt.read_version(spark, dst).count() == 40
    # CDC-apply mode: deletes replicate too
    src2, dst2, ck2 = tmp_path / "s2", tmp_path / "d2", tmp_path / "ck2"
    vt.append(src2, df, change_feed=True, stats_columns=["k"])
    vt.append(dst2, df.limit(0), stats_columns=["k"])
    vt.delete_where_pruned(spark, src2, [("k", "between", (0, 4))])
    rc = main([
        "table", "replicate", str(dst2), str(src2),
        "--checkpoint", str(ck2), "--read-change-feed", "--keys", "k",
    ])
    assert rc == 0
    assert vt.read_version(spark, dst2).count() == 15
    # missing --keys refuses
    rc = main([
        "table", "replicate", str(dst2), str(src2),
        "--checkpoint", str(tmp_path / "ck3"), "--read-change-feed",
    ])
    err = capsys.readouterr().err
    assert rc == 2 and "--keys" in err
