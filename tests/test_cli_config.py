"""CLI config layering tests (_base_ inheritance, closed schema)."""

from __future__ import annotations

import json

import pytest

from webextract.__main__ import load_config


def test_base_chain_and_dict_merge(tmp_path):
    (tmp_path / "base.json").write_text(json.dumps({
        "min_region_size": 5,
        "merge_aliases": {"title": "header"},
    }))
    (tmp_path / "child.json").write_text(json.dumps({
        "_base_": "base.json",
        "max_link_density": 0.4,
        "merge_aliases": {"blockquote": "paragraph"},
    }))
    cfg = load_config(str(tmp_path / "child.json"))
    assert cfg.min_region_size == 5            # inherited
    assert cfg.max_link_density == 0.4         # child
    # dict values merge per-key, as in the reference's CfgNode merge
    assert cfg.merge_aliases == {"title": "header",
                                 "blockquote": "paragraph"}


def test_child_overrides_base(tmp_path):
    (tmp_path / "base.json").write_text(json.dumps({"min_region_size": 5}))
    (tmp_path / "child.json").write_text(json.dumps({
        "_base_": "base.json", "min_region_size": 9}))
    assert load_config(str(tmp_path / "child.json")).min_region_size == 9


def test_base_cycle_rejected(tmp_path):
    (tmp_path / "a.json").write_text(json.dumps({"_base_": "b.json"}))
    (tmp_path / "b.json").write_text(json.dumps({"_base_": "a.json"}))
    with pytest.raises(SystemExit, match="cycle"):
        load_config(str(tmp_path / "a.json"))


def test_unknown_key_rejected_through_chain(tmp_path):
    (tmp_path / "base.json").write_text(json.dumps({"bogus": 1}))
    (tmp_path / "child.json").write_text(json.dumps({"_base_": "base.json"}))
    with pytest.raises(SystemExit, match="unknown config keys"):
        load_config(str(tmp_path / "child.json"))


def test_cli_dedup_stages_then_staged_curate(spark, tmp_path, capsys):
    """CLI drive of the staged production shape: materialize the dedup
    stages of a corpus snapshot, then curate consuming them — identical
    survivors to the fused run."""
    from pyspark.sql import Row

    from webextract.__main__ import main

    base = ("the quick brown fox jumps over the lazy dog and runs through "
            "a field of tall green grass while the sun is warm and the "
            "wind is soft in the valley near the river bend where birds "
            "sing")
    rows = [Row(doc_id=1, text=base), Row(doc_id=2, text=base),
            Row(doc_id=3, text=base.rsplit(" ", 1)[0] + " hum"),
            Row(doc_id=4, text="ab cd")]
    docs_path = str(tmp_path / "docs")
    spark.createDataFrame(rows).write.parquet(docs_path)

    stages = str(tmp_path / "stages")
    assert main(["dedup-stages", "--input", docs_path,
                 "--output", stages]) == 0
    st_summary = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert st_summary["signatures"] == 4 and st_summary["pairs"] >= 1

    fused_out = str(tmp_path / "fused")
    assert main(["curate", "--input", docs_path, "--output", fused_out,
                 "--min-quality", "0.3"]) == 0
    fused_summary = json.loads(
        capsys.readouterr().out.strip().splitlines()[-1])
    staged_out = str(tmp_path / "staged")
    assert main(["curate", "--input", docs_path, "--output", staged_out,
                 "--min-quality", "0.3", "--stages", stages,
                 "--transitive"]) == 0
    staged_summary = json.loads(
        capsys.readouterr().out.strip().splitlines()[-1])
    assert staged_summary["staged"] is True
    fused = sorted(r["doc_id"]
                   for r in spark.read.parquet(fused_out).collect())
    staged = sorted(r["doc_id"]
                    for r in spark.read.parquet(staged_out).collect())
    assert fused == staged == [1]
    assert fused_summary["rows_out"] == staged_summary["rows_out"] == 1
    assert staged_summary["staged_pairs_ignored"] is False

    # a LOWER curate threshold than the stage build: the staged pairs
    # (filtered at 0.8) would silently miss [0.5, 0.8) pairs — the CLI
    # must ignore them and re-verify from the threshold-independent
    # candidates, matching a fused run at the lower threshold
    low_fused = str(tmp_path / "low_fused")
    assert main(["curate", "--input", docs_path, "--output", low_fused,
                 "--min-quality", "0.3", "--threshold", "0.5"]) == 0
    capsys.readouterr()
    low_staged = str(tmp_path / "low_staged")
    assert main(["curate", "--input", docs_path, "--output", low_staged,
                 "--min-quality", "0.3", "--threshold", "0.5",
                 "--stages", stages]) == 0
    low_summary = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert low_summary["staged_pairs_ignored"] is True
    assert sorted(r["doc_id"] for r in spark.read.parquet(low_staged).collect()) \
        == sorted(r["doc_id"] for r in spark.read.parquet(low_fused).collect())

    # stage tables built on other id/text columns cannot be reused
    import pytest
    with pytest.raises(SystemExit, match="stage tables are content-keyed"):
        main(["curate", "--input", docs_path, "--output",
              str(tmp_path / "bad"), "--stages", stages,
              "--id-col", "other_id"])

    # a pre-metadata stage dir (stage_meta missing): thresholds cannot be
    # checked, so the conservative path re-verifies from candidates
    import shutil
    shutil.rmtree(f"{stages}/stage_meta")
    nometa_out = str(tmp_path / "nometa")
    assert main(["curate", "--input", docs_path, "--output", nometa_out,
                 "--min-quality", "0.3", "--stages", stages]) == 0
    nometa = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert nometa["staged_pairs_ignored"] is True
    assert sorted(r["doc_id"]
                  for r in spark.read.parquet(nometa_out).collect()) == [1]


def test_cli_increment(spark, tmp_path, capsys):
    """CLI drive of snapshot-growth dedup: new batch vs committed
    corpus, with and without the stored signature stage table —
    identical survivors."""
    from pyspark.sql import Row

    from webextract.__main__ import main

    base = ("the quick brown fox jumps over the lazy dog and runs through "
            "a field of tall green grass while the sun is warm and the "
            "wind is soft in the valley near the river bend where birds "
            "sing")
    other = ("entirely different page about gardening tips for growing "
             "tomatoes peppers and herbs in raised beds with compost and "
             "regular watering through the hot months of summer")
    corpus_path = str(tmp_path / "corpus")
    spark.createDataFrame(
        [Row(doc_id=2, text=base)]).write.parquet(corpus_path)
    new_path = str(tmp_path / "new")
    spark.createDataFrame([
        Row(doc_id=11, text=base),                         # corpus dup
        Row(doc_id=13, text=base.rsplit(" ", 1)[0] + " hum"),  # near dup
        Row(doc_id=15, text=other),                        # survives
    ]).write.parquet(new_path)

    out = str(tmp_path / "survivors")
    assert main(["increment", "--input", new_path, "--corpus", corpus_path,
                 "--output", out]) == 0
    summary = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert summary == {"new_rows": 3, "survivors": 1}
    assert [r["doc_id"] for r in spark.read.parquet(out).collect()] == [15]

    # staged shape: the committed corpus's stored signatures feed the
    # band join; survivors identical
    stages = str(tmp_path / "stages")
    assert main(["dedup-stages", "--input", corpus_path,
                 "--output", stages]) == 0
    capsys.readouterr()
    out2 = str(tmp_path / "survivors2")
    assert main(["increment", "--input", new_path, "--corpus", corpus_path,
                 "--output", out2, "--stages", stages]) == 0
    summary2 = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert summary2["survivors"] == 1
    assert [r["doc_id"] for r in
            spark.read.parquet(out2).collect()] == [15]


def test_cli_dedup_stages_custom_id_col(spark, tmp_path, capsys):
    # non-default --id-col must flow through every stage (the candidates
    # stage used to crash on the missing default column)
    from pyspark.sql import Row

    from webextract.__main__ import main

    base = ("the quick brown fox jumps over the lazy dog and runs through "
            "a field of tall green grass while the sun is warm")
    rows = [Row(page_id=1, text=base), Row(page_id=2, text=base)]
    docs_path = str(tmp_path / "docs")
    spark.createDataFrame(rows).write.parquet(docs_path)
    stages = str(tmp_path / "stages")
    assert main(["dedup-stages", "--input", docs_path, "--output", stages,
                 "--id-col", "page_id", "--n-hashes", "8",
                 "--band-size", "2"]) == 0
    summary = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert summary["signatures"] == 2 and summary["pairs"] == 1
    cand_cols = spark.read.parquet(f"{stages}/candidates").columns
    assert cand_cols == ["doc_a", "doc_b"]
    sig_cols = spark.read.parquet(f"{stages}/signatures").columns
    assert sig_cols == ["page_id"] + [f"mh{k}" for k in range(8)]
    meta = spark.read.json(f"{stages}/stage_meta").collect()[0]
    assert (meta["n_hashes"], meta["band_size"]) == (8, 2)


def test_cli_hygiene_ops(spark, tmp_path, capsys):
    """CLI drive of the hygiene pass: pii-mask, decontaminate against a
    benchmark parquet, and deterministic stratified sampling."""
    from pyspark.sql import Row

    from webextract.__main__ import main

    secret = ("the capital of france is paris and the capital of spain "
              "is madrid")
    rows = [
        Row(doc_id=1, lang="en",
            text=f"reach me at jo@x.example.org please {secret}"),
        Row(doc_id=2, lang="en", text="a clean document about nothing "
                                      "in particular at all today"),
        Row(doc_id=3, lang="de", text="noch ein sauberes dokument ohne "
                                      "besondere merkmale heute hier"),
    ]
    docs_path = str(tmp_path / "docs")
    spark.createDataFrame(rows).write.parquet(docs_path)
    bench_path = str(tmp_path / "bench")
    spark.createDataFrame([Row(text=secret)]).write.parquet(bench_path)

    masked_out = str(tmp_path / "masked")
    assert main(["hygiene", "--op", "pii-mask", "--input", docs_path,
                 "--output", masked_out]) == 0
    summary = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert summary == {"op": "pii-mask", "rows_in": 3, "rows_out": 3}
    masked = {r["doc_id"]: r for r in
              spark.read.parquet(masked_out).collect()}
    assert "<EMAIL>" in masked[1]["masked_text"]
    assert masked[2]["has_pii"] is False

    decon_out = str(tmp_path / "decon")
    assert main(["hygiene", "--op", "decontaminate", "--input", docs_path,
                 "--benchmark", bench_path, "--output", decon_out]) == 0
    capsys.readouterr()
    decon = {r["id"]: r for r in spark.read.parquet(decon_out).collect()}
    assert decon[1]["contaminated"] is True
    assert decon[2]["contaminated"] is False

    samp_out = str(tmp_path / "sample")
    assert main(["hygiene", "--op", "sample", "--input", docs_path,
                 "--output", samp_out, "--strata-col", "lang",
                 "--rate", "en=1.0", "--default-rate", "0.0"]) == 0
    capsys.readouterr()
    kept = sorted(r["doc_id"] for r in
                  spark.read.parquet(samp_out).collect())
    assert kept == [1, 2]  # every en row, no de rows


def test_cli_hygiene_canonicalize_and_lm_score(spark, tmp_path, capsys):
    from pyspark.sql import Row

    from webextract.__main__ import main

    docs = [
        Row(doc_id=1, url="https://A.test/x/?utm_source=z",
            text="the cat sat on the mat"),
        Row(doc_id=2, url="not a url", text="zz qq vv ww pp"),
    ]
    docs_path = str(tmp_path / "docs")
    spark.createDataFrame(docs).write.parquet(docs_path)
    ref_path = str(tmp_path / "ref")
    spark.createDataFrame([Row(text="the cat sat on the mat today")]) \
        .write.parquet(ref_path)

    canon_out = str(tmp_path / "canon")
    assert main(["hygiene", "--op", "canonicalize", "--input", docs_path,
                 "--output", canon_out]) == 0
    capsys.readouterr()
    canon = {r["doc_id"]: r["canonical_url"]
             for r in spark.read.parquet(canon_out).collect()}
    assert canon[1] == "https://a.test/x"
    assert canon[2] == "not a url"

    lm_out = str(tmp_path / "lm")
    assert main(["hygiene", "--op", "lm-score", "--input", docs_path,
                 "--benchmark", ref_path, "--output", lm_out]) == 0
    capsys.readouterr()
    lm = {r["id"]: r for r in spark.read.parquet(lm_out).collect()}
    assert lm[1]["known_rate"] == 1.0
    assert lm[2]["known_rate"] == 0.0
