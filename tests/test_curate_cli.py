"""End-to-end test of the curation CLI (jobs/run_curate.py): quality
filter, exact dedup, decontamination, and split-partitioned output."""

from __future__ import annotations

import json
import os

import pytest

from pyspark.sql import functions as F

import jobs.run_curate as cli
from kg.ops.curate import curate_corpus


def _write_docs(spark, path, rows):
    spark.createDataFrame(rows, ["doc_id", "text"]).write.mode(
        "overwrite"
    ).parquet(path)


WORDS = [f"word{i}" for i in range(40)]
GOOD = " ".join(WORDS)                      # long, alpha, no stopwords
BENCH = " ".join(f"eval{i}" for i in range(20))
LEAK = " ".join(f"eval{i}" for i in range(14)) + " " + " ".join(WORDS[:10])
JUNK = "!!! ??? !!!"                        # zero quality


@pytest.fixture()
def corpus(spark, tmp_path):
    docs = str(tmp_path / "docs")
    bench = str(tmp_path / "bench")
    _write_docs(
        spark,
        docs,
        [
            (1, GOOD),
            (2, GOOD),          # exact duplicate of 1 -> dropped
            (3, LEAK),          # shares 13-grams with benchmark -> dropped
            (4, JUNK),          # quality 0 -> dropped
            (5, " ".join(reversed(WORDS))),  # clean survivor
        ],
    )
    _write_docs(spark, bench, [(100, BENCH)])
    return docs, bench


def test_cli_end_to_end(spark, corpus, tmp_path, capsys):
    docs, bench = corpus
    out = str(tmp_path / "curated")
    cli.main(
        [
            "--input", docs,
            "--output", out,
            "--benchmark", bench,
            "--min-quality", "0.05",
            "--dedup", "exact",
            "--stats",
        ],
        spark=spark,
    )
    report = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert report["rows_in"] == 5
    assert report["rows_out"] == 2
    assert report["stages"] == {
        "quality_dropped": 1,
        "dedup_dropped": 1,
        "decontaminate_dropped": 1,
    }
    got = spark.read.parquet(out)
    assert sorted(r["doc_id"] for r in got.collect()) == [1, 5]
    assert "split" in got.columns
    # physically partitioned by split for trainer-side pruning
    assert any(d.startswith("split=") for d in os.listdir(out))
    assert sum(report["splits"].values()) == 2


def test_cli_deterministic_rerun(spark, corpus, tmp_path):
    docs, bench = corpus
    out1, out2 = str(tmp_path / "c1"), str(tmp_path / "c2")
    args = ["--input", docs, "--output", None, "--benchmark", bench,
            "--dedup", "exact"]
    for out in (out1, out2):
        args[3] = out
        cli.main(list(args), spark=spark)
    a = sorted(map(tuple, spark.read.parquet(out1).collect()))
    b = sorted(map(tuple, spark.read.parquet(out2).collect()))
    assert a == b


def test_curate_corpus_paragraph_mode(spark):
    # doc 20 repeats doc 10's paragraph -> rewritten without it;
    # doc 30 is ONLY that paragraph -> dropped entirely
    rows = [
        (10, "unique alpha beta\nshared paragraph here"),
        (20, "shared paragraph here\nother gamma delta"),
        (30, "shared paragraph here"),
    ]
    docs = spark.createDataFrame(rows, ["doc_id", "text"])
    got = {
        r["doc_id"]: r["text"]
        for r in curate_corpus(docs, dedup="paragraph").collect()
    }
    assert set(got) == {10, 20}
    assert got[10] == "unique alpha beta\nshared paragraph here"
    assert got[20] == "other gamma delta"


def test_curate_corpus_rejects_unknown_dedup(spark):
    docs = spark.createDataFrame([(1, "x")], ["doc_id", "text"])
    with pytest.raises(ValueError):
        curate_corpus(docs, dedup="fuzzy")


def test_cli_pack_annotates_per_split(spark, corpus, tmp_path, capsys):
    docs, _ = corpus
    out = str(tmp_path / "curated_packed")
    cli.main(
        ["--input", docs, "--output", out, "--pack", "16",
         "--split", "train=0.5,val=0.5"],
        spark=spark,
    )
    capsys.readouterr()
    got = spark.read.parquet(out)
    for c in ("n_tokens", "start_offset", "first_pack", "last_pack"):
        assert c in got.columns
    import pandas as pd

    pdf = got.toPandas()
    # offsets restart per split and form an exact prefix sum in id order
    for name, g in pdf.groupby("split"):
        g = g.sort_values("doc_id")
        acc = 0
        for _, r in g.iterrows():
            assert r["start_offset"] == acc
            assert r["first_pack"] == acc // 16
            acc += r["n_tokens"]


def test_cli_mix_and_profile(spark, tmp_path, capsys):
    """--mix keeps/drops whole groups deterministically; --profile
    appends per-group stats of the written output to the report."""
    docs = str(tmp_path / "docs_lang")
    rows = [(i, f"text body number {i} alpha bravo", "keepme" if i % 2 else "dropme")
            for i in range(40)]
    spark.createDataFrame(rows, ["doc_id", "text", "lang"]).write.mode(
        "overwrite"
    ).parquet(docs)
    out = str(tmp_path / "curated_mix")
    cli.main(
        ["--input", docs, "--output", out,
         "--mix", "keepme=1.0", "--profile"],
        spark=spark,
    )
    report = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    got = spark.read.parquet(out)
    langs = {r["lang"] for r in got.select("lang").distinct().collect()}
    assert langs == {"keepme"}               # dropme absent from --mix -> dropped
    assert report["rows_out"] == 20          # rate 1.0 keeps every keepme doc
    prof = {p["lang"]: p for p in report["profile"]}
    assert set(prof) == {"keepme"}
    assert prof["keepme"]["n_docs"] == 20 and prof["keepme"]["dup_ratio"] == 0.0


def test_cli_mix_rejects_missing_group_column(spark, tmp_path):
    docs = str(tmp_path / "docs_nolang")
    _write_docs(spark, docs, [(1, GOOD)])
    out = str(tmp_path / "curated_nolang")
    with pytest.raises(SystemExit, match="lang"):
        cli.main(
            ["--input", docs, "--output", out, "--mix", "en=1.0"],
            spark=spark,
        )


def test_cli_clean_lines_and_redact_pii(spark, tmp_path, capsys):
    docs = str(tmp_path / "pdocs")
    keep = (
        "this line has enough words to survive the filter.\n"
        "mail me at alice@example.com with acct 123456789."
    )
    _write_docs(
        spark,
        docs,
        [
            (1, keep),
            (2, "no terminal punctuation so every line dies"),
        ],
    )
    out = str(tmp_path / "pout")
    cli.main(
        [
            "--input", docs,
            "--output", out,
            "--clean-lines",
            "--redact-pii",
            "--split", "train=1.0",
        ],
        spark=spark,
    )
    report = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    # doc 2 lost every line -> dropped before curation
    assert report["rows_out"] == 1
    row = spark.read.parquet(out).first()
    assert row["doc_id"] == 1
    assert "<EMAIL>" in row["text"] and "<NUM>" in row["text"]
    assert "alice@example.com" not in row["text"]
    # both original lines survived the C4 rules
    assert row["text"].count("\n") == 1


def test_cli_gopher_and_dsir(spark, tmp_path, capsys):
    # --gopher with paper defaults: 56-word stopword-bearing doc passes,
    # the bullet list fails (word count + bullet_frac + alpha_frac)
    base = "the cat and dog have fun with that toy to be sure of it"
    gdocs = str(tmp_path / "gdocs")
    _write_docs(
        spark, gdocs,
        [(1, " ".join([base] * 4)), (2, "• one\n• two\n• three")],
    )
    gout = str(tmp_path / "gout")
    cli.main(
        ["--input", gdocs, "--output", gout, "--gopher",
         "--split", "train=1.0"],
        spark=spark,
    )
    report = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert report["rows_out"] == 1
    assert spark.read.parquet(gout).first()["doc_id"] == 1

    # --dsir-target: disjoint vocabularies make the signs certain —
    # every doc-1 token is IN the target (ratio ln((Nr+B)/(Nt+B)) > 0),
    # every doc-3 token is absent from it (ratio < 0)
    ddocs, dtgt = str(tmp_path / "ddocs"), str(tmp_path / "dtgt")
    on_domain = "cat dog toy play fetch ball park walk"
    off_domain = "zebra lion tiger panda bear wolf deer elk"
    # doc 5 has zero alnum tokens: its 0.0 SENTINEL ratio must not
    # slip past the default >= 0.0 threshold
    _write_docs(
        spark, ddocs, [(1, on_domain), (3, off_domain), (5, "!!! ???")]
    )
    _write_docs(spark, dtgt, [(9, on_domain)])
    dout = str(tmp_path / "dout")
    cli.main(
        ["--input", ddocs, "--output", dout,
         "--dsir-target", dtgt, "--min-dsir", "0.0",
         "--split", "train=1.0"],
        spark=spark,
    )
    report = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert report["rows_out"] == 1
    assert spark.read.parquet(dout).first()["doc_id"] == 1


def test_cli_chunk_writes_side_table(spark, corpus, tmp_path, capsys):
    docs, _ = corpus
    out = str(tmp_path / "curated_ck")
    cli.main(
        ["--input", docs, "--output", out, "--min-quality", "0.05",
         "--dedup", "exact", "--chunk", "8:6"],
        spark=spark,
    )
    report = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    chunks = spark.read.parquet(out + "_chunks")
    assert report["chunk_rows"] == chunks.count() > 0
    rows = chunks.collect()
    assert {"doc_id", "chunk_idx", "start_tok", "n_tok", "chunk_text",
            "split"} <= set(chunks.columns)
    # stride rule: starts are multiples of 6, windows hold <= 8 tokens
    for r in rows:
        assert r["start_tok"] % 6 == 0 and 1 <= r["n_tok"] <= 8
    # every curated doc with tokens has a chunk 0
    curated_ids = {
        r["doc_id"] for r in spark.read.parquet(out).collect()
    }
    assert {r["doc_id"] for r in rows if r["chunk_idx"] == 0} == curated_ids


def test_cli_chunk_rejects_bad_spec(spark, corpus, tmp_path):
    docs, _ = corpus
    out = str(tmp_path / "curated_badck")
    with pytest.raises(SystemExit):
        cli.main(
            ["--input", docs, "--output", out, "--chunk", "eight"],
            spark=spark,
        )


def test_cli_jsonl_input(spark, tmp_path, capsys):
    """--input-format jsonl reads newline-delimited JSON through the
    same curation path; a corpus lacking the contract columns fails
    loudly before any stage runs."""
    src = tmp_path / "docs.jsonl"
    rows = [
        {"doc_id": 1, "text": GOOD},
        {"doc_id": 2, "text": GOOD},  # exact dup -> dropped
        {"doc_id": 3, "text": " ".join(reversed(WORDS))},
    ]
    src.write_text("\n".join(json.dumps(r) for r in rows) + "\n")
    out = str(tmp_path / "curated")
    cli.main(
        [
            "--input", str(src), "--input-format", "jsonl",
            "--output", out, "--dedup", "exact",
            "--split", "train=1.0",
        ],
        spark=spark,
    )
    got = spark.read.parquet(out)
    assert got.count() == 2
    assert {r["doc_id"] for r in got.select("doc_id").collect()} == {1, 3}

    bad = tmp_path / "bad.jsonl"
    bad.write_text(json.dumps({"identifier": 1, "body": "x"}) + "\n")
    with pytest.raises(SystemExit, match="lacks column"):
        cli.main(
            ["--input", str(bad), "--input-format", "jsonl",
             "--output", out],
            spark=spark,
        )


def test_cli_max_contamination_threshold(spark, corpus, tmp_path):
    docs, bench = corpus
    # LEAK = 14 eval tokens + 10 corpus words = 24 tokens -> 12 distinct
    # 13-grams, 2 of them inside the benchmark run -> fraction 1/6
    out_hi = str(tmp_path / "hi")
    cli.main(
        ["--input", docs, "--output", out_hi, "--benchmark", bench,
         "--dedup", "exact", "--max-contamination", "0.5"],
        spark=spark,
    )
    assert 3 in {r["doc_id"] for r in spark.read.parquet(out_hi).collect()}
    out_lo = str(tmp_path / "lo")
    cli.main(
        ["--input", docs, "--output", out_lo, "--benchmark", bench,
         "--dedup", "exact", "--max-contamination", "0.1"],
        spark=spark,
    )
    assert 3 not in {r["doc_id"] for r in spark.read.parquet(out_lo).collect()}


def test_curate_corpus_max_contamination_validates(spark):
    import pytest as _pytest

    docs = spark.createDataFrame([(1, "a")], ["doc_id", "text"])
    with _pytest.raises(ValueError, match="max_contamination"):
        curate_corpus(docs, benchmark=docs, max_contamination=1.5)


def test_cli_skew_col_reports_multiplier(spark, tmp_path, capsys):
    """--skew-col appends the top-key skew diagnostic of the INPUT."""
    docs = str(tmp_path / "docs_skew")
    rows = [(i, f"text body number {i} alpha bravo",
             "hot" if i < 30 else f"cold{i}") for i in range(40)]
    spark.createDataFrame(rows, ["doc_id", "text", "lang"]).write.mode(
        "overwrite"
    ).parquet(docs)
    out = str(tmp_path / "curated_skew")
    cli.main(
        ["--input", docs, "--output", out, "--skew-col", "lang"],
        spark=spark,
    )
    report = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    skew = report["skew"]
    assert skew[0]["key"] == "hot" and skew[0]["n"] == 30
    assert skew[0]["n_keys"] == 11
    # max/avg = 30 / (40/11) = 8.25
    assert skew[0]["skew_fp"] == 8_250_000
    with pytest.raises(SystemExit, match="skew-col"):
        cli.main(
            ["--input", docs, "--output", out, "--skew-col", "nope"],
            spark=spark,
        )


def test_cli_quantiles_col_reports_per_group(spark, tmp_path, capsys):
    """--quantiles-col appends exact nearest-rank quantiles of the INPUT
    per --mix-by group."""
    docs = str(tmp_path / "docs_quant")
    rows = [
        (i, f"text body number {i} alpha bravo", "en", (i + 1) * 10)
        for i in range(10)
    ]
    spark.createDataFrame(
        rows, ["doc_id", "text", "lang", "n_chars"]
    ).write.mode("overwrite").parquet(docs)
    out = str(tmp_path / "curated_quant")
    cli.main(
        ["--input", docs, "--output", out, "--quantiles-col", "n_chars"],
        spark=spark,
    )
    report = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    q = report["quantiles"]
    assert len(q) == 1 and q[0]["lang"] == "en"
    # values 10..100: nearest-rank p25→30, p50→50, p75→80, p99→100
    assert (q[0]["n"], q[0]["p25"], q[0]["p50"], q[0]["p75"], q[0]["p99"]) \
        == (10, 30, 50, 80, 100)
    with pytest.raises(SystemExit, match="quantiles-col"):
        cli.main(
            ["--input", docs, "--output", out, "--quantiles-col", "nope"],
            spark=spark,
        )


def test_cli_governance_reports(spark, tmp_path, capsys):
    """--column-profile / --k-anon / --drift-against append governance
    sections to the JSON report."""
    rows = [
        (i, f"body text number {i} alpha bravo", "en" if i % 4 else "de",
         f"src{i % 3}")
        for i in range(24)
    ]
    cur = str(tmp_path / "docs_gov")
    spark.createDataFrame(
        rows, ["doc_id", "text", "lang", "source"]
    ).write.mode("overwrite").parquet(cur)
    prev = str(tmp_path / "docs_prev")
    spark.createDataFrame(
        [(100 + i, f"older body {i} alpha", "en", "src0") for i in range(24)],
        ["doc_id", "text", "lang", "source"],
    ).write.mode("overwrite").parquet(prev)
    out = str(tmp_path / "curated_gov")
    cli.main(
        [
            "--input", cur, "--output", out,
            "--column-profile",
            "--k-anon", "lang,source", "--k-anon-k", "4",
            "--drift-against", prev,
        ],
        spark=spark,
    )
    report = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    prof = {r["col_name"]: r for r in report["column_profile"]}
    assert prof["doc_id"]["completeness"] == 1.0
    assert prof["doc_id"]["n_distinct"] == 24
    ka = report["k_anonymity"]
    # lang=de only pairs with src0/src1/src2 twice each (6 de rows over
    # 3 sources) — groups of 2 < 4 are at risk
    assert ka["k"] == 4 and ka["n_rows"] == 24 and ka["at_risk_rows"] > 0
    # prev is all-en, input is 3/4 en — drift nonzero
    assert report["drift"]["psi"] > 0.0
    with pytest.raises(SystemExit, match="k-anon"):
        cli.main(
            ["--input", cur, "--output", out, "--k-anon", "nope"],
            spark=spark,
        )
    with pytest.raises(SystemExit, match="drift column"):
        cli.main(
            ["--input", cur, "--output", out, "--drift-against", prev,
             "--drift-col", "nope"],
            spark=spark,
        )


def test_cli_mix_alpha_auto_rates(spark, tmp_path, capsys):
    """--mix-alpha derives down-sample-only rates from the temperature
    rule: the most-boosted (rarest) group keeps 100%, the dominant
    group keeps boost_dom/boost_rare < 100%; rerun is byte-identical."""
    docs = str(tmp_path / "docs_alpha")
    rows = (
        [(i, f"text body number {i} alpha bravo", "big") for i in range(36)]
        + [(100 + i, f"text body number {i} charlie delta", "small")
           for i in range(4)]
    )
    spark.createDataFrame(rows, ["doc_id", "text", "lang"]).write.mode(
        "overwrite"
    ).parquet(docs)
    out = str(tmp_path / "curated_alpha")
    cli.main(
        ["--input", docs, "--output", out, "--mix-alpha", "0.5"],
        spark=spark,
    )
    json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    got = spark.read.parquet(out)
    by = {r["lang"]: r["n"] for r in
          got.groupBy("lang").agg(F.count("*").alias("n")).collect()}
    # rare group keeps everything (rate 1.0); dominant group's expected
    # rate is boost_big/boost_small = sqrt(4/36)/(4/36)·... = 1/3 — the
    # Bernoulli draw is deterministic, so just pin the invariant
    assert by["small"] == 4
    assert 0 < by["big"] < 36
    first = sorted(r["doc_id"] for r in got.collect())
    out2 = str(tmp_path / "curated_alpha2")
    cli.main(
        ["--input", docs, "--output", out2, "--mix-alpha", "0.5"],
        spark=spark,
    )
    capsys.readouterr()
    second = sorted(
        r["doc_id"] for r in spark.read.parquet(out2).collect()
    )
    assert first == second


def test_cli_mix_alpha_conflicts_with_mix(spark, tmp_path):
    docs = str(tmp_path / "docs_conflict")
    spark.createDataFrame(
        [(1, GOOD, "en")], ["doc_id", "text", "lang"]
    ).write.mode("overwrite").parquet(docs)
    with pytest.raises(SystemExit, match="mutually exclusive"):
        cli.main(
            ["--input", docs, "--output", str(tmp_path / "o"),
             "--mix", "en=1.0", "--mix-alpha", "0.5"],
            spark=spark,
        )


def test_cli_l_diversity_report(spark, tmp_path, capsys):
    docs = str(tmp_path / "docs_ldiv")
    rows = ([(i, GOOD + f" {i}", "zipA", "flu") for i in range(4)]
            + [(10, GOOD + " x", "zipB", "flu"),
               (11, GOOD + " y", "zipB", "cold")])
    spark.createDataFrame(
        rows, ["doc_id", "text", "zip", "diag"]
    ).write.mode("overwrite").parquet(docs)
    out = str(tmp_path / "curated_ldiv")
    cli.main(
        ["--input", docs, "--output", out,
         "--l-div", "zip:diag", "--min-quality", "0"],
        spark=spark,
    )
    report = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    ld = report["l_diversity"]
    # zipA: 4 rows, 1 distinct diag -> at risk; zipB diverse
    assert (ld["n_groups"], ld["at_risk_groups"], ld["at_risk_rows"]) == (2, 1, 4)
    with pytest.raises(SystemExit, match="QUASI"):
        cli.main(
            ["--input", docs, "--output", out, "--l-div", "zip"],
            spark=spark,
        )
