"""spark-submit entry point for training-data curation.

    spark-submit --py-files dist/kg.zip jobs/run_curate.py \
        --input /path/to/documents --output /path/to/curated \
        [--benchmark /path/to/eval_docs] [--min-quality 0.1] \
        [--dedup exact|paragraph] [--ngram 13] \
        [--split train=0.98,val=0.01,test=0.01] [--seed kg-split-v1] \
        [--mix en=1.0,de=0.5 --mix-by lang] [--profile] [--skew-col COL] [--pack 2048] \
        [--clean-lines] [--redact-pii] [--gopher] \
        [--dsir-target /path/to/target_docs --min-dsir 0.0]

Runs quality filter → corpus dedup → benchmark decontamination →
deterministic split over a documents table and writes the curated
corpus partitioned by ``split`` (so a trainer reads ``split=train``
with partition pruning, no filter scan).

Per-stage drop counts are a deployment-scale cost (each is a full
corpus pass), so they are opt-in via ``--stats``; the default reports
only rows in/out, which parquet answers from footers.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

# direct `python jobs/run_curate.py` puts jobs/ on sys.path, not the repo
# root; on a cluster the package ships via --py-files instead.
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _parse_weights(spec: str, flag: str = "--split") -> dict[str, float]:
    out: dict[str, float] = {}
    for part in spec.split(","):
        name, _, w = part.partition("=")
        if not _:
            raise SystemExit(f"bad {flag} component {part!r} (want name=weight)")
        out[name.strip()] = float(w)
    return out


def main(argv: list[str] | None = None, spark=None) -> None:
    """``spark=None`` builds and owns a session (spark-submit path);
    a caller-supplied session (tests) is reused and NOT stopped."""
    ap = argparse.ArgumentParser(description="kg corpus curation")
    ap.add_argument("--input", required=True, help="documents parquet dir")
    ap.add_argument("--input-format", choices=["parquet", "jsonl"],
                    default="parquet",
                    help="'jsonl' reads newline-delimited JSON (the "
                         "interchange format most raw web corpora ship "
                         "in); requires an id column and a text column "
                         "per line, exactly like the parquet contract")
    ap.add_argument("--output", required=True, help="curated output dir")
    ap.add_argument("--benchmark", default=None,
                    help="eval-set documents parquet; corpus docs sharing "
                         "any --ngram word n-gram with it are dropped")
    ap.add_argument("--max-contamination", type=float, default=None,
                    help="with --benchmark: drop docs whose contaminated "
                         "n-gram FRACTION exceeds this (default: any hit "
                         "drops the doc)")
    ap.add_argument("--min-quality", type=float, default=None,
                    help="drop docs with quality_score below this")
    ap.add_argument("--dedup", choices=["exact", "paragraph"], default=None,
                    help="'exact' keeps the lowest-id copy of each "
                         "normalized text; 'paragraph' removes later "
                         "occurrences of exact paragraphs corpus-wide")
    ap.add_argument("--clean-lines", action="store_true",
                    help="C4-style line filter BEFORE curation: keep "
                         "lines with >=3 words, terminal punctuation, "
                         "no javascript/cookie boilerplate, no braces; "
                         "docs losing every line are dropped")
    ap.add_argument("--redact-pii", action="store_true",
                    help="redact emails/IPv4s/long digit runs to typed "
                         "placeholders BEFORE curation")
    ap.add_argument("--gopher", action="store_true",
                    help="drop docs failing the Gopher A1.1 rule bundle "
                         "(word/length bounds, symbol ratio, bullet/"
                         "ellipsis lines, alpha fraction, stopwords) "
                         "BEFORE curation")
    ap.add_argument("--dsir-target", default=None, metavar="DIR",
                    help="target-domain documents parquet: keep docs "
                         "whose DSIR log-likelihood ratio vs this "
                         "target is >= --min-dsir")
    ap.add_argument("--min-dsir", type=float, default=0.0,
                    help="DSIR log-ratio keep threshold "
                         "(with --dsir-target; default 0.0 = "
                         "more-target-like-than-raw)")
    ap.add_argument("--ngram", type=int, default=13)
    ap.add_argument("--split", default="train=0.98,val=0.01,test=0.01")
    ap.add_argument("--seed", default="kg-split-v1")
    ap.add_argument("--id-col", default="doc_id")
    ap.add_argument("--text-col", default="text")
    ap.add_argument("--mix", default=None, metavar="GROUP=RATE,...",
                    help="per-group Bernoulli keep rates applied after "
                         "curation (domain up/down mixing, deterministic "
                         "md5 thresholds); groups not listed are DROPPED")
    ap.add_argument("--mix-alpha", type=float, default=None,
                    choices=(0.25, 0.5, 0.75, 1.0), metavar="ALPHA",
                    help="auto-derive --mix rates from temperature "
                         "sampling p ∝ n^ALPHA over --mix-by groups "
                         "(down-sample-only; mutually exclusive with "
                         "--mix)")
    ap.add_argument("--mix-by", default="lang",
                    help="group column for --mix and --profile")
    ap.add_argument("--column-profile", action="store_true",
                    help="report per-column completeness/distinctness "
                         "of the INPUT (Deequ-style table health)")
    ap.add_argument("--k-anon", default=None, metavar="COL,...",
                    help="report k-anonymity risk of this "
                         "quasi-identifier column combination of the "
                         "INPUT")
    ap.add_argument("--l-div", default=None, metavar="QUASI,...:SENSITIVE",
                    help="report distinct l-diversity risk: comma-"
                         "separated quasi columns, colon, the sensitive "
                         "column (l fixed by --l-div-l)")
    ap.add_argument("--l-div-l", type=int, default=2,
                    help="distinct-value threshold for --l-div "
                         "(default 2)")
    ap.add_argument("--k-anon-k", type=int, default=5,
                    help="group-size threshold for --k-anon "
                         "(default 5)")
    ap.add_argument("--drift-against", default=None, metavar="DIR",
                    help="previous-snapshot documents parquet: report "
                         "the PSI drift of --drift-col between it and "
                         "the INPUT")
    ap.add_argument("--drift-col", default=None,
                    help="column for --drift-against "
                         "(default: --mix-by)")
    ap.add_argument("--quantiles-col", default=None,
                    help="report exact nearest-rank quantiles "
                         "(p25/p50/p75/p90/p99) of this integer input "
                         "column per --mix-by group (histogram-CDF, "
                         "never a raw-row sort)")
    ap.add_argument("--skew-col", default=None,
                    help="report shuffle-key skew of this input column "
                         "(top keys + exact max/avg multiplier) in the "
                         "JSON report — run before keying a big join")
    ap.add_argument("--profile", action="store_true",
                    help="append a per-group corpus profile of the curated "
                         "output to the report (one aggregation pass)")
    ap.add_argument("--pack", type=int, default=None, metavar="MAX_TOKENS",
                    help="annotate each doc with its context-window span "
                         "(concatenation-model packing, PER SPLIT: a "
                         "trainer packs train/val/test independently)")
    ap.add_argument("--chunk", default=None, metavar="WINDOW[:STRIDE]",
                    help="also write <output>_chunks: overlapping "
                         "WINDOW-token chunks every STRIDE tokens "
                         "(default STRIDE=WINDOW, disjoint) carved from "
                         "the curated corpus — the pre-embedding / RAG "
                         "step; partitioned by split like the corpus")
    ap.add_argument("--stats", action="store_true",
                    help="count per-stage drops (extra corpus passes)")
    ap.add_argument("--shuffle-partitions", type=int, default=None)
    args = ap.parse_args(argv)

    from kg.ops.curate import curate_corpus
    from kg.session import get_spark

    owns_session = spark is None
    if owns_session:
        spark = get_spark(
            "kg-curate", shuffle_partitions=args.shuffle_partitions or 32
        )

    if args.input_format == "jsonl":
        # schema is INFERRED from the lines (one extra scan — the price
        # of the interchange format); validate the contract columns so
        # a malformed corpus fails here, not deep inside a stage
        docs = spark.read.json(args.input)
        missing = {args.id_col, args.text_col} - set(docs.columns)
        if missing:
            raise SystemExit(
                f"--input-format jsonl: input lacks column(s) "
                f"{sorted(missing)} (have {sorted(docs.columns)})"
            )
    else:
        docs = spark.read.parquet(args.input)
    bench = spark.read.parquet(args.benchmark) if args.benchmark else None
    weights = _parse_weights(args.split)

    t0 = time.monotonic()
    # pre-curation text rewrites: line cleaning first (drop boilerplate
    # lines, and docs that lose every line), then PII redaction on the
    # surviving text — both pure map-side column passes
    if args.clean_lines:
        from pyspark.sql import functions as F

        from kg.ops.curate import clean_lines

        cleaned = clean_lines(docs, id_col=args.id_col, text_col=args.text_col)
        kept = cleaned.where(F.col("n_kept") > 0).select(
            args.id_col, F.col("text_clean").alias(args.text_col)
        )
        docs = docs.drop(args.text_col).join(kept, args.id_col)
    if args.redact_pii:
        from kg.ops.text import redact_pii

        red = redact_pii(docs, id_col=args.id_col, text_col=args.text_col)
        docs = docs.drop(args.text_col).join(
            red.selectExpr(args.id_col, f"text_redacted AS {args.text_col}"),
            args.id_col,
        )
    if args.min_dsir != 0.0 and not args.dsir_target:
        raise SystemExit("--min-dsir requires --dsir-target")
    # selection filters on the (possibly rewritten) text: Gopher rule
    # verdict, then DSIR target-domain threshold — each a semi-join on
    # the op's keep set, so no op output column leaks into the corpus.
    # Checkpoint the rewrite chain first: each selection op traverses
    # `docs` 2-4x, and without this every traversal re-runs the
    # clean_lines/redact_pii joins from the scan (the --pack branch
    # below guards the same re-execution class, ADVICE r4).
    if (args.gopher or args.dsir_target) and (
        args.clean_lines or args.redact_pii
    ):
        docs = docs.localCheckpoint()
    if args.gopher:
        from pyspark.sql import functions as F

        from kg.ops.text import gopher_quality

        g = gopher_quality(docs, id_col=args.id_col, text_col=args.text_col)
        docs = docs.join(
            g.where(F.col("keep")).select(args.id_col), args.id_col, "left_semi"
        )
    if args.dsir_target:
        from pyspark.sql import functions as F

        from kg.ops.curate import dsir_weights

        target = spark.read.parquet(args.dsir_target)
        w = dsir_weights(
            docs, target, id_col=args.id_col, text_col=args.text_col
        )
        # n_tokens > 0: zero-token docs carry the 0.0 SENTINEL ratio,
        # which any min-dsir <= 0 would otherwise admit — an empty doc
        # is never "target-like"
        docs = docs.join(
            w.where(
                (F.col("n_tokens") > 0)
                & (F.col("log_ratio") >= args.min_dsir)
            ).select(args.id_col),
            args.id_col,
            "left_semi",
        )
    curated = curate_corpus(
        docs,
        benchmark=bench,
        min_quality=args.min_quality,
        dedup=args.dedup,
        ngram=args.ngram,
        weights=weights,
        seed=args.seed,
        id_col=args.id_col,
        text_col=args.text_col,
        max_contamination=args.max_contamination,
    )
    if (
        args.mix or args.mix_alpha is not None or args.profile
    ) and args.mix_by not in docs.columns:
        raise SystemExit(
            f"--mix/--profile group column {args.mix_by!r} not in input "
            f"columns {docs.columns}"
        )
    if args.mix and args.mix_alpha is not None:
        raise SystemExit("--mix and --mix-alpha are mutually exclusive")
    if args.mix_alpha is not None:
        # auto-derive --mix rates from the temperature rule: keep rate
        # r_g = boost_g / max(boost) reaches the p ∝ n^α target mix by
        # down-sampling alone (the most-boosted group keeps 100%).
        # Rates come from the POST-curation distribution (the corpus
        # the sampler actually draws from).  One vocabulary-sized
        # collect — O(groups), same class as the bucket collects.
        from kg.ops.curate import temperature_mix_weights, weighted_sample

        wrows = temperature_mix_weights(
            curated, args.mix_by, alpha=args.mix_alpha
        ).collect()
        mx = max(r["boost"] for r in wrows)
        rates = {r[args.mix_by]: round(r["boost"] / mx, 6) for r in wrows}
        print(f"run_curate: --mix-alpha rates {rates}", file=sys.stderr)
        curated = weighted_sample(
            curated, rates, by=args.mix_by, id_col=args.id_col
        )
    if args.mix:
        from kg.ops.curate import weighted_sample

        curated = weighted_sample(
            curated,
            _parse_weights(args.mix, "--mix"),
            by=args.mix_by,
            id_col=args.id_col,
        )
    if args.pack is not None:
        from pyspark.sql import functions as F

        from kg.ops.curate import pack_sequences

        # pack PER SPLIT: each split is its own token stream (a trainer
        # never mixes train rows into a val context window).  Split
        # count is bounded by the --split spec, so this is a handful of
        # distributed scans, not a per-row loop.
        #
        # checkpoint the curated chain ONCE first: pack_sequences
        # localCheckpoints its input and the write-side join probes it
        # again, so without this the full quality/dedup/decontaminate
        # chain re-executes ~2x per split (~6x corpus passes at the
        # default 3 splits — ADVICE r4; results identical, cost not).
        curated = curated.localCheckpoint()
        # pack_sequences' output columns would collide with same-named
        # input columns at the join below (ambiguous-column write error)
        pack_cols = ("n_tokens", "start_offset", "first_pack", "last_pack")
        clash = [c for c in pack_cols if c in curated.columns]
        if clash:
            # replaced, not merged: say so (split_assign RAISES on the
            # same class because its collision corrupts a foreign
            # column; here the pack outputs own these names by contract)
            print(
                f"run_curate: --pack replaces input column(s) {clash} "
                "with pack_sequences outputs",
                file=sys.stderr,
            )
        parts = []
        for name in weights:
            sub = curated.where(F.col("split") == name)
            offs = pack_sequences(
                sub, max_tokens=args.pack,
                id_col=args.id_col, text_col=args.text_col,
            )
            parts.append(sub.drop(*clash).join(offs, args.id_col))
        out = parts[0]
        for p in parts[1:]:
            out = out.unionByName(p)
        curated = out
    curated.write.mode("overwrite").partitionBy("split").parquet(args.output)
    sec = time.monotonic() - t0

    report: dict[str, object] = {
        "rows_in": docs.count(),
        "rows_out": spark.read.parquet(args.output).count(),
        "sec": round(sec, 3),
    }
    if args.chunk is not None:
        from kg.ops.curate import chunk_documents

        w_spec, _, s_spec = args.chunk.partition(":")
        try:
            window = int(w_spec)
            stride = int(s_spec) if s_spec else window
        except ValueError:
            raise SystemExit(
                f"bad --chunk spec {args.chunk!r} (want WINDOW[:STRIDE])"
            )
        # chunk the DURABLE output, not the lazy curated chain: reading
        # the just-written parquet back costs one scan and re-executes
        # nothing (the --pack re-execution class, ADVICE r4)
        written = spark.read.parquet(args.output)
        chunks = chunk_documents(
            written, args.id_col, args.text_col,
            window=window, stride=stride,
        ).join(written.select(args.id_col, "split"), args.id_col)
        chunks.write.mode("overwrite").partitionBy("split").parquet(
            args.output + "_chunks"
        )
        report["chunk_rows"] = spark.read.parquet(
            args.output + "_chunks"
        ).count()
    if args.stats:
        stages: dict[str, int] = {}
        cur = docs
        if args.min_quality is not None:
            nxt = curate_corpus(
                cur, min_quality=args.min_quality,
                id_col=args.id_col, text_col=args.text_col,
            ).drop("bucket", "split")
            stages["quality_dropped"] = cur.count() - nxt.count()
            cur = nxt
        if args.dedup:
            nxt = curate_corpus(
                cur, dedup=args.dedup,
                id_col=args.id_col, text_col=args.text_col,
            ).drop("bucket", "split")
            stages["dedup_dropped"] = cur.count() - nxt.count()
            cur = nxt
        if bench is not None:
            nxt = curate_corpus(
                cur, benchmark=bench, ngram=args.ngram,
                id_col=args.id_col, text_col=args.text_col,
                max_contamination=args.max_contamination,
            ).drop("bucket", "split")
            stages["decontaminate_dropped"] = cur.count() - nxt.count()
        report["stages"] = stages
    if args.skew_col:
        if args.skew_col not in docs.columns:
            raise SystemExit(
                f"--skew-col {args.skew_col!r} not in input columns "
                f"{docs.columns}"
            )
        from kg.ops import skew_profile

        # top-5 rows only; the diagnostic is O(keys) distributed work
        # and an O(top) collect
        report["skew"] = [
            r.asDict()
            for r in skew_profile(docs, args.skew_col, top=5)
            .orderBy("rank")
            .collect()
        ]
    if args.column_profile:
        from kg.ops import column_profile

        # one row per input column; collect is O(columns)
        report["column_profile"] = [
            r.asDict()
            for r in column_profile(docs).orderBy("col_name").collect()
        ]
    if args.k_anon:
        quasi = [c.strip() for c in args.k_anon.split(",") if c.strip()]
        missing = set(quasi) - set(docs.columns)
        if missing:
            raise SystemExit(
                f"--k-anon columns {sorted(missing)} not in input "
                f"columns {docs.columns}"
            )
        from kg.ops import k_anonymity

        report["k_anonymity"] = k_anonymity(
            docs, quasi, k=args.k_anon_k
        ).collect()[0].asDict()
    if args.l_div:
        if ":" not in args.l_div:
            raise SystemExit("--l-div needs QUASI,...:SENSITIVE")
        quasi_part, _, sens = args.l_div.rpartition(":")
        quasi = [c.strip() for c in quasi_part.split(",") if c.strip()]
        sens = sens.strip()
        missing = (set(quasi) | {sens}) - set(docs.columns)
        if missing:
            raise SystemExit(
                f"--l-div columns {sorted(missing)} not in input "
                f"columns {docs.columns}"
            )
        from kg.ops import l_diversity

        report["l_diversity"] = l_diversity(
            docs, quasi, sens, l=args.l_div_l
        ).collect()[0].asDict()
    if args.drift_against:
        from kg.ops import distribution_drift

        drift_col = args.drift_col or args.mix_by
        prev = spark.read.parquet(args.drift_against)
        for side, frame in (("input", docs), ("--drift-against", prev)):
            if drift_col not in frame.columns:
                raise SystemExit(
                    f"drift column {drift_col!r} not in {side} columns"
                )
        report["drift"] = distribution_drift(
            prev, docs, drift_col
        ).collect()[0].asDict()
    if args.quantiles_col:
        if args.quantiles_col not in docs.columns:
            raise SystemExit(
                f"--quantiles-col {args.quantiles_col!r} not in input "
                f"columns {docs.columns}"
            )
        from kg.ops import group_quantiles

        # one row per group (groups bounded by nature); collect is
        # O(groups)
        report["quantiles"] = [
            r.asDict()
            for r in group_quantiles(
                docs, args.mix_by, args.quantiles_col
            )
            .orderBy(args.mix_by)
            .collect()
        ]
    if args.profile:
        from kg.ops.curate import corpus_profile

        prof = corpus_profile(
            spark.read.parquet(args.output),
            by=args.mix_by,
            text_col=args.text_col,
        )
        # one row per group (groups are bounded by nature — langs,
        # sources); collect is O(groups)
        report["profile"] = [r.asDict() for r in prof.collect()]
    splits = {
        r["split"]: r["n"]
        for r in spark.read.parquet(args.output)
        .groupBy("split")
        .count()
        .withColumnRenamed("count", "n")
        .collect()
    }
    report["splits"] = splits
    print(json.dumps(report))
    if owns_session:
        spark.stop()


if __name__ == "__main__":
    sys.exit(main())
