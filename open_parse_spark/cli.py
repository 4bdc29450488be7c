"""spark-submit entry point.

Usage (cluster — spark-submit takes an application FILE, not a module):
    zip -r openparse_spark.zip open_parse_spark
    echo 'from open_parse_spark.cli import main; import sys; sys.exit(main())' > run_cli.py
    spark-submit --py-files openparse_spark.zip run_cli.py \\
        parse --input <transcripts_path_or_iceberg_table> --output <dir> \\
              --checkpoint <dir> [--n-buckets 256] [--buckets-per-wave 16]
    (exactly the launch shape tests/test_spark_submit.py pins end to end)

Local smoke:
    python -m open_parse_spark.cli parse --input /root/repo/BENCH/bench_transcripts \\
        --output /tmp/nodes --checkpoint /tmp/ckpt --n-buckets 8
"""

from __future__ import annotations

import argparse
import sys
import time


def main(argv=None) -> int:
    p = argparse.ArgumentParser(prog="open_parse_spark")
    sub = p.add_subparsers(dest="cmd", required=True)

    pp = sub.add_parser("parse", help="resumable transcript parse")
    pp.add_argument("--input", required=True)
    pp.add_argument("--output", required=True)
    pp.add_argument("--checkpoint", required=True)
    pp.add_argument("--n-buckets", type=int, default=64)
    pp.add_argument("--buckets-per-wave", type=int, default=8)
    pp.add_argument("--run-id", default=None)
    pp.add_argument("--master", default=None)

    sp = sub.add_parser("stream", help="structured-streaming parse")
    sp.add_argument("--input", required=True)
    sp.add_argument("--output", required=True)
    sp.add_argument("--checkpoint", required=True)
    sp.add_argument("--master", default=None)

    dp = sub.add_parser(
        "dedup", help="near-duplicate pairs + keep list over a documents table"
    )
    dp.add_argument("--input", required=True, help="parquet with (doc_id, text)")
    dp.add_argument("--output", required=True, help="output dir (pairs/, keep/)")
    dp.add_argument(
        "--method", choices=["minhash", "jaccard", "simhash", "exact"],
        default="minhash",
    )
    dp.add_argument("--master", default=None)

    qp = sub.add_parser(
        "quality", help="per-document quality/PII/lang-id columns"
    )
    qp.add_argument("--input", required=True, help="parquet with (doc_id, text)")
    qp.add_argument("--output", required=True)
    qp.add_argument("--scrub-pii", action="store_true")
    qp.add_argument("--master", default=None)

    kp = sub.add_parser(
        "pack", help="greedy sequence packing into fixed-size context bins"
    )
    kp.add_argument(
        "--input", required=True,
        help="parquet with (doc_id, text) plus the shard column",
    )
    kp.add_argument("--output", required=True)
    kp.add_argument("--capacity", type=int, default=512)
    kp.add_argument("--shard-col", default="source")
    kp.add_argument("--master", default=None)

    mp = sub.add_parser(
        "sample", help="deterministic stratified sample (exact per-stratum quota)"
    )
    mp.add_argument(
        "--input", required=True,
        help="parquet with (doc_id, text) plus the stratum column",
    )
    mp.add_argument("--output", required=True)
    mp.add_argument("--num", type=int, default=1, help="quota numerator")
    mp.add_argument("--den", type=int, default=5, help="quota denominator")
    mp.add_argument("--stratum-col", default="lang")
    mp.add_argument("--master", default=None)

    cp = sub.add_parser(
        "decontaminate", help="flag training docs sharing n-grams with a benchmark set"
    )
    cp.add_argument("--input", required=True, help="training parquet (doc_id, text)")
    cp.add_argument("--benchmark", required=True, help="benchmark parquet (doc_id, text)")
    cp.add_argument("--output", required=True)
    cp.add_argument("--ngram", type=int, default=13)
    cp.add_argument("--master", default=None)

    bp = sub.add_parser(
        "clean-lines",
        help="drop boilerplate lines repeated across >= min-df documents",
    )
    bp.add_argument("--input", required=True, help="parquet with (doc_id, text)")
    bp.add_argument("--output", required=True)
    bp.add_argument("--min-df", type=int, default=3)
    bp.add_argument("--min-chars", type=int, default=5)
    bp.add_argument("--master", default=None)

    hp = sub.add_parser(
        "html-extract",
        help="strip HTML boilerplate; emit (doc_id, heading, body_text, n_blocks)",
    )
    hp.add_argument("--input", required=True, help="parquet with (doc_id, html)")
    hp.add_argument("--output", required=True)
    hp.add_argument("--html-col", default="html")
    hp.add_argument("--master", default=None)

    chp = sub.add_parser(
        "chunk", help="token-window chunking with overlap (embedding fan-out)"
    )
    chp.add_argument("--input", required=True, help="parquet with (doc_id, text)")
    chp.add_argument("--output", required=True)
    chp.add_argument("--window", type=int, default=128)
    chp.add_argument("--overlap", type=int, default=32)
    chp.add_argument("--master", default=None)

    up = sub.add_parser(
        "url-stats", help="per-domain URL counts over a documents table"
    )
    up.add_argument("--input", required=True, help="parquet with (doc_id, text)")
    up.add_argument("--output", required=True)
    up.add_argument("--master", default=None)

    dsp = sub.add_parser(
        "dup-spans",
        help="exact-substring duplicate spans (word-gram suffix dedup)",
    )
    dsp.add_argument("--input", required=True, help="parquet with (doc_id, text)")
    dsp.add_argument("--output", required=True)
    dsp.add_argument("--ngram", type=int, default=6)
    dsp.add_argument("--min-df", type=int, default=2)
    dsp.add_argument("--master", default=None)

    args = p.parse_args(argv)

    from open_parse_spark.spark.session import get_spark

    spark = get_spark(app_name=f"open-parse-{args.cmd}", master=args.master)

    if args.cmd == "parse":
        from open_parse_spark.sources.transcripts import load_transcripts
        from open_parse_spark.spark.checkpoint import run_resumable

        # Iceberg-table-or-parquet-path resolution + column validation
        transcripts = load_transcripts(spark, args.input)
        res = run_resumable(
            spark,
            transcripts,
            out_path=args.output,
            checkpoint_path=args.checkpoint,
            n_buckets=args.n_buckets,
            buckets_per_wave=args.buckets_per_wave,
            run_id=args.run_id or f"run-{int(time.time())}",
        )
        print(
            f"processed buckets={res.processed_buckets} "
            f"skipped(resumed)={res.skipped_buckets}"
        )
        return 0

    if args.cmd == "stream":
        from open_parse_spark.streaming.jobs import streaming_parse

        nodes = streaming_parse(spark, args.input)
        q = (
            nodes.writeStream.format("parquet")
            .option("path", args.output)
            .option("checkpointLocation", args.checkpoint)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        return 0

    if args.cmd == "dedup":
        from open_parse_spark.operators import dedup as D

        docs = spark.read.parquet(args.input)
        if args.method == "exact":
            D.exact_duplicates(docs).write.mode("overwrite").parquet(
                f"{args.output}/groups"
            )
            return 0
        pairs = {
            "minhash": D.minhash_neardup_pairs,
            "jaccard": D.ngram_jaccard_pairs,
        }.get(args.method)
        if pairs is None:  # simhash: candidates only (no verification stage)
            D.simhash_candidates(docs).write.mode("overwrite").parquet(
                f"{args.output}/pairs"
            )
            return 0
        p = pairs(docs)
        p.write.mode("overwrite").parquet(f"{args.output}/pairs")
        D.dedup_keep_list(docs, spark.read.parquet(f"{args.output}/pairs")).write.mode(
            "overwrite"
        ).parquet(f"{args.output}/keep")
        return 0

    if args.cmd == "quality":
        from pyspark.sql import functions as F

        from open_parse_spark.functions import text as T

        docs = spark.read.parquet(args.input)
        t = F.col("text")
        cols = [
            "doc_id",
            T.word_count(t).alias("n_words"),
            T.token_count(t).alias("n_tokens"),
            T.punct_count(t).alias("n_punct"),
            T.predict_lang(t).alias("pred_lang"),
            T.fingerprint(t).alias("fp"),
        ]
        if args.scrub_pii:
            cols.append(T.scrub_pii(t).alias("clean_text"))
        docs.select(*cols).write.mode("overwrite").parquet(args.output)
        return 0

    if args.cmd == "pack":
        from open_parse_spark.operators.packing import pack_sequences

        docs = spark.read.parquet(args.input)
        pack_sequences(
            docs, capacity=args.capacity, shard_col=args.shard_col
        ).write.mode("overwrite").parquet(args.output)
        return 0

    if args.cmd == "sample":
        from open_parse_spark.operators.sampling import stratified_sample

        docs = spark.read.parquet(args.input)
        stratified_sample(
            docs, num=args.num, den=args.den, stratum_col=args.stratum_col
        ).write.mode("overwrite").parquet(args.output)
        return 0

    if args.cmd == "decontaminate":
        from open_parse_spark.operators.dedup import ngram_contamination

        train = spark.read.parquet(args.input)
        bench = spark.read.parquet(args.benchmark)
        ngram_contamination(train, bench, n=args.ngram).write.mode(
            "overwrite"
        ).parquet(args.output)
        return 0

    if args.cmd == "clean-lines":
        from open_parse_spark.operators.dedup import remove_boilerplate_lines

        docs = spark.read.parquet(args.input)
        remove_boilerplate_lines(
            docs, min_df=args.min_df, min_chars=args.min_chars
        ).write.mode("overwrite").parquet(args.output)
        return 0

    if args.cmd == "chunk":
        from open_parse_spark.operators.chunking import chunk_documents

        docs = spark.read.parquet(args.input)
        chunk_documents(
            docs, window=args.window, overlap=args.overlap
        ).write.mode("overwrite").parquet(args.output)
        return 0

    if args.cmd == "url-stats":
        from open_parse_spark.functions.text import url_domain_stats

        docs = spark.read.parquet(args.input)
        url_domain_stats(docs).write.mode("overwrite").parquet(args.output)
        return 0

    if args.cmd == "dup-spans":
        from open_parse_spark.operators.dedup import duplicate_spans

        docs = spark.read.parquet(args.input)
        duplicate_spans(docs, n=args.ngram, min_df=args.min_df).write.mode(
            "overwrite"
        ).parquet(args.output)
        return 0

    if args.cmd == "html-extract":
        from open_parse_spark.operators.html import extract_main_content

        pages = spark.read.parquet(args.input)
        extract_main_content(pages, html_col=args.html_col).write.mode(
            "overwrite"
        ).parquet(args.output)
        return 0

    return 1


if __name__ == "__main__":
    sys.exit(main())
