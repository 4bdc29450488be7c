"""Per-query iteration harness for optimization work (guide §1.4).

NOT the bench of record (`bench.py` is frozen for measurement): this tool
times individual registry queries with the same noop-sink methodology so a
change can be A/B'd in seconds instead of re-running the whole suite, and
dumps ``explain("formatted")`` plans for the plan-diff evidence in
``plans/r06/``.

Usage:
    python bench_extra.py time q1 q2 ...      # time the named queries
    python bench_extra.py time ALL            # time every headline query
    python bench_extra.py explain q1 ... DIR  # write <q>_<suffix>.txt plans
    python bench_extra.py reps N time q1 ...  # best-of-N (default 1)
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, REPO)

HEADLINE = [
    "parse_flagship", "dedup_exact", "dedup_fingerprint", "neardup_jaccard",
    "dedup_minhash", "dedup_simhash", "ann_cosine_topk", "ann_lsh", "ann_ivf",
    "neardup_cosine", "quality_gopher", "training_samples", "text_quality",
    "lang_id", "pii_scrub", "tfidf_top_terms", "op_spatial_anti_join",
    "op_remove_repeated", "events_hourly", "decontaminate", "pack_sequences",
    "sample_stratified", "mix_corpus", "mix_corpus_threshold",
    "quality_repetition", "training_pipeline_full", "html_extract",
    "quality_classifier", "doc_chunks", "url_domains", "dup_spans",
    "rag_index", "chunk_merge", "decontaminate_bloom", "domain_pagerank",
    "vocab_coverage", "ann_pq",
]


def _spark(cpus: int):
    from open_parse_spark.spark.session import get_spark

    return get_spark(
        app_name="bench-extra",
        master=f"local[{cpus}]",
        shuffle_partitions=2 * cpus,
    )


def _steal():
    with open("/proc/stat") as f:
        parts = [int(x) for x in f.readline().split()[1:9]]
    return (parts[7] if len(parts) > 7 else 0), sum(parts)


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    args = sys.argv[1:]
    reps = 1
    if args and args[0] == "reps":
        reps = int(args[1])
        args = args[2:]
    mode, args = args[0], args[1:]

    from open_parse_spark.plans.queries import REGISTRY

    spark = _spark(cpus)
    # ad-hoc conf A/Bs: BENCH_EXTRA_CONF="k=v;k=v" (runtime-settable confs)
    for kv in os.environ.get("BENCH_EXTRA_CONF", "").split(";"):
        if "=" in kv:
            k, v = kv.split("=", 1)
            spark.conf.set(k.strip(), v.strip())

    # match bench.py: python workers are warm before any query is timed
    import pandas as pd  # noqa: F401

    def _touch(batches):
        from open_parse_spark.core.parse import parse_turn_records  # noqa: F401

        for b in batches:
            yield __import__("pandas").DataFrame({"n": [len(b)]})

    cores = spark.sparkContext.defaultParallelism
    spark.range(cores * 4, numPartitions=cores * 4).mapInPandas(
        _touch, "n long"
    ).write.format("noop").mode("overwrite").save()

    if mode == "explain":
        *names, out_dir = args
        os.makedirs(out_dir, exist_ok=True)
        for name in names:
            fn, _ = REGISTRY[name]
            txt = fn(spark, sf_dir)._jdf.queryExecution().explainString(
                spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
                    "formatted"
                )
            )
            path = os.path.join(out_dir, f"{name}.txt")
            with open(path, "w") as fh:
                fh.write(txt)
            print(f"wrote {path} ({txt.count('Exchange')} Exchange refs)")
        return

    names = HEADLINE if args == ["ALL"] else args
    secs: dict[str, float] = {}
    for name in names:
        fn, _ = REGISTRY[name]
        spark.sparkContext.setJobDescription(f"bench_extra:{name}")
        best, best_steal = float("inf"), 0.0
        for _ in range(reps):
            s0, t0 = _steal()
            t = time.monotonic()
            fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
            sec = time.monotonic() - t
            s1, t1 = _steal()
            if sec < best:
                best = sec
                best_steal = 100.0 * (s1 - s0) / max(1, t1 - t0)
        secs[name] = round(best, 3)
        print(f"{name}: {best:.3f}s (steal {best_steal:.2f}%)", file=sys.stderr)
    print(json.dumps({"queries": secs, "total": round(sum(secs.values()), 3)}))


if __name__ == "__main__":
    main()
