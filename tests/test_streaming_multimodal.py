"""Structured Streaming jobs + multimodal operators at the Spark level."""

import pandas as pd
import pytest

from open_parse_spark.data.synth import write_transcripts_parquet


@pytest.fixture(scope="module")
def stream_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("stream_in")
    write_transcripts_parquet(str(d / "part-0.parquet"), n_convs=10, avg_turns=4, seed=7)
    write_transcripts_parquet(str(d / "part-1.parquet"), n_convs=10, avg_turns=4, seed=8)
    # NOTE: both files share conv_id values (generator namespace), so tests
    # sort on text as a final tiebreak
    return str(d)


def test_streaming_parse_matches_batch(spark, stream_dir, tmp_path):
    from open_parse_spark.spark.pipeline import parse_transcripts
    from open_parse_spark.streaming.jobs import run_stream_to_memory, streaming_parse

    stream = streaming_parse(spark, stream_dir, max_files_per_trigger=1)
    q = run_stream_to_memory(stream, "nodes_stream")
    q.awaitTermination(120)

    got = (
        spark.table("nodes_stream")
        .select("conv_id", "turn_idx", "node_idx", "text")
        .orderBy("conv_id", "turn_idx", "node_idx", "text")
        .toPandas()
    )
    batch = (
        parse_transcripts(spark.read.parquet(stream_dir), repartition_for_skew=False)
        .select("conv_id", "turn_idx", "node_idx", "text")
        .orderBy("conv_id", "turn_idx", "node_idx", "text")
        .toPandas()
    )
    # streaming output == batch output on the same files (stateless map)
    pd.testing.assert_frame_equal(got, batch)
    assert len(got) > 0


def test_streaming_events_hourly(spark, tmp_path):
    from open_parse_spark.streaming.jobs import (
        run_stream_to_memory,
        streaming_events_hourly,
    )

    src = "/root/testdata/sf0.001"
    import shutil, os

    d = tmp_path / "events_in"
    d.mkdir()
    shutil.copy(os.path.join(src, "events.parquet"), d / "events.parquet")
    stream = streaming_events_hourly(spark, str(d))
    q = run_stream_to_memory(stream, "events_stream", mode="append")
    q.awaitTermination(120)
    got = spark.table("events_stream").toPandas()
    # append-mode watermarked agg only emits windows the watermark has passed;
    # with a single micro-batch the final windows stay open - assert the
    # plumbing ran and produced a well-formed frame
    assert set(got.columns) == {"hour", "event_type", "n", "min_value", "max_value"}


def test_streaming_dedup_exact_matches_batch(spark, stream_dir):
    """Streaming dedup emits exactly one row per distinct text hash, and the
    emitted hash set equals the batch distinct set on the same files."""
    from open_parse_spark.streaming.jobs import run_stream_to_memory, streaming_dedup_exact

    stream = streaming_dedup_exact(spark, stream_dir)
    q = run_stream_to_memory(stream, "dedup_stream")
    q.awaitTermination(120)
    got = spark.table("dedup_stream").toPandas()
    assert got["text_hash"].is_unique
    batch = (
        spark.read.parquet(stream_dir)
        .selectExpr("md5(text) AS text_hash")
        .distinct()
        .toPandas()
    )
    assert set(got["text_hash"]) == set(batch["text_hash"])


def test_multimodal_features_spark(spark):
    from open_parse_spark.operators.multimodal import (
        extract_media_features,
        sample_video_frames,
        synthesize_media_from_documents,
    )

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    media = synthesize_media_from_documents(docs)
    feats = extract_media_features(media).toPandas()
    assert len(feats) == docs.count()
    assert feats["decode_ok"].all()  # synthetic mimes are all decodable
    assert all(len(v) == 16 for v in feats["feature"])
    assert (feats["n_bytes"] > 0).all()

    frames = sample_video_frames(media).toPandas()
    assert (frames["frame_ts_ms"] % 1000 == 0).all()
    # every video contributes at least ceil(duration/1000)+1 frames
    assert len(frames) > 0


def test_decode_media_stub_raises_for_unknown():
    from open_parse_spark.operators.multimodal import decode_media

    with pytest.raises(NotImplementedError):
        decode_media(b"x", "application/octet-stream")
    assert decode_media(b"x", "image/png") == b"x"


def test_undecodable_media_kept_in_lineage(spark):
    """Undecodable rows are counted-and-carried (decode_ok=false, empty
    feature), never silently dropped — lineage accounts for every input."""
    from open_parse_spark.operators.multimodal import (
        MEDIA_SCHEMA,
        extract_media_features,
    )

    rows = [
        (1, "image", "image/png", b"ok-bytes", None, None, None),
        (2, "image", "image/tiff", b"no-codec", None, None, None),
    ]
    media = spark.createDataFrame(rows, schema=MEDIA_SCHEMA)
    feats = (
        extract_media_features(media).orderBy("media_id").toPandas()
    )
    assert len(feats) == 2
    assert list(feats["decode_ok"]) == [True, False]
    assert len(feats["feature"][0]) == 16
    assert len(feats["feature"][1]) == 0
    assert (feats["n_bytes"] > 0).all()  # raw bytes still measured


def test_streaming_sessionize_matches_batch(spark, tmp_path):
    """Custom stateful operator (applyInPandasWithState): sessions the
    stream CLOSES must match the batch sessionization exactly; sessions still
    open in state at stream end are the only permitted difference."""
    import os
    import shutil

    from open_parse_spark.plans.queries import q_events_sessionize
    from open_parse_spark.streaming.jobs import run_stream_to_memory, streaming_sessionize

    src = "/root/testdata/sf0.001"
    d = tmp_path / "sess_in"
    d.mkdir()
    shutil.copy(os.path.join(src, "events.parquet"), d / "events.parquet")

    stream = streaming_sessionize(spark, str(d))
    q = run_stream_to_memory(stream, "sessions_stream", mode="append")
    q.awaitTermination(180)
    got = spark.table("sessions_stream").toPandas()

    batch = q_events_sessionize(spark, src).toPandas()
    # sessions followed by a later session of the same user are gap-closed in
    # the stream too; each user's final session may legitimately still be open
    last_per_user = batch.groupby("user_id")["session_no"].transform("max")
    closed = batch[batch["session_no"] < last_per_user]

    cols = ["user_id", "session_no", "n_events", "session_start"]
    got_set = set(map(tuple, got[cols].itertuples(index=False)))
    closed_set = set(map(tuple, closed[cols].itertuples(index=False)))
    batch_set = set(map(tuple, batch[cols].itertuples(index=False)))
    assert closed_set <= got_set, "stream lost a gap-closed session"
    assert got_set <= batch_set, "stream emitted a session batch never saw"
    assert len(got) == len(got_set)  # exactly-once per closed session


def test_streaming_decontaminate_matches_batch(spark, stream_dir):
    """Stateless stream-side contamination == the batch operator on the same
    rows (turn-keyed; the batch op is run on a doc_id projection of them)."""
    from pyspark.sql import functions as F

    from open_parse_spark.operators.dedup import ngram_contamination
    from open_parse_spark.streaming.jobs import (
        run_stream_to_memory,
        streaming_decontaminate,
    )

    raw = spark.read.parquet(stream_dir)
    # benchmark: a deterministic slice of the same corpus -> guaranteed hits
    bench = raw.where(F.crc32("text") % 5 == 0).select("text")

    stream = streaming_decontaminate(spark, stream_dir, bench, n=4)
    q = run_stream_to_memory(stream, "decon_stream")
    q.awaitTermination(120)
    got = (
        spark.table("decon_stream")
        .orderBy("conv_id", "turn_idx", "shared_grams")
        .toPandas()
    )
    assert len(got) == raw.count()
    assert bool(got["contaminated"].any())  # the bench slice itself collides

    # batch twin on the identical rows, keyed the same way
    keyed = raw.select(
        F.concat_ws(
            "#", "conv_id", F.col("turn_idx").cast("string"), F.md5("text")
        ).alias("doc_id"),
        "text",
    ).distinct()
    batch = (
        ngram_contamination(keyed, bench.withColumnRenamed("text", "text"), n=4)
        .toPandas()
        .set_index("doc_id")
    )
    # per-(conv,turn) multiset of shared-gram counts must match exactly
    stream_counts = {}
    for _, r in got.iterrows():
        stream_counts.setdefault((r["conv_id"], r["turn_idx"]), []).append(
            int(r["shared_grams"])
        )
    batch_counts = {}
    texts = {}
    for _, r in raw.select("conv_id", "turn_idx", "text").toPandas().iterrows():
        texts.setdefault((r["conv_id"], r["turn_idx"]), []).append(r["text"])
    import hashlib
    for (conv, turn), txts in texts.items():
        vals = []
        for t in txts:
            key = f"{conv}#{turn}#{hashlib.md5(t.encode()).hexdigest()}"
            vals.append(int(batch.loc[key]["shared_grams"]))
        # distinct() collapsed identical texts; replicate per original row
        batch_counts[(conv, turn)] = vals
    for k, vals in stream_counts.items():
        assert sorted(vals) == sorted(batch_counts[k]), k


def test_streaming_parse_html_turns_matches_batch(spark, tmp_path):
    """HTML payloads through the streaming twin == batch parse (stateless
    map; pins that the DOM path needs no per-stream state)."""
    import datetime

    from open_parse_spark.spark.pipeline import parse_transcripts
    from open_parse_spark.streaming.jobs import run_stream_to_memory, streaming_parse

    d = tmp_path / "html_stream"
    d.mkdir()
    rows = []
    for i in range(6):
        html = (
            f"<html><body><nav><a href='/'>Home</a></nav><article>"
            f"<h1>Page {i}</h1><p>" + f"page {i} body words. " * 20
            + "</p></article><footer>foot</footer></body></html>"
        )
        rows.append(("hc%d" % (i % 2), i // 2, "user", html, "",
                     datetime.datetime(2026, 1, 1)))
    pdf = pd.DataFrame(
        rows, columns=["conv_id", "turn_idx", "role", "text", "tool", "ts"]
    ).astype({"turn_idx": "int32", "ts": "datetime64[us]"})
    pdf.to_parquet(str(d / "f0.parquet"), index=False)

    stream = streaming_parse(spark, str(d), max_files_per_trigger=1)
    q = run_stream_to_memory(stream, "nodes_html_stream")
    q.awaitTermination(120)
    got = (
        spark.table("nodes_html_stream")
        .select("conv_id", "turn_idx", "node_idx", "text")
        .orderBy("conv_id", "turn_idx", "node_idx", "text")
        .toPandas()
    )
    batch = (
        parse_transcripts(spark.read.parquet(str(d)), repartition_for_skew=False)
        .select("conv_id", "turn_idx", "node_idx", "text")
        .orderBy("conv_id", "turn_idx", "node_idx", "text")
        .toPandas()
    )
    pd.testing.assert_frame_equal(got, batch)
    assert len(got) == 6 and got["text"].str.startswith("**Page").all()


def test_streaming_sessionize_multichunk_key(spark, tmp_path):
    """A key whose micro-batch spans multiple Arrow chunks must still be
    processed in global (ts, event_id) order — per-chunk sorting computed
    gaps against the wrong predecessor (review finding)."""
    import datetime

    from open_parse_spark.streaming.jobs import (
        run_stream_to_memory,
        streaming_sessionize,
    )

    d = tmp_path / "events"
    d.mkdir()
    base = datetime.datetime(2026, 1, 1)
    # one user, 40 events in REVERSE time order within the file so chunk 2
    # holds earlier timestamps than chunk 1; all within one session except a
    # single > gap jump in the middle
    rows = []
    for i in reversed(range(40)):
        offs = i * 10 + (100000 if i >= 20 else 0)  # 100ks gap -> 2 sessions
        rows.append((1, i, base + datetime.timedelta(seconds=offs)))
    pdf = pd.DataFrame(rows, columns=["user_id", "event_id", "ts"]).astype(
        {"user_id": "int64", "event_id": "int64", "ts": "datetime64[us]"}
    )
    pdf.to_parquet(str(d / "f0.parquet"), index=False)

    prior = spark.conf.get("spark.sql.execution.arrow.maxRecordsPerBatch", None)
    spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", "7")
    try:
        stream = streaming_sessionize(
            spark, str(d), gap_seconds=3600, watermark="0 seconds"
        )
        q = run_stream_to_memory(stream, "sess_chunked", mode="append")
        q.awaitTermination(120)
        got = (
            spark.table("sess_chunked")
            .orderBy("session_no")
            .toPandas()
        )
    finally:
        if prior is None:
            spark.conf.unset("spark.sql.execution.arrow.maxRecordsPerBatch")
        else:
            spark.conf.set(
                "spark.sql.execution.arrow.maxRecordsPerBatch", prior
            )
    # the first (earlier) session closes via the gap; 20 events in order
    assert len(got) >= 1
    assert got.iloc[0]["n_events"] == 20, got


def test_bloom_positions_python_twin_matches_spark(spark):
    """The stream-side Python position arithmetic must equal the Spark
    expression bit-for-bit (same md5 prefix hash, mask/shift, odd stride) —
    the contract streaming_bloom_decontaminate rests on."""
    import random
    import string

    from open_parse_spark.operators.dedup import (
        bloom_positions,
        bloom_positions_py,
    )

    rng = random.Random(99)
    grams = [
        "".join(rng.choice(string.ascii_lowercase + " 0123456789") for _ in range(rng.randint(1, 30)))
        for _ in range(200)
    ] + ["", "a b c d", "üñïçödé gram"]
    df = spark.createDataFrame([(g,) for g in grams], "gram string")
    for m, k in ((1 << 15, 4), (64, 2)):
        got = {}
        for r in bloom_positions(df, m, k).collect():
            got.setdefault(r["gram"], []).append(r["pos"])
        for g in grams:
            assert sorted(got[g]) == sorted(bloom_positions_py(g, m, k)), (g, m, k)


def test_streaming_bloom_decontaminate_matches_batch(spark, stream_dir):
    """Stream-side bloom verdicts == the batch operator on the same rows,
    false positives included (tiny m so the FP channel is exercised)."""
    from pyspark.sql import functions as F

    from open_parse_spark.operators.dedup import bloom_decontaminate
    from open_parse_spark.streaming.jobs import (
        run_stream_to_memory,
        streaming_bloom_decontaminate,
    )

    raw = spark.read.parquet(stream_dir)
    bench = raw.where(F.crc32("text") % 5 == 0).select("text")
    m, k = 256, 3  # small filter -> false positives occur and must match

    stream = streaming_bloom_decontaminate(spark, stream_dir, bench, m=m, k=k, n=4)
    q = run_stream_to_memory(stream, "bloom_stream")
    q.awaitTermination(120)
    got = spark.table("bloom_stream").toPandas()
    assert len(got) == raw.count()
    assert bool(got["bloom_contaminated"].any())

    keyed = raw.select(
        F.concat_ws(
            "#", "conv_id", F.col("turn_idx").cast("string"), F.md5("text")
        ).alias("doc_id"),
        "text",
    ).distinct()
    batch = bloom_decontaminate(keyed, bench, m=m, k=k, n=4).toPandas()

    # per-(conv,turn) multiset of (n_grams, hits) must match the batch op's
    got_ms = sorted(map(tuple, got[["n_grams", "bloom_hits"]].itertuples(index=False)))
    # batch is keyed per distinct (conv,turn,text); re-expand to row multiset
    import pandas as pd

    raw_pdf = raw.select(
        F.concat_ws(
            "#", "conv_id", F.col("turn_idx").cast("string"), F.md5("text")
        ).alias("doc_id")
    ).toPandas()
    merged = raw_pdf.merge(batch, on="doc_id", how="left")
    want_ms = sorted(map(tuple, merged[["n_grams", "bloom_hits"]].itertuples(index=False)))
    assert got_ms == want_ms
