"""Out-of-order / late-data hardening for the stateful streaming operators
(VERDICT r2 item 6): random event-time jitter within micro-batches, file-
ordered arrival across micro-batches, and beyond-watermark stragglers.

Semantics pinned here:
- ``streaming_sessionize``: closed sessions are exactly-once and a subset of
  the batch sessionization over the rows the stream actually accepted;
  every batch session that a later same-user session gap-closes is emitted;
  beyond-watermark stragglers are DROPPED by the engine before the state
  function (they must not corrupt open-session state).
- ``streaming_dedup_exact``: within-watermark duplicates collapse to one
  row; a duplicate arriving beyond the watermark of its first copy may
  legitimately re-emit (the documented lambda split) but distinct texts are
  never lost.
"""

import datetime
import random

import pandas as pd
import pytest


def _write_events(path, rows):
    pdf = pd.DataFrame(
        rows, columns=["event_id", "ts", "user_id", "event_type", "value", "props"]
    ).astype(
        {
            "event_id": "int64",
            "ts": "datetime64[us]",
            "user_id": "int64",
            "event_type": "object",
            "value": "float64",
            "props": "object",
        }
    )
    pdf.to_parquet(path, index=False)
    return pdf


def _batch_sessions(events, gap_seconds):
    """Driver-side total-order sessionization (the batch-twin semantics)."""
    out = []
    for uid, grp in events.groupby("user_id"):
        grp = grp.sort_values(["ts", "event_id"])
        session_no, n, start, last = 0, 0, None, None
        for ts in grp["ts"]:
            if last is None or (ts - last).total_seconds() > gap_seconds:
                if n:
                    out.append((uid, session_no, n, start))
                session_no += 1
                n = 0
                start = ts.strftime("%Y-%m-%d %H:%M:%S")
            n += 1
            last = ts
        if n:
            out.append((uid, session_no, n, start))
    return out


@pytest.mark.slow
def test_sessionize_fuzz_jitter_across_microbatches(spark, tmp_path):
    """3 per-file micro-batches; rows shuffled within each file; per-user
    time ranges advance with the files (in-order across batches, arbitrary
    within).  Closed sessions must be exactly-once and match the driver
    replay's non-final sessions."""
    rng = random.Random(1234)
    base = datetime.datetime(2026, 1, 1)
    gap = 600
    d = tmp_path / "ev"
    d.mkdir()
    rows_all, eid = [], 0
    for f in range(3):
        rows = []
        for uid in range(1, 7):
            if rng.random() < 0.2:  # user skips this file -> big gap
                continue
            # each file covers a disjoint 1h range; events jitter inside
            t0 = base + datetime.timedelta(hours=3 * f)
            n = rng.randint(3, 12)
            offs = sorted(rng.randint(0, 900) for _ in range(n))
            for o in offs:
                rows.append(
                    (eid, t0 + datetime.timedelta(seconds=o), uid, "e", 0.0, "")
                )
                eid += 1
        rng.shuffle(rows)  # out-of-order WITHIN the micro-batch
        _write_events(str(d / f"f{f}.parquet"), rows)
        rows_all.extend(rows)

    from open_parse_spark.streaming.jobs import (
        run_stream_to_memory,
        streaming_sessionize,
    )

    stream = streaming_sessionize(
        spark, str(d), gap_seconds=gap, watermark="0 seconds",
        max_files_per_trigger=1,
    )
    q = run_stream_to_memory(stream, "sess_fuzz", mode="append")
    q.awaitTermination(180)
    got = spark.table("sess_fuzz").toPandas()
    got_set = set(
        map(tuple, got[["user_id", "session_no", "n_events", "session_start"]]
            .itertuples(index=False))
    )
    assert len(got) == len(got_set), "duplicate closed session emitted"

    events = pd.DataFrame(
        rows_all, columns=["event_id", "ts", "user_id", "event_type", "value", "props"]
    )
    batch = _batch_sessions(events, gap)
    batch_set = set(batch)
    last_per_user = {}
    for uid, sno, *_ in batch:
        last_per_user[uid] = max(last_per_user.get(uid, 0), sno)
    closed_set = {s for s in batch if s[1] < last_per_user[s[0]]}
    assert closed_set <= got_set, f"lost gap-closed sessions: {closed_set - got_set}"
    assert got_set <= batch_set, f"phantom sessions: {got_set - batch_set}"


@pytest.mark.slow
def test_sessionize_within_watermark_disorder_no_rewind(spark, tmp_path):
    """Cross-batch disorder WITHIN the watermark: a later micro-batch carries
    rows older than the open session's max timestamp.  Absorbing them must
    not rewind ``last_ts_us`` (a rewind inflates the next on-time row's gap
    and opens a phantom session) and must pull the session start back when a
    row predates it (batch order would have started the session there).

    user 1 catches the rewind: batch 1 is entirely older than batch 0's max
    (900s), so a rewind to 750s would make batch 2's 1400s row look 650s
    away (> gap 600) and split what batch sessionization keeps whole.
    user 3 catches the start pull-back: its session is later gap-closed, and
    the emitted session_start must be the earliest row's (50s), which only
    arrived in batch 1."""
    base = datetime.datetime(2026, 1, 1, 12)
    d = tmp_path / "ev"
    d.mkdir()

    def ev(eid, sec, uid):
        return (eid, base + datetime.timedelta(seconds=sec), uid, "e", 0.0, "")

    # user 2 is an on-time clock advancing the watermark steadily
    files = [
        [ev(0, 0, 1), ev(1, 300, 1), ev(2, 600, 1), ev(3, 900, 1),
         ev(4, 0, 2), ev(5, 300, 2), ev(6, 600, 2), ev(7, 900, 2),
         ev(8, 100, 3)],
        [ev(9, 700, 1), ev(10, 750, 1),
         ev(11, 1200, 2), ev(12, 1500, 2),
         ev(13, 50, 3)],
        [ev(14, 1400, 1),
         ev(15, 1800, 2), ev(16, 2100, 2)],
        [ev(17, 2400, 2), ev(18, 2700, 2),
         ev(19, 2700, 3)],
    ]
    rows_all = []
    for f, rows in enumerate(files):
        _write_events(str(d / f"f{f}.parquet"), rows)
        rows_all.extend(rows)

    from open_parse_spark.streaming.jobs import (
        run_stream_to_memory,
        streaming_sessionize,
    )

    stream = streaming_sessionize(
        spark, str(d), gap_seconds=600, watermark="15 minutes",
        max_files_per_trigger=1,
    )
    q = run_stream_to_memory(stream, "sess_disorder", mode="append")
    q.awaitTermination(180)
    got = spark.table("sess_disorder").toPandas()
    got_set = set(
        map(tuple, got[["user_id", "session_no", "n_events", "session_start"]]
            .itertuples(index=False))
    )
    assert len(got) == len(got_set), "duplicate closed session emitted"

    events = pd.DataFrame(
        rows_all, columns=["event_id", "ts", "user_id", "event_type", "value", "props"]
    )
    batch = _batch_sessions(events, 600)
    batch_set = set(batch)
    # no phantoms: in particular user 1 must NOT have a gap-closed session
    # (its 7 rows are one contiguous batch session)
    assert got_set <= batch_set, f"phantom sessions: {got_set - batch_set}"
    # user 3's gap-closed session carries the pulled-back start (50s row
    # that arrived one batch late)
    start_50 = (base + datetime.timedelta(seconds=50)).strftime("%Y-%m-%d %H:%M:%S")
    assert (3, 1, 2, start_50) in got_set, got_set


@pytest.mark.slow
def test_sessionize_beyond_watermark_straggler_dropped(spark, tmp_path):
    """A straggler older than the watermark must be dropped by the engine,
    not merged into (or corrupting) the user's open-session state."""
    base = datetime.datetime(2026, 1, 1, 12)
    d = tmp_path / "ev"
    d.mkdir()
    # file 0: user 1, two sessions (gap 7200 > 600) -> first closes via gap
    rows0 = [
        (0, base, 1, "e", 0.0, ""),
        (1, base + datetime.timedelta(seconds=60), 1, "e", 0.0, ""),
        (2, base + datetime.timedelta(seconds=7200), 1, "e", 0.0, ""),
    ]
    _write_events(str(d / "f0.parquet"), rows0)
    # file 1: straggler a full day BEFORE file 0 — far beyond the 10-minute
    # watermark once batch 0 advanced it
    rows1 = [(3, base - datetime.timedelta(days=1), 1, "e", 0.0, "")]
    _write_events(str(d / "f1.parquet"), rows1)

    from open_parse_spark.streaming.jobs import (
        run_stream_to_memory,
        streaming_sessionize,
    )

    stream = streaming_sessionize(
        spark, str(d), gap_seconds=600, watermark="10 minutes",
        max_files_per_trigger=1,
    )
    q = run_stream_to_memory(stream, "sess_late", mode="append")
    q.awaitTermination(120)
    got = spark.table("sess_late").toPandas()
    # exactly the one gap-closed session (2 events at base); the straggler
    # neither created a phantom session nor re-opened/corrupted state
    closed = set(
        map(tuple, got[["user_id", "session_no", "n_events", "session_start"]]
            .itertuples(index=False))
    )
    assert (1, 1, 2, base.strftime("%Y-%m-%d %H:%M:%S")) in closed
    assert all(n == 2 for (_, _, n, _) in closed), got


@pytest.mark.slow
def test_dedup_within_watermark_dupes_collapse(spark, tmp_path):
    """Duplicates spread across micro-batches but within the watermark must
    collapse to one row; distinct texts always survive."""
    rng = random.Random(99)
    base = datetime.datetime(2026, 1, 1)
    d = tmp_path / "turns"
    d.mkdir()
    texts = [f"document body {i}" for i in range(10)]
    seen_rows = []
    for f in range(3):
        rows = []
        for i, t in enumerate(texts):
            # each text appears in 1-3 files; ts jitters within 10 min
            if f == 0 or rng.random() < 0.5:
                ts = base + datetime.timedelta(
                    seconds=f * 60 + rng.randint(0, 600)
                )
                rows.append((f"c{f}", i, "user", t, "", ts))
        rng.shuffle(rows)
        pdf = pd.DataFrame(
            rows, columns=["conv_id", "turn_idx", "role", "text", "tool", "ts"]
        ).astype({"turn_idx": "int32", "ts": "datetime64[us]"})
        pdf.to_parquet(str(d / f"f{f}.parquet"), index=False)
        seen_rows.extend(rows)

    from open_parse_spark.streaming.jobs import (
        run_stream_to_memory,
        streaming_dedup_exact,
    )

    stream = streaming_dedup_exact(
        spark, str(d), watermark="1 hour", max_files_per_trigger=1
    )
    q = run_stream_to_memory(stream, "dedup_fuzz", mode="append")
    q.awaitTermination(120)
    got = spark.table("dedup_fuzz").toPandas()
    # all duplicates are within the 1h watermark -> exactly one row per text
    assert len(got) == len(texts), got.sort_values("text_hash")
    assert got["text_hash"].nunique() == len(texts)


def test_streaming_chunk_and_urls_match_batch(spark, tmp_path):
    """Stateless round-3 twins: streaming output == batch operator output on
    the same rows (one shared code path; this pins the stream legality)."""
    import duckdb

    from open_parse_spark.functions.text import url_domain_stats
    from open_parse_spark.operators.chunking import chunk_documents
    from open_parse_spark.streaming.jobs import (
        run_stream_to_memory,
        streaming_chunk,
        streaming_extract_urls,
    )

    d = tmp_path / "docs"
    d.mkdir()
    con = duckdb.connect()
    for f in range(2):
        con.execute(
            f"""COPY (SELECT i AS doc_id,
                 'doc ' || i::VARCHAR || ' see https://s' || (i % 3)::VARCHAR ||
                 '.com/p' || i::VARCHAR || ' ' || repeat('tok ', i % 25) AS text,
                 'en' AS lang, 'src' AS source, 1::BIGINT AS n_chars
               FROM generate_series({f * 20}, {f * 20 + 19}) t(i))
               TO '{d / f"f{f}.parquet"}' (FORMAT PARQUET)"""
        )

    q = run_stream_to_memory(
        streaming_chunk(spark, str(d), window=8, overlap=2, max_files_per_trigger=1),
        "chunk_stream",
    )
    q.awaitTermination(120)
    got = {
        (r["doc_id"], r["chunk_idx"]): r["chunk_text"]
        for r in spark.table("chunk_stream").collect()
    }
    batch_df = spark.read.parquet(str(d))
    want = {
        (r["doc_id"], r["chunk_idx"]): r["chunk_text"]
        for r in chunk_documents(batch_df, window=8, overlap=2).collect()
    }
    assert got == want and len(got) > 40

    q2 = run_stream_to_memory(
        streaming_extract_urls(spark, str(d), max_files_per_trigger=1), "url_stream"
    )
    q2.awaitTermination(120)
    rows = spark.table("url_stream").collect()
    assert len(rows) == 40 and all(r["domain"].startswith("s") for r in rows)
    # stream rows aggregate to exactly the batch domain stats
    import collections

    agg = collections.Counter(r["domain"] for r in rows)
    batch_stats = {
        r["domain"]: r["n_urls"] for r in url_domain_stats(batch_df).collect()
    }
    assert dict(agg) == batch_stats


def test_streaming_url_domains_hourly_matches_batch(spark, tmp_path):
    """Watermarked windowed domain counts == a batch groupBy over the same
    rows, for every window the watermark closed."""
    import datetime

    from pyspark.sql import functions as F

    from open_parse_spark.functions.text import extract_urls, url_domain
    from open_parse_spark.streaming.jobs import (
        run_stream_to_memory,
        streaming_url_domains_hourly,
    )

    base = datetime.datetime(2026, 3, 1)
    d = tmp_path / "turns"
    d.mkdir()
    rows = []
    for i in range(60):
        ts = base + datetime.timedelta(minutes=7 * i)  # spans ~7 hours
        rows.append(
            (f"c{i}", 0, "user",
             f"turn {i} links https://d{i % 3}.example/p{i} end", "", ts)
        )
    pdf = pd.DataFrame(
        rows, columns=["conv_id", "turn_idx", "role", "text", "tool", "ts"]
    ).astype({"turn_idx": "int32", "ts": "datetime64[us]"})
    # two files -> two micro-batches
    pdf.iloc[:30].to_parquet(str(d / "f0.parquet"), index=False)
    pdf.iloc[30:].to_parquet(str(d / "f1.parquet"), index=False)

    q = run_stream_to_memory(
        streaming_url_domains_hourly(
            spark, str(d), watermark="0 seconds", max_files_per_trigger=1
        ),
        "url_hourly",
    )
    q.awaitTermination(120)
    got = {
        (r["hour"], r["domain"]): r["n_urls"]
        for r in spark.table("url_hourly").collect()
    }
    assert got, "no closed windows emitted"

    batch_df = spark.read.parquet(str(d))
    batch = {
        (r["hour"], r["domain"]): r["n_urls"]
        for r in batch_df.select(
            "ts", F.explode(extract_urls(F.col("text"))).alias("url")
        )
        .select("ts", url_domain(F.col("url")).alias("domain"))
        .groupBy(
            F.date_format(
                F.window("ts", "1 hour").start, "yyyy-MM-dd HH:mm:ss"
            ).alias("hour"),
            "domain",
        )
        .agg(F.count(F.lit(1)).alias("n_urls"))
        .collect()
    }
    # append mode: every emitted window must match batch exactly; the final
    # (never-closed) window is the only permitted omission
    for k, v in got.items():
        assert batch[k] == v, (k, v, batch.get(k))
    missing = set(batch) - set(got)
    assert len({h for h, _ in missing}) <= 1, f"too many unclosed windows: {missing}"


def test_streaming_rag_index_matches_batch(spark, tmp_path):
    """foreachBatch incremental index == the batch rag_index_table over all
    rows, written bucket-partitioned."""
    import duckdb

    from open_parse_spark.operators.chunking import rag_index_table
    from open_parse_spark.streaming.jobs import streaming_rag_index

    d = tmp_path / "docs"
    d.mkdir()
    con = duckdb.connect()
    for f in range(2):
        con.execute(
            f"""COPY (SELECT i AS doc_id,
                 'doc ' || i::VARCHAR || ' ' || repeat('tok' || (i % 5)::VARCHAR || ' ', 20) AS text,
                 'en' AS lang, 's' AS source, 1::BIGINT AS n_chars
               FROM generate_series({f * 15}, {f * 15 + 14}) t(i))
               TO '{d / f"f{f}.parquet"}' (FORMAT PARQUET)"""
        )
    out = str(tmp_path / "index")
    ckpt = str(tmp_path / "ckpt")
    q = streaming_rag_index(
        spark, str(d), out, ckpt, window=8, overlap=2, max_files_per_trigger=1
    )
    q.awaitTermination(120)

    got = {
        (r["doc_id"], r["chunk_idx"]): (r["n_words"], r["bucket"])
        for r in spark.read.parquet(out).collect()
    }
    want = {
        (r["doc_id"], r["chunk_idx"]): (r["n_words"], r["bucket"])
        for r in rag_index_table(
            spark.read.parquet(str(d)), window=8, overlap=2
        ).collect()
    }
    assert got == want and len(got) > 30
    # the physical layout is the serving layout: epoch (idempotent replay
    # unit) then bucket (ANN pruning key)
    import os

    epochs = [p for p in os.listdir(out) if p.startswith("epoch=")]
    assert len(epochs) == 2, epochs  # one per micro-batch
    buckets = {
        b for e in epochs for b in os.listdir(os.path.join(out, e))
        if b.startswith("bucket=")
    }
    assert len(buckets) >= 2, buckets


def test_streaming_rag_index_replay_idempotent(spark, tmp_path):
    """A replayed epoch must overwrite its own partitions, not append
    duplicates (review finding: plain append double-wrote replayed rows)."""
    import duckdb

    from open_parse_spark.streaming.jobs import streaming_rag_index

    d = tmp_path / "docs"
    d.mkdir()
    duckdb.sql(
        f"""COPY (SELECT i AS doc_id, repeat('w' || (i % 4)::VARCHAR || ' ', 12) AS text,
             'en' AS lang, 's' AS source, 1::BIGINT AS n_chars
           FROM generate_series(0, 9) t(i)) TO '{d / "f.parquet"}' (FORMAT PARQUET)"""
    )
    out = str(tmp_path / "index")
    # run once...
    q = streaming_rag_index(spark, str(d), out, str(tmp_path / "ck1"), window=8, overlap=2)
    q.awaitTermination(90)
    first = spark.read.parquet(out).count()
    # ...then simulate a replay of the SAME epoch (fresh checkpoint -> the
    # whole input re-runs as epoch 0 again)
    q2 = streaming_rag_index(spark, str(d), out, str(tmp_path / "ck2"), window=8, overlap=2)
    q2.awaitTermination(90)
    again = spark.read.parquet(out).count()
    assert again == first, f"replay duplicated rows: {first} -> {again}"
    keys = spark.read.parquet(out).select("doc_id", "chunk_idx").collect()
    assert len(keys) == len({(r["doc_id"], r["chunk_idx"]) for r in keys})


@pytest.mark.slow
def test_streaming_rag_index_kill_and_resume(spark, tmp_path):
    """Kill the index build MID-STREAM (not just replay a finished epoch):
    stop the query after the first micro-batch commits, restart from the
    same checkpoint, and the served index must equal the single-shot batch
    build — no dropped epochs, no duplicate rows from the interrupted one
    (VERDICT r3 item 8)."""
    import time

    import duckdb

    from open_parse_spark.operators.chunking import rag_index_table
    from open_parse_spark.streaming.jobs import streaming_rag_index

    d = tmp_path / "docs"
    d.mkdir()
    con = duckdb.connect()
    for f in range(4):
        con.execute(
            f"""COPY (SELECT i AS doc_id,
                 'doc ' || i::VARCHAR || ' ' || repeat('kw' || (i % 7)::VARCHAR || ' ', 18) AS text,
                 'en' AS lang, 's' AS source, 1::BIGINT AS n_chars
               FROM generate_series({f * 12}, {f * 12 + 11}) t(i))
               TO '{d / f"f{f}.parquet"}' (FORMAT PARQUET)"""
        )
    out = str(tmp_path / "index")
    ckpt = str(tmp_path / "ckpt")

    q = streaming_rag_index(
        spark, str(d), out, ckpt, window=8, overlap=2, max_files_per_trigger=1
    )
    # kill after the first batch commits but (typically) before the stream
    # drains — q.stop() interrupts whatever batch is in flight
    deadline = time.monotonic() + 120
    while time.monotonic() < deadline:
        p = q.lastProgress
        if p is not None and p["batchId"] >= 1:
            break
        time.sleep(0.2)
    q.stop()
    q.awaitTermination(60)
    interrupted = spark.read.parquet(out).count()

    # resume from the same checkpoint; availableNow drains the rest
    q2 = streaming_rag_index(
        spark, str(d), out, ckpt, window=8, overlap=2, max_files_per_trigger=1
    )
    q2.awaitTermination(120)

    got = {
        (r["doc_id"], r["chunk_idx"]): (r["n_words"], r["bucket"])
        for r in spark.read.parquet(out).collect()
    }
    want = {
        (r["doc_id"], r["chunk_idx"]): (r["n_words"], r["bucket"])
        for r in rag_index_table(
            spark.read.parquet(str(d)), window=8, overlap=2
        ).collect()
    }
    assert got == want, {
        "missing": set(want) - set(got), "extra": set(got) - set(want),
    }
    assert len(got) > 40
    # duplicate guard: parquet rows == distinct (doc, chunk) keys
    assert spark.read.parquet(out).count() == len(got)
    # the kill normally lands mid-stream (fewer rows served than the end);
    # on a fast box the stream may drain first — then this degrades to a
    # restart-after-completion no-op check, which must also hold
    assert interrupted <= len(got), (interrupted, len(got))


def test_sessionize_beyond_gap_backward_straggler_not_merged(spark, tmp_path):
    """A within-watermark row more than ``gap`` OLDER than the open
    session's start must NOT be absorbed (review finding): batch
    sessionization puts it in its own earlier session, so merging it
    emitted a (start pulled back, n_events+1) tuple batch never produces.
    Such extreme stragglers are dropped like beyond-watermark rows, and
    every closed session the stream emits must still be a batch tuple.

    user 1: session opens at 1000s (rows to 1200s); the watermark (driven
    by user 2's clock) sits far enough back that a 300s row is still
    within it, but 300s is 700s before the session start (> gap 600) —
    the old code merged it into a phantom (start=300s, n=4) session."""
    base = datetime.datetime(2026, 1, 1, 12)
    d = tmp_path / "ev"
    d.mkdir()

    def ev(eid, sec, uid):
        return (eid, base + datetime.timedelta(seconds=sec), uid, "e", 0.0, "")

    files = [
        [ev(0, 1000, 1), ev(1, 1100, 1), ev(2, 1200, 1),
         ev(3, 1200, 2)],                     # watermark -> 1200s - 30min < 300s
        [ev(4, 300, 1),                       # backward straggler, > gap older
         ev(5, 1500, 2)],
        [ev(6, 2600, 1),                      # gap-closes user 1's session
         ev(7, 4000, 2), ev(8, 6000, 2)],     # advance watermark to flush
    ]
    rows_all = []
    for f, rows in enumerate(files):
        _write_events(str(d / f"f{f}.parquet"), rows)
        rows_all.extend(rows)

    from open_parse_spark.streaming.jobs import (
        run_stream_to_memory,
        streaming_sessionize,
    )

    stream = streaming_sessionize(
        spark, str(d), gap_seconds=600, watermark="30 minutes",
        max_files_per_trigger=1,
    )
    q = run_stream_to_memory(stream, "sess_farback", mode="append")
    q.awaitTermination(180)
    got = spark.table("sess_farback").toPandas()
    got_set = set(
        map(tuple, got[["user_id", "session_no", "n_events", "session_start"]]
            .itertuples(index=False))
    )
    start_1000 = (base + datetime.timedelta(seconds=1000)).strftime("%Y-%m-%d %H:%M:%S")
    start_300 = (base + datetime.timedelta(seconds=300)).strftime("%Y-%m-%d %H:%M:%S")
    # the open session closes UNMERGED: start stays 1000s, n_events stays 3
    assert (1, 1, 3, start_1000) in got_set, got_set
    # and no phantom merged/backward tuple exists
    assert not any(t[0] == 1 and t[3] == start_300 for t in got_set), got_set
    assert not any(t[0] == 1 and t[2] == 4 for t in got_set), got_set
