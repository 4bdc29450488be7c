"""Randomized-corpus oracle parity: the hostile-corpus suite generalized to
a seeded random ASCII corpus — random word soup, duplicate documents,
shared prefixes, digit/punct-heavy rows, random NULLs, lengths 0..4000.
Catches parity classes the handcrafted corpus doesn't enumerate (boundary
word counts, accidental n-gram collisions, quantile edge ranks).

Deterministic (seed=1234): a failure reproduces exactly."""

import duckdb
import numpy as np
import pandas as pd

from tests.test_hostile_corpus_parity import SKIP, _normalize

_WORDS = (
    "the a and of to is in data spark query row table scan join agg hash "
    "window sort merge filter value line text node turn page tool batch "
    "fast slow small large it's 123 456 7890 alpha beta gamma"
).split()


def _random_corpus(seed: int = 1234, n: int = 48) -> pd.DataFrame:
    rng = np.random.RandomState(seed)
    rows = []
    for i in range(n):
        shape = rng.randint(8)
        if shape == 0:
            text = None
        elif shape == 1:
            text = ""
        elif shape == 2:  # pure word soup, random length
            k = int(rng.randint(1, 400))
            text = " ".join(rng.choice(_WORDS, k))
        elif shape == 3:  # digit/punct heavy
            text = " ".join(
                rng.choice(["123", "!!!", "#$%", "9.99", "a1b2", "..."], 30)
            )
        elif shape == 4 and rows:  # exact duplicate of an earlier doc
            text = rows[int(rng.randint(len(rows)))][1]
        elif shape == 5:  # shared prefix + unique tail (near-dup bait)
            text = (
                "common shared prefix words for near duplicate pairs "
                + " ".join(rng.choice(_WORDS, 10))
            )
        elif shape == 6:  # whitespace-riddled incl. every collapse-class char
            seps = [" ", "  ", "\t", "\n", "\r\n", "\f", " \n "]
            ws = rng.choice(_WORDS, 20)
            text = (
                "".join(w + seps[int(rng.randint(len(seps)))] for w in ws)
                + " \t "
            )
        else:  # long doc
            text = " ".join(rng.choice(_WORDS, 2000))
        lang = rng.choice(["en", "de", "fr", "es", "zh", None])
        source = rng.choice(["s0", "s1", "s2", None])
        rows.append(
            (i, text, lang, source, len(text) if text else 0)
        )
    return pd.DataFrame(
        rows, columns=["doc_id", "text", "lang", "source", "n_chars"]
    )


def test_random_corpus_oracle_parity(spark, tmp_path):
    from open_parse_spark.plans.queries import REGISTRY

    pdf = _random_corpus()
    con = duckdb.connect()
    con.register("docs", pdf)
    d = str(tmp_path)
    con.execute(
        f"COPY (SELECT doc_id::BIGINT AS doc_id, text, lang, source, "
        f"n_chars::BIGINT AS n_chars FROM docs) "
        f"TO '{d}/documents.parquet' (FORMAT PARQUET)"
    )
    con.execute(
        f"COPY (SELECT i::BIGINT AS vec_id, "
        f"list_transform(generate_series(1, 8), x -> (i * x)::FLOAT / 10) AS embedding, "
        f"(i % 3)::INT AS label FROM generate_series(0, 9) t(i)) "
        f"TO '{d}/embeddings.parquet' (FORMAT PARQUET)"
    )
    for t in ("documents", "embeddings"):
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{d}/{t}.parquet'")

    failures = []
    for name, (fn, sql) in REGISTRY.items():
        if sql is None or name in SKIP:
            continue
        try:
            got = _normalize(fn(spark, d).toPandas())
            want = _normalize(con.execute(sql).df())
        except Exception as exc:  # noqa: BLE001
            failures.append(f"{name}: raised {type(exc).__name__}: {exc}")
            continue
        if len(got) != len(want):
            failures.append(f"{name}: rows {len(got)} != {len(want)}")
        elif list(got.columns) != list(want.columns):
            failures.append(
                f"{name}: cols {list(got.columns)} != {list(want.columns)}"
            )
        elif not got.equals(want):
            diff = (got != want) & ~(got.isna() & want.isna())
            failures.append(
                f"{name}: value mismatch rows "
                f"{list(got.index[diff.any(axis=1)])[:5]}"
            )
    assert not failures, "\n".join(failures)
