"""Empty-corpus robustness: every registry query must run (not raise) on
zero-row tables with the production schemas.  Empty inputs are routine at
scale — an empty partition, a filter that matches nothing, a fresh table —
and driver-side .first()/div-by-zero/seed-from-data bugs all surface here."""

import os

import duckdb
import pytest


@pytest.fixture(scope="module")
def empty_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("empty_sf")
    con = duckdb.connect()
    src = "/root/testdata/sf0.001"
    for name in (
        "region nation customer supplier part orders lineitem events "
        "documents embeddings"
    ).split():
        con.execute(
            f"COPY (SELECT * FROM '{src}/{name}.parquet' LIMIT 0) "
            f"TO '{d}/{name}.parquet' (FORMAT PARQUET)"
        )
    return str(d)


def test_registry_queries_survive_empty_corpus(spark, empty_dir):
    from open_parse_spark.plans.queries import REGISTRY

    failures = []
    for name, (fn, _sql) in REGISTRY.items():
        try:
            n = fn(spark, empty_dir).count()
        except Exception as exc:  # noqa: BLE001
            failures.append(f"{name}: {type(exc).__name__}: {exc}")
            continue
        # eval_* aggregates legitimately return a single summary row;
        # everything else must be empty on empty input
        if n != 0 and not name.startswith("eval_"):
            failures.append(f"{name}: {n} rows from empty input")
    assert not failures, "\n".join(failures)
