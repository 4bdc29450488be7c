"""Frozen-golden regression guard: the per-turn parse of the seed-42 fixture
corpus must stay byte-identical across refactors/rounds.  The golden was
produced by the single-threaded oracle (the reference-semantics code path)
and committed; any semantic drift in the core engine fails here first."""

import os

import pandas as pd

from open_parse_spark.data.synth import gen_transcripts
from open_parse_spark.spark.pipeline import run_turns_oracle

GOLDEN = os.path.join(
    os.path.dirname(__file__), "goldens", "nodes_seed42_40x6.parquet"
)


def test_oracle_matches_frozen_golden():
    golden = pd.read_parquet(GOLDEN)
    now = run_turns_oracle(gen_transcripts(n_convs=40, avg_turns=6, seed=42))
    assert len(now) == len(golden)
    assert now["text"].tolist() == golden["text"].tolist()
    assert now["tokens"].tolist() == golden["tokens"].tolist()
    assert now["conv_id"].tolist() == golden["conv_id"].tolist()
    assert now["turn_idx"].tolist() == golden["turn_idx"].tolist()
    assert now["node_idx"].tolist() == golden["node_idx"].tolist()
