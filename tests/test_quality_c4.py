"""Crafted-corpus dialect parity for the C4 cleaning gates.

The synthetic documents table is single-line prose, so the sf-gate alone
exercises almost none of the line rules; this corpus hits every branch in
BOTH engines: terminal-punctuation variants (``. ! ? "``, trailing spaces,
trailing ``\r`` — the Java-vs-RE2 ``$`` trap the \\z anchor exists for),
the 3-word minimum, javascript case variants, the 5-kept-line page gate,
lorem ipsum and brace page gates, empty/None text.
"""

import duckdb
import pandas as pd
import pytest

from open_parse_spark.plans.queries import REGISTRY

FIVE_GOOD = "\n".join(f"this is kept line number {i}." for i in range(5))

CRAFTED = [
    (0, FIVE_GOOD),                                      # keep=true
    (1, FIVE_GOOD + "\nbut it has lorem IPSUM inside."),  # page gate: lorem
    (2, FIVE_GOOD + "\ncode { body }."),                  # page gate: brace
    (3, "\n".join(f"kept line number {i}." for i in range(4))),  # only 4 kept
    (4, "ends with bang number one!\n" + FIVE_GOOD),      # ! terminal
    (5, 'he said "quoted line three words."\n' + FIVE_GOOD),  # " terminal
    (6, "trailing spaces line three.   \n" + FIVE_GOOD),  # spaces after punct
    (7, "carriage return line three.\r\n" + FIVE_GOOD),   # \r: NOT terminal
    (8, "no terminal punctuation here\n" + FIVE_GOOD),
    (9, "two words.\n" + FIVE_GOOD),                      # < 3 words dropped
    (10, "enable JavaScript to view this page.\n" + FIVE_GOOD),
    (11, "uses javascript everywhere in this line.\n" + FIVE_GOOD),
    (12, ""),                                             # empty text
    (13, None),                                           # NULL text
    (14, "question line number three?\n" + FIVE_GOOD),    # ? terminal
]


@pytest.fixture(scope="module")
def crafted_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("c4docs")
    pdf = pd.DataFrame(CRAFTED, columns=["doc_id", "text"])
    pdf.to_parquet(d / "documents.parquet")
    return str(d)


def test_crafted_parity_and_branches(spark, crafted_dir):
    fn, sql = REGISTRY["quality_c4"]
    got = fn(spark, crafted_dir).toPandas().sort_values("doc_id").reset_index(drop=True)

    con = duckdb.connect()
    con.execute(f"CREATE VIEW documents AS SELECT * FROM '{crafted_dir}/documents.parquet'")
    want = con.execute(sql).df().sort_values("doc_id").reset_index(drop=True)
    got = got.reindex(sorted(got.columns), axis=1)
    want = want.reindex(sorted(want.columns), axis=1)
    pd.testing.assert_frame_equal(got, want, check_dtype=False)

    by_id = {int(r["doc_id"]): r for _, r in got.iterrows()}
    assert bool(by_id[0]["keep"])
    assert bool(by_id[1]["has_lorem"]) and not bool(by_id[1]["keep"])
    assert bool(by_id[2]["has_brace"]) and not bool(by_id[2]["keep"])
    assert int(by_id[3]["n_kept_lines"]) == 4 and not bool(by_id[3]["keep"])
    for d in (4, 5, 6, 14):  # extra terminal-punct line kept
        assert int(by_id[d]["n_kept_lines"]) == 6, d
    # \r after the period means the line does NOT end in terminal punct
    assert int(by_id[7]["n_kept_lines"]) == 5
    assert "carriage" not in by_id[7]["cleaned_text"]
    for d in (8, 9, 10, 11):  # first line dropped by its gate
        assert int(by_id[d]["n_kept_lines"]) == 5, d
    assert int(by_id[12]["n_kept_lines"]) == 0 and by_id[12]["cleaned_text"] == ""
    assert int(by_id[13]["n_kept_lines"]) == 0 and not bool(by_id[13]["keep"])
