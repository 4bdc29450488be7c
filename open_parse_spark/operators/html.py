"""Spark operator over the DOM extractor (core/html.py): batch main-content
extraction for a DataFrame carrying raw HTML pages.

Plan shape: column-pruned scan -> one Arrow ``mapInPandas`` stage running
the stdlib-DOM extractor per row — zero shuffle, identical to the flagship
parse.  At 100 TB, run ``q_html_boilerplate_stats``-style JVM regex metrics
first and route link-dense / text-empty pages away from this stage.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def _block_text(b: dict) -> str:
    """A block's textual form: flowing blocks carry their text; table
    blocks carry (headers, rows) and render via the byte-exact markdown
    renderer (joining their empty ``text`` would silently drop table
    content — caught by review)."""
    if b["kind"] == "table":
        from open_parse_spark.functions.tables import output_to_markdown

        return output_to_markdown(list(b.get("headers", [])), b.get("rows", []))
    return b["text"]


def extract_main_content(
    df: DataFrame, id_col: str = "doc_id", html_col: str = "html"
) -> DataFrame:
    """(id, heading, body_text, n_blocks) per page: headings joined with
    newlines, non-heading blocks (paragraphs, lists, table-free text) joined
    with blank lines, boilerplate dropped by the DOM heuristics."""
    import pandas as pd

    src = df.select(
        F.col(id_col).cast("long").alias("doc_id"),
        F.coalesce(F.col(html_col), F.lit("")).alias("html"),
    )

    def extract(batches):
        from open_parse_spark.core.html import extract_main_blocks

        for pdf in batches:
            if not len(pdf):
                continue
            ids, heads, bodies, counts = [], [], [], []
            for doc_id, html in zip(pdf["doc_id"], pdf["html"]):
                blocks = extract_main_blocks(html)
                ids.append(doc_id)
                heads.append(
                    "\n".join(
                        b["text"] for b in blocks if b["kind"] == "heading"
                    )
                )
                bodies.append(
                    "\n\n".join(
                        t
                        for t in (
                            # renders end with a newline; strip it so the
                            # blank-line join stays uniform (per-block
                            # output keeps the byte-exact render)
                            _block_text(b).rstrip("\n")
                            for b in blocks
                            if b["kind"] != "heading"
                        )
                        if t  # a table with no cells renders empty — skip
                    )
                )
                counts.append(len(blocks))
            yield pd.DataFrame(
                {
                    "doc_id": ids,
                    "heading": heads,
                    "body_text": bodies,
                    "n_blocks": counts,
                }
            )

    return src.mapInPandas(
        extract, "doc_id long, heading string, body_text string, n_blocks long"
    )


def extract_blocks(
    df: DataFrame, id_col: str = "doc_id", html_col: str = "html"
) -> DataFrame:
    """One row per kept content block, in document order: (id, block_idx,
    kind, text, level) — the chunking-granularity surface (RAG splitters,
    per-block dedup) as opposed to ``extract_main_content``'s joined view.
    Same zero-shuffle Arrow shape."""
    import pandas as pd

    src = df.select(
        F.col(id_col).cast("long").alias("doc_id"),
        F.coalesce(F.col(html_col), F.lit("")).alias("html"),
    )

    def explode(batches):
        from open_parse_spark.core.html import extract_main_blocks

        for pdf in batches:
            if not len(pdf):
                continue
            ids, idxs, kinds, texts, levels = [], [], [], [], []
            for doc_id, html in zip(pdf["doc_id"], pdf["html"]):
                for i, b in enumerate(extract_main_blocks(html)):
                    ids.append(doc_id)
                    idxs.append(i)
                    kinds.append(b["kind"])
                    texts.append(_block_text(b))
                    levels.append(b["level"])
            yield pd.DataFrame(
                {
                    "doc_id": ids,
                    "block_idx": idxs,
                    "kind": kinds,
                    "text": texts,
                    "level": levels,
                }
            )

    return src.mapInPandas(
        explode,
        "doc_id long, block_idx long, kind string, text string, level long",
    )
