"""User-facing API parity: DocumentParser / pipelines / append_transform
(reference doc_parser.py:52-126, processing/ingest.py:25-62)."""

import json

from open_parse_spark import (
    BasicIngestionPipeline,
    DocumentParser,
    NoOpIngestionPipeline,
    SemanticIngestionPipeline,
)


def _payload():
    def line(y, text, bold=False, size=11.0):
        return {
            "bbox": [72, y - 12, 540, y],
            "spans": [
                {"text": text, "is_bold": bold, "is_italic": False, "size": size}
            ],
        }

    return json.dumps(
        {
            "pages": [
                {
                    "page": 0,
                    "width": 612.0,
                    "height": 792.0,
                    "elements": [
                        {"kind": "text", "lines": [line(700, "MOCK LEASE AGREEMENT", bold=True, size=18.0)]},
                        {
                            "kind": "text",
                            "lines": [
                                line(640 - i * 14, f"body paragraph sentence {i} " * 4)
                                for i in range(8)
                            ],
                        },
                    ],
                }
            ]
        }
    )


def test_default_parser_runs_basic_pipeline():
    doc = DocumentParser().parse(_payload(), filename="lease.json")
    assert doc.filename == "lease.json"
    assert doc.num_pages == 1
    assert doc.nodes[0].text.startswith("**MOCK LEASE AGREEMENT**")


def test_noop_pipeline_keeps_raw_nodes():
    doc = DocumentParser(NoOpIngestionPipeline()).parse(_payload())
    # no heading merge, no stub removal: one node per element
    assert len(doc.nodes) == 2


def test_append_transform_extension_point():
    pipeline = BasicIngestionPipeline()

    def drop_everything(nodes):
        return []

    pipeline.append_transform(drop_everything)
    doc = DocumentParser(pipeline).parse(_payload())
    assert doc.nodes == []


def test_semantic_pipeline_class():
    doc = DocumentParser(SemanticIngestionPipeline(min_tokens=10)).parse(_payload())
    assert doc.nodes and doc.nodes[0].text.startswith("**MOCK LEASE AGREEMENT**")


def test_parse_table_distributed(spark):
    import pandas as pd

    pdf = pd.DataFrame(
        {
            "conv_id": ["c1", "c1"],
            "turn_idx": pd.array([0, 1], dtype="int32"),
            "role": ["user", "assistant"],
            "text": [_payload(), "plain prose " * 100],
            "tool": ["", ""],
            "ts": pd.to_datetime(["2020-01-01", "2020-01-01"]),
        }
    )
    df = spark.createDataFrame(pdf)
    out = DocumentParser().parse_table(df).orderBy("turn_idx", "node_idx").toPandas()
    assert out.iloc[0]["text"].startswith("**MOCK LEASE AGREEMENT**")
    # distributed result equals local parse
    local = DocumentParser().parse(_payload())
    assert out[out.turn_idx == 0]["text"].tolist() == [n.text for n in local.nodes]


def test_parse_table_custom_pipeline_emits_error_rows(spark):
    """A malformed payload in the custom-pipeline path becomes a node_idx=-1
    parse_error row (same lineage contract as the stock path), never a
    failed Spark job."""
    import pandas as pd

    pipeline = BasicIngestionPipeline()

    def explode_on_marker(nodes):
        if any("BOOM" in (n.text or "") for n in nodes):
            raise ValueError("marker payload")
        return nodes

    pipeline.append_transform(explode_on_marker)
    pdf = pd.DataFrame(
        {
            "conv_id": ["c1", "c1"],
            "turn_idx": pd.array([0, 1], dtype="int32"),
            "role": ["user", "assistant"],
            "text": ["BOOM " * 60, "plain prose " * 100],
            "tool": ["", ""],
            "ts": pd.to_datetime(["2020-01-01", "2020-01-01"]),
        }
    )
    out = (
        DocumentParser(pipeline)
        .parse_table(spark.createDataFrame(pdf))
        .orderBy("turn_idx", "node_idx")
        .toPandas()
    )
    errs = out[out.node_idx == -1]
    assert len(errs) == 1
    assert errs.iloc[0]["turn_idx"] == 0
    assert "ValueError" in errs.iloc[0]["parse_error"]
    # the healthy turn still parsed
    assert (out[out.turn_idx == 1].node_idx >= 0).all()
