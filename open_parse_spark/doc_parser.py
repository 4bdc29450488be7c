"""User-facing API, mirroring the reference's surface so an open-parse user
can switch with minimal relearning.

Reference: ``/root/reference/src/openparse/doc_parser.py:63-126`` (parser +
pipeline selection) and ``processing/ingest.py:25-53`` (IngestionPipeline /
append_transform extension point).

- ``DocumentParser(processing_pipeline=...).parse(text, tool)`` — one
  document (turn payload) -> ``ParsedDocument`` of nodes, eagerly, locally.
- ``DocumentParser.parse_table(spark_df)`` — the same pipeline distributed
  over a transcripts DataFrame via Arrow ``mapInPandas``.
- custom steps: subclass nothing — any ``list[Node] -> list[Node]`` callable
  appended via ``pipeline.append_transform`` (the reference's ProcessingStep
  subclassing collapses to a plain function here).
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Callable, List, Optional

from open_parse_spark.core.model import Node
from open_parse_spark.core.payload import decode_payload, elements_to_nodes
from open_parse_spark.core.transforms import (
    Transform,
    basic_pipeline_transforms,
    run_pipeline,
)


class IngestionPipeline:
    """Reference processing/ingest.py:25-53."""

    def __init__(self, transformations: Optional[List[Transform]] = None):
        self.transformations: List[Transform] = list(transformations or [])

    def run(self, nodes: List[Node]) -> List[Node]:
        return run_pipeline(nodes, self.transformations)

    def append_transform(self, transform: Transform) -> None:
        self.transformations.append(transform)


class NoOpIngestionPipeline(IngestionPipeline):
    """Reference processing/ingest.py:56-62."""

    def __init__(self):
        super().__init__([])


class BasicIngestionPipeline(IngestionPipeline):
    """Reference processing/ingest.py:65-92."""

    def __init__(self):
        super().__init__(basic_pipeline_transforms())
        # snapshot for parse_table's stock-pipeline fast-path identity check
        self._stock_transforms = tuple(self.transformations)


class SemanticIngestionPipeline(IngestionPipeline):
    """Reference processing/ingest.py:95-136; embeddings default to the
    deterministic local hashing client (no RPC)."""

    def __init__(
        self,
        embed_many: Optional[Callable] = None,
        min_tokens: int = 256,
        max_tokens: int = 1024,
    ):
        from open_parse_spark.core.semantic import semantic_pipeline_transforms

        super().__init__(
            semantic_pipeline_transforms(
                embed_many, min_tokens=min_tokens, max_tokens=max_tokens
            )
        )


@dataclass
class ParsedDocument:
    """Reference schemas.py:686-700, minus uuid/wall-clock fields
    (SURVEY §4.3.5)."""

    nodes: List[Node]
    filename: str = ""
    num_pages: int = 0
    coordinate_system: str = "bottom-left"
    table_parsing_kwargs: Optional[dict] = field(default=None)


class DocumentParser:
    """Reference doc_parser.py:52-126."""

    def __init__(
        self,
        processing_pipeline: Optional[IngestionPipeline] = None,
        use_basic_pipeline_if_none: bool = True,
    ):
        if processing_pipeline is None and use_basic_pipeline_if_none:
            processing_pipeline = BasicIngestionPipeline()
        elif processing_pipeline is None:
            processing_pipeline = NoOpIngestionPipeline()
        self.processing_pipeline = processing_pipeline

    def parse(
        self, text: Optional[str], tool: Optional[str] = None, filename: str = ""
    ) -> ParsedDocument:
        """One document payload -> ParsedDocument (local, eager)."""
        elements = decode_payload(text, tool)
        nodes = elements_to_nodes(elements)
        nodes = self.processing_pipeline.run(nodes)
        num_pages = (
            max((n.end_page for n in nodes), default=-1) + 1 if nodes else 0
        )
        return ParsedDocument(nodes=nodes, filename=filename, num_pages=num_pages)

    def parse_table(self, transcripts_df, **kwargs):
        """Distributed: transcripts DataFrame -> node rows (the pipeline's
        transforms ship to executors inside the Arrow UDF)."""
        import pandas as pd

        from open_parse_spark.core.parse import node_to_record
        from open_parse_spark.spark.pipeline import (
            INPUT_COLS,
            NODE_SCHEMA,
            parse_transcripts,
        )

        transforms = self.processing_pipeline.transformations
        if type(self.processing_pipeline) is BasicIngestionPipeline and getattr(
            self.processing_pipeline, "_stock_transforms", None
        ) is not None and len(transforms) == len(
            self.processing_pipeline._stock_transforms
        ) and all(
            a is b
            for a, b in zip(
                transforms, self.processing_pipeline._stock_transforms
            )
        ):
            # untouched stock pipeline: the tuned zero-shuffle path.  The
            # check is element-wise IDENTITY against the list captured at
            # construction — a type+length check alone would silently route
            # an in-place-replaced transform to the stock path (review)
            return parse_transcripts(transcripts_df, **kwargs)
        if kwargs:
            # the custom-pipeline path has no skew/option plumbing; dropping
            # kwargs silently would diverge from the stock path's behavior
            raise TypeError(
                f"parse_table options {sorted(kwargs)} are only supported "
                "with the stock pipeline"
            )

        def _parse(batches):
            for pdf in batches:
                out = {name: [] for name in NODE_SCHEMA.fieldNames()}
                for conv_id, turn_idx, text, tool in zip(
                    pdf["conv_id"], pdf["turn_idx"], pdf["text"], pdf["tool"]
                ):
                    try:
                        nodes = run_pipeline(
                            elements_to_nodes(decode_payload(text, tool)), transforms
                        )
                    except Exception as exc:
                        # same lineage contract as _parse_partition
                        # (pipeline.py): a malformed payload becomes one
                        # node_idx=-1 parse_error row, never a failed job
                        out["conv_id"].append(conv_id)
                        out["turn_idx"].append(int(turn_idx))
                        out["node_idx"].append(-1)
                        out["text"].append(None)
                        out["tokens"].append(0)
                        out["variant"].append(["error"])
                        out["num_pages"].append(0)
                        out["start_page"].append(0)
                        out["end_page"].append(0)
                        out["bbox"].append([])
                        out["elements"].append([])
                        out["parse_error"].append(
                            f"{type(exc).__name__}: {exc}"[:500]
                        )
                        continue
                    for i, node in enumerate(nodes):
                        rec = node_to_record(node, i)
                        out["conv_id"].append(conv_id)
                        out["turn_idx"].append(int(turn_idx))
                        out["node_idx"].append(i)
                        out["text"].append(rec["text"])
                        out["tokens"].append(rec["tokens"])
                        out["variant"].append(rec["variant"])
                        out["num_pages"].append(rec["num_pages"])
                        out["start_page"].append(rec["start_page"])
                        out["end_page"].append(rec["end_page"])
                        out["bbox"].append(
                            [tuple(b.values()) for b in rec["bbox"]]
                        )
                        out["elements"].append(
                            [
                                (
                                    e["variant"],
                                    e["text"],
                                    tuple(e["bbox"].values()),
                                    e["image_mimetype"],
                                )
                                for e in rec["elements"]
                            ]
                        )
                        out["parse_error"].append(None)
                if out["conv_id"]:
                    # zero-node batch: skip the yield (pandas-2 empty-column
                    # float64 trap vs the list-typed schema columns — see
                    # spark/pipeline.py:_parse_partition)
                    yield pd.DataFrame(out)

        return transcripts_df.select(*INPUT_COLS).mapInPandas(
            _parse, schema=NODE_SCHEMA
        )
