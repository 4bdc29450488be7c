"""open-parse-spark: PySpark-native document extraction with open-parse's
observable semantics, plus large-scale training-data operators.

Public surface mirrors the reference package layout
(``/root/reference/src/openparse/__init__.py``): DocumentParser + pipelines +
node/element model, with the Spark distribution layer underneath.
"""

from open_parse_spark.core.model import (  # noqa: F401
    Bbox,
    ImageElement,
    LineElement,
    Node,
    TableElement,
    TextElement,
    TextSpan,
    bullet_regex,
)
from open_parse_spark.doc_parser import (  # noqa: F401
    BasicIngestionPipeline,
    DocumentParser,
    IngestionPipeline,
    NoOpIngestionPipeline,
    ParsedDocument,
    SemanticIngestionPipeline,
)

__version__ = "0.1.0"
