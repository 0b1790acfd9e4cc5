"""Column-level expression builders (all JVM-side built-ins)."""

from bigdata_elephant_spark.functions.text import (  # noqa: F401
    FILTER_TEXT_PATTERN,
    filter_text,
    filter_text_py,
    tokenize,
    tokenize_str,
)
from bigdata_elephant_spark.functions.hashing import h32  # noqa: F401
