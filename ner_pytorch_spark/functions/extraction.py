"""HTML → text extraction.

The reference has no HTML extractor (its ingestion starts at pre-tokenized
CoNLL files, /root/reference/loader.py:21-42), so the byte-identical-per-url
invariant required by the north rule is anchored to THIS extractor: a pure,
deterministic function of the ``html`` bytes alone — no locale, parallelism,
wall-clock or dict-order dependence. The synthetic corpus generator
(``ner_pytorch_spark.datagen``) stores ``text = extract_text(html)`` so the
invariant holds by construction, and tests verify byte-identity under
repartitioning at two parallelism levels.

Spark hosting: an Arrow-batched pandas UDF (``extract_text_udf``) — the
per-page work is pure Python string processing, the batching is Arrow's.
"""

from __future__ import annotations

import re

import pandas as pd
from pyspark.sql import functions as F
from pyspark.sql.types import StringType

# Tags whose entire content is dropped (non-visible text).
_DROP_CONTENT = re.compile(
    r"<(script|style|noscript|template)\b[^>]*>.*?</\1\s*>",
    re.IGNORECASE | re.DOTALL,
)
_COMMENT = re.compile(r"<!--.*?-->", re.DOTALL)
# Block-level boundaries become newlines so sentences in adjacent <p>s
# never fuse into one line.
_BLOCK_TAG = re.compile(
    r"</?(p|div|br|li|ul|ol|h[1-6]|tr|table|td|th|blockquote|section|article"
    r"|header|footer|title|body|html|head)\b[^>]*/?>",
    re.IGNORECASE,
)
_ANY_TAG = re.compile(r"<[^>]+>")
_ENTITIES = {
    "&amp;": "&",
    "&lt;": "<",
    "&gt;": ">",
    "&quot;": '"',
    "&#39;": "'",
    "&apos;": "'",
    "&nbsp;": " ",
}
_HSPACE = re.compile(r"[ \t\r\f\v]+")


def extract_text(html: bytes | str | None) -> str:
    """Pure deterministic HTML→text. The engine-defined extractor.

    Steps (fixed order): utf-8 decode (replace errors) → drop comments →
    drop script/style/noscript/template content → block tags to newline →
    strip remaining tags → decode the 7 named entities above → collapse
    horizontal whitespace → strip each line → drop empty lines → join
    with a single newline.
    """
    if html is None:
        return ""
    s = html.decode("utf-8", errors="replace") if isinstance(html, (bytes, bytearray)) else html
    s = _COMMENT.sub("", s)
    s = _DROP_CONTENT.sub("", s)
    s = _BLOCK_TAG.sub("\n", s)
    s = _ANY_TAG.sub(" ", s)
    for ent, ch in _ENTITIES.items():
        s = s.replace(ent, ch)
    lines = []
    for line in s.split("\n"):
        line = _HSPACE.sub(" ", line).strip()
        if line:
            lines.append(line)
    return "\n".join(lines)


@F.pandas_udf(StringType())
def extract_text_udf(html: pd.Series) -> pd.Series:
    """Arrow-batched wrapper over :func:`extract_text`."""
    return html.map(extract_text)
