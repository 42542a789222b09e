"""HTML boilerplate removal (beyond-reference §2.J scope).

Web-crawl curation starts with main-content extraction: navigation bars,
footers and link farms must not reach the training corpus (jusText,
Kohlschütter et al.'s boilerpipe, trafilatura all classify BLOCKS by text
length and link density). The reference ingests markdown only
(src/tools/load.py), so the HTML path is engine work.

This is the jusText-shaped core as pure JVM-side expressions — one
regexp_extract_all to split blocks, higher-order array functions for the
per-block classifier, zero UDFs and zero shuffles (a narrow map over the
corpus; at 100 TB it scales embarrassingly with the scan).

Block model: well-formed, non-nested ``<p>``/``<div>`` blocks on a single
line (the synthesizer in the workload query guarantees this; a production
crawler would put a tag-soup normalizer — an mapInPandas lxml pass — in
front, exactly like the multimodal decode twins). The classifier is
integer-only: keep a block iff

    len(strip_tags(block)) >= min_len
    AND link_chars * den < len(strip_tags(block)) * num_inv

with the default 3×link < text ("link density < 1/3") rule, so both
engines agree bit-for-bit with no float ratio anywhere.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

__all__ = ["extract_main_content", "BLOCK_RE", "LINK_TEXT_RE", "TAG_RE"]

# RE2-compatible (no backreferences, no lookaround): the same patterns run
# verbatim in the DuckDB oracle.
BLOCK_RE = "<(?:p|div)>.*?</(?:p|div)>"
LINK_TEXT_RE = "<a [^>]*>([^<]*)</a>"
TAG_RE = "<[^>]*>"


def _block_text(b: Column) -> Column:
    return F.regexp_replace(b, TAG_RE, "")


def _link_chars(b: Column) -> Column:
    return F.aggregate(
        F.regexp_extract_all(b, F.lit(LINK_TEXT_RE), 1),
        F.lit(0),
        lambda acc, x: acc + F.length(x),
    )


def extract_main_content(
    html: Column, min_len: int = 20, link_factor: int = 3
) -> dict[str, Column]:
    """Classify blocks of ``html`` and reassemble the main content.

    Returns the column bundle (callers pick what to project):
      blocks    array of raw block strings, document order
      kept      array of surviving block strings
      content   kept block texts joined with \\n (tags stripped)
    A block survives iff its tag-stripped text has >= ``min_len`` chars
    and ``link_factor``×(chars inside <a> tags) < text chars — integer
    arithmetic only, engine-portable.
    """
    blocks = F.regexp_extract_all(html, F.lit(BLOCK_RE), 0)
    kept = F.filter(
        blocks,
        lambda b: (F.length(_block_text(b)) >= F.lit(min_len))
        & (F.lit(link_factor) * _link_chars(b) < F.length(_block_text(b))),
    )
    content = F.array_join(F.transform(kept, _block_text), "\n")
    return {"blocks": blocks, "kept": kept, "content": content}
