"""HTML text extraction + boilerplate signals: the FIRST stage of
every web-scraped training corpus (the role trafilatura/jusText play
in CCNet/RefinedWeb-style pipelines), as codegen'd column expressions.

Everything here is regex + chained-replace arithmetic on the JVM --
no UDF, no parser library -- deliberately limited to the boilerplate
SIGNALS recipes actually filter on:

- ``html_to_text``     tag/script/style/comment removal + entity decode
- ``html_title``       the <title> payload
- ``link_density``     anchor-text chars / total text chars (jusText's
                       core boilerplate feature: navigation and footer
                       blocks are link-dense, body prose is not)
- ``tag_count``        markup weight (tags per document)

Patterns are RE2-safe (no backreferences/lookaround) and replaces
apply in one FIXED order, so a SQL engine mirrors the output
byte-for-byte -- same contract as functions/text.py's PII scrubber.
A real DOM parser slots into the same seam as a mapInPandas decoder
when structural extraction (main-content detection) is needed; these
signals are what the filter step consumes either way.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def _c(col: Column | str) -> Column:
    return F.col(col) if isinstance(col, str) else col


# Fixed application order -- scripts/styles/comments go BEFORE the
# generic tag strip (their bodies are not text), entities decode last.
_SCRIPT_PAT = r"(?is)<script[^>]*>.*?</script>"
_STYLE_PAT = r"(?is)<style[^>]*>.*?</style>"
_COMMENT_PAT = r"(?s)<!--.*?-->"
_TAG_PAT = r"<[^>]*>"
# (entity, replacement) pairs in fixed order; &amp; LAST so freshly
# produced '&' never re-combines with trailing text into a new entity.
_ENTITIES = (
    ("&nbsp;", " "),
    ("&lt;", "<"),
    ("&gt;", ">"),
    ("&quot;", '"'),
    ("&#39;", "'"),
    ("&amp;", "&"),
)
_ANCHOR_PAT = r"(?is)<a[\s>][^>]*>(.*?)</a>"
_TITLE_PAT = r"(?is)<title[^>]*>(.*?)</title>"


def html_to_text(col: Column | str) -> Column:
    """Visible text: drop script/style/comment bodies, strip tags to
    spaces, decode the common entities, collapse whitespace."""
    out = _c(col)
    for pat in (_SCRIPT_PAT, _STYLE_PAT, _COMMENT_PAT):
        out = F.regexp_replace(out, pat, " ")
    out = F.regexp_replace(out, _TAG_PAT, " ")
    for ent, rep in _ENTITIES:
        out = F.replace(out, F.lit(ent), F.lit(rep))
    return F.trim(F.regexp_replace(out, r"\s+", " "))


def html_title(col: Column | str) -> Column:
    """The first <title> payload (trimmed), '' when absent."""
    return F.trim(F.regexp_extract(_c(col), _TITLE_PAT, 1))


def tag_count(col: Column | str) -> Column:
    """Number of markup tags (markup-weight signal)."""
    return F.size(F.regexp_extract_all(_c(col), F.lit(_TAG_PAT), F.lit(0)))


def anchor_text(col: Column | str) -> Column:
    """All anchor payloads joined by one space (inner tags stripped,
    whitespace collapsed) -- the numerator source of link_density."""
    joined = F.array_join(
        F.regexp_extract_all(_c(col), F.lit(_ANCHOR_PAT), F.lit(1)), " "
    )
    out = F.regexp_replace(joined, _TAG_PAT, " ")
    for ent, rep in _ENTITIES:  # same decode as html_to_text, so the
        out = F.replace(out, F.lit(ent), F.lit(rep))  # density ratio
    return F.trim(F.regexp_replace(out, r"\s+", " "))  # is consistent


def link_density(col: Column | str) -> Column:
    """anchor-text chars / visible-text chars in [0, 1] (0.0 for empty
    documents). jusText's headline boilerplate feature: navigation
    bars, footers and link farms score high, body prose scores low."""
    text_len = F.length(html_to_text(_c(col)))
    link_len = F.length(anchor_text(_c(col)))
    return F.when(
        text_len > 0,
        F.least(
            link_len.cast("double") / text_len.cast("double"), F.lit(1.0)
        ),
    ).otherwise(F.lit(0.0))
