"""URL canonicalization + domain extraction: the normalization pass a
web-corpus pipeline runs before URL-level dedup and per-domain
balancing (``operators/splits.py::cap_per_group`` groups on exactly
the domain column this module produces).

Everything is regex-group column arithmetic (no UDF). A URL splits on
ONE RE2-safe pattern into (authority, path, ?query, #fragment);
normalization then:

- lowercases scheme + host (the case-insensitive parts per RFC 3986;
  path/query case is significant and preserved),
- strips the default port (:80 for http, :443 for https),
- drops the fragment (never sent to the server),
- drops tracking parameters (utm_*, fbclid, gclid, msclkid) and the
  dangling '?' when nothing survives.

``url_domain`` approximates the registrable domain as the last two
host labels -- a cheap single-expression key for synthetic hosts. For
real web corpora use ``functions/psl.py::with_registrable_domain``:
the full publicsuffix.org algorithm (wildcards, exceptions,
multi-label rules) as broadcast longest-suffix-match joins, which
groups ``*.co.uk`` / ``*.com.au`` hosts correctly where the
two-label rule collapses them onto the public suffix.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def _c(col: Column | str) -> Column:
    return F.col(col) if isinstance(col, str) else col


_URL_SPLIT = r"^([A-Za-z][A-Za-z0-9+.\-]*://[^/?#]*)([^?#]*)(\?[^#]*)?(#.*)?$"
_TRACKING_PAT = r"^(utm_[A-Za-z0-9_]*|fbclid|gclid|msclkid)="


def _authority(col: Column | str) -> Column:
    return F.regexp_extract(_c(col), _URL_SPLIT, 1)


def url_host(col: Column | str) -> Column:
    """Lowercased host (no scheme, port, or userinfo); '' if the value
    does not parse as an absolute URL."""
    auth = F.lower(_authority(col))
    no_user = F.regexp_replace(auth, r"^[a-z][a-z0-9+.\-]*://([^@]*@)?", "")
    return F.regexp_extract(no_user, r"^([^:]*)", 1)


def url_domain(col: Column | str) -> Column:
    """Registrable-domain approximation: the last two host labels.
    For PSL fidelity (co.uk, exceptions, wildcards) use
    ``functions/psl.py::with_registrable_domain`` -- this stays the
    cheap pure-Column variant."""
    host = url_host(col)
    two = F.regexp_extract(host, r"([^.]+\.[^.]+)$", 1)
    return F.when(two != "", two).otherwise(host)


def _clean_query(col: Column | str) -> Column:
    """The query string with tracking params removed: '' or '?k=v&...'."""
    raw = F.regexp_extract(_c(col), _URL_SPLIT, 3)  # includes the '?'
    qs = F.substring(raw, 2, 1 << 30)
    kept = F.filter(
        F.split(qs, "&"),
        lambda p: (p != "") & ~p.rlike(_TRACKING_PAT),
    )
    joined = F.array_join(kept, "&")
    return F.when(
        (raw == "") | (joined == ""), F.lit("")
    ).otherwise(F.concat(F.lit("?"), joined))


def normalize_url(col: Column | str) -> Column:
    """Canonical form: lowercased scheme+authority, default port
    stripped, fragment dropped, tracking params removed."""
    auth = F.lower(_authority(col))
    auth = F.regexp_replace(auth, r"^(http://[^/?#]*):80$", "$1")
    auth = F.regexp_replace(auth, r"^(https://[^/?#]*):443$", "$1")
    path = F.regexp_extract(_c(col), _URL_SPLIT, 2)
    return F.concat(auth, path, _clean_query(col))


def url_query_param_count(col: Column | str) -> Column:
    """Number of query parameters SURVIVING normalization (tracking
    params excluded) -- a spam/quality signal alongside link_density."""
    q = _clean_query(col)
    return F.when(q == "", F.lit(0)).otherwise(
        F.size(F.split(F.substring(q, 2, 1 << 30), "&"))
    ).cast("int")
