"""URL canonicalization — the normalization step in front of URL-level
corpus dedup (the one common pretraining op the registry lacked until
r8; see ``plans/text_queries.py::url_dedup``).

All pure ``pyspark.sql.functions`` column expressions — JVM-side,
whole-stage-codegen, zero Python in the hot path — so canonicalization
is a scan-local projection at any corpus size.  The rules are the
standard crawl-dedup set (RFC 3986 syntax-based normalization plus the
tracking-parameter strip every crawl pipeline applies):

- scheme and host lowercased (case-insensitive per RFC 3986 §6.2.2.1);
  userinfo (``user:pass@``) is case-SIGNIFICANT per §3.2.1 and is
  preserved verbatim — lowercasing it would merge distinct URLs;
- the scheme's OWN default port (``:80`` on http, ``:443`` on https)
  and a leading ``www.`` dropped;
- the fragment dropped (never sent to the server);
- tracking query parameters (``utm_*``, ``fbclid``, ``gclid``,
  ``ref``) removed, OTHER parameters preserved in order;
- trailing path slashes dropped.

Path and kept-parameter case/order are intentionally preserved — they
are semantically significant, and over-normalizing merges distinct
pages (precision loss is worse than recall loss for dedup survivors).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# Query parameters that never change page identity.  Kept as a single
# alternation so the Spark expression and the DuckDB oracle share one
# literal (plans/text_queries.py interpolates this constant into both).
TRACKING_PARAMS = "utm_[a-z0-9_]+|fbclid|gclid|ref"

_SCHEME = r"^([A-Za-z][A-Za-z0-9+.-]*)://"
_HOSTPORT = r"^[A-Za-z][A-Za-z0-9+.-]*://([^/?#]+)"
_REST = r"^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]+(.*)$"


def canonicalize_url(url: Column) -> Column:
    """Canonical form of an absolute ``scheme://host...`` URL column.

    Every regex below is RE2-compatible (no backtracking constructs,
    no replacement backreferences, no lookaround) so the DuckDB oracle
    can apply the IDENTICAL patterns — cross-engine parity is part of
    the contract.  Two deliberate contract bounds, both on the
    precision-safe side:

    - a string that does not parse as ``scheme://host...`` (relative
      path, empty host, ``mailto:``) is returned UNCHANGED — a
      pass-through keeps malformed URLs distinct, where normalizing
      them would collapse every unparseable row onto one degenerate
      key and dedup would merge unrelated documents;
    - only ``k=v``-form tracking params are stripped; a bare valueless
      ``?utm_source`` is preserved (stripping it without eating a
      following real param's separator needs lookahead, which RE2
      lacks — a recall miss, never a wrong merge).
    """
    scheme = F.lower(F.regexp_extract(url, _SCHEME, 1))
    authority = F.regexp_extract(url, _HOSTPORT, 1)
    # Userinfo is CASE-SIGNIFICANT (RFC 3986 §3.2.1 — only scheme and
    # host are case-insensitive), so split it off BEFORE lowercasing:
    # the host starts after the LAST '@', which the greedy `^.*@`
    # matches without lookaround (RE2-safe, mirrored in the oracle).
    userinfo = F.regexp_extract(authority, r"^(.*@)", 1)
    hostport = F.lower(F.regexp_replace(authority, r"^.*@", ""))
    # Default-port strip is SCHEME-AWARE: :443 is only a default on
    # https and :80 only on http — http://h:443 and http://h are
    # different resources and must not merge.
    no_port = (
        F.when(
            scheme == F.lit("https"), F.regexp_replace(hostport, r":443$", "")
        )
        .when(scheme == F.lit("http"), F.regexp_replace(hostport, r":80$", ""))
        .otherwise(hostport)
    )
    host = F.regexp_replace(no_port, r"^www\.", "")
    rest = F.regexp_extract(url, _REST, 1)
    path = F.regexp_replace(F.regexp_extract(rest, r"^[^?#]*", 0), r"/+$", "")
    # Query extraction is ANCHORED through the path (`^[^?#]*\?`) so a
    # '?' living inside the fragment ('#x?y') can never be mistaken
    # for a query start — an unanchored `\?` match would resurrect
    # fragment text as query params.  Tracking-param removal: each
    # match consumes its LEADING separator ('?' was already cut by
    # the extract), so survivors keep their own separators and only a
    # leading '&' orphan needs trimming.
    query = F.regexp_replace(
        F.regexp_extract(rest, r"^[^?#]*\?([^#]*)", 1),
        f"(^|&)({TRACKING_PARAMS})=[^&]*",
        "",
    )
    query = F.regexp_replace(query, r"^&+", "")
    canonical = F.concat(
        scheme,
        F.lit("://"),
        userinfo,
        host,
        path,
        F.when(query != F.lit(""), F.concat(F.lit("?"), query)).otherwise(
            F.lit("")
        ),
    )
    # Unparseable input → pass-through (see docstring): an empty
    # scheme or host extract means the URL never matched the
    # scheme://host grammar.
    return F.when(
        (scheme == F.lit("")) | (host == F.lit("")), url
    ).otherwise(canonical)
