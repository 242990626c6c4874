"""URL normalization and filtering — the crawl-side hygiene pass.

The CCNet/RefinedWeb recipe runs URL-level steps before any content
work: canonicalize (so the exact-dedup fingerprint catches same-page
refetches), extract the host/domain (per-domain caps, blocklists), and
drop junk schemes. Everything here is pure Column expressions —
regexp/lower/split in whole-stage codegen, no Python in the corpus
pass — designed to feed ``operators/dedup`` (fingerprint on the
normalized URL) and ``operators/sample.cap_per_key`` (cap on domain).
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import Column, DataFrame, functions as F
from pyspark.sql.functions import col as _c


def _col(c) -> Column:
    return _c(c) if isinstance(c, str) else c


def normalize_url(url) -> Column:
    """Canonical form for dedup keys: lowercase scheme+host, default
    ports stripped, fragment dropped, tracking params (utm_*, fbclid,
    gclid) removed, trailing ``/`` and empty ``?`` trimmed.

    Scheme-less or malformed URLs (no ``scheme://`` prefix) pass
    through as their trimmed input rather than collapsing to ``''`` —
    otherwise every junk URL would share one dedup fingerprint and
    ``drop_exact_duplicates`` would keep exactly one of them. Run
    ``filter_urls`` first when junk should be dropped instead."""
    raw = F.trim(_col(url))
    head = F.lower(F.regexp_extract(raw, r"^([a-zA-Z][a-zA-Z0-9+.-]*://[^/?#]*)", 1))
    # lowercase scheme://host, keep path case (paths are case-sensitive)
    u = F.concat(
        head,
        F.regexp_extract(raw, r"^[a-zA-Z][a-zA-Z0-9+.-]*://[^/?#]*(.*)$", 1),
    )
    u = F.regexp_replace(u, r"#.*$", "")  # fragment
    # scheme-default ports only, whatever follows (path, query, or end)
    u = F.regexp_replace(u, r"^(http://[^/?#]*):80(?=[/?]|$)", "$1")
    u = F.regexp_replace(u, r"^(https://[^/?#]*):443(?=[/?]|$)", "$1")
    # tracking params, then tidy the separators they leave behind
    u = F.regexp_replace(u, r"([?&])(utm_[a-z]+|fbclid|gclid)=[^&#]*", "$1")
    u = F.regexp_replace(u, r"\?&+", "?")
    u = F.regexp_replace(u, r"&&+", "&")
    u = F.regexp_replace(u, r"[?&]+$", "")
    u = F.regexp_replace(u, r"/\?", "?")  # dir slash before query
    u = F.regexp_replace(u, r"/$", "")
    return F.when(head == "", raw).otherwise(u)


def url_host(url) -> Column:
    """Lowercased host (no port, no credentials)."""
    h = F.lower(F.regexp_extract(_col(url), r"^[a-zA-Z][a-zA-Z0-9+.-]*://([^/?#]*)", 1))
    h = F.regexp_replace(h, r"^.*@", "")  # credentials
    return F.regexp_replace(h, r":\d+$", "")  # port


def url_domain(url) -> Column:
    """Registrable-domain HEURISTIC: last two labels, or last three
    when the TLD looks like a two-level public suffix (co.uk, com.au,
    ...). A real deployment swaps in the Public Suffix List; the
    heuristic keeps this dependency-free and is right for the common
    crawl mass."""
    h = url_host(url)
    parts = F.split(h, r"\.")
    n = F.size(parts)
    two_level = F.element_at(parts, -2).isin(
        "co", "com", "net", "org", "gov", "ac", "edu"
    ) & (F.length(F.element_at(parts, -1)) <= 3)
    last2 = F.concat_ws(".", F.element_at(parts, -2), F.element_at(parts, -1))
    last3 = F.when(
        n >= 3,
        F.concat_ws(
            ".", F.element_at(parts, -3), F.element_at(parts, -2),
            F.element_at(parts, -1),
        ),
    ).otherwise(last2)
    return F.when(n <= 2, h).otherwise(F.when(two_level, last3).otherwise(last2))


def filter_urls(
    df: DataFrame,
    url_col: str,
    blocked_domains: Sequence[str] = (),
    allowed_schemes: Sequence[str] = ("http", "https"),
) -> DataFrame:
    """Drop rows with junk schemes or blocklisted domains.

    The blocklist is an ``isin`` literal when small; hand a DataFrame
    blocklist to ``df.join(block, ..., "left_anti")`` instead when it
    outgrows a broadcast (millions of domains)."""
    scheme = F.lower(F.regexp_extract(_col(url_col), r"^([a-zA-Z][a-zA-Z0-9+.-]*)://", 1))
    out = df.filter(scheme.isin(list(allowed_schemes)))
    if blocked_domains:
        out = out.filter(~url_domain(url_col).isin(list(blocked_domains)))
    return out
