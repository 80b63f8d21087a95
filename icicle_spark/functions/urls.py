"""URL canonicalization + filtering for web-corpus curation — all
JVM-side Column expressions (regexp chains in whole-stage codegen, no
Python, no shuffle), the RefinedWeb/CCNet-style *first* pipeline stage
that runs before any content-based dedup or quality scoring.

Engine extensions (not in the reference — SURVEY.md §2.12); the
canonical form is defined HERE, deterministically, so DuckDB oracles
can replay it exactly:

1. strip the fragment (``#...``),
2. lowercase the ``scheme://authority`` prefix (path/query case kept),
3. drop the default port (``:80`` for http, ``:443`` for https),
4. drop a leading ``www.`` host label,
5. remove tracking query params (``utm_*``, ``gclid``, ``fbclid``,
   ``ref``) and collapse the leftover ``?``/``&`` separators,
6. strip trailing slashes from the path tail.

At 100 TB this whole stage is a narrow map over the scan — the
blocklist rides as an ``isin`` literal (or a broadcast join for big
lists via ``url_filter(blocked=df)``), and dedup-by-canonical-URL is
the same one-hash groupBy as exact content dedup.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

# scheme://authority (no path/query/fragment chars)
_PREFIX_RE = r"^([A-Za-z][A-Za-z0-9+.-]*://[^/?#]*)"
_TRACKING_RE = r"([?&])(utm_[a-z]+|gclid|fbclid|ref)=[^&#]*"


def canonicalize_url(url: Column) -> Column:
    """Canonical form of ``url`` per the module contract above.

    Pure Column expression; inputs without a ``scheme://`` prefix pass
    through steps 1/5/6 only (the prefix rewrites match nothing).
    """
    u = F.regexp_replace(url, r"#.*$", "")  # 1. fragment
    prefix = F.lower(F.regexp_extract(u, _PREFIX_RE, 1))
    rest = F.regexp_replace(u, _PREFIX_RE, "")
    # 3. default ports (scheme-matched, not blanket)
    prefix = F.regexp_replace(prefix, r"^(http://[^:]*):80$", r"$1")
    prefix = F.regexp_replace(prefix, r"^(https://[^:]*):443$", r"$1")
    # 4. leading www.
    prefix = F.regexp_replace(prefix, r"://www\.", "://")
    # 5. tracking params, then separator cleanup: "?&"->"?", "&&"->"&",
    #    trailing "?"/"&" dropped
    rest = F.regexp_replace(rest, _TRACKING_RE, r"$1")
    rest = F.regexp_replace(rest, r"\?&+", "?")
    rest = F.regexp_replace(rest, r"&&+", "&")
    rest = F.regexp_replace(rest, r"[?&]+$", "")
    # 6. trailing path slashes (only when no query survived)
    rest = F.regexp_replace(rest, r"/+$", "")
    return F.concat(prefix, rest)


def url_host(url: Column) -> Column:
    """Lowercased host (authority minus userinfo/port, minus ``www.``)."""
    host = F.lower(
        F.regexp_extract(url, r"^[A-Za-z][A-Za-z0-9+.-]*://([^/?#]*)", 1)
    )
    host = F.regexp_replace(host, r"^[^@]*@", "")
    host = F.regexp_replace(host, r":[0-9]*$", "")
    return F.regexp_replace(host, r"^www\.", "")


def registered_domain(host: Column) -> Column:
    """Last two labels of the host (``a.b.example.com`` ->
    ``example.com``) — the blocklist granularity. Single-label hosts
    pass through unchanged."""
    two = F.regexp_extract(host, r"([^.]+\.[^.]+)$", 1)
    return F.when(two != "", two).otherwise(host)


def url_filter(
    df: DataFrame,
    url_col: str = "url",
    blocked_domains: list[str] | DataFrame | None = None,
    blocked_patterns: list[str] | None = None,
    max_len: int = 2048,
) -> DataFrame:
    """Canonicalize + policy-gate URLs; adds ``canonical_url``,
    ``domain``, ``kept``, ``reason`` (first failing rule, in the fixed
    order blocked_domain -> blocked_pattern -> too_long — the same
    first-failing-reason shape as ``quality_filter``).

    ``blocked_domains`` may be a small list (compiled to an ``isin``
    literal — zero shuffle) or a DataFrame with a ``domain`` column
    (broadcast left-semi shape via a broadcast join + null check, for
    blocklists too big to inline).
    """
    canon = canonicalize_url(F.col(url_col))
    domain = registered_domain(url_host(F.col(url_col)))
    out = df.withColumn("canonical_url", canon).withColumn("domain", domain)

    if isinstance(blocked_domains, DataFrame):
        bl = blocked_domains.select(
            F.col("domain").alias("__bl_domain"), F.lit(True).alias("__blocked")
        )
        out = out.join(
            F.broadcast(bl), out["domain"] == bl["__bl_domain"], "left"
        ).drop("__bl_domain")
        is_blocked_domain = F.coalesce(F.col("__blocked"), F.lit(False))
    elif blocked_domains:
        is_blocked_domain = F.col("domain").isin(*blocked_domains)
    else:
        is_blocked_domain = F.lit(False)

    if blocked_patterns:
        pat = "|".join(f"(?:{p})" for p in blocked_patterns)
        is_blocked_pattern = F.col("canonical_url").rlike(pat)
    else:
        is_blocked_pattern = F.lit(False)

    reason = (
        F.when(is_blocked_domain, F.lit("blocked_domain"))
        .when(is_blocked_pattern, F.lit("blocked_pattern"))
        .when(F.length(F.col(url_col)) > max_len, F.lit("too_long"))
    )
    out = out.withColumn("reason", reason).withColumn(
        "kept", F.col("reason").isNull()
    )
    return out.drop("__blocked") if "__blocked" in out.columns else out
