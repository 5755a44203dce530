"""URL canonicalization — pure Column exprs, Java-regex/RE2-portable.

The first dedup a web-crawl pipeline runs is URL-level: the same page is
fetched many times under superficially different URLs (host case, default
ports, tracking parameters, fragments, trailing slashes).  Canonicalizing
before content dedup collapses those re-crawls without touching document
bytes at all — at 100 TB this removes whole fetches from every downstream
stage, so it runs first and entirely JVM-side.

Rules applied (the conservative, widely-agreed subset):
- lowercase scheme://host, strip default ports ``:80``/``:443``;
- drop the fragment (never sent to the server);
- drop tracking parameters (``utm_*``, ``fbclid``, ``gclid``, ``ref``),
  sort the survivors (parameter order is not semantic);
- strip trailing slashes from the path.

Every regex sticks to the Java/RE2 common subset (no lookaround, no
backrefs) so the DuckDB oracle twin evaluates the identical patterns.
The query-parameter filter uses array HOFs (CodegenFallback) — acceptable
here because canonicalization is a one-shot projection per corpus, not a
bench hot loop; the regex stages stay whole-stage codegen.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# parameters that never affect the fetched content
TRACKING_PARAM_RE = r"^(utm_[a-z]+|fbclid|gclid|ref)="
_SCHEME_HOST_RE = r"^([A-Za-z][A-Za-z0-9+.-]*://[^/?#]+)"
_PATH_RE = r"^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]+([^?#]*)"
_QUERY_RE = r"\?([^#]*)"


def canonicalize_url(url: Column) -> Column:
    """Canonical form of *url* per the module rules; '' components degrade
    gracefully (a host-only URL canonicalizes to scheme://host)."""
    scheme_host = F.regexp_replace(
        F.lower(F.regexp_extract(url, _SCHEME_HOST_RE, 1)), r":(80|443)$", ""
    )
    path = F.regexp_replace(F.regexp_extract(url, _PATH_RE, 1), r"/+$", "")
    params = F.filter(
        F.split(F.regexp_extract(url, _QUERY_RE, 1), "&"),
        lambda p: (F.length(p) > 0) & ~p.rlike(TRACKING_PARAM_RE),
    )
    qs = F.array_join(F.array_sort(params), "&")
    return F.concat(
        scheme_host,
        path,
        F.when(qs == "", F.lit("")).otherwise(F.concat(F.lit("?"), qs)),
    )


def url_host(url: Column) -> Column:
    """Lowercased host of *url* (port and userinfo stripped); '' when the
    value is not a scheme://host URL."""
    host = F.regexp_extract(url, r"^[A-Za-z][A-Za-z0-9+.-]*://([^/?#]+)", 1)
    host = F.regexp_replace(host, r"^[^@]*@", "")   # userinfo
    host = F.regexp_replace(host, r":[0-9]*$", "")  # port
    return F.lower(host)


def url_path(url: Column) -> Column:
    """Path component of *url*; '/' for host-only URLs."""
    p = F.regexp_extract(url, _PATH_RE, 1)
    return F.when(F.length(p) == 0, F.lit("/")).otherwise(p)


def url_template(url: Column) -> Column:
    """Structural template of *url*: path+query with long hex runs masked
    ``<h>`` (session ids, content hashes; ≥8 hex chars) then digit runs
    masked ``<n>`` — the URL-pattern generalization crawl frontiers use to
    spot template farms (millions of URLs, one page generator).  Hex first:
    a pure-digit run of length ≥8 is an id, not a number, and must not be
    split by the digit rule.  Fragment excluded (never fetched).  Both
    regexes are Java/RE2-portable; replace-ALL on both engines (DuckDB
    needs the 'g' flag — oracle twins carry it)."""
    path_q = F.regexp_extract(
        url, r"^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]+([^#]*)", 1
    )
    return F.regexp_replace(
        F.regexp_replace(path_q, r"[0-9a-f]{8,}", "<h>"), r"[0-9]+", "<n>"
    )


def _char_count(col: Column, ch: str) -> Column:
    """Occurrences of literal char *ch* — the length/replace trick (both
    engines count codepoints, arithmetic identical)."""
    return (
        F.length(col) - F.length(F.replace(col, F.lit(ch), F.lit("")))
    ).cast("bigint")


def url_shape_features(url: Column) -> Column:
    """Struct of integer URL-SHAPE spam features (Fetterly'04 / Ntoulas'06
    frontier heuristics — spam URLs are structurally weird before a byte
    of content is fetched): subdomain depth (host dots), digits and
    hyphens in the host (``cheap-pills-99`` hosts), path depth ('/'
    count), query-parameter count, and percent-escape count.  One codegen
    projection, exact integers, every counter the length/replace or
    global-regexp-strip trick — DuckDB twins carry the 'g' flag.

    Returns struct(subdomain_depth, host_digits, host_hyphens,
    path_depth, n_params, n_pct_escapes).
    """
    host = url_host(url)
    path = url_path(url)
    query = F.regexp_extract(url, _QUERY_RE, 1)
    digits = (
        F.length(host) - F.length(F.regexp_replace(host, r"[0-9]", ""))
    ).cast("bigint")
    n_params = F.when(F.length(query) == 0, F.lit(0).cast("bigint")).otherwise(
        _char_count(query, "&") + 1
    )
    return F.struct(
        _char_count(host, ".").alias("subdomain_depth"),
        digits.alias("host_digits"),
        _char_count(host, "-").alias("host_hyphens"),
        _char_count(path, "/").alias("path_depth"),
        n_params.alias("n_params"),
        _char_count(url, "%").alias("n_pct_escapes"),
    )
