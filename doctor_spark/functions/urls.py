"""URL functions for web-corpus pipelines (Common-Crawl-style tables).

The first stages of every web-text pipeline (CCNet, C4, RefinedWeb,
Dolma) key on the URL: canonicalize → dedup by URL → filter by
domain blocklist → per-domain quotas/stats.  These are pure Column
expressions (JVM codegen, zero Python, zero shuffles per row), so the
URL stage of a 10^12-row table is a map over the scan.

Canonical form produced by :func:`canonicalize_url`:

- scheme and host lowercased
- fragment removed
- default port removed (``http:80``, ``https:443``); other ports kept
- trailing slashes stripped from the path (root path becomes empty)
- tracking query parameters removed (``utm_*``, ``fbclid``, ``gclid``,
  ``ref``), remaining parameters sorted lexicographically

The parser is structural (anchored ``regexp_extract`` + ``split_part``
+ array higher-order functions), NOT global regex rewriting — DuckDB's
``regexp_replace`` is first-match-only while Spark's replaces all, so
the oracle can only be exact if every regex here matches at most once.
Assumes authority-form URLs (``scheme://host[:port][/path][?q][#f]``);
inputs that don't parse yield NULL host/domain and pass through
canonicalization unchanged beyond the structural rules.
"""

from __future__ import annotations

from pyspark.sql import Column, functions as F

# two-label public suffixes recognized by registrable_domain(); a real
# deployment loads the full Mozilla PSL as a broadcast join table — the
# expression form below is the hot-path shape (no join needed for the
# overwhelmingly common suffixes)
SUFFIX_2 = (
    "co.uk", "org.uk", "gov.uk", "ac.uk",
    "com.au", "net.au", "org.au",
    "co.jp", "or.jp", "ne.jp",
    "com.br", "com.cn", "co.in", "co.kr", "com.mx",
)

# tracking parameters dropped by canonicalize_url (the uBlock/URLhaus
# consensus core set)
TRACKING_PARAM_RE = r"^(utm_[A-Za-z0-9_]+|fbclid|gclid|msclkid|ref)="


def _no_fragment(url: Column) -> Column:
    return F.split_part(url, F.lit("#"), F.lit(1))


def url_scheme(url: Column) -> Column:
    """Lowercased scheme, '' when the URL has no ``scheme://``."""
    return F.lower(F.regexp_extract(url, r"^([A-Za-z][A-Za-z0-9+.-]*)://", 1))


def url_host(url: Column) -> Column:
    """Lowercased host (no port, no credentials handling), NULL when the
    URL has no authority."""
    rest = F.regexp_extract(_no_fragment(url), r"^[A-Za-z][A-Za-z0-9+.-]*://([^/?]+)", 1)
    host = F.lower(F.split_part(rest, F.lit(":"), F.lit(1)))
    return F.when(host == "", F.lit(None).cast("string")).otherwise(host)


def url_port(url: Column) -> Column:
    """Explicit port as a string, '' when absent."""
    rest = F.regexp_extract(_no_fragment(url), r"^[A-Za-z][A-Za-z0-9+.-]*://([^/?]+)", 1)
    return F.when(
        rest.contains(":"), F.split_part(rest, F.lit(":"), F.lit(2))
    ).otherwise(F.lit(""))


def url_path(url: Column) -> Column:
    """Path with trailing slashes stripped ('' for the root)."""
    raw = F.regexp_extract(
        _no_fragment(url), r"^[A-Za-z][A-Za-z0-9+.-]*://[^/?]+(/[^?]*)?", 1
    )
    return F.regexp_replace(raw, r"/+$", "")


def url_query_params(url: Column, drop_tracking: bool = True) -> Column:
    """Query parameters as a sorted array, tracking params removed."""
    q = F.regexp_extract(_no_fragment(url), r"\?(.*)$", 1)
    params = F.filter(
        F.split(q, "&"),
        lambda p: (p != "")
        & (~p.rlike(TRACKING_PARAM_RE) if drop_tracking else F.lit(True)),
    )
    return F.array_sort(params)


def canonicalize_url(url: Column) -> Column:
    """Canonical URL per the module contract; NULL-host URLs return the
    fragment-stripped input unchanged (nothing to normalize against)."""
    scheme, host, port = url_scheme(url), url_host(url), url_port(url)
    keep_port = (
        (port != "")
        & ~((scheme == "http") & (port == "80"))
        & ~((scheme == "https") & (port == "443"))
    )
    params = url_query_params(url)
    rebuilt = F.concat(
        scheme,
        F.lit("://"),
        host,
        F.when(keep_port, F.concat(F.lit(":"), port)).otherwise(F.lit("")),
        url_path(url),
        F.when(
            F.size(params) > 0,
            F.concat(F.lit("?"), F.array_join(params, "&")),
        ).otherwise(F.lit("")),
    )
    return F.when(host.isNull(), _no_fragment(url)).otherwise(rebuilt)


def registrable_domain(host: Column) -> Column:
    """eTLD+1 under the SUFFIX_2 table: last two labels, or last three
    when the last two form a known two-label public suffix.  A leading
    ``www.`` label is ignored; single-label hosts return themselves."""
    labels = F.filter(
        F.split(F.coalesce(host, F.lit("")), r"\."), lambda x: x != ""
    )
    labels = F.when(
        (F.size(labels) > 1) & (F.element_at(labels, 1) == "www"),
        F.slice(labels, 2, F.size(labels) - 1),
    ).otherwise(labels)
    n = F.size(labels)
    last2 = F.concat_ws(".", F.element_at(labels, -2), F.element_at(labels, -1))
    last3 = F.concat_ws(
        ".", F.element_at(labels, -3), F.element_at(labels, -2),
        F.element_at(labels, -1),
    )
    dom = (
        F.when(n <= 0, F.lit(None).cast("string"))
        .when(n == 1, F.element_at(labels, 1))
        .when((n >= 3) & last2.isin(*SUFFIX_2), last3)
        .otherwise(last2)
    )
    return F.when(host.isNull(), F.lit(None).cast("string")).otherwise(dom)


# url_path_template segment classes, applied whole-segment in this
# order (first match wins).  Deliberately minimal and spec'd: the
# oracle replays the same classes as RE2 patterns in DuckDB.
_SEG_UUID_RE = (
    r"^[0-9a-f]{8}-[0-9a-f]{4}-[0-9a-f]{4}-[0-9a-f]{4}-[0-9a-f]{12}$"
)
_SEG_HEX_RE = r"^[0-9a-f]{8,}$"
_SEG_NUM_RE = r"^[0-9]+$"


def url_path_template(url: Column) -> Column:
    """Path template: the URL's path with identifier-like segments
    replaced by typed placeholders — the pattern a crawl planner uses
    to discover a site's URL structure (``/article/{n}``,
    ``/img/{hex}``) from a 10^12-row frontier without per-host code.

    Whole-segment rules, first match wins: UUID → ``{uuid}``,
    all-digits → ``{n}``, lowercase hex run of ≥8 (checked after
    digits, so it always contains a letter) → ``{hex}``; everything
    else is kept verbatim.  '' for the root path; NULL-host URLs yield
    NULL.  Pure Column expressions (split / transform / array_join),
    whole-stage codegen — zero Python, zero shuffles."""
    path = url_path(url)
    segs = F.split(path, "/")
    templ = F.array_join(
        F.transform(
            segs,
            lambda s: (
                F.when(s.rlike(_SEG_UUID_RE), F.lit("{uuid}"))
                .when(s.rlike(_SEG_NUM_RE), F.lit("{n}"))
                .when(s.rlike(_SEG_HEX_RE), F.lit("{hex}"))
                .otherwise(s)
            ),
        ),
        "/",
    )
    return F.when(
        url_host(url).isNull(), F.lit(None).cast("string")
    ).otherwise(templ)


# language tokens recognized by url_lang_stem / url_lang: the 27
# lang_guess languages (functions/text.py) plus the web's other
# high-frequency locale path markers.  Whole-segment matching only —
# '/it/' the country section vs 'it' the language is an inherent
# ambiguity of the published heuristic (Resnik & Smith 2003 STRAND;
# ParaCrawl/Bitextor use the same token substitution), documented, not
# special-cased.
URL_LANG_CODES = (
    "en", "de", "fr", "es", "it", "pt", "nl", "sv", "da", "no", "fi",
    "pl", "cs", "ro", "hu", "tr", "id", "vi", "ca", "zh", "ja", "ko",
    "ar", "ru", "el", "he", "th", "hi", "uk", "bg", "sk", "sl", "hr",
    "lt", "lv", "et",
)
_LANG_ALT_RE = r"^[a-z]{2}[-_][a-zA-Z]{2}$"  # en-US, pt_br, zh-CN


def _is_lang_segment(seg: Column) -> Column:
    low = F.lower(seg)
    base = F.substring(low, 1, 2)
    return low.isin(*URL_LANG_CODES) | (
        low.rlike(_LANG_ALT_RE) & base.isin(*URL_LANG_CODES)
    )


def url_lang(url: Column) -> Column:
    """The URL's language marker as a lowercase 2-letter base code —
    the FIRST whole path segment matching :data:`URL_LANG_CODES` (bare
    ``en`` or regioned ``en-US``/``pt_BR``), else the host's first
    label when the host has ≥3 labels (``en.example.org`` yes,
    ``it.com`` no); NULL when the URL carries no marker.  Pure Column
    expressions — zero Python, zero shuffles."""
    segs = F.filter(F.split(url_path(url), "/"), lambda s: s != "")
    path_hit = F.try_element_at(F.filter(segs, _is_lang_segment), F.lit(1))
    labels = F.split(url_host(url), r"\.")
    first = F.try_element_at(labels, F.lit(1))
    host_hit = F.when(
        (F.size(labels) >= 3) & _is_lang_segment(first), first
    )
    hit = F.coalesce(path_hit, host_hit)
    return F.substring(F.lower(hit), 1, 2)


def url_lang_stem(url: Column) -> Column:
    """Language-neutral URL stem — the STRAND/ParaCrawl URL-matching
    heuristic's join key: every language-marker path segment and a
    marker first host label replaced by ``{lang}``, query dropped::

        https://example.org/en-US/doc/9 -> https://example.org/{lang}/doc/9
        https://fr.example.org/doc/9    -> https://{lang}.example.org/doc/9

    Two pages with the SAME stem and DIFFERENT :func:`url_lang` codes
    are a candidate parallel pair — no content needed, so the heuristic
    runs on the 10^12-row frontier itself.  NULL for URLs with no host
    or no language marker (a stem that never contained a marker can
    only self-pair).  Pure Column expressions."""
    host = url_host(url)
    labels = F.split(host, r"\.")
    stem_host = F.when(
        (F.size(labels) >= 3) & _is_lang_segment(F.element_at(labels, 1)),
        F.concat(
            F.lit("{lang}"),
            F.substr(
                host,
                F.length(F.split_part(host, F.lit("."), F.lit(1))) + 1,
            ),
        ),
    ).otherwise(host)
    segs = F.split(url_path(url), "/")
    stem_path = F.array_join(
        F.transform(
            segs,
            lambda s: F.when(_is_lang_segment(s), F.lit("{lang}")).otherwise(s),
        ),
        "/",
    )
    stem = F.concat(url_scheme(url), F.lit("://"), stem_host, stem_path)
    return F.when(
        host.isNull() | url_lang(url).isNull(),
        F.lit(None).cast("string"),
    ).otherwise(stem)


def surt_key(url: Column) -> Column:
    """SURT-form index key (Sort-friendly URI Reordering Transform —
    the key of Common Crawl's CDX URL index and of every wayback-style
    deduplicating crawler): host labels reversed and comma-joined
    (leading ``www.`` dropped), ``)``, then the lowercased canonical
    path and the lowercased sorted non-tracking query::

        https://WWW.Example.co.uk:443/Articles/9/?id=9&utm_s=x
          -> uk,co,example)/articles/9?id=9

    Reversing the host makes a plain lexicographic sort cluster every
    page of a registrable domain (and every subdomain under it)
    contiguously — the property that lets a 10^12-row index answer
    prefix queries from sorted parquet row groups without a secondary
    index.  Pure Column expressions; NULL-host URLs yield NULL."""
    host = url_host(url)
    labels = F.filter(F.split(host, r"\."), lambda x: x != "")
    labels = F.when(
        (F.size(labels) > 1) & (F.element_at(labels, 1) == "www"),
        F.slice(labels, 2, F.size(labels) - 1),
    ).otherwise(labels)
    params = url_query_params(url)
    key = F.concat(
        F.array_join(F.reverse(labels), ","),
        F.lit(")"),
        F.lower(url_path(url)),
        F.when(
            F.size(params) > 0,
            F.concat(F.lit("?"), F.lower(F.array_join(params, "&"))),
        ).otherwise(F.lit("")),
    )
    return F.when(host.isNull(), F.lit(None).cast("string")).otherwise(key)
