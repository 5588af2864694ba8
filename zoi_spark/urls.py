"""URL canonicalization + URL-level dedup for web corpora.

Common-Crawl-style pipelines dedup on the CANONICAL url before any
content pass: scheme/host case, default ports, fragments and tracking
parameters produce byte-different urls for the same resource, and at
10^12 documents the cheapest dedup win is collapsing those before
content fingerprints are even computed (one string projection + one
hash shuffle, vs a text-hash pass over every byte).

Everything here is pure ``pyspark.sql.functions`` (JVM-side, RE2-safe
regexes) so the DuckDB oracle can recompute canonical forms exactly.

Canonicalization steps (the conservative, semantics-preserving subset):

1. lowercase scheme and host (path/query case is preserved — it is
   significant on most origin servers);
2. strip the fragment (``#…`` — never sent to the server);
3. drop default ports (``:80`` for http, ``:443`` for https);
4. drop tracking query parameters (``utm_*``, ``fbclid``, ``gclid``,
   ``msclkid``, ``ref``) and a then-empty ``?``;
5. collapse a bare trailing ``/`` on an empty path.

Reference seed: Zoi's ``url/1`` validates scheme+host
(lib/zoi/types/string.ex:121-131); canonicalization is the table-level
counterpart the 100 TB engine needs (SURVEY §2.6 charter).
"""

from __future__ import annotations

import re

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

# tracking parameters dropped during canonicalization (public lists:
# UTM family + the big ad-click ids)
TRACKING_PARAM_RE = r"(utm_[a-z]+|fbclid|gclid|msclkid|ref)=[^&#]*"


def canonical_url(url: Column) -> Column:
    """Canonical form of an absolute http(s) url — pure expressions,
    identical in Spark and DuckDB regex dialects (no lookahead)."""
    # 1. lowercase scheme://host[:port] (text up to the first '/', '?'
    #    or '#' after the scheme) — path/query case preserved. Rebuilt
    #    with concat+substr, NOT regexp_replace with a dynamic
    #    replacement: Spark interprets '$'/'\' in replacement strings,
    #    and '$' is legal in URL authorities (RFC 3986 sub-delims), so
    #    'http://a$bad.com/x' would abort the job with an
    #    illegal-group-reference error and '$1' would silently corrupt
    #    the canonical form.
    head = F.regexp_extract(url, r"^([a-zA-Z][a-zA-Z0-9+.-]*://[^/?#]*)", 1)
    u = F.when(head == "", url).otherwise(
        F.concat(F.lower(head),
                 url.substr(F.length(head) + F.lit(1), F.length(url))))
    # 2. strip fragment
    u = F.regexp_replace(u, r"#.*$", "")
    # 3. default ports
    u = F.regexp_replace(u, r"^(http://[^/:?#]+):80(/|\?|$)", r"$1$2")
    u = F.regexp_replace(u, r"^(https://[^/:?#]+):443(/|\?|$)", r"$1$2")
    # 4. tracking params (mid-query then leading), then dangling ?/&
    u = F.regexp_replace(u, r"&" + TRACKING_PARAM_RE, "")
    u = F.regexp_replace(u, r"\?" + TRACKING_PARAM_RE + r"&", "?")
    u = F.regexp_replace(u, r"\?" + TRACKING_PARAM_RE + r"$", "")
    u = F.regexp_replace(u, r"\?$", "")
    # 5. bare trailing slash on an empty path: https://h/ -> https://h
    u = F.regexp_replace(u, r"^([a-z][a-z0-9+.-]*://[^/?#]+)/$", r"$1")
    return u


def canonical_url_sql(col: str = "url") -> str:
    """The DuckDB twin of :func:`canonical_url` — same steps, same
    regexes (RE2), for oracle parity."""
    t = TRACKING_PARAM_RE
    # same literal-safe concat+substr rebuild as the Spark side; the
    # IS NULL guard matters because DuckDB's concat treats NULL
    # operands as '' while Spark's returns NULL
    h = f"regexp_extract({col}, '^([a-zA-Z][a-zA-Z0-9+.-]*://[^/?#]*)', 1)"
    u = (f"(CASE WHEN {col} IS NULL THEN NULL WHEN {h} = '' THEN {col} "
         f"ELSE concat(lower({h}), substr({col}, length({h}) + 1)) END)")
    u = f"regexp_replace({u}, '#.*$', '')"
    u = f"regexp_replace({u}, '^(http://[^/:?#]+):80(/|\\?|$)', '\\1\\2')"
    u = f"regexp_replace({u}, '^(https://[^/:?#]+):443(/|\\?|$)', '\\1\\2')"
    u = f"regexp_replace({u}, '&{t}', '')"
    u = f"regexp_replace({u}, '\\?{t}&', '?')"
    u = f"regexp_replace({u}, '\\?{t}$', '')"
    u = f"regexp_replace({u}, '\\?$', '')"
    u = f"regexp_replace({u}, '^([a-z][a-z0-9+.-]*://[^/?#]+)/$', '\\1')"
    return u


def resolve_href(href: Column, base: Column) -> Column:
    """Absolutize an href against its page url — the RFC 3986 subset
    pure expressions can carry: absolute urls pass through,
    scheme-relative ``//h/p`` takes the page scheme, root-relative
    ``/p`` takes the page origin, query/fragment-only ``?q``/``#f``
    append to the page path, and anything else resolves against the
    page's directory (no ``..`` normalization — a deliberate
    conservative miss, <0.1% of web hrefs). DuckDB twin:
    :func:`resolve_href_sql`."""
    scheme = F.lower(F.regexp_extract(
        base, r"^([a-zA-Z][a-zA-Z0-9+.-]*)://", 1))
    origin = F.regexp_extract(
        base, r"^([a-zA-Z][a-zA-Z0-9+.-]*://[^/?#]*)", 1)
    # page directory: everything up to the LAST '/' before any ?#;
    # the greedy match on a path-less url ('http://h') stops inside
    # '//', so guard on length > origin and fall back to origin+'/'
    dirbase = F.regexp_extract(base, r"^([^?#]*/)", 1)
    dir_ = F.when(F.length(dirbase) > F.length(origin), dirbase) \
            .otherwise(F.concat(origin, F.lit("/")))
    path = F.regexp_extract(base, r"^([^?#]*)", 1)
    return (F.when(href.rlike(r"^[a-zA-Z][a-zA-Z0-9+.-]*://"), href)
            .when(href.startswith("//"),
                  F.concat(scheme, F.lit(":"), href))
            .when(href.startswith("/"), F.concat(origin, href))
            .when(href.startswith("?") | href.startswith("#"),
                  F.concat(path, href))
            .otherwise(F.concat(dir_, href)))


def resolve_href_sql(href: str, base: str) -> str:
    """The DuckDB twin of :func:`resolve_href` — same branches, same
    regexes, for oracle parity."""
    scheme = (f"lower(regexp_extract({base}, "
              f"'^([a-zA-Z][a-zA-Z0-9+.-]*)://', 1))")
    origin = (f"regexp_extract({base}, "
              f"'^([a-zA-Z][a-zA-Z0-9+.-]*://[^/?#]*)', 1)")
    dirbase = f"regexp_extract({base}, '^([^?#]*/)', 1)"
    dir_ = (f"(CASE WHEN length({dirbase}) > length({origin}) "
            f"THEN {dirbase} ELSE {origin} || '/' END)")
    path = f"regexp_extract({base}, '^([^?#]*)', 1)"
    return (f"(CASE "
            f"WHEN regexp_matches({href}, "
            f"'^[a-zA-Z][a-zA-Z0-9+.-]*://') THEN {href} "
            f"WHEN {href} LIKE '//%' THEN {scheme} || ':' || {href} "
            f"WHEN {href} LIKE '/%' THEN {origin} || {href} "
            f"WHEN {href} LIKE '?%' OR {href} LIKE '#%' "
            f"THEN {path} || {href} "
            f"ELSE {dir_} || {href} END)")


def url_host(url: Column) -> Column:
    """Lowercased host (port stripped) — the partition/skew key for
    host-level operations (hot hosts are THE skew source in web
    corpora; see tablechecks.suggest_salt)."""
    return F.lower(F.regexp_extract(url, r"^[a-zA-Z][a-zA-Z0-9+.-]*://([^/:?#]+)", 1))


def url_dedup_groups(df: DataFrame, *, url_col: str = "url",
                     id_col: str = "doc_id") -> DataFrame:
    """Groups of rows sharing a canonical url: ``(curl, n_docs,
    keep_id)`` for groups with >1 member — one projection + one hash
    aggregation with map-side combine (the cheapest dedup pass; run it
    BEFORE content fingerprints at scale)."""
    return (df.select(canonical_url(F.col(url_col)).alias("curl"),
                      F.col(id_col))
            .where(F.col("curl").isNotNull() & (F.col("curl") != ""))
            .groupBy("curl")
            .agg(F.count("*").alias("n_docs"),
                 F.min(id_col).alias("keep_id"))
            .where(F.col("n_docs") > 1))


def url_dedup(df: DataFrame, *, url_col: str = "url",
              id_col: str = "doc_id") -> DataFrame:
    """Keep the min-id representative per canonical url (window over
    the canonical form — one shuffle, no join; same shape as
    dedup.exact_dedup).

    Rows with a NULL/empty url are EXEMPT (all kept): a null key is
    not "the same resource" — without the guard the window would
    collapse every url-less row into one partition and keep a single
    survivor (same hazard url_dedup_groups filters against).

    Exempt rows are split out BEFORE the window and unioned back, so
    they never land in the single NULL/'' window partition — at web
    scale url-less rows are common enough that routing them through
    one task is a straggler. Costs a second (filter-pushed) scan of
    the source instead."""
    curl = canonical_url(F.col(url_col))
    w = Window.partitionBy(curl).orderBy(F.col(id_col))
    exempt = F.col(url_col).isNull() | (curl == "")
    kept = (df.where(~exempt)
            .withColumn("__rn", F.row_number().over(w))
            .where(F.col("__rn") == 1).drop("__rn"))
    return kept.unionByName(df.where(exempt))


# demo blocklist for url_quality_flags — real deployments load a
# curated domain/word list (UT1-style); the operator takes it as a
# parameter so the list is data, not code
URL_BLOCKLIST = ("casino", "xxx", "viagra", "lottery")


def url_quality_flags(df: DataFrame, *, url_col: str = "url",
                      max_len: int = 300, max_depth: int = 12,
                      max_params: int = 10,
                      max_host_digit_ratio: float = 1 / 3,
                      blocklist: tuple[str, ...] = URL_BLOCKLIST
                      ) -> DataFrame:
    """FineWeb/RefinedWeb-style URL intake filtering: one boolean per
    rule (true = passes), plus the conjunction ``url_pass`` — run
    BEFORE fetching/validating content, since a rejected url costs one
    string projection instead of a text pass.

    Rules: well-formed absolute http(s) url; host is not an IPv4
    literal; no blocklist token anywhere in the lowercased url; host
    is not digit-heavy (DGA/spam hosts); path depth and query
    parameter count bounded (crawler traps); total length bounded.
    Pure regex/length expressions — fused into the scan, zero shuffle,
    and every regex is RE2-compatible for the DuckDB oracle.
    """
    u = F.coalesce(F.col(url_col), F.lit(""))
    low = F.lower(u)
    host = url_host(u)
    hd = F.length(host) - F.length(F.regexp_replace(host, "[0-9]", ""))
    path = F.regexp_extract(u, r"^[a-zA-Z][a-zA-Z0-9+.-]*://[^/?#]*([^?#]*)", 1)
    depth = F.length(path) - F.length(F.regexp_replace(path, "/", ""))
    nparams = F.when(
        u.rlike(r"\?"),
        F.length(F.regexp_replace(u, r"[^&]", "")) + 1).otherwise(F.lit(0))

    # blocklist tokens are LITERALS, not regexes (re.escape); an empty
    # blocklist disables the rule instead of matching everything (the
    # bare alternation "()" would match every url)
    if blocklist:
        block_pat = "(" + "|".join(re.escape(b) for b in blocklist) + ")"
        not_blocked = ~low.rlike(block_pat)
    else:
        not_blocked = F.lit(True)
    flags = {
        # scheme case is insignificant (RFC 3986; canonical_url
        # lowercases it) — match it case-insensitively here too
        "u_valid": u.rlike(r"(?i)^https?://[^/:?#]+"),
        "u_not_ip": ~host.rlike(r"^[0-9]+\.[0-9]+\.[0-9]+\.[0-9]+$"),
        "u_not_blocked": not_blocked,
        "u_host_digits": (F.length(host) > 0)
                         & (hd / F.length(host) <= max_host_digit_ratio),
        "u_depth": depth <= max_depth,
        "u_params": nparams <= max_params,
        "u_length": F.length(u) <= max_len,
    }
    out = df
    for name, flag in flags.items():
        out = out.withColumn(name, flag)
    url_pass = None
    for name in flags:
        c = F.col(name)
        url_pass = c if url_pass is None else url_pass & c
    return out.withColumn("url_pass", url_pass)


def url_dedup_latest(df: DataFrame, *, url_col: str = "url",
                     ts_col: str, id_col: str = "doc_id") -> DataFrame:
    """Keep the LATEST crawl per canonical url (ties → min id) — the
    recrawl-handling variant of :func:`url_dedup`: Common-Crawl-style
    corpora carry the same resource across snapshots, and training
    pipelines usually want the freshest fetch, not the first-seen id.
    Same shape as url_dedup: one string projection + one window over
    the canonical form, one shuffle, no join. Rows with a NULL/empty
    url are exempt (all kept) and split out before the window — same
    guard, rationale and skew note as url_dedup.
    """
    curl = canonical_url(F.col(url_col))
    w = (Window.partitionBy(curl)
         .orderBy(F.col(ts_col).desc(), F.col(id_col).asc()))
    exempt = F.col(url_col).isNull() | (curl == "")
    kept = (df.where(~exempt)
            .withColumn("__rn", F.row_number().over(w))
            .where(F.col("__rn") == 1).drop("__rn"))
    return kept.unionByName(df.where(exempt))


def host_reputation(df: DataFrame, *, host_col: str = "host",
                    quality_col: str = "quality",
                    min_docs: int = 5,
                    min_avg_quality: float = 0.5) -> DataFrame:
    """Host-level reputation aggregation — the FineWeb-style complement
    to per-URL filtering: a host whose DOCUMENTS are consistently junk
    is blocked wholesale, which catches spam farms whose individual
    URLs look clean. Feed any per-document quality signal (heuristic
    ``text.quality_score``, the linear classifier, a dup-rate flag).

    Emits per-host ``(n_docs, avg_quality, min_quality, max_quality,
    host_flagged)``; ``host_flagged`` only fires once the host has
    ``min_docs`` documents — low-traffic hosts get the benefit of the
    doubt rather than a verdict from one bad page. The flagged set is
    the host blocklist: broadcast it back against the corpus
    (anti-join on the host key) or persist it as the next crawl's
    deny list.

    Plan shape at 10^12 docs: ONE hash aggregation on the host key
    (map-side partial absorbs the Zipf head); output cardinality is
    the host count (~10^8), orders of magnitude below the corpus.
    For pathological single-host skew the same salting
    `tablechecks.suggest_salt` sizes for uniqueness applies.
    """
    return (df.groupBy(host_col)
            .agg(F.count("*").alias("n_docs"),
                 F.round(F.avg(quality_col), 6).alias("avg_quality"),
                 F.min(quality_col).alias("min_quality"),
                 F.max(quality_col).alias("max_quality"))
            .withColumn("host_flagged",
                        (F.col("n_docs") >= min_docs)
                        & (F.col("avg_quality") < min_avg_quality)))


def domain_blocklist_flags(df: DataFrame, blocked: list[str], *,
                           url_col: str = "url") -> DataFrame:
    """Registrable-domain blocklist matching — the UT1-blacklist /
    adult-domain filter every public web-corpus pipeline starts with
    (CCNet, C4 and RefinedWeb all gate on a curated domain list before
    any content heuristic runs). Host h matches entry d iff
    ``h == d`` or ``h`` ends with ``'.' + d`` — subdomains inherit the
    verdict (``ads.tracker.example`` is blocked by ``tracker.example``)
    but sibling look-alikes do NOT (``nottracker.example`` is clean).
    Matching is case-insensitive; entries are normalized to lowercase.

    Adds ``host``, ``blocked_domain`` (the DEEPEST matching entry —
    longest, ties broken by lexicographically greatest — NULL when
    clean: the most specific rule is the one an auditor wants to see)
    and ``blocked``.

    Scale: a curated blocklist is 10^2–10^6 literals — corpus-
    independent, so it compiles into the plan as an array literal and
    the whole operator is ONE projection (no join, no shuffle; the
    in-plan sort runs over the tiny literal array per row). Lists
    beyond literal-plan comfort (~10^5) belong in a broadcast join on
    an exploded host-suffix key instead; this operator deliberately
    targets the curated-list regime.
    """
    if not blocked:
        raise ValueError("domain_blocklist_flags: blocked list is empty")
    entries = sorted({d.strip().lower() for d in blocked if d.strip()})
    # materialize host FIRST: an expression referenced inside a
    # higher-order-function lambda is re-evaluated PER ELEMENT, so
    # embedding the regexp_extract here would run it once per
    # blocklist entry per row
    df = df.withColumn("host", url_host(F.col(url_col)))
    host = F.col("host")
    arr = F.array(*[F.lit(d) for d in entries])
    matches = F.filter(
        arr, lambda d: (host == d)
        | host.endswith(F.concat(F.lit("."), d)))
    # F.get is NULL-safe on the empty (clean-host) array where ANSI
    # mode makes element_at throw INVALID_ARRAY_INDEX
    deepest = F.get(
        F.reverse(F.array_sort(
            F.transform(matches,
                        lambda d: F.struct(F.length(d).alias("l"),
                                           d.alias("d"))))),
        0)["d"]
    return (df.withColumn("blocked_domain", deepest)
            .withColumn("blocked", F.col("blocked_domain").isNotNull()))


def path_templates(df: DataFrame, *, url_col: str = "url",
                   min_urls: int = 100) -> DataFrame:
    """Crawler-trap template mining: collapse every digit run in the
    URL path to ``{N}`` and count distinct urls per (host, template) —
    calendar pages, session ids and paginated facets all share one
    template with an unbounded url population, which is how trap
    detection actually works in crawl pipelines (a static depth/param
    rule like url_quality_flags catches the shape, this catches the
    VOLUME). Emits ``host``, ``path_template``, ``n_urls`` and
    ``trap`` (n_urls ≥ *min_urls*).

    Shape at 10^12 rows: one projection (two regexp_extract + one
    regexp_replace), then count(DISTINCT url) per (host, template) —
    distinct-within-group shuffles on (host, template, url) first, so
    even a trap template with 10^9 urls spreads across the cluster;
    the final per-template rollup is the only narrow-key stage and its
    cardinality is the template vocabulary, not the corpus."""
    host = url_host(F.col(url_col))
    path = F.regexp_extract(F.col(url_col),
                            r"^[a-zA-Z][a-zA-Z0-9+.-]*://[^/?#]*([^?#]*)",
                            1)
    template = F.regexp_replace(path, r"[0-9]+", "{N}")
    return (df.select(host.alias("host"),
                      template.alias("path_template"),
                      F.col(url_col).alias("__url"))
            .groupBy("host", "path_template")
            .agg(F.countDistinct("__url").alias("n_urls"))
            .withColumn("trap", F.col("n_urls") >= int(min_urls)))


def host_concentration(df: DataFrame, *, host_col: str = "host",
                       top_k: int = 10) -> DataFrame:
    """Corpus host-concentration profile, ONE summary row: number of
    hosts, Herfindahl-Hirschman index (Σ share², 1/n_hosts = uniform,
    1 = single-host), and the corpus share of the top-*k* hosts by
    document count (ties by host ASC) — the diversity gate that
    catches a crawl gone circular (one forum mirror = 40% of docs)
    before any per-doc quality score can. NULL/empty hosts are
    excluded from shares.

    Shape at 10^12 rows: one host-keyed count aggregation (map-side
    combine absorbs hot hosts), then the HHI and totals are one-row
    re-aggregations of that host-count table and the top-k is
    TakeOrdered — nothing wider than the host vocabulary ever
    shuffles."""
    counts = (df.where(F.col(host_col).isNotNull()
                       & (F.col(host_col) != ""))
              .groupBy(host_col).agg(F.count("*").alias("__c")))
    counts = counts.persist()
    totals = counts.agg(F.count("*").alias("n_hosts"),
                        F.sum("__c").alias("n_docs"))
    topk = (counts.orderBy(F.desc("__c"), F.asc(host_col))
            .limit(int(top_k))
            .agg(F.sum("__c").alias("__top")))
    hhi = (counts.crossJoin(F.broadcast(totals))
           .agg(F.round(F.sum(F.pow(F.col("__c") / F.col("n_docs"),
                                    F.lit(2))), 6).alias("hhi")))
    out = (totals.crossJoin(F.broadcast(hhi))
           .crossJoin(F.broadcast(topk))
           .select("n_hosts", "n_docs", "hhi",
                   F.round(F.col("__top") / F.col("n_docs"), 6)
                   .alias("topk_share")))
    out._zoi_persisted = [counts]  # release after materialization
    return out


def query_param_profile(df: DataFrame, *, url_col: str = "url"
                        ) -> DataFrame:
    """Query-parameter mining: which ``?key=value`` keys appear across
    the corpus, on how many DISTINCT urls, and how often they carry a
    value — the evidence pass behind a canonical_url strip-list (utm_*
    and session ids show up on huge distinct-url counts; real content
    params on few). Output per key: ``n_urls`` (distinct),
    ``n_occurrences``, ``n_with_value``.

    One extract + explode over the query string (bounded by params per
    url, not corpus size) and one hash aggregation on the key; the
    distinct-url count shuffles (key, url) once — same shape as
    path_templates."""
    q = F.regexp_extract(F.col(url_col), r"\?([^#]*)", 1)
    parts = F.explode(F.split(q, "&"))
    base = (df.where(F.col(url_col).isNotNull() & (q != ""))
            .select(F.col(url_col).alias("__u"), parts.alias("__p"))
            .where(F.col("__p") != ""))
    key = F.substring_index("__p", "=", 1)
    has_val = F.col("__p").contains("=") & \
        (F.substring_index("__p", "=", -1) != "")
    kv = base.select("__u", key.alias("param"),
                     has_val.cast("long").alias("__hv"))
    return (kv.groupBy("param")
            .agg(F.count_distinct("__u").alias("n_urls"),
                 F.count("*").cast("long").alias("n_occurrences"),
                 F.sum("__hv").cast("long").alias("n_with_value")))


def tld_profile(df: DataFrame, *, url_col: str = "url") -> DataFrame:
    """Corpus TLD mix: the last dot-separated label of each host (the
    whole host when it has no dot — localhost, bare IPv4 last octet
    caveat documented), with url and distinct-host volumes and the url
    share — the crawl-frontier composition report (a .ru/.cn surge or a
    spam-TLD bloom shows here first). Output per tld: ``n_urls``,
    ``n_hosts``, ``share`` (round 6).

    One projection + one aggregation on the tld; the distinct-host
    count shuffles (tld, host) once; the share denominator is a window
    over the ≤few-hundred-row TLD table."""
    host = url_host(F.col(url_col))
    tld = F.regexp_extract(host, r"([^.]+)$", 1)
    base = (df.where(F.col(url_col).isNotNull())
            .select(tld.alias("tld"), host.alias("__h"))
            .where(F.col("tld") != ""))
    counts = (base.groupBy("tld")
              .agg(F.count("*").alias("n_urls"),
                   F.count_distinct("__h").alias("n_hosts")))
    tot = Window.partitionBy()
    return counts.select(
        "tld", F.col("n_urls").cast("long").alias("n_urls"),
        F.col("n_hosts").cast("long").alias("n_hosts"),
        F.round(F.col("n_urls") / F.sum("n_urls").over(tot), 6)
        .alias("share"))


def snapshot_host_overlap(df: DataFrame, *, url_col: str = "url",
                          ts_col: str = "warc_ts") -> DataFrame:
    """Host-set Jaccard between CONSECUTIVE monthly crawl snapshots —
    the frontier-drift check on the crawl itself (the content-side
    twins are js_divergence/centroid_drift): a collapsing overlap means
    the crawler lost a seed list or a snapshot was mis-partitioned; an
    overlap near 1 with rising volume means recrawl mass, which is
    what url_dedup_latest then collapses.

    Output per consecutive pair: ``(snap_a, snap_b, hosts_a, hosts_b,
    n_common, jaccard)`` — inclusion-exclusion on exact distinct-host
    counts, round-6 division at the end.

    Shape at 10^12 rows: the ONLY corpus-scale stage is the
    distinct (month, host) projection (one shuffle, map-side partial
    distinct); everything after runs on the host vocabulary (~10^8),
    with the snapshot rank window over the ≤10³-row snapshot list and
    the pair join keyed on (rank, host). NULL-ts and empty-host rows
    are excluded before the distinct."""
    snap = F.date_trunc("month", F.col(ts_col)).cast("date")
    hosts = (df.where(F.col(ts_col).isNotNull())
             .select(snap.alias("snap"),
                     url_host(F.col(url_col)).alias("host"))
             .where(F.col("host") != "")
             .distinct())
    hosts = hosts.persist()
    # snapshot list is tiny — a single-partition rank window is fine
    snaps = (hosts.select("snap").distinct()
             .withColumn("__r", F.row_number().over(
                 Window.orderBy("snap"))))
    h = hosts.join(F.broadcast(snaps), "snap")
    counts = hosts.groupBy("snap").agg(F.count("*").alias("n"))
    common = (h.alias("x")
              .join(h.alias("y"),
                    (F.col("x.__r") + 1 == F.col("y.__r"))
                    & (F.col("x.host") == F.col("y.host")))
              .groupBy(F.col("x.__r").alias("__r"))
              .agg(F.count("*").alias("n_common")))
    pairs = (snaps.alias("a")
             .join(snaps.alias("b"),
                   F.col("a.__r") + 1 == F.col("b.__r"))
             .select(F.col("a.snap").alias("snap_a"),
                     F.col("b.snap").alias("snap_b"),
                     F.col("a.__r").alias("__r")))
    out = (pairs
           .join(F.broadcast(counts.withColumnRenamed("snap", "snap_a")
                             .withColumnRenamed("n", "hosts_a")), "snap_a")
           .join(F.broadcast(counts.withColumnRenamed("snap", "snap_b")
                             .withColumnRenamed("n", "hosts_b")), "snap_b")
           .join(F.broadcast(common), "__r", "left")
           .select("snap_a", "snap_b", "hosts_a", "hosts_b",
                   F.coalesce("n_common", F.lit(0)).cast("long")
                   .alias("n_common"))
           .withColumn("jaccard",
                       F.round(F.col("n_common")
                               / (F.col("hosts_a") + F.col("hosts_b")
                                  - F.col("n_common")), 6)))
    out._zoi_persisted = [hosts]
    return out


def host_fetch_gaps(df: DataFrame, *, url_col: str = "url",
                    ts_col: str = "warc_ts",
                    min_fetches: int = 3) -> DataFrame:
    """Per-host fetch-interval profile — the crawl-politeness /
    recrawl-cadence report: ``min_gap_s`` near zero means the crawler
    hammered a host (politeness bug or a mirror split across worker
    queues); ``median_gap_s`` is the effective revisit period that
    freshness-weighted sampling (recency_weights) should be calibrated
    against. Hosts with < *min_fetches* timestamped fetches are
    dropped (one gap is not a cadence).

    Output per host: ``(host, n_fetches, min_gap_s, median_gap_s,
    max_gap_s)`` — gaps in whole seconds (exact integer epoch math;
    the median is the exact interpolated percentile both engines
    compute identically).

    Shape at 10^12 rows: one host-keyed window for the lag (the same
    shuffle the per-host dedup already pays), then a host-keyed
    aggregation whose exact median rides the group — host cardinality
    ~10^8 ≪ corpus, and the Zipf-head host's partition is bounded by
    its fetch count, the quantity this operator exists to expose."""
    host = url_host(F.col(url_col))
    base = (df.where(F.col(ts_col).isNotNull())
            .select(host.alias("host"),
                    F.unix_timestamp(F.col(ts_col)).alias("__t"))
            .where(F.col("host") != ""))
    w = Window.partitionBy("host").orderBy("__t")
    gaps = (base.withColumn("__gap", F.col("__t")
                            - F.lag("__t").over(w))
            .where(F.col("__gap").isNotNull()))
    return (gaps.groupBy("host")
            .agg((F.count("*") + 1).cast("long").alias("n_fetches"),
                 F.min("__gap").alias("min_gap_s"),
                 F.expr("percentile(__gap, 0.5)").alias("median_gap_s"),
                 F.max("__gap").alias("max_gap_s"))
            .where(F.col("n_fetches") >= int(min_fetches)))


def content_churn(df: DataFrame, *, url_col: str = "url",
                  snap_col: str = "snap", text_col: str = "text",
                  round_to: int = 6) -> DataFrame:
    """Per-host content-churn between the two snapshots in ``snap_col``
    (exactly two distinct values expected; extras raise): for urls
    fetched in BOTH, did the extracted text change? Output ``(host,
    n_common, n_changed, churn_rate)``.

    This is the north-rule byte-identity invariant ("byte-identical
    extracted text per url", BASELINE.json input_hint) turned into a
    table check: a refetch whose digest drifts while the extractor
    version is pinned flags a broken extractor or a cloaking host.

    Shape at 10^12 rows: rows reduce to ``(url, host, 48-bit md5
    digest)`` BEFORE the self-join — the join ships 3 narrow columns,
    never text — then one url-keyed equi-join (AQE handles hot-host
    skew) and one host aggregation. Each side is aggregated to ONE row
    per url first (min digest breaks refetch ties deterministically),
    so a url refetched k·m times contributes exactly one pair:
    n_common counts common URLS, not join-multiplied refetch pairs,
    and churn stays page-weighted. Digest collisions (~2^-48 per
    pair) bias churn DOWN by at most that."""
    snaps = [r[0] for r in
             df.select(snap_col).distinct().orderBy(snap_col).collect()]
    if len(snaps) != 2:
        raise ValueError(f"content_churn expects exactly 2 snapshots, "
                         f"got {snaps!r}")
    digest = F.conv(F.substring(F.md5(F.col(text_col)), 1, 12),
                    16, 10).cast("long")
    slim = (df.where(F.col(url_col).isNotNull() & F.col(text_col).isNotNull())
            .select(F.col(snap_col).alias("__s"),
                    F.col(url_col).alias("__u"),
                    url_host(F.col(url_col)).alias("host"),
                    digest.alias("__d")))
    # one row per url per side: refetches within a snapshot would
    # otherwise multiply through the equi-join (k·m pairs per url)
    # and make the rates refetch-weighted instead of page-weighted
    a = (slim.where(F.col("__s") == snaps[0])
         .groupBy("__u")
         .agg(F.min("host").alias("host"), F.min("__d").alias("__d")))
    b = (slim.where(F.col("__s") == snaps[1])
         .groupBy("__u")
         .agg(F.min("__d").alias("__d2")))
    j = a.join(b, "__u")
    return (j.groupBy("host")
            .agg(F.count("*").alias("n_common"),
                 F.sum((F.col("__d") != F.col("__d2")).cast("long"))
                 .alias("n_changed"))
            .select("host",
                    F.col("n_common").cast("long").alias("n_common"),
                    F.col("n_changed").cast("long").alias("n_changed"),
                    F.round(F.col("n_changed") / F.col("n_common"),
                            round_to).alias("churn_rate")))


def selflink_ratio(df: DataFrame, *, url_col: str = "url",
                   text_col: str = "text", id_col: str = "doc_id",
                   round_to: int = 6) -> DataFrame:
    """Per-host internal-link share: of all outlinks on a host's
    pages, what fraction point back at the SAME host? ``(host,
    n_links, n_self, self_ratio)``. Near-1.0 hosts are closed link
    farms / template navigation; near-0 hosts are syndication hubs —
    both SEO-spam priors for the quality gate.

    Composes text.extract_links (href regex, one posexplode, no UDF)
    with the page host carried through ``carry_cols`` — the page→link
    edge never needs a join back to its source row. One projection +
    explode + one host aggregation. Relative hrefs (root-, path-,
    query- or fragment-relative) resolve to the PAGE's own host per
    RFC 3986 and count as self-links; scheme-relative ``//h/…`` takes
    its own authority."""
    from . import text as _text

    pages = (df.select(F.col(id_col),
                       url_host(F.col(url_col)).alias("src_host"),
                       F.col(text_col))
             .where(F.col(url_col).isNotNull()))
    links = _text.extract_links(pages, text_col=text_col,
                                id_col=id_col,
                                carry_cols=["src_host"])
    href = F.col("href")
    dst = (F.when(href.rlike(r"^[a-zA-Z][a-zA-Z0-9+.-]*://"),
                  url_host(href))
           .when(href.startswith("//"),
                 F.lower(F.regexp_extract(href, r"^//([^/:?#]+)", 1)))
           .otherwise(F.col("src_host")))
    return (links.where(F.col("src_host") != "")
            .groupBy(F.col("src_host").alias("host"))
            .agg(F.count("*").cast("long").alias("n_links"),
                 F.sum((dst == F.col("src_host")).cast("long"))
                 .alias("n_self"))
            .select("host", "n_links",
                    F.col("n_self").cast("long").alias("n_self"),
                    F.round(F.col("n_self") / F.col("n_links"),
                            round_to).alias("self_ratio")))


_CANONICAL_RE = (r'(?i)<link[^>]*rel=["\x27]?canonical["\x27]?'
                 r'[^>]*href=["\x27]?([^"\x27> ]+)')


def canonical_mismatch(df: DataFrame, *, url_col: str = "url",
                       text_col: str = "text",
                       round_to: int = 6) -> DataFrame:
    """Per-host rel=canonical conformance: of pages declaring a
    ``<link rel="canonical" href=…>``, how many declare a DIFFERENT
    canonical than their own url (after `canonical_url`
    normalization on both sides)? ``(host, n_canonical, n_mismatch,
    mismatch_rate)``. High mismatch hosts are syndication mirrors /
    parameter-spam — their pages should dedup to the declared target
    BEFORE content fingerprints run.

    One regexp_extract projection (rel-before-href attribute order,
    the overwhelmingly dominant emitted form — documented contract) +
    one host aggregation. No explode: only the FIRST declaration
    counts, matching browser/crawler precedence. Relative canonical
    hrefs (the common ``href="/page"`` self-canonical form) are
    resolved against the page url via :func:`resolve_href` before
    comparing — a host whose pages all declare relative
    self-canonicals correctly reports mismatch_rate 0."""
    decl = F.regexp_extract(F.col(text_col), _CANONICAL_RE, 1)
    base = (df.where(F.col(url_col).isNotNull())
            .select(F.col(url_col).alias("__url"),
                    url_host(F.col(url_col)).alias("host"),
                    canonical_url(F.col(url_col)).alias("__self"),
                    decl.alias("__decl")))
    base = base.where((F.col("__decl") != "") & (F.col("host") != ""))
    resolved = resolve_href(F.col("__decl"), F.col("__url"))
    mism = (canonical_url(resolved) != F.col("__self"))
    return (base.groupBy("host")
            .agg(F.count("*").cast("long").alias("n_canonical"),
                 F.sum(mism.cast("long")).alias("n_mismatch"))
            .select("host", "n_canonical",
                    F.col("n_mismatch").cast("long").alias("n_mismatch"),
                    F.round(F.col("n_mismatch") / F.col("n_canonical"),
                            round_to).alias("mismatch_rate")))


def staleness_audit(df: DataFrame, *, url_col: str = "url",
                    ts_col: str = "warc_ts",
                    max_age_s: int) -> DataFrame:
    """Freshness-SLA audit: hosts whose LAST fetch is older than
    ``max_age_s`` relative to the corpus watermark (the max fetch ts
    anywhere) — ``(host, last_fetch_s, age_s, n_fetches)``. The
    watermark, not wall-clock, anchors the age so the check is
    deterministic and replayable on a frozen snapshot.

    One host aggregation + one broadcast of the 1-row watermark;
    epoch-seconds arithmetic (integer) end to end."""
    base = (df.where(F.col(ts_col).isNotNull()
                     & F.col(url_col).isNotNull())
            .select(url_host(F.col(url_col)).alias("host"),
                    F.unix_timestamp(F.col(ts_col)).alias("__t"))
            .where(F.col("host") != ""))
    per_host = base.groupBy("host").agg(
        F.max("__t").alias("last_fetch_s"),
        F.count("*").cast("long").alias("n_fetches"))
    wm = base.agg(F.max("__t").alias("__wm"))
    return (per_host.crossJoin(F.broadcast(wm))  # 1-row watermark
            .withColumn("age_s", F.col("__wm") - F.col("last_fetch_s"))
            .where(F.col("age_s") > int(max_age_s))
            .select("host", "last_fetch_s", "age_s", "n_fetches"))


def url_ext_census(df: DataFrame, *, url_col: str = "url",
                   round_to: int = 6) -> DataFrame:
    """Path file-extension census — the cheapest frontier-composition
    QC: a crawl whose .php/.asp share explodes is walking dynamic
    parameter space; a .xml/.json surge means feed endpoints leaked
    into the html frontier. Extension = lowercased text after the
    LAST '.' of the LAST path segment (query/fragment stripped),
    empty for extensionless paths — ``(ext, n_urls, share)``.

    One regexp projection + one vocabulary-sized aggregation; the
    share divides by the total via a 1-row broadcast."""
    # last path segment's extension: after the final '/', a dot, then
    # dot-free/slash-free tail up to ?#; RE2-safe in both engines
    ext = F.lower(F.regexp_extract(
        F.col(url_col), r"^[^?#]*/[^/?#]*\.([^./?#]+)(?:[?#]|$)", 1))
    base = (df.where(F.col(url_col).isNotNull())
            .select(ext.alias("ext")))
    cells = base.groupBy("ext").agg(F.count("*").alias("n_urls"))
    tot = cells.agg(F.sum("n_urls").alias("__t"))
    return (cells.crossJoin(F.broadcast(tot))
            .select("ext",
                    F.col("n_urls").cast("long").alias("n_urls"),
                    F.round(F.col("n_urls") / F.col("__t"), round_to)
                    .alias("share")))


def url_depth_census(df: DataFrame, *, url_col: str = "url",
                     round_to: int = 6) -> DataFrame:
    """Path-depth census — crawl-frontier shape QC: depth = number of
    non-empty '/'-separated path segments after the authority
    (query/fragment stripped), 0 for root pages. A depth histogram
    that keeps growing a long tail means the crawler is descending
    calendar/pagination traps; a depth-0 spike means a seed-list
    re-crawl leaked in. Output ``(depth, n_urls, share)``.

    One regexp + higher-order-function projection, one ≤~50-bucket
    aggregation, share via a 1-row broadcast — no corpus-wide sort."""
    path = F.regexp_extract(
        F.col(url_col), r"^[a-zA-Z][a-zA-Z0-9+.-]*://[^/?#]+([^?#]*)", 1)
    depth = F.size(F.filter(F.split(path, "/"),
                            lambda x: x != "")).cast("long")
    cells = (df.where(F.col(url_col).isNotNull())
             .select(depth.alias("depth"))
             .groupBy("depth").agg(F.count("*").alias("n_urls")))
    tot = cells.agg(F.sum("n_urls").alias("__t"))
    return (cells.crossJoin(F.broadcast(tot))
            .select("depth",
                    F.col("n_urls").cast("long").alias("n_urls"),
                    F.round(F.col("n_urls") / F.col("__t"), round_to)
                    .alias("share")))


def idn_host_census(df: DataFrame, *, url_col: str = "url",
                    digit_share: float = 0.25, max_hyphens: int = 2,
                    max_len: int = 39, round_to: int = 6) -> DataFrame:
    """Suspicious-host census over DISTINCT hosts — the spam/phishing
    composition gauge every crawl QC dashboard carries: punycode
    (IDN `xn--` labels, the homograph-attack vehicle), digit-heavy
    hosts (DGA/throwaway domains), hyphen-stuffed hosts (keyword-spam
    domains) and over-long hosts. One row:
    ``(n_hosts, n_punycode, n_digit_heavy, n_hyphen_heavy, n_long,
    share_flagged)`` where share_flagged = hosts with ≥1 flag.

    Hosts are distinct-ed FIRST (one hash aggregation — the flag math
    then runs once per host, not per page), flags are pure string
    expressions, and the verdict is a single global aggregate."""
    host = url_host(F.col(url_col))
    hosts = (df.where(F.col(url_col).isNotNull())
             .select(host.alias("__h"))
             .where(F.col("__h") != "")
             .distinct())
    puny = F.col("__h").rlike(r"(^|\.)xn--")
    n_digits = F.length(F.regexp_replace("__h", r"[^0-9]", ""))
    digit_heavy = (n_digits / F.length("__h")) >= F.lit(float(digit_share))
    hyphen_heavy = (F.length(F.regexp_replace("__h", r"[^-]", ""))
                    > F.lit(int(max_hyphens)))
    long_host = F.length("__h") > F.lit(int(max_len))
    flagged = puny | digit_heavy | hyphen_heavy | long_host
    return (hosts.agg(
        F.count("*").cast("long").alias("n_hosts"),
        F.sum(puny.cast("long")).cast("long").alias("n_punycode"),
        F.sum(digit_heavy.cast("long")).cast("long").alias("n_digit_heavy"),
        F.sum(hyphen_heavy.cast("long")).cast("long")
        .alias("n_hyphen_heavy"),
        F.sum(long_host.cast("long")).cast("long").alias("n_long"),
        F.round(F.sum(flagged.cast("long"))
                / F.count("*"), round_to).alias("share_flagged")))


def prefix_compression_stats(df: DataFrame, *, url_col: str = "url",
                             tiers: "tuple[int, ...]" = (8, 16, 32),
                             round_to: int = 6) -> DataFrame:
    """Delta-encoding win estimate for URL storage: within each host,
    sort urls and measure what share of consecutive pairs agree on an
    8/16/32-char prefix — the number that decides whether the url
    column of a 10^12-row manifest is worth prefix-compressing
    (sorted-run delta encoding routinely cuts url storage 3-5× when
    the 16-char share is high). Output one row:
    ``(n_urls, n_pairs, share_p8, share_p16, share_p32)``.

    The window is partitioned BY HOST (the natural sort key of a url
    manifest), so no global sort: each host's urls sort locally, and
    hot hosts are bounded by the same skew budget every host-keyed
    operator here carries (cap with `host_cap` upstream if a single
    host dominates)."""
    host = url_host(F.col(url_col))
    base = (df.where(F.col(url_col).isNotNull())
            .select(F.col(url_col).alias("__u"), host.alias("__h"))
            .where(F.col("__h") != ""))
    w = Window.partitionBy("__h").orderBy("__u")
    prev = F.lag("__u").over(w)
    withp = base.select("__u", prev.alias("__p"))
    # one aggregation over the windowed frame: rows with a NULL prev
    # (each host's first url) count toward n_urls but not n_pairs
    aggs = [F.count("*").cast("long").alias("n_urls"),
            F.count("__p").cast("long").alias("n_pairs")]
    for t in tiers:
        match = F.when(
            F.col("__p").isNotNull()
            & (F.substring("__u", 1, int(t))
               == F.substring("__p", 1, int(t))), F.lit(1)) \
            .otherwise(F.lit(0))
        aggs.append(F.round(F.sum(match) / F.count("__p"), round_to)
                    .alias(f"share_p{t}"))
    return withp.agg(*aggs)


def robots_rules(df: DataFrame, *, host_col: str = "host",
                 text_col: str = "robots_txt") -> DataFrame:
    """Parse robots.txt bodies into one rule row per
    ``(host, agent, rule, path)`` — the crawl-compliance table the
    frontier checks against (:func:`robots_check`). Implements the
    RFC 9309 prefix subset: ``User-agent`` lines open a group (stacked
    consecutive UA lines share it), ``Allow``/``Disallow`` lines in a
    group apply to each of its agents, ``#`` comments and unknown
    directives are ignored, and an EMPTY ``Disallow:`` value (the
    allow-everything idiom) contributes no rule. ``*``/``$`` wildcards
    in paths are NOT interpreted — they pass through as literals
    (documented subset; wildcard support belongs to a regex-compiling
    variant).

    Shape at crawl scale: lines posexplode (bounded by robots.txt
    size, ~10² lines), a per-host ordered window to assign group ids
    (robots bodies are single short documents — the per-host window
    partition is one file's lines, never corpus-wide), and one
    group-keyed equi-join multiplying each rule by its group's agents.
    Output cardinality ≈ hosts × rules-per-file.
    """
    lines = F.split(F.col(text_col), "\n")
    base = (df.where(F.col(host_col).isNotNull()
                     & F.col(text_col).isNotNull())
            .select(F.col(host_col).alias("host"),
                    F.posexplode(lines).alias("__pos", "__line")))
    directive = F.lower(F.regexp_extract(
        "__line", r"^\s*([A-Za-z-]+)\s*:", 1))
    value = F.trim(F.regexp_extract(
        "__line", r"^\s*[A-Za-z-]+\s*:\s*([^#]*)", 1))
    parsed = (base.select("host", "__pos",
                          directive.alias("__d"), value.alias("__v"))
              .where(directive.isin("user-agent", "allow", "disallow")))
    is_ua = (F.col("__d") == "user-agent").cast("int")
    w = Window.partitionBy("host").orderBy("__pos")
    # a UA line opens a NEW group unless it directly follows another
    # UA line (stacked agents share the group)
    opens = ((is_ua == 1)
             & (F.coalesce(F.lag(is_ua).over(w), F.lit(0)) == 0))
    grouped = parsed.withColumn(
        "__grp", F.sum(opens.cast("int")).over(
            w.rowsBetween(Window.unboundedPreceding, 0)))
    agents = (grouped.where(F.col("__d") == "user-agent")
              .select("host", "__grp",
                      F.lower("__v").alias("agent")))
    rules = (grouped.where(F.col("__d") != "user-agent")
             .where(F.col("__v") != "")  # empty Disallow: = no rule
             .select("host", "__grp", F.col("__d").alias("rule"),
                     F.col("__v").alias("path")))
    return (agents.join(rules, ["host", "__grp"])
            .select("host", "agent", "rule", "path")
            .distinct())


def robots_check(df: DataFrame, rules: DataFrame, *,
                 url_col: str = "url", agent: str = "*") -> DataFrame:
    """Evaluate each url against a parsed rule table
    (:func:`robots_rules`) for one crawler identity: RFC 9309
    precedence — the MOST SPECIFIC (longest-pattern) matching rule
    wins (specificity = octet length of the raw pattern), ``allow``
    beats ``disallow`` on equal length, and a url with no matching
    rule (or no rules for its host) is allowed. Group selection
    follows the spec: when the host's robots.txt has a group for this
    exact agent, ONLY those rules apply; otherwise the ``*`` groups
    do.

    Pattern syntax (full RFC 9309): plain prefixes match as prefixes,
    ``*`` matches any character sequence, and a trailing ``$`` anchors
    the match to the END of the path. Patterns compile to SQL LIKE
    expressions (``*`` → ``%``, LIKE metacharacters escaped, a ``%``
    appended unless ``$``-anchored) — per-row expression matching in
    both Spark and the DuckDB oracle, no regex compilation from
    untrusted data.

    Returns the input's url column plus ``(host, path, rule, rule_path,
    allowed)`` — rule_path is the RAW pattern; NULL when nothing
    matched.

    Shape at 10^12 urls: rules are host-bounded (≈ hosts ×
    rules-per-file ≪ corpus) so the host equi-join is
    broadcast/AQE-friendly; the LIKE match is a per-row string
    expression; the winner pick is a window keyed by url — partition
    cardinality = matching rules per url (tiny). Hot hosts skew the
    join the same way every host-keyed operator here does; AQE
    skew-join splitting covers it.
    """
    target = agent.lower()
    # does this host define a group for the exact agent?
    has_exact = (rules.groupBy("host")
                 .agg(F.max((F.col("agent") == target).cast("int"))
                      .alias("__has_exact")))
    eff = (rules.join(has_exact, "host")
           .where(((F.col("agent") == target)
                   & (F.col("__has_exact") == 1))
                  | ((F.col("agent") == "*")
                     & (F.col("__has_exact") == 0)))
           .select("host", "rule", F.col("path").alias("rule_path")))
    # compile the robots pattern to a LIKE pattern: strip a trailing
    # '$' anchor, escape LIKE metacharacters (escape char '\'),
    # '*' -> '%', then append '%' unless anchored
    anchored = F.col("rule_path").endswith("$")
    raw = F.when(anchored,
                 F.expr("substring(rule_path, 1, length(rule_path) - 1)")) \
        .otherwise(F.col("rule_path"))
    esc = F.replace(F.replace(F.replace(raw, F.lit("\\"), F.lit("\\\\")),
                              F.lit("%"), F.lit("\\%")),
                    F.lit("_"), F.lit("\\_"))
    like_pat = F.replace(esc, F.lit("*"), F.lit("%"))
    eff = eff.withColumn(
        "__pat", F.when(anchored, like_pat)
                  .otherwise(F.concat(like_pat, F.lit("%"))))
    u = F.col(url_col)
    path0 = F.regexp_extract(
        u, r"^[a-zA-Z][a-zA-Z0-9+.-]*://[^/?#]*([^#]*)", 1)
    base = df.select(u.alias("url"),
                     url_host(u).alias("host"),
                     F.when(path0 == "", F.lit("/"))
                     .otherwise(path0).alias("path"))
    m = (base.join(eff, "host", "left")
         .withColumn("__match",
                     F.col("rule_path").isNotNull()
                     & F.expr("path LIKE __pat ESCAPE '\\\\'"))
         .drop("__pat"))
    # keep at most one winner per url: longest prefix, allow on ties;
    # urls whose rules all missed keep one NULL-rule row
    pw = Window.partitionBy("url").orderBy(
        F.col("__match").desc(),
        F.length("rule_path").desc(), F.col("rule").asc())
    return (m.withColumn("__rn", F.row_number().over(pw))
            .where(F.col("__rn") == 1)
            .select("url", "host", "path",
                    F.when(F.col("__match"), F.col("rule")).alias("rule"),
                    F.when(F.col("__match"), F.col("rule_path"))
                    .alias("rule_path"),
                    F.coalesce(F.when(F.col("__match"),
                                      F.col("rule") == "allow"),
                               F.lit(True)).alias("allowed")))


def sitemap_locs(df: DataFrame, *, text_col: str = "text",
                 id_col: str = "doc_id") -> DataFrame:
    """Extract ``<loc>`` urls from sitemap-XML bodies — the frontier
    expansion pass: crawlers mine fetched sitemaps for urls the link
    graph hasn't surfaced. One regexp_extract_all + explode per
    document (bounded by the 50k-url sitemap spec cap), no UDF, no
    shuffle. Returns ``(id, loc, host)`` with surrounding whitespace
    trimmed; compose with an anti-join against the corpus's canonical
    urls to get the NEW frontier (see the `sitemap_frontier` query).
    """
    locs = F.regexp_extract_all(
        F.col(text_col), F.lit(r"(?i)<loc>\s*([^<]+?)\s*</loc>"), 1)
    return (df.where(F.col(text_col).isNotNull())
            .select(F.col(id_col), F.explode(locs).alias("loc"))
            .select(id_col, F.col("loc"),
                    url_host(F.col("loc")).alias("host"))
            .where(F.col("loc") != ""))


def crawl_schedule_plan(df: DataFrame, *, host_col: str = "host",
                        delay_s: float = 1.0,
                        parallelism: int = 1000,
                        round_to: int = 6) -> DataFrame:
    """Politeness-constrained crawl-capacity plan, ONE summary row:
    with per-host fetch delay ``delay_s`` (robots Crawl-delay or the
    crawler's politeness default) and ``parallelism`` worker slots,
    the frontier's makespan is bounded below by BOTH the busiest
    single host (its fetches are strictly serial — politeness forbids
    intra-host parallelism) and total work / slots; the greatest of
    the two is the classic LPT lower bound. A bottleneck host whose
    serial chain exceeds total/slots is the actionable finding: no
    fleet size fixes it, only a per-host cap (sampling.host_cap).

    Output: ``(n_hosts, n_urls, max_host_urls, bottleneck_host,
    host_time_s, fleet_time_s, makespan_lb_s, host_bound)`` —
    bottleneck ties break to the lexicographically smallest host;
    ``host_bound`` is true when the serial host chain is the binding
    constraint.

    Shape at 10^12 urls: one host-keyed count aggregation (map-side
    combine), then a rank-1 pick and a 1-row rollup over the host
    vocabulary — nothing beyond the host table shuffles."""
    counts = (df.where(F.col(host_col).isNotNull()
                       & (F.col(host_col) != ""))
              .groupBy(F.col(host_col).alias("host"))
              .agg(F.count("*").alias("__n")))
    counts = counts.persist()
    w = Window.orderBy(F.desc("__n"), F.asc("host"))
    top = (counts.withColumn("__r", F.row_number().over(w))
           .where(F.col("__r") == 1)
           .select(F.col("host").alias("bottleneck_host"),
                   F.col("__n").alias("max_host_urls")))
    tot = counts.agg(F.count("*").cast("long").alias("n_hosts"),
                     F.sum("__n").cast("long").alias("n_urls"))
    d = float(delay_s)
    p = int(parallelism)
    host_t = F.col("max_host_urls") * d
    fleet_t = F.col("n_urls") * d / p
    out = (tot.crossJoin(F.broadcast(top))  # both sides are 1 row
           .select("n_hosts", "n_urls",
                   F.col("max_host_urls").cast("long")
                   .alias("max_host_urls"),
                   "bottleneck_host",
                   F.round(host_t, round_to).alias("host_time_s"),
                   F.round(fleet_t, round_to).alias("fleet_time_s"),
                   F.round(F.greatest(host_t, fleet_t), round_to)
                   .alias("makespan_lb_s"),
                   (host_t >= fleet_t).alias("host_bound")))
    out._zoi_persisted = [counts]
    return out


def frontier_priority(edges: DataFrame, quality: DataFrame, *,
                      src_col: str = "src", dst_col: str = "dst",
                      quality_col: str = "quality",
                      round_to: int = 6) -> DataFrame:
    """Crawl-frontier priority scoring — the OPIC idea (Abiteboul,
    Preda & Cobena, WWW 2003): each fetched page distributes its
    quality mass equally across its outlinks, and an unfetched url's
    priority is the mass it accumulates — so urls endorsed by many
    good pages are crawled first, without waiting for a global
    PageRank to converge. ``priority(dst) = Σ_src quality(src) /
    outdeg(src)`` over the edge list; returns ``(dst, n_parents,
    priority)``.

    Shape at crawl scale: one src-keyed aggregation for outdegrees
    (edge-bounded), one src equi-join of edges against (quality ×
    outdeg), one dst-keyed aggregation — all keyed by graph columns,
    nothing corpus-quadratic; hot dsts (everyone links the homepage)
    are absorbed by the map-side partial sum."""
    deg = (edges.groupBy(F.col(src_col).alias("__s"))
           .agg(F.count("*").alias("__deg")))
    q = quality.select(F.col(src_col).alias("__s"),
                       F.col(quality_col).alias("__q"))
    mass = deg.join(q, "__s").select(
        "__s", (F.col("__q") / F.col("__deg")).alias("__m"))
    return (edges.select(F.col(src_col).alias("__s"),
                         F.col(dst_col).alias("dst"))
            .join(mass, "__s")
            .groupBy("dst")
            .agg(F.count("*").cast("long").alias("n_parents"),
                 F.round(F.sum("__m"), round_to).alias("priority")))


def pct_encoding_audit(df: DataFrame, *, url_col: str = "url"
                       ) -> DataFrame:
    """Percent-encoding validity census per url — the RFC 3986
    escapes web intakes actually get wrong: counts of valid escapes
    (% followed by two hex digits), INVALID escapes (% followed by
    anything else — strictly illegal, a serialization bug upstream),
    and double-encodings (%25 followed by two hex digits — a url
    encoded twice, the classic proxy/redirect-chain artifact that
    breaks dedup because the same resource spells differently).

    Pure regexp_count projections — one codegen stage, no shuffle
    before the caller's aggregation. Returns ``(url, n_valid_escapes,
    n_invalid_escapes, n_double_encoded)`` for urls containing '%'.
    """
    u = F.col(url_col)
    return (df.where(u.isNotNull() & u.contains("%"))
            .select(
                u.alias("url"),
                F.regexp_count(u, F.lit(r"%[0-9A-Fa-f]{2}"))
                 .alias("n_valid_escapes"),
                (F.regexp_count(u, F.lit("%"))
                 - F.regexp_count(u, F.lit(r"%[0-9A-Fa-f]{2}")))
                 .alias("n_invalid_escapes"),
                F.regexp_count(u, F.lit(r"%25[0-9A-Fa-f]{2}"))
                 .alias("n_double_encoded")))


def typosquat_candidates(df: DataFrame, host_col: str, *,
                         top_k: int = 20, max_dist: int = 2,
                         ratio: float = 0.1,
                         round_to: int = 6) -> DataFrame:
    """Typosquat / spoof-host detector: rare hosts within edit
    distance <= *max_dist* of a HIGH-volume host ("h0st3" next to
    "host3") are either typos polluting per-host stats or active
    spoofing - both poison host-level reputation joins. Candidates
    must be at most *ratio* x the legit host's volume, which keeps
    sibling legitimate hosts (host1 vs host2, both heavy) out of
    the report.

    Plan: one host count aggregation; the top-k legit list is a
    TakeOrdered k-row frame, broadcast against the full distinct-
    host table - the levenshtein pass is k x |hosts|, never
    |hosts| squared. Returns ``(suspect, legit, dist, n_suspect,
    n_legit, volume_ratio)``.
    """
    counts = (df.where(F.col(host_col).isNotNull())
              .groupBy(F.col(host_col).alias("h"))
              .agg(F.count(F.lit(1)).alias("c")))
    top = (counts.orderBy(F.col("c").desc(), F.col("h"))
           .limit(int(top_k))
           .select(F.col("h").alias("legit"),
                   F.col("c").alias("n_legit")))
    cand = counts.select(F.col("h").alias("suspect"),
                         F.col("c").alias("n_suspect"))
    dist = F.levenshtein("suspect", "legit")
    return (cand.join(F.broadcast(top),
                      (F.col("suspect") != F.col("legit")))
            .where((dist <= int(max_dist))
                   & (F.col("n_suspect")
                      <= float(ratio) * F.col("n_legit")))
            .select("suspect", "legit", dist.alias("dist"),
                    "n_suspect", "n_legit",
                    F.round(F.col("n_suspect") / F.col("n_legit"),
                            round_to).alias("volume_ratio")))


# common multi-label public suffixes (a deliberately small, PINNED
# subset of the Mozilla Public Suffix List — the full list is data,
# not code; callers pass extras for their crawl's tail)
MINI_PSL = (
    "co.uk", "org.uk", "gov.uk", "ac.uk", "me.uk",
    "com.au", "net.au", "org.au", "co.jp", "ne.jp", "or.jp",
    "com.br", "com.cn", "com.mx", "co.in", "co.za", "com.ar",
    "com.tr", "co.kr", "com.sg", "com.hk", "co.nz", "com.tw",
)


def registrable_domain(host: Column,
                       extra_suffixes=()) -> Column:
    """eTLD+1 (registrable domain) of a hostname against a PINNED
    mini public-suffix list: if the last TWO labels are a listed
    public suffix (co.uk, com.au, …), take the last THREE labels,
    else the last two; hosts with a single label pass through
    unchanged. Lowercased first, so dedup keys never split on case.

    This is the grouping key host-level ops should aggregate by —
    ``news.bbc.co.uk`` and ``m.bbc.co.uk`` are the same publisher,
    which per-host counts (host_hits, host_concentration) miss. The
    suffix test is a set-membership on the last-two-label string —
    one expression, no join, identical in both engines.
    """
    suffixes = set(MINI_PSL) | {s.lower() for s in extra_suffixes}
    h = F.lower(host)
    last2 = F.regexp_extract(h, r"([^.]+\.[^.]+)$", 1)
    last3 = F.regexp_extract(h, r"([^.]+\.[^.]+\.[^.]+)$", 1)
    reg = F.when(last2.isin(*sorted(suffixes))
                 & (last3 != ""), last3) \
           .when(last2 != "", last2) \
           .otherwise(h)
    return reg
