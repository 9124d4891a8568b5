"""Vendored public-suffix snapshot + the PSL longest-match algorithm.

The Public Suffix List (publicsuffix.org, Mozilla-maintained, public
data) defines where the "registered domain" boundary sits for every
TLD: ``example.co.uk``'s registrable domain is ``example.co.uk`` (the
public suffix is ``co.uk``), not ``co.uk``. A 2-label heuristic lumps
every ``*.co.uk`` site into ONE ``co.uk`` bucket, so per-domain caps
over-cap entire ccTLD registries collectively — wrong on real crawls.

``PSL_SNAPSHOT`` is a CURATED snapshot of the list's high-traffic
rules (major ccTLD second-level registries, the canonical wildcard /
exception cases, and a handful of private-section hosting suffixes),
not the full ~9k-rule file: the full list ships as data in production
(swap the ``rules=`` argument; the algorithm is rule-count agnostic).
Rule syntax follows the PSL spec exactly:

- ``co.uk``          — normal rule: the suffix itself is public.
- ``*.ck``           — wildcard: EVERY direct child of ``ck`` is a
                       public suffix (``anything.ck``).
- ``!www.ck``        — exception: overrides the wildcard; ``www.ck``
                       is registrable (public suffix = ``ck``).
- unlisted TLDs fall to the spec's implicit default rule ``*`` (the
  TLD itself is the public suffix).

Prevailing-rule order per the spec: any matching exception rule wins;
otherwise the match with the most labels; otherwise the default.

The lookup compiles to a constant-foldable when-chain over literal
arrays (Catalyst folds the rule arrays to single literals), so the
Spark side is a pure zero-shuffle projection — no join, no explode —
and the DuckDB twin is the same chain over the same vendored arrays.
"""

from __future__ import annotations

from pyspark.sql import Column, functions as F

# --- curated snapshot (publicsuffix.org, ICANN + private sections) ---

_CC_SLDS: dict[str, str] = {
    "uk": "co org me ltd plc net sch ac gov nhs police",
    "au": "com net org edu gov asn id",
    "jp": "co ne or ac ad ed go gr lg",
    "nz": "co net org govt ac school geek gen kiwi maori",
    "za": "co net org gov ac web",
    "br": "com net org gov edu mil art blog eco far",
    "in": "co net org gov ac edu res gen firm ind",
    "cn": "com net org gov edu ac mil",
    "kr": "co ne or re pe go mil ac hs ms es sc kg seoul busan",
    "tw": "com net org edu gov idv",
    "hk": "com net org edu gov idv",
    "sg": "com net org edu gov per",
    "il": "co net org ac gov muni idf k12",
    "ar": "com net org edu gob gov int mil musica tur",
    "mx": "com net org edu gob",
    "tr": "com net org edu gov mil bbs av dr gen web",
    "pl": "com net org edu gov info waw wroc krakow",
    "fr": "asso gouv nom prd tm avocat",
    "it": "edu gov",
    "es": "com nom org gob edu",
    "pt": "com edu gov org net publ",
    "gr": "com edu net org gov",
    "ua": "com net org edu gov in kiev",
    "th": "co net or ac go in mi",
    "id": "co net or web sch go ac my biz",
    "my": "com net org edu gov mil name",
    "ph": "com net org edu gov ngo",
    "vn": "com net org edu gov int ac biz info name pro health",
    "sa": "com net org edu gov med pub sch",
    "ae": "co net org sch ac gov mil",
    "eg": "com net org edu gov eun sci",
    "ng": "com net org edu gov mil mobi name sch",
    "ke": "co ne or go ac sc me mobi info",
    "ca": "gc",
    "us": "ca ny tx fl wa ma il pa oh ga nc mi dc",
}

#: normal rules (the suffix itself is public)
PSL_NORMAL: tuple[str, ...] = tuple(
    sorted(
        {f"{sld}.{cc}" for cc, slds in _CC_SLDS.items() for sld in slds.split()}
        | {
            # private-section hosting suffixes (each customer site is
            # its own registrable domain)
            "github.io", "gitlab.io", "blogspot.com", "herokuapp.com",
            "cloudfront.net", "azurewebsites.net", "netlify.app",
            "vercel.app", "pages.dev", "web.app", "firebaseapp.com",
            "appspot.com", "fly.dev", "onrender.com", "readthedocs.io",
            "surge.sh", "neocities.org", "s3.amazonaws.com",
            # US K-12 third-level registries (3-label rules)
            "k12.ca.us", "k12.ny.us", "k12.tx.us",
        }
    )
)

#: wildcard rules, stored as the PARENT (``*.ck`` -> ``ck``): every
#: direct child of the parent is a public suffix
PSL_WILDCARD: tuple[str, ...] = tuple(
    sorted(
        {"bd", "ck", "er", "fk", "jm", "kh", "mm", "np", "pg"}
        | {
            # Japanese city domains: *.kawasaki.jp etc.
            f"{c}.jp"
            for c in (
                "kawasaki kitakyushu kobe nagoya sapporo sendai yokohama"
            ).split()
        }
    )
)

#: exception rules, stored without the ``!``: registrable despite a
#: matching wildcard
PSL_EXCEPTION: tuple[str, ...] = tuple(
    sorted(
        {"www.ck"}
        | {
            f"city.{c}.jp"
            for c in (
                "kawasaki kitakyushu kobe nagoya sapporo sendai yokohama"
            ).split()
        }
    )
)

#: deepest level a SNAPSHOT rule can match — derived from the data by
#: rules_max_labels() below (3: k12.ca.us / s3.amazonaws.com normals,
#: city.*.jp exceptions, 2-label wildcard parents). Kept as a named
#: constant for documentation; the lookup functions re-derive the depth
#: from whatever rules they are handed.
MAX_MATCH_LABELS = 3


def rules_max_labels(
    normal: tuple[str, ...],
    wildcard: tuple[str, ...],
    exception: tuple[str, ...],
) -> int:
    """Deepest level the given rule set can match: max label count
    over normal/exception rules, wildcard PARENT labels + 1 (the
    wildcard covers its parent's direct children). Derived from the
    data so a caller swapping in the full PSL (which has 4-5-label
    rules) can never silently truncate its deep rules to the snapshot's
    depth — they'd otherwise never match, mis-bucketing those hosts
    with no error."""
    return max(
        max((r.count(".") + 1 for r in normal), default=1),
        max((r.count(".") + 1 for r in exception), default=1),
        max((r.count(".") + 2 for r in wildcard), default=1),
    )


def _suffix_regex(i: int) -> str:
    """Regex capturing the last ``i`` dot-labels of a host (identical
    syntax in Spark and DuckDB; no match -> empty string in both)."""
    return rf"((?:[^.]+\.){{{i - 1}}}[^.]+)$"


def host_of(url: Column) -> Column:
    """Lowercased host of a URL (port and userinfo excluded)."""
    host = F.regexp_extract(url, r"://(?:[^/?#@]*@)?([^:/?#]+)", 1)
    return F.lower(host)


def host_of_sql(expr: str) -> str:
    return f"lower(regexp_extract({expr}, '://(?:[^/?#@]*@)?([^:/?#]+)', 1))"


def registered_domain_psl(
    host: Column,
    normal: tuple[str, ...] = PSL_NORMAL,
    wildcard: tuple[str, ...] = PSL_WILDCARD,
    exception: tuple[str, ...] = PSL_EXCEPTION,
    max_labels: int | None = None,
) -> Column:
    """Registrable domain of a (lowercased) host per the PSL algorithm:
    public suffix = prevailing rule's span; registered domain = suffix
    plus one label; NULL when the host IS a public suffix (or empty).

    Pure column expression: the rule sets become constant-folded
    literal arrays, the lookup is a fixed when-chain over the last
    1..max_labels+1 label spans — zero shuffle at any scale.
    ``max_labels`` defaults to the depth the PASSED rules need."""
    if max_labels is None:
        max_labels = rules_max_labels(normal, wildcard, exception)
    s = {i: F.regexp_extract(host, _suffix_regex(i), 1) for i in range(1, max_labels + 2)}
    norm = F.array(*[F.lit(x) for x in normal])
    wild = F.array(*[F.lit(x) for x in wildcard])
    exc = F.array(*[F.lit(x) for x in exception])

    # One chain producing the registered domain directly. Prevailing
    # rule per the spec: any matching exception first (its suffix is
    # the rule minus its leftmost label, so the rule's own span IS the
    # registered domain), then the longest match (a normal rule at i,
    # or a wildcard parent at i-1 covering i, make the last i labels
    # public -> registered domain is the i+1-label span), then the
    # implicit default rule '*' (the TLD is public -> 2-label span).
    chain = F.when(F.lit(False), F.lit(""))
    for i in range(max_labels, 1, -1):
        chain = chain.when(F.array_contains(exc, s[i]), s[i])
    for i in range(max_labels, 1, -1):
        chain = chain.when(
            F.array_contains(norm, s[i]) | F.array_contains(wild, s[i - 1]),
            s[i + 1],
        )
    rd = chain.otherwise(s[2])
    # '' means the host has no span that deep — it IS a public suffix
    return F.when((rd != "") & (host != ""), rd)


def registered_domain_psl_sql(
    host_expr: str,
    normal: tuple[str, ...] = PSL_NORMAL,
    wildcard: tuple[str, ...] = PSL_WILDCARD,
    exception: tuple[str, ...] = PSL_EXCEPTION,
    max_labels: int | None = None,
) -> str:
    """DuckDB twin of :func:`registered_domain_psl` — same vendored
    arrays, same chain, same regexes, same derived depth."""
    if max_labels is None:
        max_labels = rules_max_labels(normal, wildcard, exception)

    def arr(xs: tuple[str, ...]) -> str:
        return "[" + ", ".join(f"'{x}'" for x in xs) + "]"

    s = {
        i: f"regexp_extract({host_expr}, '{_suffix_regex(i)}', 1)"
        for i in range(1, max_labels + 2)
    }
    whens = []
    for i in range(max_labels, 1, -1):
        whens.append(
            f"WHEN list_contains({arr(exception)}, {s[i]}) THEN {s[i]}"
        )
    for i in range(max_labels, 1, -1):
        whens.append(
            f"WHEN list_contains({arr(normal)}, {s[i]})"
            f" OR list_contains({arr(wildcard)}, {s[i - 1]}) THEN {s[i + 1]}"
        )
    rd = "CASE " + " ".join(whens) + f" ELSE {s[2]} END"
    return (
        f"CASE WHEN ({host_expr}) <> '' THEN nullif(({rd}), '') END"
    )


def registered_domain_psl_py(
    host: str,
    normal: tuple[str, ...] = PSL_NORMAL,
    wildcard: tuple[str, ...] = PSL_WILDCARD,
    exception: tuple[str, ...] = PSL_EXCEPTION,
) -> str | None:
    """Independent pure-Python reference of the PSL algorithm (label
    walk, no regex) — the test oracle for the column twins."""
    if not host:
        return None
    labels = host.lower().split(".")
    n = len(labels)
    ps_len = None
    for i in range(n, 0, -1):
        span = ".".join(labels[n - i :])
        if span in exception:
            ps_len = i - 1
            break
    if ps_len is None:
        for i in range(n, 0, -1):
            span = ".".join(labels[n - i :])
            parent = ".".join(labels[n - i + 1 :])
            if span in normal or (i >= 2 and parent in wildcard):
                ps_len = i
                break
    if ps_len is None:
        ps_len = 1  # implicit default rule '*'
    if n <= ps_len:
        return None
    return ".".join(labels[n - ps_len - 1 :])
