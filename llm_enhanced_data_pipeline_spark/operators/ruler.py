"""Full-fidelity ruler quality scorer (SURVEY.md §2 P18).

Replicates the reference's six weighted components, penalty, confidence
and tier ladder (Data_Analysis/evaluation/quality_scoring.py:98-133
weights; :135-304 component scorers; :329-357 penalty; :363-391
confidence; :393-406 tiers):

    completeness * 0.15 + recency * 0.20 + academic_substance * 0.30
    + methodological_rigor * 0.25 + impact_potential * 0.10
    + domain_relevance * 0.15  →  max(0, total - penalty)

Every component is a pure Spark SQL expression (codegen, no UDFs), and
every builder has a DuckDB twin generated from the SAME term tables so
the oracle cannot drift from the engine. Term membership uses substring
containment on the lowercased text — exactly the reference's
``word in abstract`` semantics (so 'result' matches 'results').
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# Component weights (quality_scoring.py:106-115).
REF_WEIGHTS = {
    "completeness": 0.15,
    "recency": 0.20,
    "substance": 0.30,
    "rigor": 0.25,
    "impact": 0.10,
    "relevance": 0.15,
}

# Term families (quality_scoring.py:190-327). Substring-matched.
INNOVATION_TERMS = [
    "novel", "new", "propose", "introduce", "innovative",
    "original", "state-of-the-art", "sota", "breakthrough",
]
EVAL_TERMS = [
    "experiment", "evaluation", "benchmark", "comparison",
    "result", "performance", "accuracy", "precision", "recall",
]
THEORY_TERMS = [
    "theorem", "proof", "lemma", "corollary", "equation",
    "formula", "mathematical", "theoretical",
]
METHOD_TERMS = [
    "method", "approach", "framework", "algorithm", "model",
    "architecture", "technique", "strategy",
]
METRIC_TERMS = ["metric", "measure", "score", "f1", "roc", "auc", "mse", "mae"]
DATASET_TERMS = ["dataset", "benchmark", "corpus", "collection", "db"]
STAT_TERMS = ["significant", "p-value", "confidence", "interval", "variance"]
REPRO_TERMS = ["reproducible", "replication", "code available", "github"]
APPLICATION_TERMS = [
    "application", "real-world", "practical", "deploy",
    "industry", "clinical", "commercial", "usable",
]
GENERAL_TERMS = ["general", "universal", "broad", "wide", "scalable"]
IMPACTFUL_TERMS = [
    "foundation", "fundamental", "paradigm", "landmark",
    "seminal", "pioneering", "transformative",
]
RESOURCE_TERMS = [
    "open source", "resource", "toolkit", "library",
    "package", "platform", "system",
]


def _has_any(text: Column, terms: list[str]) -> Column:
    """any(term in text) — substring containment, reference semantics."""
    cond = F.lit(False)
    for t in terms:
        cond = cond | text.contains(t)
    return cond


def _has_any_sql(expr: str, terms: list[str]) -> str:
    return "(" + " OR ".join(f"contains({expr}, '{t}')" for t in terms) + ")"


def _count_matching(text: Column, terms: list[str]) -> Column:
    """sum(1 for term in terms if term in text)."""
    total = F.lit(0)
    for t in terms:
        total = total + F.when(text.contains(t), F.lit(1)).otherwise(F.lit(0))
    return total


def _count_matching_sql(expr: str, terms: list[str]) -> str:
    parts = [f"(CASE WHEN contains({expr}, '{t}') THEN 1 ELSE 0 END)" for t in terms]
    return "(" + " + ".join(parts) + ")"


def _tiered(count: Column, tiers: list[tuple[int, float]]) -> Column:
    """Highest matching (min_count, points) tier wins, else 0.0 —
    mirrors the reference's descending if/elif ladders. ``tiers`` is
    ascending; building ascending leaves the HIGHEST threshold as the
    outermost (first-checked) branch."""
    out = F.lit(0.0)
    for min_count, points in tiers:
        out = F.when(count >= F.lit(min_count), F.lit(points)).otherwise(out)
    return out


def _tiered_sql(count_expr: str, tiers: list[tuple[int, float]]) -> str:
    out = "0.0::DOUBLE"
    for min_count, points in tiers:
        out = f"(CASE WHEN {count_expr} >= {min_count} THEN {points}::DOUBLE ELSE {out} END)"
    return out


# -- completeness (quality_scoring.py:135-164) ------------------------------
# Mandatory title/abstract/authors (any missing -> 0.0); graded points
# for long-enough title/abstract, any authors; +0.05 per present
# optional field (categories / comments / publish_date / url).

def completeness(
    title: Column,
    abstract: Column,
    n_authors: Column,
    has_categories: Column,
    has_comments: Column,
    has_publish_date: Column,
    has_url: Column,
) -> Column:
    score = (
        F.when(F.length(abstract) > 100, F.lit(0.3)).otherwise(F.lit(0.0))
        + F.when(F.length(title) > 10, F.lit(0.25)).otherwise(F.lit(0.0))
        + F.when(n_authors > 0, F.lit(0.25)).otherwise(F.lit(0.0))
        + F.when(has_categories, F.lit(0.05)).otherwise(F.lit(0.0))
        + F.when(has_comments, F.lit(0.05)).otherwise(F.lit(0.0))
        + F.when(has_publish_date, F.lit(0.05)).otherwise(F.lit(0.0))
        + F.when(has_url, F.lit(0.05)).otherwise(F.lit(0.0))
    )
    mandatory_ok = (F.length(title) > 0) & (F.length(abstract) > 0) & (n_authors > 0)
    return F.when(mandatory_ok, F.least(score, F.lit(1.0))).otherwise(F.lit(0.0))


def completeness_sql(
    title: str,
    abstract: str,
    n_authors: str,
    has_categories: str,
    has_comments: str,
    has_publish_date: str,
    has_url: str,
) -> str:
    score = (
        f"((CASE WHEN length({abstract}) > 100 THEN 0.3::DOUBLE ELSE 0.0::DOUBLE END)"
        f" + (CASE WHEN length({title}) > 10 THEN 0.25::DOUBLE ELSE 0.0::DOUBLE END)"
        f" + (CASE WHEN {n_authors} > 0 THEN 0.25::DOUBLE ELSE 0.0::DOUBLE END)"
        f" + (CASE WHEN {has_categories} THEN 0.05::DOUBLE ELSE 0.0::DOUBLE END)"
        f" + (CASE WHEN {has_comments} THEN 0.05::DOUBLE ELSE 0.0::DOUBLE END)"
        f" + (CASE WHEN {has_publish_date} THEN 0.05::DOUBLE ELSE 0.0::DOUBLE END)"
        f" + (CASE WHEN {has_url} THEN 0.05::DOUBLE ELSE 0.0::DOUBLE END))"
    )
    mandatory = (
        f"(length({title}) > 0 AND length({abstract}) > 0 AND {n_authors} > 0)"
    )
    return f"(CASE WHEN {mandatory} THEN least({score}, 1.0::DOUBLE) ELSE 0.0::DOUBLE END)"


# -- recency (quality_scoring.py:166-189) -----------------------------------

def recency(days_ago: Column) -> Column:
    return (
        F.when(days_ago <= 7, F.lit(1.0))
        .when(days_ago <= 30, 0.9 - (days_ago - 7) * 0.01)
        .when(days_ago <= 90, 0.7 - (days_ago - 30) * 0.005)
        .when(days_ago <= 365, 0.4 - (days_ago - 90) * 0.001)
        .otherwise(F.greatest(F.lit(0.1), 0.3 - (days_ago - 365) * 0.0001))
    )


def recency_sql(days_ago: str) -> str:
    return f"""(CASE
      WHEN {days_ago} <= 7 THEN 1.0::DOUBLE
      WHEN {days_ago} <= 30 THEN 0.9::DOUBLE - ({days_ago} - 7) * 0.01::DOUBLE
      WHEN {days_ago} <= 90 THEN 0.7::DOUBLE - ({days_ago} - 30) * 0.005::DOUBLE
      WHEN {days_ago} <= 365 THEN 0.4::DOUBLE - ({days_ago} - 90) * 0.001::DOUBLE
      ELSE greatest(0.1::DOUBLE, 0.3::DOUBLE - ({days_ago} - 365) * 0.0001::DOUBLE) END)"""


# -- academic substance (quality_scoring.py:190-235) ------------------------

_TECH_TIERS = [(1, 0.1), (3, 0.25), (5, 0.4)]
_INNOV_TIERS = [(1, 0.1), (2, 0.2), (3, 0.3)]
_EVAL_TIERS = [(1, 0.1), (2, 0.15), (3, 0.2)]


def substance(abstract: Column, tech_term_count: Column) -> Column:
    score = (
        _tiered(tech_term_count, _TECH_TIERS)
        + _tiered(_count_matching(abstract, INNOVATION_TERMS), _INNOV_TIERS)
        + _tiered(_count_matching(abstract, EVAL_TERMS), _EVAL_TIERS)
        + F.when(_has_any(abstract, THEORY_TERMS), F.lit(0.1)).otherwise(F.lit(0.0))
    )
    return F.least(score, F.lit(1.0))


def substance_sql(abstract: str, tech_term_count: str) -> str:
    score = (
        f"({_tiered_sql(tech_term_count, _TECH_TIERS)}"
        f" + {_tiered_sql(_count_matching_sql(abstract, INNOVATION_TERMS), _INNOV_TIERS)}"
        f" + {_tiered_sql(_count_matching_sql(abstract, EVAL_TERMS), _EVAL_TIERS)}"
        f" + (CASE WHEN {_has_any_sql(abstract, THEORY_TERMS)} THEN 0.1::DOUBLE ELSE 0.0::DOUBLE END))"
    )
    return f"least({score}, 1.0::DOUBLE)"


# -- methodological rigor (quality_scoring.py:237-269) ----------------------

_METHOD_TIERS = [(1, 0.15), (2, 0.3)]


def rigor(abstract: Column) -> Column:
    score = (
        _tiered(_count_matching(abstract, METHOD_TERMS), _METHOD_TIERS)
        + F.when(_has_any(abstract, METRIC_TERMS), F.lit(0.2)).otherwise(F.lit(0.0))
        + F.when(_has_any(abstract, DATASET_TERMS), F.lit(0.2)).otherwise(F.lit(0.0))
        + F.when(_has_any(abstract, STAT_TERMS), F.lit(0.15)).otherwise(F.lit(0.0))
        + F.when(_has_any(abstract, REPRO_TERMS), F.lit(0.15)).otherwise(F.lit(0.0))
    )
    return F.least(score, F.lit(1.0))


def rigor_sql(abstract: str) -> str:
    score = (
        f"({_tiered_sql(_count_matching_sql(abstract, METHOD_TERMS), _METHOD_TIERS)}"
        f" + (CASE WHEN {_has_any_sql(abstract, METRIC_TERMS)} THEN 0.2::DOUBLE ELSE 0.0::DOUBLE END)"
        f" + (CASE WHEN {_has_any_sql(abstract, DATASET_TERMS)} THEN 0.2::DOUBLE ELSE 0.0::DOUBLE END)"
        f" + (CASE WHEN {_has_any_sql(abstract, STAT_TERMS)} THEN 0.15::DOUBLE ELSE 0.0::DOUBLE END)"
        f" + (CASE WHEN {_has_any_sql(abstract, REPRO_TERMS)} THEN 0.15::DOUBLE ELSE 0.0::DOUBLE END))"
    )
    return f"least({score}, 1.0::DOUBLE)"


# -- impact potential (quality_scoring.py:274-304) --------------------------

def impact(abstract: Column) -> Column:
    score = (
        F.when(_has_any(abstract, APPLICATION_TERMS), F.lit(0.3)).otherwise(F.lit(0.0))
        + F.when(_has_any(abstract, GENERAL_TERMS), F.lit(0.2)).otherwise(F.lit(0.0))
        + F.when(_has_any(abstract, IMPACTFUL_TERMS), F.lit(0.25)).otherwise(F.lit(0.0))
        + F.when(_has_any(abstract, RESOURCE_TERMS), F.lit(0.25)).otherwise(F.lit(0.0))
    )
    return F.least(score, F.lit(1.0))


def impact_sql(abstract: str) -> str:
    score = (
        f"((CASE WHEN {_has_any_sql(abstract, APPLICATION_TERMS)} THEN 0.3::DOUBLE ELSE 0.0::DOUBLE END)"
        f" + (CASE WHEN {_has_any_sql(abstract, GENERAL_TERMS)} THEN 0.2::DOUBLE ELSE 0.0::DOUBLE END)"
        f" + (CASE WHEN {_has_any_sql(abstract, IMPACTFUL_TERMS)} THEN 0.25::DOUBLE ELSE 0.0::DOUBLE END)"
        f" + (CASE WHEN {_has_any_sql(abstract, RESOURCE_TERMS)} THEN 0.25::DOUBLE ELSE 0.0::DOUBLE END))"
    )
    return f"least({score}, 1.0::DOUBLE)"


# -- domain relevance (quality_scoring.py:306-327) --------------------------
# match_ratio*0.5 + (0.3 if any cs.* category else 0.1)
# + min(0.2, title_matches*0.1); topic_terms == [] -> 0.5 flat.

def domain_relevance(
    title: Column, text: Column, has_cs_category: Column, topic_terms: list[str]
) -> Column:
    if not topic_terms:
        return F.lit(0.5)
    matched = _count_matching(text, topic_terms)
    match_ratio = matched.cast("double") / F.lit(float(len(topic_terms)))
    category_score = F.when(has_cs_category, F.lit(0.3)).otherwise(F.lit(0.1))
    title_score = F.least(
        F.lit(0.2), _count_matching(title, topic_terms).cast("double") * 0.1
    )
    return F.least(match_ratio * 0.5 + category_score + title_score, F.lit(1.0))


def domain_relevance_sql(
    title: str, text: str, has_cs_category: str, topic_terms: list[str]
) -> str:
    if not topic_terms:
        return "0.5::DOUBLE"
    ratio = (
        f"({_count_matching_sql(text, topic_terms)}::DOUBLE"
        f" / {float(len(topic_terms))})"
    )
    cat = f"(CASE WHEN {has_cs_category} THEN 0.3::DOUBLE ELSE 0.1::DOUBLE END)"
    ttl = f"least(0.2::DOUBLE, {_count_matching_sql(title, topic_terms)}::DOUBLE * 0.1::DOUBLE)"
    return f"least({ratio} * 0.5::DOUBLE + {cat} + {ttl}, 1.0::DOUBLE)"


# -- penalty (quality_scoring.py:329-357) -----------------------------------
# Short abstract +0.2 (the reference's <50 elif is unreachable —
# replicated as-is), short title +0.1, flagged duplicate +0.3; the
# suspicious-pattern regex +0.15; capped at 0.5.

_SUSPICIOUS_RE = r"\b(arxiv|submit|preprint)\b.*\b(version|draft)\b"


def penalty(title: Column, abstract: Column, is_duplicate: Column) -> Column:
    p = (
        F.when(F.length(abstract) < 100, F.lit(0.2)).otherwise(F.lit(0.0))
        + F.when(F.length(title) < 10, F.lit(0.1)).otherwise(F.lit(0.0))
        + F.when(
            F.concat(title, F.lit(" "), abstract).rlike(_SUSPICIOUS_RE), F.lit(0.15)
        ).otherwise(F.lit(0.0))
        + F.when(is_duplicate, F.lit(0.3)).otherwise(F.lit(0.0))
    )
    return F.least(p, F.lit(0.5))


def penalty_sql(title: str, abstract: str, is_duplicate: str) -> str:
    p = (
        f"((CASE WHEN length({abstract}) < 100 THEN 0.2::DOUBLE ELSE 0.0::DOUBLE END)"
        f" + (CASE WHEN length({title}) < 10 THEN 0.1::DOUBLE ELSE 0.0::DOUBLE END)"
        f" + (CASE WHEN regexp_matches({title} || ' ' || {abstract},"
        f" '{_SUSPICIOUS_RE}') THEN 0.15::DOUBLE ELSE 0.0::DOUBLE END)"
        f" + (CASE WHEN {is_duplicate} THEN 0.3::DOUBLE ELSE 0.0::DOUBLE END))"
    )
    return f"least({p}, 0.5::DOUBLE)"


# -- confidence (quality_scoring.py:363-391) --------------------------------
# mean of [raw completeness, abstract-length factor, tech-term factor].

def confidence(
    completeness_raw: Column, abstract: Column, tech_term_count: Column
) -> Column:
    length_factor = (
        F.when(F.length(abstract) > 500, F.lit(1.0))
        .when(F.length(abstract) > 200, F.lit(0.8))
        .when(F.length(abstract) > 50, F.lit(0.5))
        .otherwise(F.lit(0.2))
    )
    term_factor = (
        F.when(tech_term_count >= 3, F.lit(1.0))
        .when(tech_term_count >= 1, F.lit(0.7))
        .otherwise(F.lit(0.3))
    )
    return (completeness_raw + length_factor + term_factor) / 3.0


def confidence_sql(completeness_raw: str, abstract: str, tech_term_count: str) -> str:
    length_factor = (
        f"(CASE WHEN length({abstract}) > 500 THEN 1.0::DOUBLE"
        f" WHEN length({abstract}) > 200 THEN 0.8::DOUBLE"
        f" WHEN length({abstract}) > 50 THEN 0.5::DOUBLE ELSE 0.2::DOUBLE END)"
    )
    term_factor = (
        f"(CASE WHEN {tech_term_count} >= 3 THEN 1.0::DOUBLE"
        f" WHEN {tech_term_count} >= 1 THEN 0.7::DOUBLE ELSE 0.3::DOUBLE END)"
    )
    return f"(({completeness_raw} + {length_factor} + {term_factor}) / 3.0::DOUBLE)"
