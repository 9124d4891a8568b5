"""Provenance / PII / compliance operators (SURVEY.md §2.2 P13-P16, A8).

Reference parity:
- P13 provenance fingerprint  Data_Analysis/provenance_compliance.py:91-102
- P15 PII detection           provenance_compliance.py:187-265
- P16 quality/copyright checks provenance_compliance.py:267-333
- A8  compliance report       provenance_compliance.py:336-389

All regex work happens JVM-side (`regexp_count`); at 100 TB this is a
single scan-projection with no shuffle until the final tiny report agg.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..functions import hashing

# The reference's six PII regex families (provenance_compliance.py:192-217),
# RE2-compatible so the DuckDB oracle runs the identical patterns.
PII_PATTERNS: dict[str, str] = {
    "email": r"[a-zA-Z0-9._%+-]+@[a-zA-Z0-9.-]+\.[a-zA-Z]{2,}",
    "phone": r"\+?[0-9][0-9 ()-]{7,}[0-9]",
    "credentials_in_url": r"[a-zA-Z]+://[^/\s:@]+:[^/\s:@]+@",
    "ip_address": r"\b(?:[0-9]{1,3}\.){3}[0-9]{1,3}\b",
    "ssn_like": r"\b[0-9]{3}-[0-9]{2}-[0-9]{4}\b",
    "credit_card_like": r"\b(?:[0-9]{4}[ -]?){3}[0-9]{4}\b",
}

# family → risk level, matching the reference's per-family ladder
# exactly (provenance_compliance.py:192-217: email/phone high,
# ip_address medium, credentials/ssn/credit-card critical)
PII_RISK: dict[str, str] = {
    "email": "high",
    "phone": "high",
    "credentials_in_url": "critical",
    "ip_address": "medium",
    "ssn_like": "critical",
    "credit_card_like": "critical",
}
RISK_ORDER = ("none", "low", "medium", "high", "critical")


def pii_counts(text: Column) -> dict[str, Column]:
    return {
        name: F.regexp_count(text, F.lit(pat)) for name, pat in PII_PATTERNS.items()
    }


def pii_risk(counts: dict[str, Column]) -> Column:
    """Max risk across matched families, floored at 'low' for clean
    documents — the reference's exact rollup
    (provenance_compliance.py:246-258: ``risk_assessment = 'low'``
    when nothing matched, else the max family level)."""
    rank = {r: i for i, r in enumerate(RISK_ORDER)}
    risk_idx = F.lit(rank["low"])
    for name, cnt in counts.items():
        fam_idx = rank[PII_RISK[name]]
        risk_idx = F.when(cnt > 0, F.greatest(risk_idx, F.lit(fam_idx))).otherwise(risk_idx)
    out = F.lit("none")
    for r in RISK_ORDER[1:]:
        out = F.when(risk_idx == rank[r], F.lit(r)).otherwise(out)
    return out


def provenance_fingerprint(cols: list[Column]) -> Column:
    """md5 over a canonical '|'-joined key (null → ''), the Spark-first
    equivalent of the reference's sorted-key-JSON md5 (P13). '|' join is
    used instead of JSON so the oracle is engine-neutral (to_json
    whitespace differs across engines)."""
    normalized = [F.coalesce(c.cast("string"), F.lit("")) for c in cols]
    return hashing.md5_hex(F.concat_ws("|", *normalized))


def quality_issue_flags(
    checks: dict[str, Column],
) -> Column:
    """P16: array of the names of failed checks (order = dict order)."""
    flags = [F.when(cond, F.lit(name)) for name, cond in checks.items()]
    return F.filter(F.array(*flags), lambda x: x.isNotNull())


def severity_from_issues(issues: Column) -> Column:
    """none / warning (1 issue) / error (2+) ladder."""
    n = F.size(issues)
    return (
        F.when(n >= 2, F.lit("error"))
        .when(n == 1, F.lit("warning"))
        .otherwise(F.lit("none"))
    )


def risk_distribution(df: DataFrame, risk_col: Column) -> DataFrame:
    """A8: risk value counts + percentage.

    The total comes from an unpartitioned window over the aggregated
    (tiny: one row per risk level) frame — one job, one scan; a
    driver-side df.count() here would run the whole upstream lineage a
    second time."""
    from pyspark.sql import Window

    counts = df.groupBy(risk_col.alias("risk")).agg(F.count(F.lit(1)).alias("n"))
    total = F.sum("n").over(Window.partitionBy())
    return counts.withColumn(
        "pct", F.round(100.0 * F.col("n") / total.cast("double"), 2)
    )


# ---------------------------------------------------------------------------
# PII redaction (the write-side twin of P15's detection)

#: Redaction order matters: credential URLs contain email-shaped and
#: phone-shaped substrings, SSN/credit-card digit runs overlap the
#: phone pattern — redacting the more specific family first keeps the
#: output deterministic and identical across engines, which both apply
#: the chain in this exact order.
PII_REDACTION_ORDER: tuple[str, ...] = (
    "credentials_in_url",
    "email",
    "ssn_like",
    "credit_card_like",
    "ip_address",
    "phone",
)


def redact_pii(text: Column) -> Column:
    """Replace every match of the six PII families with a
    ``[FAMILY]`` token (digit-free, so later patterns in the chain can
    never re-match inside an earlier replacement).

    Pure sequential ``regexp_replace`` projection: one scan, no
    shuffle — at 100 TB this fuses into the same whole-stage-codegen
    pass as the rest of the cleaning chain.
    """
    out = text
    for name in PII_REDACTION_ORDER:
        out = F.regexp_replace(out, PII_PATTERNS[name], f"[{name.upper()}]")
    return out


def redact_pii_sql(expr: str) -> str:
    """DuckDB twin of :func:`redact_pii` (same patterns, same order,
    global flag)."""
    out = expr
    for name in PII_REDACTION_ORDER:
        pat = PII_PATTERNS[name].replace("'", "''")
        out = f"regexp_replace({out}, '{pat}', '[{name.upper()}]', 'g')"
    return out
