"""robots.txt parsing + rule matching (RFC 9309), the missing front half of
the scheduler's robots enforcement: the scheduler consumes per-host
``(allow, disallow)`` rule arrays (`frontier/scheduler.py::_apply_robots`);
this module produces them from raw fetched robots.txt bodies.

Parser semantics (RFC 9309 §2):

- lines are ``field: value`` with ``#`` comments; field names case-insensitive;
- ``User-agent`` lines open a group; consecutive UA lines share one group;
- the applicable group is the most specific UA match (longest token that is a
  case-insensitive substring of the product token), else the ``*`` group;
- empty ``Disallow:`` means allow-all (dropped at parse);
- ``Crawl-delay`` is a de-facto extension many crawlers honor — surfaced so
  callers can derive per-host politeness budgets.

Matching (`rule_match_col` / the scheduler): **longest-match wins** between
the allow and disallow rule sets; ties favor allow (RFC 9309 §2.2.2). The
reference converter itself never fetches robots (it replays a finished
HTTrack crawl), so this is north-rule surface, not reference parity.

The parse runs as an Arrow-batched pandas UDF over fetched robots bodies —
one robots.txt is small, but a 10^8-host crawl has 10^8 of them; parsing is
embarrassingly parallel and the output rule arrays are what broadcasts.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    DoubleType,
    StringType,
    StructField,
    StructType,
)

__all__ = ["parse_robots", "robots_rules", "rule_match_col", "apply_robots_rules"]


def parse_robots(text: str | None, user_agent: str = "*") -> dict:
    """One robots.txt body → {"allow": [...], "disallow": [...],
    "crawl_delay": float | None} for ``user_agent``."""
    groups: list[tuple[list[str], dict]] = []  # ([agents], rules)
    current: dict | None = None
    agents_open = False
    for raw in (text or "").splitlines():
        line = raw.split("#", 1)[0].strip()
        if not line or ":" not in line:
            continue
        field, value = line.split(":", 1)
        field = field.strip().lower()
        value = value.strip()
        if field == "user-agent":
            if not agents_open:
                current = {"agents": [], "allow": [], "disallow": [],
                           "crawl_delay": None}
                groups.append((current["agents"], current))
                agents_open = True
            current["agents"].append(value.lower())
            continue
        agents_open = False
        if current is None:
            continue  # rules before any User-agent line: ignored (RFC 9309)
        if field == "disallow" and value:
            current["disallow"].append(value)
        elif field == "allow" and value:
            current["allow"].append(value)
        elif field == "crawl-delay":
            try:
                current["crawl_delay"] = float(value)
            except ValueError:
                pass

    ua = user_agent.lower()
    best: dict | None = None
    best_len = -1
    star: dict | None = None
    for agents, rules in groups:
        for a in agents:
            if a == "*":
                if star is None:
                    star = rules
            elif a in ua and len(a) > best_len:
                best, best_len = rules, len(a)
    chosen = best if best is not None else star
    if chosen is None:
        return {"allow": [], "disallow": [], "crawl_delay": None}
    return {
        "allow": list(chosen["allow"]),
        "disallow": list(chosen["disallow"]),
        "crawl_delay": chosen["crawl_delay"],
    }


_RULES_TYPE = StructType([
    StructField("allow", ArrayType(StringType()), False),
    StructField("disallow", ArrayType(StringType()), False),
    StructField("crawl_delay", DoubleType(), True),
])


def robots_rules(
    fetched: DataFrame,
    body_col: str = "body",
    host_col: str = "host",
    user_agent: str = "*",
) -> DataFrame:
    """(host, allow, disallow, crawl_delay) from fetched robots.txt bodies —
    the DataFrame the scheduler's ``robots`` parameter broadcasts."""

    @F.pandas_udf(_RULES_TYPE)
    def _parse(bodies: pd.Series) -> pd.DataFrame:
        rows = [parse_robots(b if b is None or isinstance(b, str)
                             else bytes(b).decode("utf-8", "replace"),
                             user_agent)
                for b in bodies]
        return pd.DataFrame(rows, columns=["allow", "disallow", "crawl_delay"])

    return fetched.select(
        F.col(host_col).alias("host"), _parse(F.col(body_col)).alias("r")
    ).select("host", "r.allow", "r.disallow", "r.crawl_delay")


def _rule_to_regex(rule: Column) -> Column:
    """Compile a robots rule path to an anchored Java regex (RFC 9309 §2.2.3):
    ``*`` matches any char sequence, a trailing ``$`` anchors end-of-path,
    every other char is literal. Pure-Column string surgery."""
    anchored = rule.endswith("$")
    core = F.when(anchored, rule.substr(F.lit(1), F.length(rule) - 1)).otherwise(rule)
    # Escape regex metachars except '*' (kept as the wildcard marker) …
    escaped = F.regexp_replace(core, r"([.\\+?\[\]{}()^$|])", r"\\$1")
    # … then turn each '*' into '.*'.
    body = F.regexp_replace(escaped, r"\*", ".*")
    return F.concat(F.lit("^"), body, F.when(anchored, F.lit("$")).otherwise(F.lit("")))


def _rule_matches(path: Column, rule: Column) -> Column:
    """Does ``rule`` match ``path``? Literal rules (no '*', no trailing '$')
    take the cheap prefix path; wildcard rules compile to a regex
    (RFC 9309 §2.2.3 makes '*'/'$' support mandatory)."""
    literal = (~rule.contains("*")) & (~rule.endswith("$"))
    return F.when(literal, path.startswith(rule)).otherwise(
        F.regexp_like(path, _rule_to_regex(rule))
    )


def _longest_match_len(rules: Column, path: Column) -> Column:
    """Length of the longest rule that matches ``path`` (−1 if none), with
    RFC 9309 wildcard semantics. Specificity is the rule's octet length
    (the de-facto standard — Google's parser ranks by pattern length).
    Pure-Column (whole-stage codegen): filter → transform(length) → max."""
    return F.coalesce(
        F.array_max(
            F.transform(
                F.filter(
                    F.coalesce(rules, F.array()),
                    lambda p: _rule_matches(path, p),
                ),
                lambda p: F.length(p),
            )
        ),
        F.lit(-1),
    )


def rule_match_col(path: Column, allow: Column, disallow: Column) -> Column:
    """True when ``path`` is BLOCKED: the longest matching disallow rule is
    strictly longer than the longest matching allow rule (ties → allowed,
    RFC 9309 §2.2.2)."""
    return _longest_match_len(disallow, path) > _longest_match_len(allow, path)


def apply_robots_rules(
    df: DataFrame,
    rules: DataFrame,
    url_key_col: str = "url_key",
    host_col: str = "host",
) -> DataFrame:
    """Filter rows whose path is blocked for their host. ``rules`` is the
    ``robots_rules`` output (broadcast: one small row per host)."""
    path = F.regexp_extract(F.col(url_key_col), r"^[^/]*(/.*)?$", 1)
    has_allow = "allow" in rules.columns
    joined = df.join(F.broadcast(rules), host_col, "left")
    allow = F.col("allow") if has_allow else F.array()
    blocked = rule_match_col(path, allow, F.col("disallow"))
    out = joined.where(~blocked).drop("disallow", "crawl_delay")
    return out.drop("allow") if has_allow else out
