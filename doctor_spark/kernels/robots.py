"""robots.txt parsing and path matching — RFC 9309 (Robots Exclusion
Protocol), from scratch.

A crawl-politeness gate is the stage a web-corpus pipeline runs between
frontier generation and fetch (and again before training-set inclusion,
when robots snapshots accompany the crawl, as Common Crawl's do): drop
every page whose host's robots.txt disallows it for the harvesting
agent.  The reference engine has no robots stage (it receives documents
over HTTP); this module exists for the web-scale corpus side of this
repo, next to the URL stage in :mod:`..functions.urls`.

Semantics implemented (RFC 9309 §2):

- line syntax: ``key: value`` with ``#`` comments, keys case-insensitive,
  blank/garbage lines ignored, optional UTF-8 BOM stripped;
- groups: consecutive ``User-agent`` lines share one group; a rule line
  ends user-agent accumulation; rules before any ``User-agent`` line are
  ignored (RFC: rules outside a group);
- group selection: the group(s) whose agent token is the LONGEST
  case-insensitive prefix of the crawler's product token; groups with
  identical tokens are merged; ``*`` groups are the fallback — a specific
  match EXCLUDES the ``*`` group entirely (the classic trap this module's
  tests pin);
- rule precedence: longest pattern (octet length) wins; on a tie Allow
  wins; rules with an empty pattern are no-ops; no rule matched ⇒
  allowed (and no robots.txt at all ⇒ allowed);
- patterns: ``*`` matches any character run, a trailing ``$`` anchors the
  end; otherwise a pattern is a path prefix.

``Crawl-delay`` (a de-facto extension, not in RFC 9309) is parsed by
:func:`crawl_delay_ms` with the same group-selection rule — the fetch
scheduler's per-host politeness interval.

Out of scope (documented): percent-encoding normalization of pattern vs
path octets, ``Sitemap`` directives (non-rule lines are ignored), and
the 500 KiB size cap (callers truncate).
"""

from __future__ import annotations

import re

__all__ = [
    "compile_robots",
    "crawl_delay_ms",
    "pattern_to_regex",
    "robots_allowed",
]

_LINE_RE = re.compile(r"^\s*([A-Za-z-]+)\s*:\s*(.*?)\s*$")


def pattern_to_regex(pattern: str) -> str:
    """Robots path pattern → anchored Java/RE2/Python-portable regex.

    ``*`` → ``.*``; a trailing ``$`` anchors; everything else is escaped
    (``re.escape`` emits only backslash-escaped punctuation, which Java's
    ``Pattern`` accepts identically — the JVM matcher in
    :mod:`..operators.robots` runs these strings verbatim)."""
    anchored = pattern.endswith("$")
    body = pattern[:-1] if anchored else pattern
    parts = [re.escape(seg) for seg in body.split("*")]
    return "^" + ".*".join(parts) + ("$" if anchored else "")


def _parse_groups(body) -> list[tuple[list[str], list[tuple[bool, str]], list[str]]]:
    """robots.txt body → ``[(ua_tokens, rules, crawl_delays), ...]``."""
    if body is None:
        return []
    if isinstance(body, (bytes, bytearray)):
        body = bytes(body).decode("utf-8", errors="replace")
    body = body.lstrip("﻿")

    groups: list[tuple[list[str], list[tuple[bool, str]], list[str]]] = []
    cur_uas: list[str] = []
    in_ua_run = False
    for raw in body.splitlines():
        line = raw.split("#", 1)[0]
        m = _LINE_RE.match(line)
        if m is None:
            continue
        key = m.group(1).lower()
        val = m.group(2)
        if key == "user-agent":
            ua = val.lower()
            if not ua:
                continue
            if in_ua_run and groups and groups[-1][0] is cur_uas:
                cur_uas.append(ua)
            else:
                cur_uas = [ua]
                groups.append((cur_uas, [], []))
            in_ua_run = True
        elif key in ("allow", "disallow"):
            in_ua_run = False
            if groups and val:  # empty pattern = no-op rule
                groups[-1][1].append((key == "allow", val))
        elif key == "crawl-delay":
            in_ua_run = False
            if groups and val:
                groups[-1][2].append(val)
        else:
            # Sitemap/unknown: ends a UA run, contributes no rule
            in_ua_run = False
    return groups


def _select_groups(groups, agent: str):
    """The group(s) whose agent token is the longest case-insensitive
    prefix of ``agent``; the '*' groups only when no specific token
    matches."""
    agent_l = agent.lower()
    best_len = -1
    for uas, _r, _d in groups:
        for ua in uas:
            if ua != "*" and agent_l.startswith(ua) and len(ua) > best_len:
                best_len = len(ua)
    if best_len >= 0:
        return [
            g
            for g in groups
            if any(
                ua != "*" and len(ua) == best_len and agent_l.startswith(ua)
                for ua in g[0]
            )
        ]
    return [g for g in groups if "*" in g[0]]


def compile_robots(body, agent: str) -> list[tuple[bool, int, str]]:
    """Parse a robots.txt body and compile the rule list that applies to
    ``agent``, ready for first-match evaluation.

    Returns ``[(allow, pattern_len, regex), ...]`` sorted by
    ``(pattern_len DESC, allow DESC)`` so the FIRST rule whose regex
    matches the path is the RFC 9309 verdict (longest match, Allow wins
    ties).  An empty list means everything is allowed.
    """
    rules: list[tuple[bool, str]] = []
    for _uas, grules, _delays in _select_groups(_parse_groups(body), agent):
        rules.extend(grules)
    compiled = [
        (allow, len(pat), pattern_to_regex(pat)) for allow, pat in rules
    ]
    compiled.sort(key=lambda r: (-r[1], not r[0]))
    return compiled


def crawl_delay_ms(body, agent: str) -> int | None:
    """``Crawl-delay`` (seconds, possibly fractional) for ``agent`` in
    integer MILLISECONDS, or None when the selected group carries no
    parseable delay.  Group selection is the RFC rule (a specific match
    excludes '*'); when merged groups disagree the MAXIMUM wins — the
    conservative politeness choice.  Negative and non-numeric values are
    ignored."""
    best: int | None = None
    for _uas, _rules, delays in _select_groups(_parse_groups(body), agent):
        for raw in delays:
            try:
                ms = round(float(raw) * 1000)
            except ValueError:
                continue
            if ms < 0:
                continue
            if best is None or ms > best:
                best = ms
    return best


def robots_allowed(body, agent: str, path: str) -> bool:
    """Single-node evaluator (tests + oracle replays): first match in the
    compiled order is the verdict; no match ⇒ allowed."""
    if not path.startswith("/"):
        path = "/" + path
    for allow, _plen, rx in compile_robots(body, agent):
        if re.search(rx, path):
            return allow
    return True
