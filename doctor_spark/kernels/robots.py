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

Out of scope (documented): percent-encoding normalization of pattern vs
path octets, ``Crawl-delay``/``Sitemap`` directives (non-rule lines are
ignored), and the 500 KiB size cap (callers truncate).
"""

from __future__ import annotations

import re

__all__ = ["compile_robots", "pattern_to_regex", "robots_allowed"]

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


def compile_robots(body, agent: str) -> list[tuple[bool, int, str]]:
    """Parse a robots.txt body and compile the rule list that applies to
    ``agent``, ready for first-match evaluation.

    Returns ``[(allow, pattern_len, regex), ...]`` sorted by
    ``(pattern_len DESC, allow DESC)`` so the FIRST rule whose regex
    matches the path is the RFC 9309 verdict (longest match, Allow wins
    ties).  An empty list means everything is allowed.
    """
    if body is None:
        return []
    if isinstance(body, (bytes, bytearray)):
        body = bytes(body).decode("utf-8", errors="replace")
    body = body.lstrip("﻿")
    agent_l = agent.lower()

    # group parse: list of (ua_tokens, rules)
    groups: list[tuple[list[str], list[tuple[bool, str]]]] = []
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
                groups.append((cur_uas, []))
            in_ua_run = True
        elif key in ("allow", "disallow"):
            in_ua_run = False
            if groups and val:  # empty pattern = no-op rule
                groups[-1][1].append((key == "allow", val))
        else:
            # Sitemap/Crawl-delay/unknown: ends a UA run, contributes no rule
            in_ua_run = False

    # group selection: longest specific prefix token, else the '*' groups
    best_len = -1
    for uas, _rules in groups:
        for ua in uas:
            if ua != "*" and agent_l.startswith(ua) and len(ua) > best_len:
                best_len = len(ua)
    rules: list[tuple[bool, str]] = []
    if best_len >= 0:
        for uas, grules in groups:
            if any(
                ua != "*" and len(ua) == best_len and agent_l.startswith(ua)
                for ua in uas
            ):
                rules.extend(grules)
    else:
        for uas, grules in groups:
            if "*" in uas:
                rules.extend(grules)

    compiled = [
        (allow, len(pat), pattern_to_regex(pat)) for allow, pat in rules
    ]
    compiled.sort(key=lambda r: (-r[1], not r[0]))
    return compiled


def robots_allowed(body, agent: str, path: str) -> bool:
    """Single-node evaluator (tests + oracle replays): first match in the
    compiled order is the verdict; no match ⇒ allowed."""
    if not path.startswith("/"):
        path = "/" + path
    for allow, _plen, rx in compile_robots(body, agent):
        if re.search(rx, path):
            return allow
    return True
