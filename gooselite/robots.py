"""From-scratch robots.txt evaluator (RFC 9309 subset), pure stdlib.

The crawl-politeness gate a Common-Crawl-style pipeline applies before a
url ever reaches the pages table.  Implements the spec's matching model:

- groups = consecutive ``User-agent`` lines followed by Allow/Disallow
  rules; comments (``#``) and unknown fields are ignored; field names
  are case-insensitive.
- group selection: the group whose agent token is the longest
  case-insensitive prefix of the product token wins; ``*`` groups apply
  only when no specific group matched.
- rule matching: ``*`` matches any octets, ``$`` anchors the end;
  the most-specific (longest-pattern) matching rule wins; on a tie
  between Allow and Disallow, Allow wins; no matching rule → allowed.

`allowed` is total over arbitrary text (a hostile robots.txt cannot
raise) — unparseable lines are skipped, as crawlers do in practice.
"""
from __future__ import annotations

import re
from typing import List, Tuple

_FIELD_RE = re.compile(r"^\s*([A-Za-z-]+)\s*:\s*(.*?)\s*(?:#.*)?$")


def _pattern_to_re(pattern: str) -> re.Pattern:
    """Translate an RFC 9309 path pattern (* wildcard, $ end anchor)."""
    anchored = pattern.endswith("$")
    if anchored:
        pattern = pattern[:-1]
    parts = [re.escape(p) for p in pattern.split("*")]
    return re.compile("".join(["^", ".*".join(parts)]) + ("$" if anchored else ""))


def parse_robots(text: str) -> List[Tuple[List[str], List[Tuple[bool, str]]]]:
    """→ [(agent_tokens, [(is_allow, pattern), ...]), ...] in file order."""
    groups: List[Tuple[List[str], List[Tuple[bool, str]]]] = []
    agents: List[str] = []
    rules: List[Tuple[bool, str]] = []
    collecting_agents = True
    for line in text.splitlines():
        m = _FIELD_RE.match(line)
        if not m:
            continue
        field, value = m.group(1).lower(), m.group(2)
        if field == "user-agent":
            if not collecting_agents:  # new group starts
                groups.append((agents, rules))
                agents, rules = [], []
                collecting_agents = True
            agents.append(value.lower())
        elif field in ("allow", "disallow"):
            if not agents:
                continue  # rules before any user-agent line: ignored
            collecting_agents = False
            if value:  # empty Disallow: == allow everything (no rule)
                rules.append((field == "allow", value))
        # other fields (crawl-delay, sitemap, ...) are ignored
    if agents:
        groups.append((agents, rules))
    return groups


def _select_group(groups, agent: str) -> List[Tuple[bool, str]]:
    """RFC 9309 §2.2.1: ALL groups matching the chosen user-agent merge
    (real robots.txt files commonly repeat a User-agent); the chosen
    agent is the longest-prefix specific token, else ``*``."""
    agent = agent.lower()
    best_len = -1
    for agents, _rules in groups:
        for tok in agents:
            if tok != "*" and agent.startswith(tok) and len(tok) > best_len:
                best_len = len(tok)
    merged: List[Tuple[bool, str]] = []
    want_star = best_len < 0
    for agents, rules in groups:
        for tok in agents:
            if (tok == "*" and want_star) or (
                    tok != "*" and len(tok) == best_len
                    and agent.startswith(tok)):
                merged.extend(rules)
                break
    return merged


def compile_rules(robots_text: str, agent: str):
    """Pre-compiled rule set for repeated verdicts against one (robots
    text, agent) pair — the per-host hot path: [(pattern_len, is_allow,
    compiled_re), ...]. Unparseable patterns are skipped."""
    compiled = []
    for is_allow, pattern in _select_group(parse_robots(robots_text), agent):
        try:
            compiled.append((len(pattern), is_allow, _pattern_to_re(pattern)))
        except re.error:  # pragma: no cover - escaped patterns can't
            continue
    return compiled


def allowed_compiled(compiled, path: str) -> bool:
    """Verdict from compile_rules output: longest pattern wins, tie →
    Allow wins, no match → allowed."""
    best = None  # (pattern_len, is_allow)
    for plen, is_allow, rx in compiled:
        if rx.match(path):
            key = (plen, is_allow)
            if best is None or key > best:
                best = key
    return True if best is None else best[1]


def allowed(robots_text: str, agent: str, path: str) -> bool:
    """RFC 9309 verdict for (agent, path); total over arbitrary text."""
    try:
        return allowed_compiled(compile_rules(robots_text, agent), path)
    except Exception:  # pragma: no cover - belt and braces: fail open
        return True
