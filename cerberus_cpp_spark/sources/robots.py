"""robots.txt (RFC 9309, public) — parser and matching semantics
for crawl-policy auditing.

Pinned contract (the deliberately-deterministic subset of RFC 9309
plus the de-facto Google REP rules, documented here because real
crawlers disagree on corners):

- Lines are ``key: value`` with ``#`` comments stripped first;
  keys are case-insensitive; unknown keys are ignored but DO
  terminate a user-agent block (they count as a rule line).
- A GROUP is one or more consecutive ``user-agent`` lines followed
  by its rule lines (``allow`` / ``disallow`` / ``crawl-delay``).
- Group selection for a product token: a group applies when one of
  its agent tokens is ``*`` or a case-insensitive SUBSTRING of the
  token; the most specific group wins (longest matching agent
  token; ties -> earliest group). No applicable group = allow all.
- Path rules use ``*`` (any char run) and a trailing ``$`` (end
  anchor); matching is longest-PATTERN-wins, and on equal length
  ALLOW wins. An empty ``disallow:`` value allows everything (it
  is dropped). Paths and patterns match byte-literally otherwise.
- ``parse_robots`` also collects ``sitemap:`` values (global, not
  group-scoped).

``rule_regex`` translates a path pattern to an anchored regex that
is Java-regex AND RE2 compatible (literal chars escaped by hand —
no lookaround, no backrefs), so a DuckDB oracle can replay matching
with the identical pattern string.
"""

from __future__ import annotations

from dataclasses import dataclass, field


@dataclass
class RobotsGroup:
    agents: list[str] = field(default_factory=list)
    #: (allow, pattern) in file order; empty patterns dropped
    rules: list[tuple[bool, str]] = field(default_factory=list)
    crawl_delay: float | None = None


@dataclass
class Robots:
    groups: list[RobotsGroup] = field(default_factory=list)
    sitemaps: list[str] = field(default_factory=list)


def parse_robots(text: str) -> Robots:
    """Parse a robots.txt body per the module contract."""
    out = Robots()
    cur: RobotsGroup | None = None
    in_agents = False
    for raw in text.splitlines():
        line = raw.split("#", 1)[0].strip()
        if not line or ":" not in line:
            continue
        key, _, val = line.partition(":")
        key = key.strip().lower()
        val = val.strip()
        if key == "sitemap":
            if val:
                out.sitemaps.append(val)
            continue
        if key == "user-agent":
            if not in_agents:
                cur = RobotsGroup()
                out.groups.append(cur)
                in_agents = True
            if val:
                cur.agents.append(val.lower())
            continue
        in_agents = False
        if cur is None:
            continue  # rules before any user-agent: ignored
        if key in ("allow", "disallow"):
            if val:
                cur.rules.append((key == "allow", val))
            # empty disallow = allow all -> no rule
        elif key == "crawl-delay":
            try:
                cur.crawl_delay = float(val)
            except ValueError:
                pass
        # unknown keys: ignored (but they closed the agent block)
    return out


def select_group(robots: Robots, agent: str) -> RobotsGroup | None:
    """Most specific applicable group for a product token: longest
    agent token that is '*' or a substring of ``agent`` (lowered);
    '*' has specificity 0; ties -> earliest group."""
    a = agent.lower()
    best: tuple[int, int] | None = None  # (-specificity, index)
    chosen = None
    for i, g in enumerate(robots.groups):
        spec = None
        for tok in g.agents:
            if tok == "*":
                s = 0
            elif tok in a:
                s = len(tok)
            else:
                continue
            if spec is None or s > spec:
                spec = s
        if spec is None:
            continue
        key = (-spec, i)
        if best is None or key < best:
            best = key
            chosen = g
    return chosen


def rule_regex(pattern: str) -> str:
    """Anchored regex for a path pattern — portable across Java
    regex and RE2 (hand-escaped literals, no lookaround)."""
    out = ["^"]
    specials = set("\\.[]{}()<>*+-=!?^$|")
    n = len(pattern)
    for i, ch in enumerate(pattern):
        if ch == "*":
            out.append(".*")
        elif ch == "$" and i == n - 1:
            out.append("$")
            return "".join(out)
        elif ch in specials:
            out.append("\\" + ch)
        else:
            out.append(ch)
    # no end anchor: prefix match
    return "".join(out)


def is_allowed(robots: Robots, agent: str, path: str) -> tuple[
        bool, str | None]:
    """(allowed, winning_pattern) for a path under the contract:
    longest matching pattern wins, allow wins length ties, and the
    lexicographically LARGEST pattern wins (length, allow) ties —
    the SAME total order the Spark operator's struct-max and the
    DuckDB oracle's window use, so all three surfaces name the same
    matched rule. No match or no applicable group = allowed. Pass
    the path WITH its query string ('/p?sid=1') — RFC 9309 patterns
    match against path-plus-query and '?' is a literal in the
    translation."""
    import re

    g = select_group(robots, agent)
    if g is None:
        return True, None
    best: tuple[int, int, str, bool] | None = None
    for allow, pat in g.rules:
        if re.match(rule_regex(pat), path) is not None:
            key = (len(pat), int(allow), pat)
            if best is None or key > (best[0], best[1], best[2]):
                best = (len(pat), int(allow), pat, allow)
    if best is None:
        return True, None
    return best[3], best[2]
