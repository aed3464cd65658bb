"""robots.txt parser — the RFC 9309 (Robots Exclusion Protocol) subset a
crawl pipeline needs: group model (consecutive User-agent lines share the
following Allow/Disallow rules), product-token agent matching with the
``*`` fallback group, comments, and unknown-directive tolerance
(Crawl-delay, Sitemap, etc. are ignored, per the spec's extensibility
rule). Matching semantics — longest path prefix wins, Allow wins a
length tie — live in the APPLY step (queries/pipeline.py robots family),
not here; this module only turns bytes a webserver actually serves into
the (prefix, allow) rule dimension.

Public spec only: RFC 9309 + the original 1994 REP draft. The reference
repo (Yelp/mysql_streamer) has no crawl surface; this belongs to the
training-data-pipeline extension (SURVEY.md §7 phases 4-5).
"""

from __future__ import annotations


def parse_robots(text: str, agent: str) -> list[tuple[str, bool]]:
    """Parse robots.txt ``text`` and return the rule list
    ``[(path_prefix, allow), ...]`` for the group governing ``agent``:
    the group naming the agent exactly (case-insensitive) if one exists,
    else the ``*`` group, else no rules. The implicit allow-everything
    default ``("", True)`` is always included, so an empty/missing file
    yields "crawl anything" — the spec's stance.

    Group model per RFC 9309 §2.1: consecutive User-agent lines
    accumulate into one group's agent set; the first rule line closes the
    set; a later User-agent line starts a NEW group. Rules seen before
    any User-agent line have no group and are ignored. ``Disallow:``
    with an empty value means "nothing disallowed" and contributes no
    rule. Lines are trimmed, ``#`` starts a comment, unknown directives
    are skipped.
    """
    groups: list[tuple[list[str], list[tuple[str, bool]]]] = []
    cur_agents: list[str] = []
    cur_rules: list[tuple[str, bool]] = []
    in_rules = False

    def close_group() -> None:
        nonlocal cur_agents, cur_rules, in_rules
        if cur_agents:
            groups.append((cur_agents, cur_rules))
        cur_agents, cur_rules, in_rules = [], [], False

    for raw in text.splitlines():
        line = raw.split("#", 1)[0].strip()
        if not line:
            continue
        key, sep, val = line.partition(":")
        if not sep:
            continue  # not a directive line
        key = key.strip().lower()
        val = val.strip()
        if key == "user-agent":
            if in_rules:
                close_group()
            cur_agents.append(val.lower())
        elif key in ("allow", "disallow"):
            if not cur_agents:
                continue  # groupless rule: ignored per the group model
            in_rules = True
            if val == "":
                continue  # empty Disallow/Allow carries no rule
            cur_rules.append((val, key == "allow"))
        # any other directive: tolerated and ignored
    close_group()

    agent_l = agent.lower()
    chosen: list[tuple[str, bool]] | None = None
    for agents, rules in groups:
        if agent_l in agents:
            chosen = rules
            break
    if chosen is None:
        for agents, rules in groups:
            if "*" in agents:
                chosen = rules
                break
    return [("", True)] + (chosen or [])
