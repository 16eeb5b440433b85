"""robots.txt support — an EXTENSION over the reference (which has no
robots handling at all: grep of /root/reference/kryptone finds zero
matches) required by the north rule ("per-host priority queue with
robots.txt and politeness-delay enforcement").

Implements the public robots exclusion protocol subset that matters for
a frontier: ``User-agent`` groups, ``Allow``/``Disallow`` path rules
with longest-match precedence (Allow wins ties — Google/RFC 9309
semantics), ``Crawl-delay``. No wildcards beyond a trailing ``*``
(treated as prefix, which is what prefix rules already mean) and ``$``
anchors (matched exactly).

The provider function (host → robots.txt text or None) is the
deterministic stand-in for fetching ``https://host/robots.txt``; rules
are cached once per process/actor (stateful-stage contract).
"""

from __future__ import annotations

from dataclasses import dataclass, field


@dataclass
class RobotsRules:
    # (is_allow, path_prefix, anchored) — longest prefix wins, allow on tie
    rules: list[tuple[bool, str, bool]] = field(default_factory=list)
    crawl_delay: float | None = None

    def allowed(self, path: str) -> bool:
        if not path.startswith("/"):
            path = "/" + path
        best_len = -1
        best_allow = True
        for is_allow, prefix, anchored in self.rules:
            if prefix == "":
                continue
            if anchored:
                hit = path == prefix
            else:
                hit = path.startswith(prefix)
            if not hit:
                continue
            if len(prefix) > best_len or (len(prefix) == best_len and is_allow):
                best_len = len(prefix)
                best_allow = is_allow
        return best_allow


def parse_robots(text: str | None, agent: str = "*") -> RobotsRules:
    """Parse a robots.txt document for ``agent``: the most specific
    matching user-agent group applies ('*' as fallback)."""
    if not text:
        return RobotsRules()
    groups: list[tuple[list[str], RobotsRules]] = []
    agents: list[str] = []
    rules: RobotsRules | None = None
    last_was_agent = False
    for raw in text.splitlines():
        line = raw.split("#", 1)[0].strip()
        if not line or ":" not in line:
            continue
        key, _, value = line.partition(":")
        key = key.strip().lower()
        value = value.strip()
        if key == "user-agent":
            if not last_was_agent:
                if rules is not None:
                    groups.append((agents, rules))
                agents, rules = [], RobotsRules()
            agents.append(value.lower())
            last_was_agent = True
            continue
        last_was_agent = False
        if rules is None:
            continue
        if key in ("allow", "disallow"):
            prefix = value
            anchored = prefix.endswith("$")
            if anchored:
                prefix = prefix[:-1]
            if prefix.endswith("*"):
                prefix = prefix[:-1]
                anchored = False
            rules.rules.append((key == "allow", prefix, anchored))
        elif key == "crawl-delay":
            try:
                rules.crawl_delay = float(value)
            except ValueError:
                pass
    if rules is not None:
        groups.append((agents, rules))

    agent = agent.lower()
    fallback = RobotsRules()
    for agents, rules in groups:
        if agent in agents:
            return rules
        if "*" in agents:
            fallback = rules
    return fallback


class RobotsCache:
    """Per-process cache: host → parsed rules via a provider function.
    Deterministic provider ⇒ identical outcomes on every worker and in
    the golden simulator."""

    def __init__(self, provider, agent: str = "*"):
        self.provider = provider
        self.agent = agent
        self._cache: dict[str, RobotsRules] = {}

    def rules_for(self, host: str) -> RobotsRules:
        r = self._cache.get(host)
        if r is None:
            r = parse_robots(self.provider(host), self.agent)
            self._cache[host] = r
        return r

    def allowed(self, host: str, path: str) -> bool:
        return self.rules_for(host).allowed(path)

    def crawl_delay(self, host: str) -> float | None:
        return self.rules_for(host).crawl_delay


def synthetic_robots_provider(spec):
    """Deterministic robots.txt for the synthetic corpus: every 5th host
    disallows its /cat/ section, every 7th sets a crawl-delay, every
    11th disallows everything for a different agent (ignored by '*')."""

    def provider(host: str) -> str | None:
        try:
            idx = int(host.split(".")[0].removeprefix("h"))
        except ValueError:
            return None
        lines = ["User-agent: *"]
        if idx % 5 == 0:
            lines.append("Disallow: /cat/")
        if idx % 7 == 0:
            lines.append(f"Crawl-delay: {25 + (idx % 3) * 25}")
        if len(lines) == 1:
            lines.append("Disallow:")  # allow all
        if idx % 11 == 0:
            lines += ["", "User-agent: evilbot", "Disallow: /"]
        return "\n".join(lines)

    return provider
