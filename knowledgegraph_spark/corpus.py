"""Deterministic synthetic web-page corpus + pure-Python golden oracle.

Replaces the reference's external inputs (Vespa document store + LLM
extraction, vespa_integration.py / entity_extractor.py) with a seeded,
fully reproducible generator so that goldens are *derivable* rather than
recorded:

  * pages:   (url, warc_ts, html, text, lang) — the exact input shape
             mandated by BASELINE.json input_hint.
  * goldens: per-url extracted text (byte-identity oracle), planted
             mentions, planted triples, and the canonicalized entity /
             triple tables computed by an *independent* union-find oracle
             (NOT by the Spark pipeline under test).

The sentence grammar here is the specification the extraction operator
(operators/extraction.py) implements — the deterministic stand-in for the
reference's LLM prompt grammar (prompt.py:16-144, entity_extractor.py:135-270).

Everything is a pure function of (n_pages, seed). No wall clock, no
external data.
"""

from __future__ import annotations

import hashlib
import random
from dataclasses import dataclass, field
from datetime import datetime, timedelta, timezone
from html import escape

from knowledgegraph_spark.config import (
    DEFAULT_STRENGTH,
    MATCHING_RULES,
    STRENGTH_BY_PRED,
)

EPOCH = datetime(2024, 1, 1, tzinfo=timezone.utc)

FIRST_NAMES = [
    "Alice", "Bruno", "Carla", "Deepak", "Elena", "Farid", "Grace", "Hugo",
    "Ingrid", "Jonas", "Keiko", "Liam", "Mona", "Nils", "Olga", "Pablo",
    "Quentin", "Rosa", "Stefan", "Tara", "Umar", "Vera", "Wim", "Xenia",
    "Yusuf", "Zara", "Anton", "Bianca", "Cedric", "Dora",
]
LAST_NAMES = [
    "Johnson", "Keller", "Lindgren", "Moreau", "Novak", "Okafor", "Petrov",
    "Quirke", "Rossi", "Schmidt", "Tanaka", "Ueda", "Vargas", "Weber",
    "Xiang", "Yilmaz", "Zhou", "Andersen", "Bauer", "Castillo", "Dubois",
    "Eriksen", "Fischer", "Garcia", "Haddad", "Ivanov", "Jansen", "Kowalski",
    "Larsen", "Meyer", "Nakamura", "Olsen", "Popescu", "Quast", "Richter",
    "Silva", "Thomsen", "Urbano", "Vogel", "Wagner",
]
ORG_BASES = [
    "Acme", "Borealis", "Cinder", "Dynamo", "Everest", "Fathom", "Glacier",
    "Harbor", "Ironwood", "Juniper", "Krypton", "Lumen", "Meridian", "Nimbus",
    "Obsidian", "Pinnacle", "Quartz", "Riverton", "Summit", "Tundra",
    "Umbra", "Vertex", "Wavecrest", "Xylo", "Yonder", "Zephyr",
]
ORG_SUFFIXES = ["Corp", "Labs", "Systems", "Analytics", "Industries"]
ORG_ALIAS_SUFFIXES = {
    "Corp": "Corporation",
    "Labs": "Laboratories",
    "Systems": "Software Systems",
    "Analytics": "Data Analytics",
    "Industries": "Heavy Industries",
}
TEAM_NAMES = [
    "Platform", "Infrastructure", "Search", "Payments", "Growth", "Mobile",
    "Security", "Data", "Frontend", "Backend", "Reliability", "Tooling",
]
PROJECT_NAMES = [
    "Apollo", "Borealis", "Cascade", "Delta", "Ember", "Falcon", "Gemini",
    "Horizon", "Icarus", "Jupiter", "Kepler", "Lyra", "Mercury", "Nova",
    "Orion", "Pegasus", "Quasar", "Rigel", "Sirius", "Titan",
]
REPO_WORDS = [
    "dataflow", "ingest", "scheduler", "parser", "indexer", "gateway",
    "metrics", "auth", "billing", "notifier", "crawler", "renderer",
    "allocator", "cache", "router", "sync", "vault", "logger",
]
BRANCH_WORDS = [
    "fix-null-keys", "perf-shuffle", "add-retries", "refactor-io",
    "update-deps", "feature-linking", "cleanup-logs", "tune-gc",
    "schema-v2", "batch-writes", "dedup-pass", "arrow-udf",
]
TOPIC_NAMES = [
    "stream processing", "query optimization", "entity resolution",
    "schema evolution", "vector search", "data quality", "access control",
    "incremental compute", "graph storage", "text extraction",
    "capacity planning", "cost attribution",
]
EVENT_NAMES = [
    "Q1 Planning", "Q2 Planning", "Q3 Planning", "Q4 Planning",
    "Arch Review", "Launch Retro", "Oncall Handoff", "Perf Summit",
    "Design Jam", "Release Readiness",
]
ISSUE_KEYS = ["KG", "DF", "OPS", "SRCH", "PAY"]
ROLES = [
    "Senior Engineer", "Staff Engineer", "Data Scientist",
    "Product Manager", "Site Reliability Engineer", "Engineering Director",
]
TITLES = [
    "Principal Engineer", "Head of Platform", "Tech Lead",
    "Distinguished Engineer", "VP of Data",
]
CITIES = ["Berlin", "Lisbon", "Oslo", "Madrid", "Toronto", "Osaka", "Denver", "Zurich"]
ISSUE_STATUSES = ["Open", "Triaged", "Blocked", "Resolved", "Closed"]
PR_LABELS = ["bugfix", "performance", "refactor", "security", "docs", "ci"]

# relationTag per fact kind — lockstep with the extractor's pattern tags
# (operators/extraction.py _pattern_table)
FACT_TAG = {
    "WORKS_AT": "works_at",
    "WORKS_AT_ROLE": "works_at:role",
    "WORKS_ON": "works_on",
    "MEMBER_OF": "member_of",
    "MANAGES": "manages",
    "AUTHORED": "authored",
    "REVIEWED": "reviewed",
    "BELONGS_TO_PR": "belongs_to:repo",
    "ASSIGNED_TO": "assigned_to",
    "MERGES": "merges",
    "CREATED": "created:repo",
    "CREATED_EVENT": "created:event",
    "BELONGS_TO_TOPIC": "belongs_to:topic",
}

NOISE_SENTENCES = [
    "The weather that week was unremarkable and mild.",
    "Lunch was served in the atrium at noon.",
    "Research & development budgets were discussed informally.",
    "Several attendees joined the call a few minutes late.",
    "The office plants were watered on Friday.",
    "Coffee consumption reached a new quarterly high.",
    "A fire drill briefly interrupted the afternoon.",
    "Parking remains scarce near the north entrance.",
    "The vending machine accepts contactless payments now.",
    "Someone left an umbrella in the third-floor kitchen.",
]
NOISE_DE = [
    "Das Wetter war in dieser Woche unauffällig und mild.",
    "Die Besprechung begann mit einer kurzen Vorstellungsrunde.",
    "Der Kaffee in der Küche war schon wieder leer.",
    "Die Präsentation wurde auf nächste Woche verschoben.",
]
NOISE_FR = [
    "La réunion a commencé avec quelques minutes de retard.",
    "Le temps était doux cette semaine-là.",
    "Les notes de la séance seront partagées demain.",
    "Le déjeuner a été servi dans le hall principal.",
]


# ---------------------------------------------------------------------------
# World model
# ---------------------------------------------------------------------------


@dataclass
class Person:
    first: str
    last: str
    email: str

    @property
    def name(self) -> str:
        return f"{self.first} {self.last}"

    @property
    def alias(self) -> str:
        return f"{self.first[0]}. {self.last}"


@dataclass
class Org:
    base: str
    suffix: str
    domain: str

    @property
    def name(self) -> str:
        return f"{self.base} {self.suffix}"

    @property
    def alias(self) -> str:
        return f"{self.base} {ORG_ALIAS_SUFFIXES[self.suffix]}"


@dataclass
class World:
    people: list[Person] = field(default_factory=list)
    orgs: list[Org] = field(default_factory=list)
    teams: list[str] = field(default_factory=list)
    projects: list[str] = field(default_factory=list)
    repos: list[str] = field(default_factory=list)       # "owner/name"
    branches: list[str] = field(default_factory=list)    # unique branch names
    prs: list[int] = field(default_factory=list)         # PR numbers
    issues: list[str] = field(default_factory=list)      # "KEY-n"
    events: list[str] = field(default_factory=list)
    topics: list[str] = field(default_factory=list)


def make_world(rng: random.Random, n_pages: int) -> World:
    w = World()
    n_people = min(len(FIRST_NAMES) * len(LAST_NAMES), max(8, n_pages // 3))
    combos = rng.sample(
        [(f, l) for f in FIRST_NAMES for l in LAST_NAMES], n_people
    )
    n_orgs = min(len(ORG_BASES), max(4, n_pages // 15))
    org_picks = rng.sample(ORG_BASES, n_orgs)
    orgs = []
    for base in org_picks:
        suffix = rng.choice(ORG_SUFFIXES)
        orgs.append(Org(base, suffix, f"{base.lower()}.example"))
    w.orgs = orgs
    for f, l in combos:
        org = rng.choice(orgs)
        w.people.append(Person(f, l, f"{f.lower()}.{l.lower()}@{org.domain}"))
    w.teams = TEAM_NAMES[: max(3, min(len(TEAM_NAMES), n_pages // 20))]
    w.projects = PROJECT_NAMES[: max(4, min(len(PROJECT_NAMES), n_pages // 15))]
    owners = [o.base.lower() for o in orgs]
    w.repos = [
        f"{rng.choice(owners)}/{word}" for word in
        rng.sample(REPO_WORDS, max(4, min(len(REPO_WORDS), n_pages // 12)))
    ]
    w.branches = list(BRANCH_WORDS[: max(4, min(len(BRANCH_WORDS), n_pages // 12))])
    w.prs = list(range(100, 100 + max(6, n_pages // 4)))
    w.issues = [
        f"{rng.choice(ISSUE_KEYS)}-{i}" for i in range(10, 10 + max(6, n_pages // 4))
    ]
    w.events = EVENT_NAMES[: max(3, min(len(EVENT_NAMES), n_pages // 20))]
    w.topics = TOPIC_NAMES[: max(4, min(len(TOPIC_NAMES), n_pages // 15))]
    return w


# ---------------------------------------------------------------------------
# Scaled (non-saturating) world — entities/facts ∝ n_pages.
#
# The fixed-list world above SATURATES: its name pools cap people at 1200,
# orgs at 26, facts at 200k — so beyond ~1M pages the link/CC key spaces
# stop growing while extract volume keeps growing, which (a) is not how
# real web corpora behave (their entity sets grow with the crawl) and
# (b) pins the link/CC stages' work constant, distorting scaling
# measurements (round-3 verdict item 1).  The scaled world derives every
# entity and fact as a pure function of its index, so NOTHING is
# materialized: the executor broadcast carries a few integers + closures,
# not an O(n_pages) fact list, and the corpus keys keep growing with
# n_pages the way a crawl's do.  Surface forms stay inside the extraction
# grammar (operators/extraction.py): synthetic words are `[A-Z][a-z]+`
# from a bijective base-50 syllable numeral, so names/orgs/projects/teams
# parse exactly like the fixed-list ones.
# ---------------------------------------------------------------------------

from collections.abc import Sequence as _SequenceABC  # noqa: E402

_SYL = [
    "ba", "be", "bi", "bo", "bu", "da", "de", "di", "do", "du",
    "fa", "fe", "fi", "fo", "fu", "ga", "ge", "gi", "go", "gu",
    "ka", "ke", "ki", "ko", "ku", "la", "le", "li", "lo", "lu",
    "ma", "me", "mi", "mo", "mu", "na", "ne", "ni", "no", "nu",
    "ra", "re", "ri", "ro", "ru", "sa", "se", "si", "so", "su",
]

_M64 = (1 << 64) - 1


def _mix(i: int) -> int:
    """splitmix64 — deterministic index scatter (public-domain algorithm)."""
    z = (i + 0x9E3779B97F4A7C15) & _M64
    z = ((z ^ (z >> 30)) * 0xBF58476D1CE4E5B9) & _M64
    z = ((z ^ (z >> 27)) * 0x94D049BB133111EB) & _M64
    return z ^ (z >> 31)


def _synth_word(idx: int, cap: bool = True) -> str:
    """Injective index → pronounceable word (bijective base-50 numeral)."""
    n = idx + 1
    parts = []
    while n:
        n -= 1
        parts.append(_SYL[n % 50])
        n //= 50
    w = "".join(reversed(parts))
    return w.capitalize() if cap else w


class _LazySeq(_SequenceABC):
    """Sequence facade over an index function — len + getitem only, so
    ``random.choice``/``random.sample`` work without materializing
    anything.  Picklable when ``fn`` is (module-level fns / partials)."""

    __slots__ = ("n", "fn")

    def __init__(self, n: int, fn):
        self.n, self.fn = n, fn

    def __len__(self) -> int:
        return self.n

    def __getitem__(self, i: int):
        if isinstance(i, slice):
            return [self[j] for j in range(*i.indices(self.n))]
        if i < 0:
            i += self.n
        if not 0 <= i < self.n:
            raise IndexError(i)
        return self.fn(i)

    def __reduce__(self):
        return (_LazySeq, (self.n, self.fn))


def _scaled_org(j: int) -> Org:
    base = _synth_word(j)
    return Org(base, ORG_SUFFIXES[_mix(j) % len(ORG_SUFFIXES)], f"{base.lower()}.example")


def _scaled_person(i: int, n_orgs: int) -> Person:
    first = FIRST_NAMES[i % len(FIRST_NAMES)]
    last = _synth_word(i // len(FIRST_NAMES))
    org = _scaled_org(_mix(i + 1) % n_orgs)
    return Person(first, last, f"{first.lower()}.{last.lower()}@{org.domain}")


def _scaled_repo(k: int, n_orgs: int) -> str:
    return f"{_scaled_org(_mix(k + 3) % n_orgs).base.lower()}/{_synth_word(k, cap=False)}"


def _scaled_branch(k: int) -> str:
    return f"b-{_synth_word(k, cap=False)}"


def _scaled_issue(k: int) -> str:
    return f"{ISSUE_KEYS[_mix(k + 5) % len(ISSUE_KEYS)]}-{k + 10}"


def _scaled_event(k: int) -> str:
    return f"Summit {_synth_word(k)}"


def _scaled_topic(k: int) -> str:
    return f"topic {_synth_word(k, cap=False)}"


def make_scaled_world(n_pages: int) -> World:
    """World whose entity counts grow ∝ n_pages (same per-capita rates as
    ``make_world``'s small-scale targets), with O(1) memory."""
    from functools import partial

    n_orgs = max(4, n_pages // 15)
    w = World()
    w.orgs = _LazySeq(n_orgs, _scaled_org)
    w.people = _LazySeq(max(8, n_pages // 3), partial(_scaled_person, n_orgs=n_orgs))
    w.teams = _LazySeq(max(3, n_pages // 20), _synth_word)
    w.projects = _LazySeq(max(4, n_pages // 15), _synth_word)
    w.repos = _LazySeq(max(4, n_pages // 12), partial(_scaled_repo, n_orgs=n_orgs))
    w.branches = _LazySeq(max(4, n_pages // 12), _scaled_branch)
    w.prs = range(100, 100 + max(6, n_pages // 4))
    w.issues = _LazySeq(max(6, n_pages // 4), _scaled_issue)
    w.events = _LazySeq(max(3, n_pages // 20), _scaled_event)
    w.topics = _LazySeq(max(4, n_pages // 15), _scaled_topic)
    return w


def _fact_from_index(fidx: int, world: World, head_frac: float, seed: int):
    """Fact ``fidx`` as a pure function of (seed, fidx) — the scaled
    world's pool entries are derived on demand, never stored."""
    rng = random.Random((seed + 2) * 1_000_003 + fidx)
    return _mk_fact(rng, world, world.orgs[0], head_frac)


# ---------------------------------------------------------------------------
# Mention rendering + fact sentences
#
# A "fact" is one planted relation instance; rendering a fact yields one
# sentence plus the planted mention records (what a perfect extractor
# recovers from that sentence).
# ---------------------------------------------------------------------------


def _person_mention(p: Person, form: int) -> tuple[str, dict]:
    """form 0: canonical name; 1: name+email; 2: alias+email."""
    if form == 0:
        return p.name, {"name": p.name, "type": "Person", "email": None}
    if form == 1:
        return f"{p.name} ({p.email})", {"name": p.name, "type": "Person", "email": p.email}
    return f"{p.alias} ({p.email})", {"name": p.alias, "type": "Person", "email": p.email}


def _org_mention(o: Org, form: int) -> tuple[str, dict]:
    """form 0: name; 1: name+[domain]; 2: alias+[domain]."""
    if form == 0:
        return o.name, {"name": o.name, "type": "Organization", "domain": None}
    if form == 1:
        return f"{o.name} [{o.domain}]", {"name": o.name, "type": "Organization", "domain": o.domain}
    return f"{o.alias} [{o.domain}]", {"name": o.alias, "type": "Organization", "domain": o.domain}


def _mk_fact(rng: random.Random, w: World, head_org: Org, head_frac: float):
    """Build one fact: returns (sentence_template_fn) deferred to render time.

    We return the *identity* of the fact (pred + participants); the surface
    form of each mention is chosen per page render so the same fact appears
    under different aliases across pages (the dedup exercise).
    """
    kind = rng.choice(
        [
            "WORKS_AT", "WORKS_AT", "WORKS_AT",  # weighted: head relation
            "WORKS_ON", "MEMBER_OF", "MANAGES", "AUTHORED", "REVIEWED",
            "BELONGS_TO_PR", "ASSIGNED_TO", "MERGES", "CREATED",
            "CREATED_EVENT", "BELONGS_TO_TOPIC",
            # attribute-bearing facts (entity_config.yaml field specs)
            "WORKS_AT_ROLE", "TITLE", "BASED_IN", "ISSUE_STATUS", "PR_LABELS",
        ]
    )
    p = rng.choice(w.people)
    if kind == "WORKS_AT":
        org = head_org if rng.random() < head_frac else rng.choice(w.orgs)
        return ("WORKS_AT", p, org)
    if kind == "WORKS_AT_ROLE":
        org = head_org if rng.random() < head_frac else rng.choice(w.orgs)
        return ("WORKS_AT_ROLE", p, org, rng.choice(ROLES))
    if kind == "TITLE":
        return ("TITLE", p, rng.choice(TITLES))
    if kind == "BASED_IN":
        return ("BASED_IN", p, rng.choice(CITIES))
    if kind == "ISSUE_STATUS":
        return ("ISSUE_STATUS", rng.choice(w.issues), rng.choice(ISSUE_STATUSES))
    if kind == "PR_LABELS":
        return ("PR_LABELS", rng.choice(w.prs), tuple(rng.sample(PR_LABELS, 2)))
    if kind == "WORKS_ON":
        return ("WORKS_ON", p, rng.choice(w.projects))
    if kind == "MEMBER_OF":
        return ("MEMBER_OF", p, rng.choice(w.teams))
    if kind == "MANAGES":
        return ("MANAGES", p, rng.choice(w.teams))
    if kind == "AUTHORED":
        return ("AUTHORED", p, rng.choice(w.prs))
    if kind == "REVIEWED":
        return ("REVIEWED", p, rng.choice(w.prs))
    if kind == "BELONGS_TO_PR":
        return ("BELONGS_TO_PR", rng.choice(w.prs), rng.choice(w.repos))
    if kind == "ASSIGNED_TO":
        return ("ASSIGNED_TO", rng.choice(w.issues), p)
    if kind == "MERGES":
        b1, b2 = rng.sample(w.branches, 2)
        return ("MERGES", rng.choice(w.prs), (b1, b2))
    if kind == "CREATED":
        return ("CREATED", p, rng.choice(w.repos))
    if kind == "CREATED_EVENT":
        return ("CREATED_EVENT", p, rng.choice(w.events))
    return ("BELONGS_TO_TOPIC", rng.choice(w.issues), rng.choice(w.topics))


def _render_fact(rng: random.Random, fact) -> tuple[str, list[dict], list[dict]]:
    """Render fact → (sentence, mentions, raw_triples).

    Mentions: dicts with surface attrs (the spec for the extractor).
    Raw triples: endpoint references by *surface name* — endpoint
    canonicalization happens downstream (linking + CC), same as the
    reference resolving relation endpoints through entity_mapping
    (systematic_merge_provider.py:944-989).
    """
    kind = fact[0]
    mentions: list[dict] = []
    triples: list[dict] = []

    def _p(person, forms=(0, 1, 2)):
        form = rng.choice(forms)
        s, m = _person_mention(person, form)
        mentions.append(m)
        return s, m

    def _o(org):
        form = rng.choice((0, 1, 2))
        # alias form always carries the domain so linkage is decidable
        s, m = _org_mention(org, form)
        mentions.append(m)
        return s, m

    def _simple(name, typ):
        m = {"name": name, "type": typ}
        mentions.append(m)
        return m

    def _t(s, st, p, o, ot):
        triples.append({"s": s, "st": st, "p": p, "o": o, "ot": ot})

    if kind == "WORKS_AT":
        ps, pm = _p(fact[1])
        os_, om = _o(fact[2])
        sent = f"{ps} works at {os_}."
        _t(pm["name"], "Person", "WORKS_AT", om["name"], "Organization")
    elif kind == "WORKS_AT_ROLE":
        ps, pm = _p(fact[1])
        os_, om = _o(fact[2])
        role = fact[3]
        pm["role"] = role
        pm["worksAt"] = om["name"]
        sent = f"{ps} works at {os_} as a {role}."
        _t(pm["name"], "Person", "WORKS_AT", om["name"], "Organization")
    elif kind == "TITLE":
        ps, pm = _p(fact[1])
        pm["title"] = fact[2]
        sent = f'{ps} holds the title "{fact[2]}".'
    elif kind == "BASED_IN":
        ps, pm = _p(fact[1])
        pm["location"] = fact[2]
        sent = f"{ps} is based in {fact[2]}."
    elif kind == "ISSUE_STATUS":
        issue = f"Issue {fact[1]}"
        im = _simple(issue, "Issue")
        im["status"] = fact[2]
        sent = f"{issue} has status {fact[2]}."
    elif kind == "PR_LABELS":
        pr = f"Pull Request #{fact[1]}"
        prm = _simple(pr, "CodeChangeRequest")
        l1, l2 = fact[2]
        prm["labels"] = [l1, l2]
        sent = f'{pr} is labeled "{l1}" and "{l2}".'
    elif kind == "WORKS_ON":
        ps, pm = _p(fact[1])
        proj = fact[2]
        _simple(proj, "Project")
        sent = f"{ps} works on Project {proj}."
        _t(pm["name"], "Person", "WORKS_ON", proj, "Project")
    elif kind == "MEMBER_OF":
        ps, pm = _p(fact[1])
        team = fact[2]
        _simple(team, "Team")
        sent = f"{ps} is a member of the {team} team."
        _t(pm["name"], "Person", "MEMBER_OF", team, "Team")
    elif kind == "MANAGES":
        ps, pm = _p(fact[1])
        team = fact[2]
        _simple(team, "Team")
        sent = f"{ps} manages the {team} team."
        _t(pm["name"], "Person", "MANAGES", team, "Team")
    elif kind == "AUTHORED":
        ps, pm = _p(fact[1])
        pr = f"Pull Request #{fact[2]}"
        _simple(pr, "CodeChangeRequest")
        sent = f"{ps} authored {pr}."
        _t(pm["name"], "Person", "AUTHORED", pr, "CodeChangeRequest")
    elif kind == "REVIEWED":
        ps, pm = _p(fact[1])
        pr = f"Pull Request #{fact[2]}"
        _simple(pr, "CodeChangeRequest")
        sent = f"{ps} reviewed {pr}."
        _t(pm["name"], "Person", "REVIEWED", pr, "CodeChangeRequest")
    elif kind == "BELONGS_TO_PR":
        pr = f"Pull Request #{fact[1]}"
        repo = fact[2]
        _simple(pr, "CodeChangeRequest")
        _simple(repo, "Repository")
        sent = f"{pr} belongs to {repo}."
        _t(pr, "CodeChangeRequest", "BELONGS_TO", repo, "Repository")
    elif kind == "ASSIGNED_TO":
        issue = f"Issue {fact[1]}"
        _simple(issue, "Issue")
        ps, pm = _p(fact[2])
        sent = f"{issue} is assigned to {ps}."
        _t(issue, "Issue", "ASSIGNED_TO", pm["name"], "Person")
    elif kind == "MERGES":
        pr = f"Pull Request #{fact[1]}"
        b1, b2 = fact[2]
        _simple(pr, "CodeChangeRequest")
        _simple(b1, "Branch")
        _simple(b2, "Branch")
        sent = f"{pr} merges branch {b1} into branch {b2}."
        _t(pr, "CodeChangeRequest", "MERGES_FROM", b1, "Branch")
        _t(pr, "CodeChangeRequest", "MERGES_TO", b2, "Branch")
    elif kind == "CREATED":
        ps, pm = _p(fact[1])
        repo = fact[2]
        _simple(repo, "Repository")
        sent = f"{ps} created the repository {repo}."
        _t(pm["name"], "Person", "CREATED", repo, "Repository")
    elif kind == "CREATED_EVENT":
        ps, pm = _p(fact[1])
        ev = fact[2]
        _simple(ev, "Event")
        sent = f'{ps} created the "{ev}" event.'
        _t(pm["name"], "Person", "CREATED", ev, "Event")
    else:  # BELONGS_TO_TOPIC
        issue = f"Issue {fact[1]}"
        topic = fact[2]
        _simple(issue, "Issue")
        _simple(topic, "Topic")
        sent = f'{issue} belongs to the topic "{topic}".'
        _t(issue, "Issue", "BELONGS_TO", topic, "Topic")

    for t in triples:
        t["strength"] = STRENGTH_BY_PRED.get(t["p"], DEFAULT_STRENGTH)
        t["description"] = sent
        t["tag"] = FACT_TAG[kind]
    for m in mentions:
        m["description"] = sent
    return sent, mentions, triples


# ---------------------------------------------------------------------------
# Page assembly: golden text + HTML wrapper
# ---------------------------------------------------------------------------

_NAV = (
    '<nav class="site-nav"><ul><li><a href="/">Home</a></li>'
    '<li><a href="/about">About</a></li>'
    '<li><a href="/archive">Archive</a></li></ul></nav>'
)
_ADS = '<div class="ads">Subscribe to our newsletter for weekly updates!</div>'


def page_html(title: str, sentences: list[str], site: str) -> str:
    """Wrap body content in boilerplate HTML (nav/ads/footer/script) to
    exercise trafilatura-style main-content extraction."""
    paras = "\n".join(f"<p>{escape(s)}</p>" for s in sentences)
    return (
        "<!DOCTYPE html>\n"
        f"<html><head><title>{escape(title)}</title>"
        '<meta charset="utf-8"></head>\n<body>\n'
        f"{_NAV}\n{_ADS}\n"
        f"<article>\n<h1>{escape(title)}</h1>\n{paras}\n</article>\n"
        f'<footer>&copy; 2024 {escape(site)} &mdash; All rights reserved. '
        '<a href="/privacy">Privacy</a></footer>\n'
        "<script>var _q=[];_q.push(1);</script>\n"
        "</body></html>"
    )


def golden_text(title: str, sentences: list[str]) -> str:
    """The byte-exact text the html→text extractor must produce."""
    return title + "\n\n" + "\n".join(sentences)


def build_world_and_pool(n_pages: int, seed: int = 42, head_frac: float = 0.25,
                         scaled: bool = False):
    """World + fact pool, a pure function of (n_pages, seed, head_frac).

    ``scaled=False`` (default, fixture posture): fixed-list world, fact
    pool materialized and capped at 200k — small, broadcastable, and
    byte-stable across rounds for the golden/P-R tests.  Diversity
    SATURATES with n_pages by construction.

    ``scaled=True`` (web-corpus posture): entities and facts grow ∝
    n_pages via the index-parametric world — the pool is a ``_LazySeq``
    deriving each fact on demand, so the executor broadcast stays O(1)
    no matter how large n_pages is.  This is the corpus the scaling runs
    use: link/CC key spaces grow with the crawl, as real web data does.
    """
    if scaled:
        from functools import partial

        w = make_scaled_world(n_pages)
        n_facts = max(8, n_pages)
        pool = _LazySeq(
            n_facts, partial(_fact_from_index, world=w, head_frac=head_frac, seed=seed)
        )
        return w, pool
    rng = random.Random(seed)
    w = make_world(rng, n_pages)
    head_org = w.orgs[0]
    # pool capped: diversity saturates with world size; an uncapped pool
    # would make the executor broadcast grow linearly with n_pages
    n_facts = max(8, min(n_pages, 200_000))
    pool = [_mk_fact(rng, w, head_org, head_frac) for _ in range(n_facts)]
    return w, pool


def generate_page(pid: int, pool, seed: int = 42):
    """Render ONE page — a pure function of (pid, pool, seed).

    Page-level randomness is keyed by (seed, pid) only, so pages render
    independently in any order on any executor (distributed generation for
    the large-scale benches) while remaining byte-identical to the
    sequential path.

    Returns (page_row, golden_text, mentions, triples).
    """
    rng = random.Random((seed + 1) * 1_000_003 + pid)
    url = f"https://site{pid % 7}.example/{pid:08d}"
    ts = EPOCH + timedelta(seconds=137 * pid)
    site = f"site{pid % 7}.example"
    title = f"Engineering notes {pid:05d}"
    lang_roll = rng.random()
    if lang_roll < 0.04:
        lang, noise_pool = "de", NOISE_DE
    elif lang_roll < 0.08:
        lang, noise_pool = "fr", NOISE_FR
    else:
        lang, noise_pool = "en", NOISE_SENTENCES

    n_sent = rng.randint(4, 9)
    sentences: list[str] = []
    page_mentions: list[dict] = []
    page_triples: list[dict] = []
    ord_in_page = 0
    for _ in range(n_sent):
        if lang != "en" or rng.random() < 0.3:
            sentences.append(rng.choice(noise_pool))
            continue
        fact = rng.choice(pool)
        sent, mentions, triples = _render_fact(rng, fact)
        sentences.append(sent)
        for m in mentions:
            rec = dict(m)
            rec["url"] = url
            rec["ts"] = ts
            rec["ord"] = ord_in_page
            ord_in_page += 1
            page_mentions.append(rec)
        for t in triples:
            rec = dict(t)
            rec["url"] = url
            rec["ts"] = ts
            page_triples.append(rec)

    text = golden_text(title, sentences)
    html_only = rng.random() < 0.9
    page = {
        "url": url,
        "warc_ts": ts,
        "html": page_html(title, sentences, site).encode("utf-8") if html_only else None,
        "text": None if html_only else text,
        "lang": lang,
    }
    return page, text, page_mentions, page_triples


def generate_corpus(n_pages: int, seed: int = 42, head_frac: float = 0.25,
                    scaled: bool = False):
    """Generate the corpus (driver-side; for tests and goldens).

    Returns dict with:
      pages:    list of rows (url, warc_ts, html:bytes|None, text:str|None, lang)
      goldens:  {url: golden_text}
      mentions: planted mention records [{url, ord, name, type, email?, domain?}]
      triples:  planted raw triples [{url, s, p, o, strength, description}]
      world:    the World (for debugging only — pipeline must never see it)

    ``scaled``: use the non-saturating index-parametric world (see
    ``build_world_and_pool``); the P/R gates run against both postures.
    """
    w, pool = build_world_and_pool(n_pages, seed, head_frac, scaled=scaled)
    pages, goldens, all_mentions, all_triples = [], {}, [], []
    for pid in range(n_pages):
        page, text, ms, ts_ = generate_page(pid, pool, seed)
        pages.append(page)
        goldens[page["url"]] = text
        all_mentions.extend(ms)
        all_triples.extend(ts_)
    return {
        "pages": pages,
        "goldens": goldens,
        "mentions": all_mentions,
        "triples": all_triples,
        "world": w,
    }


def pages_dataframe(spark, n_pages: int, seed: int = 42, head_frac: float = 0.25,
                    partitions: int | None = None, scaled: bool = False):
    """Distributed corpus generation: pages rendered on executors.

    spark.range(n_pages) → mapInPandas(render) with the fact pool
    broadcast (an O(1) lazy pool in ``scaled`` mode) — generation scales
    with the cluster like any other stage, so benchmark inputs need never
    bottleneck on the driver.
    """
    from knowledgegraph_spark.config import PAGES_SCHEMA

    w, pool = build_world_and_pool(n_pages, seed, head_frac, scaled=scaled)
    sc = spark.sparkContext
    pool_bc = sc.broadcast(pool)
    parts = partitions or sc.defaultParallelism

    def render(batches):
        import pandas as pd

        p = pool_bc.value
        for pdf in batches:
            rows = [generate_page(int(pid), p, seed)[0] for pid in pdf["id"]]
            yield pd.DataFrame(
                rows, columns=["url", "warc_ts", "html", "text", "lang"]
            )

    return (
        spark.range(0, n_pages, numPartitions=parts)
        .mapInPandas(render, schema=PAGES_SCHEMA)
    )


# ---------------------------------------------------------------------------
# Pure-Python oracle: linking + canonicalization + folds via union-find.
# Independent implementation of the same semantics the Spark pipeline
# implements with broadcast joins + large-star/small-star CC
# (intended semantics of systematic_merge_provider.py:152-298, 713-850).
# ---------------------------------------------------------------------------


class _UF:
    def __init__(self):
        self.parent: dict = {}

    def find(self, x):
        root = x
        while self.parent.setdefault(root, root) != root:
            root = self.parent[root]
        while self.parent[x] != root:  # path compression
            self.parent[x], x = root, self.parent[x]
        return root

    def union(self, a, b):
        ra, rb = self.find(a), self.find(b)
        if ra != rb:
            self.parent[max(ra, rb)] = min(ra, rb)


def _norm(s: str) -> str:
    # reference normalization: lower + trim (systematic_merge_provider.py:60-62)
    return s.strip().lower()


def mention_match_keys(m: dict) -> list[str]:
    """Match keys per MATCHING_RULES for a planted/extracted mention."""
    keys = []
    t = m["type"]
    for rule in MATCHING_RULES.get(t, []):
        f = rule["field"]
        if f == "name":
            keys.append(f"{t}|name|{_norm(m['name'])}")
        elif f == "emails" and m.get("email"):
            keys.append(f"{t}|emails|{_norm(m['email'])}")
        elif f == "domain" and m.get("domain"):
            keys.append(f"{t}|domain|{_norm(m['domain'])}")
        # aliases / sourceSystemId / url / title / id: not observable at
        # mention time in this corpus (no mention carries them separately)
    return keys


def oracle_canonicalize(mentions: list[dict]) -> dict[tuple, str]:
    """(type, surface_name_norm) → canonical entity name.

    Mentions merge iff they share any match key (transitive).  Canonical
    name = surface name of the first mention of the component in
    (url, ord) order — the deterministic stand-in for the reference's
    arrival-order first-wins (systematic_merge_provider.py:717).
    """
    uf = _UF()
    key_owner: dict[str, tuple] = {}
    ordered = sorted(mentions, key=lambda m: (m["ts"], m["url"], m["ord"]))
    node_ids: dict[tuple, int] = {}
    first_name: dict[int, tuple] = {}
    for i, m in enumerate(ordered):
        node = (m["type"], _norm(m["name"]))
        if node not in node_ids:
            node_ids[node] = len(node_ids)
            first_name[node_ids[node]] = (m["ts"], m["url"], m["ord"], m["name"])
        nid = node_ids[node]
        for k in mention_match_keys(m):
            if k in key_owner:
                uf.union(key_owner[k], nid)
            else:
                key_owner[k] = nid
    # canonical per root = first-seen surface name among members
    members: dict[int, list[int]] = {}
    for node, nid in node_ids.items():
        members.setdefault(uf.find(nid), []).append(nid)
    canon_of_root = {
        root: min(first_name[n] for n in nids)[3]
        for root, nids in members.items()
    }
    return {
        node: canon_of_root[uf.find(nid)] for node, nid in node_ids.items()
    }


def oracle_triples(corpus) -> list[dict]:
    """Canonicalized, grouped golden triples (set semantics)."""
    canon = oracle_canonicalize(corpus["mentions"])

    grouped: dict[tuple, dict] = {}
    for t in corpus["triples"]:
        s = canon.get((t["st"], _norm(t["s"])), t["s"])
        o = canon.get((t["ot"], _norm(t["o"])), t["o"])
        k = (s, t["p"], o)
        g = grouped.setdefault(
            k,
            {"subj": s, "pred": t["p"], "obj": o, "strength": 0.0,
             "descriptions": set(), "sources": set(), "relationTags": set()},
        )
        g["strength"] = max(g["strength"], t["strength"])
        g["descriptions"].add(t["description"])
        g["sources"].add(t["url"])
        if t.get("tag"):
            g["relationTags"].add(t["tag"])
    out = []
    for g in grouped.values():
        g["descriptions"] = sorted(g["descriptions"])
        g["sources"] = sorted(g["sources"])
        g["relationTags"] = sorted(g["relationTags"])
        g["relation_id"] = hashlib.sha256(
            f"{g['subj']}::{g['pred']}::{g['obj']}".encode()
        ).hexdigest()
        out.append(g)
    return out


def oracle_entities(corpus) -> list[dict]:
    """Folded golden entity nodes: identity fields plus per-type attributes
    (role/location/labels append-unique, worksAt/title preserve-first,
    status if-better = max by (length, value), rawDescriptions set)."""
    canon = oracle_canonicalize(corpus["mentions"])
    folded: dict[tuple, dict] = {}
    ordered = sorted(corpus["mentions"], key=lambda m: (m["ts"], m["url"], m["ord"]))
    for m in ordered:
        cname = canon[(m["type"], _norm(m["name"]))]
        k = (m["type"], cname)
        e = folded.setdefault(
            k,
            {"name": cname, "type": m["type"], "aliases": set(),
             "emails": set(), "domain": None, "sources": set(),
             "role": set(), "location": set(), "labels": set(),
             "worksAt": None, "title": None, "status": None,
             "rawDescriptions": set()},
        )
        if m["name"] != cname:
            e["aliases"].add(m["name"])
        if m.get("email"):
            e["emails"].add(m["email"])
        if m.get("domain") and e["domain"] is None:
            e["domain"] = m["domain"]
        e["sources"].add(m["url"])
        if m.get("role"):
            e["role"].add(m["role"])
        if m.get("location"):
            e["location"].add(m["location"])
        if m.get("labels"):
            e["labels"].update(m["labels"])
        if m.get("worksAt") and e["worksAt"] is None:
            e["worksAt"] = m["worksAt"]
        if m.get("title") and e["title"] is None:
            e["title"] = m["title"]
        if m.get("status"):
            s = m["status"]
            if e["status"] is None or (len(s), s) > (len(e["status"]), e["status"]):
                e["status"] = s
        if m.get("description"):
            e["rawDescriptions"].add(m["description"])
    out = []
    for e in folded.values():
        e["aliases"] = sorted(e["aliases"])
        e["emails"] = sorted(e["emails"])
        e["sources"] = sorted(e["sources"])
        e["role"] = sorted(e["role"])
        e["location"] = sorted(e["location"])
        e["labels"] = sorted(e["labels"])
        e["rawDescriptions"] = sorted(e["rawDescriptions"])
        out.append(e)
    return out
