"""Deterministic synthetic fixtures: Common-Crawl-style pages + Wikidata-like KB.

Implements FIXTURES.md: pages ``(url, warc_ts, html, text, lang)`` whose
bodies embed (a) the reference's own test payloads verbatim
(``/root/reference/tests/data/{mona_lisa,spacex}/input.txt``), (b) templated
entity sentences over a small KB containing the golden QIDs from
``tests/data/*/output.json``, with a Zipfian entity distribution, and
(c) edge cases exercising every preprocessing rule.

Everything is seed-fixed (seed=42) and derives only from the reference's
public test payloads — no external data.  The ``text`` column and the golden
tables are computed template-side (plain string assembly), independent of
the pipeline's extraction/linking code, so they are genuine oracles.
"""

from __future__ import annotations

import datetime as dt
import random
import re
from dataclasses import dataclass, field

SEED = 42

MONA_LISA_TEXT = (
    "The Mona Lisa is a sixteenth century oil painting created by Leonardo. "
    "It's held at the Louvre in Paris."
)
SPACEX_TEXT = (
    "A successful uncrewed demonstration will make Boeing the second private "
    "company allowed to ferry NASA crews to the ISS and will make Starliner a "
    "full-fledged competitor to SpaceX's Dragon crew capsule"
)

# occupation qid -> fine tag (reference occ_labels_dict, entity_linking.py:1541)
OCC_LABELS = {
    "Q1028181": "painter",
    "Q36180": "writer",
    "Q82955": "politician",
    "Q2066131": "athlete",
    "Q639669": "musician",
    "Q33999": "actor",
}
OCC_TO_FINE = {
    "Q1028181": "PAINTER",
    "Q36180": "WRITER",
    "Q82955": "POLITICIAN",
    "Q2066131": "ATHLETE",
    "Q639669": "MUSICIAN",
    "Q33999": "ACTOR",
}

FINE_TO_COARSE = {
    "PER": "PER", "PAINTER": "PER", "WRITER": "PER", "POLITICIAN": "PER",
    "ATHLETE": "PER", "MUSICIAN": "PER", "ACTOR": "PER", "ENTREPRENEUR": "PER",
    "CITY": "GPE", "COUNTRY": "GPE", "COUNTY": "GPE", "LOC": "LOC",
    "ORG": "ORG", "BUSINESS": "ORG", "FAC": "FAC",
    "WORK_OF_ART": "WORK_OF_ART", "LITERARY_WORK": "WORK_OF_ART",
    "FILM": "WORK_OF_ART", "SONG": "WORK_OF_ART",
    "PRODUCT": "PRODUCT", "EVENT": "EVENT", "MISC": "MISC",
}


@dataclass
class Ent:
    qid: str
    label: str
    tag: str              # KB routing tag (persons -> "PER", like the per-tag DBs)
    fine: str             # EL fine tag emitted by the tag classifier
    num_rels: int
    aliases: list[str] = field(default_factory=list)
    # aliases kept in the KB index but excluded from the detection gazetteer
    # (e.g. "SpaceX Dragon" would greedily swallow the separate SpaceX mention)
    no_gaz: list[str] = field(default_factory=list)
    p31: list[str] = field(default_factory=list)
    p131: list[str] = field(default_factory=list)
    p641: list[str] = field(default_factory=list)
    triples: list[tuple[str, str]] = field(default_factory=list)  # (pred, obj)
    page: str = ""
    descr: str = ""
    lang: str = "en"

    def __post_init__(self):
        if not self.page:
            self.page = self.label
        if not self.descr:
            self.descr = f"{self.label} is a {self.fine.lower().replace('_', ' ')}."


def _core_entities() -> list[Ent]:
    """Golden QIDs from the reference's own test payloads + ambiguity probes."""
    e = [
        Ent("Q12418", "Mona Lisa", "WORK_OF_ART", "WORK_OF_ART", 40,
            p31=["Q3305213"],
            triples=[("P170", "Q762"), ("P276", "Q19675"), ("P571", "Q1500")]),
        Ent("Q2126369", "Mona Lisa (Prado)", "WORK_OF_ART", "WORK_OF_ART", 15,
            p31=["Q3305213"], triples=[("P170", "Q762"), ("P276", "Q160112")]),
        Ent("Q1756508", "Mona Lisa", "SONG", "SONG", 5, p31=["Q134556"],
            triples=[("P175", "Q910683")]),
        Ent("Q762", "Leonardo da Vinci", "PER", "PAINTER", 120,
            aliases=["Leonardo", "Leonardo di ser Piero da Vinci"], p31=["Q5"],
            triples=[("P106", "Q1028181"), ("P800", "Q12418"), ("P27", "Q38"),
                     ("P19", "Q82884")]),
        Ent("Q19675", "Louvre", "FAC", "FAC", 80, aliases=["Louvre Museum"],
            p31=["Q33506"], p131=["Q90"],
            triples=[("P131", "Q90"), ("P17", "Q142")]),
        Ent("Q90", "Paris", "CITY", "CITY", 200, p31=["Q515"], p131=["Q142"],
            triples=[("P131", "Q142"), ("P17", "Q142"), ("P1376", "Q142")]),
        Ent("Q830149", "Paris, Kentucky", "CITY", "CITY", 8, p31=["Q515"],
            p131=["Q30"], triples=[("P131", "Q30"), ("P17", "Q30")]),
        Ent("Q142", "France", "COUNTRY", "COUNTRY", 300, p31=["Q6256"],
            triples=[("P36", "Q90")]),
        Ent("Q30", "United States", "COUNTRY", "COUNTRY", 320,
            aliases=["USA", "United States of America"], p31=["Q6256"],
            triples=[("P36", "Q61")]),
        Ent("Q38", "Italy", "COUNTRY", "COUNTRY", 250, p31=["Q6256"], triples=[]),
        Ent("Q82884", "Vinci", "CITY", "CITY", 12, p31=["Q515"], p131=["Q38"],
            triples=[("P131", "Q38"), ("P17", "Q38")]),
        Ent("Q160112", "Museo del Prado", "FAC", "FAC", 35, aliases=["Prado"],
            p31=["Q33506"], p131=["Q2807"], triples=[("P131", "Q2807")]),
        Ent("Q2807", "Madrid", "CITY", "CITY", 150, p31=["Q515"], p131=["Q29"],
            triples=[("P131", "Q29"), ("P17", "Q29")]),
        Ent("Q29", "Spain", "COUNTRY", "COUNTRY", 220, p31=["Q6256"], triples=[]),
        Ent("Q61", "Washington", "CITY", "CITY", 90, aliases=["Washington, D.C."],
            p31=["Q515"], p131=["Q30"], triples=[("P131", "Q30"), ("P17", "Q30")]),
        Ent("Q910683", "Nat King Cole", "PER", "MUSICIAN", 45, p31=["Q5"],
            triples=[("P106", "Q639669"), ("P27", "Q30")]),
        # spacex payload goldens
        Ent("Q66", "Boeing", "BUSINESS", "BUSINESS", 90,
            aliases=["Boeing Company"], p31=["Q4830453"],
            triples=[("P159", "Q5083"), ("P17", "Q30"), ("P1056", "Q1024445")]),
        Ent("Q23548", "NASA", "ORG", "ORG", 150,
            aliases=["National Aeronautics and Space Administration"],
            p31=["Q327333"],
            triples=[("P159", "Q61"), ("P17", "Q30"), ("P1056", "Q25271")]),
        Ent("Q25271", "International Space Station", "FAC", "FAC", 70,
            aliases=["ISS"], p31=["Q25956"],
            triples=[("P176", "Q23548"), ("P17", "Q30")]),
        Ent("Q1024445", "Boeing Starliner", "PRODUCT", "PRODUCT", 25,
            aliases=["Starliner", "CST-100 Starliner"], p31=["Q26529"],
            triples=[("P176", "Q66"), ("P1029", "Q23548")]),
        Ent("Q193701", "SpaceX", "BUSINESS", "BUSINESS", 95,
            aliases=["Space Exploration Technologies"], p31=["Q4830453"],
            triples=[("P159", "Q6106"), ("P17", "Q30"), ("P1056", "Q236448")]),
        Ent("Q236448", "Dragon 2", "PRODUCT", "PRODUCT", 30,
            aliases=["Dragon", "SpaceX Dragon", "Crew Dragon"],
            no_gaz=["SpaceX Dragon"], p31=["Q26529"],
            triples=[("P176", "Q193701"), ("P1029", "Q23548")]),
        Ent("Q5083", "Seattle", "CITY", "CITY", 110, p31=["Q515"], p131=["Q30"],
            triples=[("P131", "Q30"), ("P17", "Q30")]),
        Ent("Q6106", "Hawthorne", "CITY", "CITY", 10, p31=["Q515"], p131=["Q30"],
            triples=[("P131", "Q30"), ("P17", "Q30")]),
    ]
    return e


_FIRST = ["Alden", "Berenice", "Caspar", "Dorothea", "Emilio", "Fenwick",
          "Greta", "Horatio", "Isolde", "Jasper", "Katriona", "Lysander"]
_LAST = ["Merriweather", "Northcote", "Oakhurst", "Pemberton", "Quillfeather",
         "Ravensworth", "Silverton", "Thistlewood", "Underhill", "Vanterpool"]
_CITY_NAMES = ["Riverton", "Greenfield", "Stonehaven", "Maplewood", "Clearwater",
               "Ashbourne", "Windermere", "Thornbury", "Elmsworth", "Springfield"]
_ORG_WORDS = ["Acme", "Borealis", "Cobalt", "Dynamo", "Equinox", "Fulcrum",
              "Gossamer", "Helix"]
_WORK_WORDS = ["The Silent Meadow", "Autumn of Glass", "The Clockwork Tide",
               "Midnight Cartographer", "The Paper Garden", "Harvest of Stars"]
_FAC_WORDS = ["Riverton Gallery", "Stonehaven Museum", "Maplewood Library",
              "Clearwater Observatory"]


def _filler_entities(rng: random.Random) -> list[Ent]:
    ents: list[Ent] = []
    qn = 900000
    countries = [("Q9000001", "Valdoria"), ("Q9000002", "Norfell"), ("Q9000003", "Auremia")]
    country_ents = []
    for qid, name in countries:
        country_ents.append(Ent(qid, name, "COUNTRY", "COUNTRY", rng.randint(150, 260),
                                p31=["Q6256"], triples=[]))
    ents += country_ents

    cities: list[Ent] = []
    for i, name in enumerate(_CITY_NAMES):
        qid = f"Q{qn}"; qn += 1
        country = country_ents[i % len(country_ents)]
        c = Ent(qid, name, "CITY", "CITY", max(6, int(140 / (1 + i))),
                p31=["Q515"], p131=[country.qid],
                triples=[("P131", country.qid), ("P17", country.qid)])
        cities.append(c)
    # ambiguous alias: a second, less-popular Springfield in a different country
    qid = f"Q{qn}"; qn += 1
    amb = Ent(qid, "Springfield", "CITY", "CITY", 4, p31=["Q515"],
              p131=[country_ents[1].qid],
              triples=[("P131", country_ents[1].qid), ("P17", country_ents[1].qid)])
    cities.append(amb)
    ents += cities

    persons: list[Ent] = []
    occs = list(OCC_TO_FINE.items())
    for i in range(12):
        qid = f"Q{qn}"; qn += 1
        name = f"{_FIRST[i]} {_LAST[(i * 7) % len(_LAST)]}"
        occ_qid, fine = occs[i % len(occs)]
        born = cities[i % len(cities)]
        p = Ent(qid, name, "PER", fine, max(5, int(120 / (1 + i))), p31=["Q5"],
                triples=[("P106", occ_qid), ("P19", born.qid),
                         ("P27", born.p131[0] if born.p131 else country_ents[0].qid)])
        persons.append(p)
    ents += persons

    orgs: list[Ent] = []
    for i, word in enumerate(_ORG_WORDS):
        qid = f"Q{qn}"; qn += 1
        name = f"{word} Corporation" if i % 2 == 0 else f"{word} Institute"
        tag = "BUSINESS" if i % 2 == 0 else "ORG"
        hq = cities[(i * 3) % len(cities)]
        founder = persons[(i * 5) % len(persons)]
        o = Ent(qid, name, tag, tag, max(5, int(100 / (1 + i))),
                aliases=[word], p31=["Q4830453" if tag == "BUSINESS" else "Q327333"],
                triples=[("P159", hq.qid), ("P112", founder.qid), ("P17", hq.p131[0])])
        orgs.append(o)
    ents += orgs

    facs: list[Ent] = []
    for i, name in enumerate(_FAC_WORDS):
        qid = f"Q{qn}"; qn += 1
        city = cities[i % len(cities)]
        f = Ent(qid, name, "FAC", "FAC", max(5, 60 - 10 * i), p31=["Q33506"],
                p131=[city.qid], triples=[("P131", city.qid), ("P17", city.p131[0])])
        facs.append(f)
    ents += facs

    works: list[Ent] = []
    fines = ["LITERARY_WORK", "WORK_OF_ART", "FILM"]
    for i, name in enumerate(_WORK_WORDS):
        qid = f"Q{qn}"; qn += 1
        creator = persons[(i * 3 + 1) % len(persons)]
        fac = facs[i % len(facs)]
        fine = fines[i % len(fines)]
        w = Ent(qid, name, fine, fine, max(4, 50 - 7 * i), p31=["Q838948"],
                triples=[("P170", creator.qid), ("P276", fac.qid)])
        works.append(w)
    ents += works
    return ents


def _ru_entities() -> list[Ent]:
    """RU slice (BASELINE cites sample EN/RU docs; the reference's linker and
    chunker are lang-parameterized — entity_linking.py:49,96-101,
    ner_chunker.py:54).  Inflected forms ride as aliases, the usual RU-KB
    shape.  Cyrillic-only surfaces: zero overlap with the EN gazetteer."""
    return [
        Ent("Q159", "Россия", "COUNTRY", "COUNTRY", 280,
            aliases=["России", "Российская Федерация"], p31=["Q6256"],
            triples=[("P36", "Q649")], lang="ru"),
        Ent("Q649", "Москва", "CITY", "CITY", 160,
            aliases=["Москве", "Москвы"], p31=["Q515"], p131=["Q159"],
            triples=[("P131", "Q159"), ("P17", "Q159"), ("P1376", "Q159")],
            lang="ru"),
        Ent("Q656", "Санкт-Петербург", "CITY", "CITY", 120,
            aliases=["Петербург", "Санкт-Петербурге"], p31=["Q515"],
            p131=["Q159"], triples=[("P131", "Q159"), ("P17", "Q159")],
            lang="ru"),
        Ent("Q7200", "Александр Пушкин", "PER", "WRITER", 95,
            aliases=["Пушкин", "Пушкина"], p31=["Q5"],
            triples=[("P27", "Q159"), ("P19", "Q649"), ("P106", "Q36180")],
            lang="ru"),
        Ent("Q132783", "Эрмитаж", "FAC", "FAC", 60,
            aliases=["Эрмитаже"], p31=["Q33506"], p131=["Q656"],
            triples=[("P131", "Q656"), ("P17", "Q159")], lang="ru"),
    ]


def build_kb() -> list[Ent]:
    rng = random.Random(SEED)
    return _core_entities() + _filler_entities(rng) + _ru_entities()


# --------------------------------------------------------------------------
# page generation
# --------------------------------------------------------------------------

HTML_TEMPLATE = (
    "<!DOCTYPE html><html><head><title>{title}</title></head>"
    "<body><nav>Boilerplate Nav</nav><p>{body}</p>"
    "<footer>Boilerplate Footer</footer></body></html>"
)


def _expected_text(title: str, body: str) -> str:
    """Template-side oracle for the extraction chain: join stripped text nodes
    with " ", collapse whitespace, add trailing period, mojibake map."""
    pieces = [p.strip() for p in (title, "Boilerplate Nav", body, "Boilerplate Footer")]
    text = " ".join(p for p in pieces if p)
    text = re.sub(r"\s+", " ", text)
    if text and text[-1] not in (".", ",", "?", "!"):
        text += "."
    for old, new in (("’", "'"), ("”", '"'), ("â€™", "'"), ("â€œ", '"'), ("â€\x9d", '"')):
        text = text.replace(old, new)
    return text


def _decoded_substr(surface: str) -> str:
    """Template-side model of the reference's mention decode: word/punct
    tokenize, space-join, replace map (entity_detection_parser.py:160-176) —
    e.g. "Paris, Kentucky" detects as "paris , kentucky"."""
    toks = re.findall(r"[\w']+|[^\w ]", surface.lower())
    while toks and toks[-1] == ",":
        toks = toks[:-1]
    s = " ".join(toks)
    for old, new in [(" - ", "-"), ("'s", ""), (" .", ""), ("{", ""), ("}", ""),
                     ("  ", " "), ('"', "'"), ("(", ""), (")", "")]:
        s = s.replace(old, new)
    return s


@dataclass
class GoldenMention:
    substr: str          # decoded, lowercased mention substring
    qid: str             # expected top-1 link
    tag: str             # coarse NER tag
    surface: str         # literal surface in the text (for offset search)


def _zipf_pick(rng_val: float, n: int, a: float = 1.1) -> int:
    weights = [1.0 / ((r + 1) ** a) for r in range(n)]
    total = sum(weights)
    acc = 0.0
    x = rng_val * total
    for i, w in enumerate(weights):
        acc += w
        if x <= acc:
            return i
    return n - 1


# Detection-only surfaces: present in the gazetteer, absent from the KB (no
# entity, no alias, no shared word with any KB label so the fuzzy word-level
# lookup G8 finds nothing).  Their mentions are detected but UNLINKABLE —
# the agent reports them in `unlisted_annotations` (agent/server.py:292-331).
UNLINKABLE_SURFACES = [
    ("Zorblatt Vextrion", "BUSINESS"),
    ("Quuxlandia", "CITY"),
    ("Blorptharn Wexley", "PER"),
]


def generate_pages(n_docs: int = 200) -> tuple[list[dict], list[dict], list[dict], list[dict]]:
    """Returns (pages_rows, golden_mentions_rows, golden_links_rows,
    golden_unlisted_rows).

    pages_rows: url, warc_ts, html(bytes), text, lang
    goldens are computed template-side (independent of pipeline code).
    """
    kb = build_kb()
    # EN template pools draw EN entities only: a Cyrillic label on an EN page
    # is (correctly) dropped by the agent's printable filter (server.py:134)
    kb_en = [e for e in kb if e.lang == "en"]
    by_fine: dict[str, list[Ent]] = {}
    for e in kb_en:
        by_fine.setdefault(e.fine, []).append(e)
    for v in by_fine.values():
        v.sort(key=lambda e: -e.num_rels)
    persons = sorted([e for e in kb_en if e.tag == "PER"], key=lambda e: -e.num_rels)
    # generic templates draw only surface-unambiguous cities: for a shared
    # surface ("Springfield") the template context legitimately steers
    # connection ranking either way, so a context-free golden would be wrong
    # there — the dedicated kind-7 probe covers the ambiguous case instead
    all_cities = by_fine.get("CITY", [])
    surface_counts: dict[str, int] = {}
    for e in all_cities:
        surface_counts[e.label.lower()] = surface_counts.get(e.label.lower(), 0) + 1
    cities = [e for e in all_cities if surface_counts[e.label.lower()] == 1]
    orgs = sorted(by_fine.get("ORG", []) + by_fine.get("BUSINESS", []),
                  key=lambda e: -e.num_rels)
    works = sorted(by_fine.get("WORK_OF_ART", []) + by_fine.get("LITERARY_WORK", [])
                   + by_fine.get("FILM", []), key=lambda e: -e.num_rels)
    facs = by_fine.get("FAC", [])

    rng = random.Random(SEED)
    pages, gm_rows, gl_rows = [], [], []

    def emit(i: int, title: str, body: str, lang: str, mentions: list[GoldenMention],
             html_override: bytes | None = None, text_override: str | None = None):
        url = f"https://example.org/doc/{i:08d}"
        ts = dt.datetime(2024, 1, 1, tzinfo=dt.timezone.utc) + dt.timedelta(seconds=i)
        html = html_override if html_override is not None else \
            HTML_TEMPLATE.format(title=title, body=body).encode("utf-8")
        text = text_override if text_override is not None else _expected_text(title, body)
        pages.append({"url": url, "warc_ts": ts, "html": html, "text": text, "lang": lang})
        # every occurrence of a golden surface is a golden mention (titles
        # repeat body surfaces, and the NER detects both); longer surfaces
        # claim their spans first so "Riverton" does not also match inside
        # "Riverton Gallery"
        claimed: list[tuple[int, int]] = []
        for m in sorted(mentions, key=lambda m: -len(m.surface)):
            start = text.find(m.surface)
            while start >= 0:
                end = start + len(m.surface)
                if not any(s < end and start < e for s, e in claimed):
                    claimed.append((start, end))
                    gm_rows.append({"url": url, "substr": m.substr, "start": start,
                                    "end": end, "tag": m.tag})
                    gl_rows.append({"url": url, "substr": m.substr, "start": start,
                                    "end": end, "qid": m.qid})
                start = text.find(m.surface, end)

    # surface -> most popular owner (what the linker resolves to absent context)
    surface_owner: dict[str, Ent] = {}
    for e in sorted(kb, key=lambda e: e.num_rels):
        for s in [e.label] + e.aliases:
            surface_owner[s.lower()] = e

    def gold(ent: Ent, surface: str | None = None) -> GoldenMention:
        s = surface or ent.label
        owner = surface_owner.get(s.lower(), ent)
        return GoldenMention(substr=_decoded_substr(s), qid=owner.qid,
                             tag=FINE_TO_COARSE.get(owner.fine, "MISC"), surface=s)

    def gold_ctx(ent: Ent, surface: str | None = None) -> GoldenMention:
        """Golden pinned to this entity — context must disambiguate."""
        s = surface or ent.label
        return GoldenMention(substr=_decoded_substr(s), qid=ent.qid,
                             tag=FINE_TO_COARSE.get(ent.fine, "MISC"), surface=s)

    for i in range(n_docs):
        kind = i % 20
        if kind == 0:
            emit(i, "Mona Lisa", MONA_LISA_TEXT, "en", [
                gold(next(e for e in kb if e.qid == "Q12418"), "Mona Lisa"),
                gold(next(e for e in kb if e.qid == "Q762"), "Leonardo"),
                gold(next(e for e in kb if e.qid == "Q19675"), "Louvre"),
                gold(next(e for e in kb if e.qid == "Q90"), "Paris"),
            ])
        elif kind == 1:
            ms = [
                gold(next(e for e in kb if e.qid == "Q66"), "Boeing"),
                gold(next(e for e in kb if e.qid == "Q23548"), "NASA"),
                gold(next(e for e in kb if e.qid == "Q25271"), "ISS"),
                gold(next(e for e in kb if e.qid == "Q1024445"), "Starliner"),
                GoldenMention(substr="spacex", qid="Q193701", tag="ORG",
                              surface="SpaceX's"),
                gold(next(e for e in kb if e.qid == "Q236448"), "Dragon"),
            ]
            emit(i, "Starliner news", SPACEX_TEXT, "en", ms)
        elif kind == 2 and i > 2:
            # edge: fully empty html
            emit(i, "", "", "en", [], html_override=b"<html><body></body></html>",
                 text_override="")
        elif kind == 3 and i > 3:
            # edge: mojibake in body
            p = persons[_zipf_pick(rng.random(), len(persons))]
            body = f"Critics said â€œbrilliantâ€\x9d about {p.label}â€™s work"
            # offsets span the trailing "'s" token (as the reference's
            # token-offset decode does); the decoded substr drops it
            ms = [GoldenMention(substr=_decoded_substr(p.label), qid=p.qid, tag="PER",
                                surface=f"{p.label}'s")]
            emit(i, "Reviews", body, "en", ms,
                 text_override=_expected_text("Reviews", body))
        elif kind == 4 and i > 4:
            # edge: '<' in plain text + no trailing punct
            c = cities[_zipf_pick(rng.random(), len(cities))]
            body = f"Temperatures < 10 degrees were recorded in {c.label}"
            emit(i, "Weather", body, "en", [gold(c)])
        elif kind == 5 and i > 5:
            # ru pass-through slice (no gazetteer entities)
            body = "Пример русского текста без сущностей для проверки."
            emit(i, "Русская страница", body, "ru", [])
        elif kind == 6 and i > 6:
            # edge: one very long sentence (chunk word-split path)
            c = cities[_zipf_pick(rng.random(), len(cities))]
            filler = " ".join(f"word{j}" for j in range(340))
            body = f"{c.label} appears before {filler} ends"
            emit(i, "Long", body, "en", [gold(c)])
        elif kind == 7 and i > 7:
            # connection-ranking probe: the *less* popular Springfield, pinned
            # by its country in the same sentence
            amb = next(e for e in kb if e.label == "Springfield" and e.num_rels < 10)
            country = next(e for e in kb if e.qid == amb.p131[0])
            pop = next(e for e in kb if e.label == "Springfield" and e.num_rels >= 10)
            # the org must not drag KG edges toward the POPULAR Springfield's
            # country, or the probe's context stops being decisive (the
            # reference's connection ranking would rightly flip it)
            org = next(
                o for o in orgs
                if all(t != ("P17", pop.p131[0]) for t in o.triples)
            )
            body = (f"{org.label} opened a plant in Springfield, a town in "
                    f"{country.label}.")
            emit(i, "Regional", body, "en",
                 [gold(org), gold_ctx(amb, "Springfield"), gold(country)])
        else:
            t = rng.randrange(5)
            if t == 0:
                p = persons[_zipf_pick(rng.random(), len(persons))]
                c = cities[_zipf_pick(rng.random(), len(cities))]
                year = 1900 + (i % 120)
                body = f"{p.label} visited {c.label} in {year}."
                emit(i, "Travel", body, "en", [gold(p), gold(c)])
            elif t == 1:
                o = orgs[_zipf_pick(rng.random(), len(orgs))]
                p = persons[_zipf_pick(rng.random(), len(persons))]
                body = f"{o.label} was founded by {p.label}."
                emit(i, "Business", body, "en", [gold(o), gold(p)])
            elif t == 2:
                w = works[_zipf_pick(rng.random(), len(works))]
                # use the work's OWN P276 facility when it has one: a random
                # facility can contradict the KG ("Mona Lisa (Prado) is held
                # at Louvre") and connection ranking would rightly follow the
                # context rather than the surface — making a surface-pinned
                # golden wrong by construction
                w_fac = next((o for (p, o) in w.triples if p == "P276"), None)
                f_ = next((e for e in facs if e.qid == w_fac), None) or \
                    facs[_zipf_pick(rng.random(), len(facs))]
                city_qid = f_.p131[0] if f_.p131 else None
                c = next((e for e in kb if e.qid == city_qid), cities[0])
                body = f"{w.label} is held at {f_.label} in {c.label}."
                emit(i, "Art", body, "en", [gold(w), gold(f_), gold(c)])
            elif t == 3:
                p = persons[_zipf_pick(rng.random(), len(persons))]
                c1 = cities[_zipf_pick(rng.random(), len(cities))]
                c2 = cities[(_zipf_pick(rng.random(), len(cities)) + 1) % len(cities)]
                body = f"{p.label} wrote about {c1.label} and {c2.label}."
                ms = [gold(p), gold(c1)] + ([gold(c2)] if c2.qid != c1.qid else [])
                emit(i, "Essay", body, "en", ms)
            else:
                o1 = orgs[_zipf_pick(rng.random(), len(orgs))]
                o2 = orgs[(_zipf_pick(rng.random(), len(orgs)) + 1) % len(orgs)]
                c = cities[_zipf_pick(rng.random(), len(cities))]
                p = persons[_zipf_pick(rng.random(), len(persons))]
                body = (f"{o1.label} opened an office in {c.label}. "
                        f"{p.label} joined {o2.label} last year.")
                ms = [gold(o1), gold(c), gold(p)]
                if o2.qid != o1.qid:
                    ms.append(gold(o2))
                emit(i, "Markets", body, "en", ms)

    # unlinkable-mention pages APPENDED after the main loop (extra pages
    # don't shift the rng stream, so every existing page/golden is
    # byte-identical to the pre-unlisted fixture set)
    gu_rows: list[dict] = []
    for k, (surface, fine) in enumerate(UNLINKABLE_SURFACES):
        i = n_docs + k
        known = cities[k % len(cities)]
        body = f"Reports mention {surface} alongside {known.label} today."
        emit(i, "Unverified", body, "en", [gold(known)])
        url = f"https://example.org/doc/{i:08d}"
        text = _expected_text("Unverified", body)
        start = text.find(surface)
        coarse = FINE_TO_COARSE.get(fine, "MISC")
        gu_rows.append({
            "url": url, "spot": _decoded_substr(surface), "start": start,
            "end": start + len(surface), "tag": coarse,
        })
        # the unlinkable surface IS a detected mention (golden_mentions
        # tracks detection; golden_links tracks linking)
        gm_rows.append({
            "url": url, "substr": _decoded_substr(surface), "start": start,
            "end": start + len(surface), "tag": coarse,
        })

    # RU pages (also appended; KG-consistent contexts — Пушкин P19 Москва,
    # Эрмитаж P131 Санкт-Петербург — so connection ranking agrees with the
    # surface-pinned goldens)
    ru_templates = [
        ("Пушкин в Москве",
         "Александр Пушкин родился в Москве.",
         # the bare-alias title occurrence is detected too (longer surfaces
         # claim their spans first, so this golden lands on the title only)
         [("Александр Пушкин", "Q7200", "PER"), ("Москве", "Q649", "GPE"),
          ("Пушкин", "Q7200", "PER")]),
        ("Эрмитаж",
         "Эрмитаж находится в Санкт-Петербурге.",
         [("Эрмитаж", "Q132783", "FAC"),
          ("Санкт-Петербурге", "Q656", "GPE")]),
        ("Столица",
         "Москва — столица России.",
         [("Москва", "Q649", "GPE"), ("России", "Q159", "GPE")]),
    ]
    for k, (title, body, surf_golds) in enumerate(ru_templates):
        i = n_docs + len(UNLINKABLE_SURFACES) + k
        emit(i, title, body, "ru",
             [GoldenMention(substr=_decoded_substr(s), qid=q, tag=t, surface=s)
              for s, q, t in surf_golds])
    return pages, gm_rows, gl_rows, gu_rows


# --------------------------------------------------------------------------
# materialize to parquet
# --------------------------------------------------------------------------

TRIPLE_WHITELIST = (
    # find_top_triplets whitelist, wiki_parser.py:480-520 (subset present in KB)
    "P31 P279 P131 P106 P361 P17 P27 P569 P50 P136 P800 P166 P571 P175 P641 "
    "P54 P26 P451 P112 P159 P170 P276 P19 P1056 P176 P1029 P1376 P36"
).split()


# subclass-of chains for every type QID used by the fixture's P31 rows:
# human -> natural person -> person -> entity; city -> human settlement ->
# geographic location -> entity; country -> state -> geographic location;
# painting -> work of art -> creative work -> entity; business/museum/team
# -> organization -> entity; river/mountain -> geographic feature ->
# geographic location.  All real Wikidata-shaped local names.
TYPE_TAXONOMY = [
    ("Q5", "Q154954"), ("Q154954", "Q215627"), ("Q215627", "Q35120"),
    ("Q515", "Q486972"), ("Q486972", "Q2221906"), ("Q2221906", "Q35120"),
    ("Q6256", "Q7275"), ("Q7275", "Q2221906"),
    ("Q3305213", "Q838948"), ("Q838948", "Q17537576"),
    ("Q17537576", "Q35120"),
    ("Q4830453", "Q43229"), ("Q33506", "Q43229"), ("Q26529", "Q43229"),
    ("Q327333", "Q43229"), ("Q43229", "Q35120"),
    ("Q134556", "Q17537576"),
    ("Q25956", "Q618123"), ("Q618123", "Q2221906"),
]


def kb_rows(kb: list[Ent]):
    ent_rows, alias_rows, triple_rows, gaz_rows = [], [], [], []
    for e in kb:
        ent_rows.append({
            "qid": e.qid, "label": e.label, "num_rels": e.num_rels, "tag": e.tag,
            "page": e.page, "descr": e.descr, "p31": e.p31, "p131": e.p131,
            "p641": e.p641,
            "image_link": f"{e.page.replace(' ', '_')}.jpg",
            "categories": [e.fine.title()],
            "dbpedia_types": [f"http://dbpedia.org/ontology/{e.fine.title()}"],
        })
        for a in e.aliases:
            alias_rows.append({"alias": a, "qid": e.qid, "name_or_alias": "alias"})
        for pred, obj in e.triples:
            triple_rows.append({"subj": e.qid, "pred": pred, "obj": obj})
        for p in e.p31:
            triple_rows.append({"subj": e.qid, "pred": "P31", "obj": p})
        surfaces = [e.label] + [a for a in e.aliases if a not in e.no_gaz]
        for s in surfaces:
            gaz_rows.append({"surface": s.lower(), "fine_tag": e.fine,
                             "coarse_tag": FINE_TO_COARSE.get(e.fine, "MISC"),
                             "num_rels": e.num_rels})
    # detection-only surfaces (no KB entity -> unlisted_annotations path)
    for s, fine in UNLINKABLE_SURFACES:
        gaz_rows.append({"surface": s.lower(), "fine_tag": fine,
                         "coarse_tag": FINE_TO_COARSE.get(fine, "MISC"),
                         "num_rels": 1})
    # P279 subclass taxonomy over the type QIDs the P31 rows actually use
    # (Wikidata local names), 2-3 levels deep with a shared-ancestor join at
    # Q35120 — gives W8's 2-hop expansion, find_types_closure's fixpoint,
    # and the path-doubled closure contract real multi-hop structure
    for s, o in TYPE_TAXONOMY:
        triple_rows.append({"subj": s, "pred": "P279", "obj": o})
    # dedupe triples
    seen = set()
    uniq = []
    for t in triple_rows:
        k = (t["subj"], t["pred"], t["obj"])
        if k not in seen:
            seen.add(k)
            uniq.append(t)
    return ent_rows, alias_rows, uniq, gaz_rows


def write_fixtures(out_dir: str, n_docs: int = 200, shards: int = 1) -> None:
    """Write all fixture parquet files with pyarrow (no Spark needed).

    ``shards > 1`` writes ``pages.parquet`` as a DIRECTORY of part files so
    a Spark scan gets ``shards`` splits (a single parquet file is one input
    partition no matter its row-group count — a serial-scan bottleneck the
    two-parallelism bench must avoid)."""
    import os

    import pyarrow as pa
    import pyarrow.parquet as pq

    os.makedirs(out_dir, exist_ok=True)
    kb = build_kb()
    ent_rows, alias_rows, triple_rows, gaz_rows = kb_rows(kb)
    pages, gm, gl, gu = generate_pages(n_docs)

    def write(name: str, rows: list[dict], schema: pa.Schema | None = None,
              n_shards: int = 1):
        if schema is not None:
            cols = {f.name: [r.get(f.name) for r in rows] for f in schema}
            table = pa.Table.from_pydict(cols, schema=schema)
        else:
            table = pa.Table.from_pylist(rows)
        if n_shards <= 1:
            pq.write_table(table, f"{out_dir}/{name}.parquet")
            return
        import os

        d = f"{out_dir}/{name}.parquet"
        os.makedirs(d, exist_ok=True)
        per = (table.num_rows + n_shards - 1) // n_shards
        for s in range(n_shards):
            sl = table.slice(s * per, per)
            if sl.num_rows:
                pq.write_table(sl, f"{d}/part-{s:05d}.parquet")

    pages_schema = pa.schema([
        pa.field("url", pa.string(), False),
        pa.field("warc_ts", pa.timestamp("us", tz="UTC")),
        pa.field("html", pa.binary()),
        pa.field("text", pa.string()),
        pa.field("lang", pa.string()),
    ])
    write("pages", pages, pages_schema, n_shards=shards)
    write("kb_entities", ent_rows)
    write("kb_aliases", alias_rows)
    write("kb_triples", triple_rows)
    write("gazetteer", gaz_rows)
    write("golden_mentions", gm)
    write("golden_links", gl)
    write("golden_unlisted", gu)
    occ_rows = [{"occ_qid": k, "fine_tag": v} for k, v in OCC_LABELS.items()]
    write("kb_occ_labels", occ_rows)
    # golden triples: golden links x kb_triples over the whitelist
    tr_by_subj: dict[str, list[dict]] = {}
    for t in triple_rows:
        tr_by_subj.setdefault(t["subj"], []).append(t)
    gt_seen, gt_rows = set(), []
    for row in gl:
        for t in tr_by_subj.get(row["qid"], []):
            if t["pred"] in TRIPLE_WHITELIST:
                k = (t["subj"], t["pred"], t["obj"])
                if k not in gt_seen:
                    gt_seen.add(k)
                    gt_rows.append(t)
    write("golden_triples", gt_rows)

    # custom-KB ingest fixture (reference S7 parse_custom_database input):
    # N-triples lines covering every triple + a label line per entity
    with open(f"{out_dir}/custom_kb.nt", "w") as f:
        for e in kb:
            f.write(f'<http://we/{e.qid}> <http://wl/label> "{e.label}" .\n')
        for t in triple_rows:
            f.write(
                f"<http://we/{t['subj']}> <http://wpd/{t['pred']}> "
                f"<http://we/{t['obj']}> .\n"
            )
        f.write("malformed line that the parser must drop\n")
        # literals exercising every escape class (backslash, tab, quote,
        # newline, CR), stored in spec-escaped form — these make the
        # ingest/export escaping contract load-bearing instead of vacuous
        # (VERDICT r4 ADVICE #1/#2): parse must unescape them, the nt
        # roundtrip part must re-escape them byte-identically
        f.write(
            '<http://we/QESC1> <http://wl/label> '
            '"back\\\\slash\\tand\\ttab" .\n'
        )
        # language-tagged and datatype-annotated literals (the remaining
        # N-Triples object forms): parse must accept them, and the
        # keep_annotations roundtrip must re-serialize them byte-identically
        f.write(
            '<http://we/QLANG1> <http://wl/label> "Joconde"@fr .\n'
        )
        f.write(
            '<http://we/QLANG1> <http://wl/label> "Mona Lisa"@zh-Hans .\n'
        )
        f.write(
            '<http://we/QDT1> <http://wpd/P571> '
            '"1503"^^<http://www.w3.org/2001/XMLSchema#gYear> .\n'
        )
        f.write(
            '<http://we/QESC2> <http://wl/label> '
            '"quo\\"te and\\nnew\\rline" .\n'
        )


def ensure_fixtures(out_dir: str, n_docs: int = 200, shards: int = 1) -> str:
    import os

    marker = os.path.join(out_dir, "pages.parquet")
    if not os.path.exists(marker):
        os.makedirs(out_dir, exist_ok=True)
        write_fixtures(out_dir, n_docs, shards)
    return out_dir


if __name__ == "__main__":
    import sys

    out = sys.argv[1] if len(sys.argv) > 1 else "fixtures"
    n = int(sys.argv[2]) if len(sys.argv) > 2 else 200
    write_fixtures(out, n)
    print(f"wrote fixtures to {out} ({n} docs)")
