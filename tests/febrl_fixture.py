"""Deterministic FEBRL-style dirty-people generator (the reference's
integration fixture shape: integration-tests/data/arc_febrl1.csv — 1000
rows, typo'd duplicates, nulls; FIXTURES.md F1). Seeded, no I/O."""

from __future__ import annotations

import random

GIVEN = [
    "lachlan", "mitchell", "sophie", "amber", "ruby", "oliver", "chloe",
    "jack", "emily", "liam", "grace", "noah", "mia", "thomas", "zoe",
    "ethan", "isla", "lucas", "ella", "henry", "ava", "leo", "ivy", "max",
]
SURNAME = [
    "berry", "green", "white", "dixon", "campbell", "harris", "walker",
    "taylor", "clark", "lewis", "young", "hall", "allen", "wright", "king",
    "scott", "baker", "adams", "nelson", "hill", "moore", "reed", "cook",
]
SUBURB = [
    "bittern", "kooringal", "tardun", "gowrie", "parkes", "seaford",
    "mildura", "penrith", "hobart", "cairns", "darwin", "geelong",
    "ballarat", "bendigo", "dubbo", "orange", "mackay", "gladstone",
]
STATE = ["nsw", "vic", "qld", "wa", "sa", "tas", "nt", "act"]


def _typo(rng: random.Random, s: str) -> str:
    if len(s) < 3:
        return s + "e"
    kind = rng.randrange(3)
    i = rng.randrange(1, len(s) - 1)
    if kind == 0:  # substitution
        return s[:i] + chr(ord("a") + rng.randrange(26)) + s[i + 1:]
    if kind == 1:  # transposition
        return s[:i] + s[i + 1] + s[i] + s[i + 2:]
    return s[:i] + s[i:]  # duplication (insert)


def make_people(
    n_entities: int = 400,
    dup_fraction: float = 0.4,
    seed: int = 42,
    corruptions: int = 1,
):
    """Rows (unique_id, given_name, surname, suburb, postcode, state,
    date_of_birth, recid); ~``dup_fraction`` of entities get one corrupted
    duplicate record. Deterministic for a given seed.

    ``corruptions`` rounds apply per duplicate: 1 (default) is the easy
    integration fixture where any sane configuration links perfectly;
    3+ makes distance-function/threshold choice matter, so the
    unsupervised objective can discriminate between search trials
    (tools/tpe_ab.py uses this)."""
    rng = random.Random(seed)
    rows = []
    uid = 0
    for e in range(n_entities):
        rec = {
            "given_name": rng.choice(GIVEN),
            "surname": rng.choice(SURNAME),
            "suburb": rng.choice(SUBURB),
            "postcode": f"{rng.randrange(800, 8000):04d}",
            "state": rng.choice(STATE),
            "date_of_birth": f"19{rng.randrange(40, 99):02d}{rng.randrange(1, 13):02d}{rng.randrange(1, 29):02d}",
        }
        uid += 1
        rows.append((str(uid), *rec.values(), f"e{e}"))
        if rng.random() < dup_fraction:
            dup = dict(rec)
            for _ in range(max(1, corruptions)):
                corruption = rng.randrange(4)
                if corruption == 0 and dup["given_name"] is not None:
                    dup["given_name"] = _typo(rng, dup["given_name"])
                elif corruption == 1:
                    dup["surname"] = _typo(rng, dup["surname"])
                elif corruption == 2:
                    pc = list(dup["postcode"])
                    pc[1], pc[2] = pc[2], pc[1]
                    dup["postcode"] = "".join(pc)
                else:
                    dup["given_name"] = None  # missing field
            uid += 1
            rows.append((str(uid), *dup.values(), f"e{e}"))
    return rows


SCHEMA = (
    "unique_id string, given_name string, surname string, suburb string, "
    "postcode string, state string, date_of_birth string, recid string"
)
