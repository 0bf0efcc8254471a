"""Vote-operator fuzz: the DataFrame aggregate must match a from-spec
single-node model on randomized sample sets (many entities, one pass).
The model below is written from the documented semantics in
operators/vote.py — NOT from reference code — and exercises tie-breaks,
error exclusion, and sentinel grouping far beyond the 11 canonical cases."""

import random

from vlm_ocr_doc_reader_spark.extraction.spec import normalize_for_vote
from vlm_ocr_doc_reader_spark.operators.vote import majority_vote

VALUES = ["7704123456", "7704123456 ", " 7704123456", "OOO Rosatom",
          "ooo rosatom", "x", "", "  ", None, "НЕТ", "a b", "a\tb"]
STATUSES = ["ok", "ok", "ok", "no_data", "error"]


def model_vote(samples):
    """(value, context, confidence, verified) per the documented semantics."""
    total = len(samples)
    valid = [(i, v, c) for i, (v, c, s) in enumerate(samples)
             if s in ("ok", "no_data")]
    if not valid:
        return ("", None, f"0/{total}", False)
    groups = {}
    for i, v, c in valid:
        groups.setdefault(normalize_for_vote(v), []).append((i, v, c))
    winner = max(groups.items(),
                 key=lambda kv: (len(kv[1]), -kv[1][0][0]))
    key, members = winner
    k = len(members)
    first = members[0]
    value = "" if key == "__NO_DATA__" else (first[1] or "").strip()
    return (value, first[2], f"{k}/{len(valid)}",
            k == len(valid) and len(valid) == total)


def test_vote_fuzz_500_entities(spark):
    rng = random.Random(99)
    rows, expected = [], {}
    for e in range(500):
        n = rng.randint(1, 7)
        samples = [(rng.choice(VALUES), rng.choice([None, "c1", "c2"]),
                    rng.choice(STATUSES)) for _ in range(n)]
        eid = f"e{e}"
        expected[eid] = model_vote(samples)
        rows += [(eid, i, v, c, s) for i, (v, c, s) in enumerate(samples)]

    df = spark.createDataFrame(
        rows, "entity_id string, axis_idx int, value string, "
              "context string, status string")
    got = {r["entity_id"]: (r["value"], r["context"], r["confidence"],
                            r["verified"])
           for r in majority_vote(df).collect()}
    assert set(got) == set(expected)
    bad = {e: (got[e], expected[e]) for e in expected if got[e] != expected[e]}
    assert not bad, f"{len(bad)} mismatches; first: {list(bad.items())[0]}"
