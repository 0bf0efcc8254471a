"""Randomized model-based checks for the round-5 operators: each operator
is compared against an independent single-node model written from its
documented semantics (the vote-fuzz pattern) on seeded random inputs that
exercise ties, duplicates, and degenerate groups far beyond the gate data.
"""

import random
from datetime import datetime, timedelta
from decimal import ROUND_HALF_UP, Decimal

from vlm_ocr_doc_reader_spark.datapipe.dedup import containment_pairs
from vlm_ocr_doc_reader_spark.datapipe.history import scd2_history
from vlm_ocr_doc_reader_spark.datapipe.sessions import (decayed_sum,
                                                        rolling_stats)

EV_SCHEMA = ("event_id long, user_id long, ts timestamp, "
             "event_type string, value double")


def _random_events(seed, n, n_users=5, tie_every=4):
    rng = random.Random(seed)
    base = datetime(2024, 3, 1)
    rows = []
    for i in range(n):
        # deliberate timestamp ties every few events (tiebreak coverage)
        ts = base + timedelta(minutes=(i // tie_every) * 7)
        rows.append((i, rng.randrange(n_users), ts,
                     rng.choice(["a", "b", "c"]), rng.uniform(-5, 5)))
    return rows


def test_scd2_fuzz_vs_model(spark):
    rows = _random_events(11, 120)
    df = spark.createDataFrame(rows, EV_SCHEMA)
    got = sorted(((r["user_id"], r["value"],
                   r["valid_from"], r["valid_to"], r["is_current"])
                  for r in scd2_history(df, key_col="user_id",
                                        value_col="event_type").collect()))

    want = []
    by_user = {}
    for eid, uid, ts, etype, _v in rows:
        by_user.setdefault(uid, []).append((ts, eid, etype))
    for uid, evs in by_user.items():
        evs.sort()
        kept = []
        for ts, eid, etype in evs:
            if not kept or kept[-1][1] != etype:
                kept.append((ts, etype))
        for i, (ts, etype) in enumerate(kept):
            nxt = kept[i + 1][0] if i + 1 < len(kept) else None
            want.append((uid, etype, ts, nxt, nxt is None))
    assert got == sorted(want)


def test_rolling_stats_fuzz_vs_model(spark):
    rows = _random_events(7, 100)
    df = spark.createDataFrame(rows, EV_SCHEMA)
    got = {r["event_id"]: (r["n_window"], r["rolling_mean"],
                           r["rolling_max"])
           for r in rolling_stats(df, n=4).collect()}

    by_user = {}
    for eid, uid, ts, _e, v in rows:
        by_user.setdefault(uid, []).append((ts, eid, v))
    for uid, evs in by_user.items():
        evs.sort()
        for i, (ts, eid, v) in enumerate(evs):
            frame = [x[2] for x in evs[max(0, i - 3):i + 1]]
            dec = sum(Decimal(repr(x)).quantize(Decimal("1.000000"),
                                                ROUND_HALF_UP)
                      for x in frame)
            mean = round(float(dec) / len(frame), 6)
            n_w, r_mean, r_max = got[eid]
            assert n_w == len(frame)
            assert abs(r_mean - mean) < 2e-6, (eid, r_mean, mean)
            assert r_max == round(max(frame), 6)


def test_decayed_sum_fuzz_vs_model(spark):
    rows = _random_events(3, 80)
    anchor = "2024-03-05 00:00:00"
    df = spark.createDataFrame(rows, EV_SCHEMA)
    got = {r["user_id"]: (r["n_events"], r["decayed_value"])
           for r in decayed_sum(df, half_life_hours=12.0,
                                anchor_ts=anchor).collect()}
    anchor_dt = datetime(2024, 3, 5)
    agg = {}
    for _eid, uid, ts, _e, v in rows:
        age_h = (anchor_dt - ts).total_seconds() / 3600.0
        term = v * (0.5 ** (age_h / 12.0))
        q = Decimal(repr(term)).quantize(Decimal("1.00000000"),
                                         ROUND_HALF_UP)
        n, s = agg.get(uid, (0, Decimal(0)))
        agg[uid] = (n + 1, s + q)
    for uid, (n, s) in agg.items():
        gn, gv = got[uid]
        assert gn == n
        assert abs(gv - float(s)) < 1e-6, (uid, gv, float(s))


def test_containment_fuzz_vs_set_model(spark):
    rng = random.Random(5)
    vocab = [f"w{i}" for i in range(30)]
    docs = [(i, " ".join(rng.choices(vocab, k=rng.randrange(3, 25))))
            for i in range(12)]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    got = {(r["id_a"], r["id_b"]): (r["n_inter"], r["containment_a"],
                                    r["containment_b"])
           for r in containment_pairs(df, k=1).collect()}
    sets = {i: set(t.split()) for i, t in docs}
    for a in range(12):
        for b in range(a + 1, 12):
            inter = len(sets[a] & sets[b])
            if inter == 0:
                assert (a, b) not in got
                continue
            n, ca, cb = got[(a, b)]
            assert n == inter
            assert ca == round(inter / len(sets[a]), 6)
            assert cb == round(inter / len(sets[b]), 6)
