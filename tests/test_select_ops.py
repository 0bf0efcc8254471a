"""SemDeDup + DSIR selection operators vs their DuckDB twins.

Planted-duplicate embeddings: exactly-scaled copies of a base vector
have pairwise cosine exactly 1.0 AND identical cosine to every centroid,
so group survival is decided purely by the documented min-id tie-break —
a deterministic fixture with no rounding-boundary risk.  DSIR docs are
drawn from two vocabularies so target-like documents must out-weigh
noise documents.
"""

import random

import duckdb
import pandas as pd
import pytest
from pyspark.sql import functions as F

from vlm_ocr_doc_reader_spark.datapipe.select import (dsir_logweights,
                                                      dsir_select, semdedup,
                                                      semdedup_over_cap)

SEED = 20260817
N_RANDOM = 48
DUP_GROUPS = {100: 3, 200: 2, 300: 4}  # base id -> group size (scaled copies)


def _emb_frame():
    rng = random.Random(SEED)
    rows = []
    for i in range(N_RANDOM):
        rows.append((i, [round(rng.gauss(0, 1), 3) for _ in range(8)]))
    for base, sz in DUP_GROUPS.items():
        v = [round(rng.gauss(0, 1), 3) for _ in range(8)]
        for j in range(sz):
            # exact scalar multiples: cosine 1.0 within the group and
            # identical centroid-cos for every member
            rows.append((base + j, [round(x * (j + 1), 3) for x in v]))
    return pd.DataFrame(rows, columns=["vec_id", "embedding"])


TARGET_VOCAB = ("the quick brown fox jumps over the lazy dog and then "
                "reads a long book about rivers").split()
NOISE_VOCAB = ["qz%d" % i for i in range(40)]


def _dsir_docs(n=300):
    rng = random.Random(SEED + 7)
    rows = []
    for i in range(n):
        is_t = i % 3 == 0
        vocab = TARGET_VOCAB if is_t else NOISE_VOCAB
        # noise docs still borrow a few target words: buckets overlap
        words = [rng.choice(vocab) for _ in range(rng.randrange(5, 30))]
        if not is_t:
            words[:2] = [rng.choice(TARGET_VOCAB), rng.choice(TARGET_VOCAB)]
        rows.append((i, " ".join(words), "en" if is_t else "xx"))
    rows.append((n, "", "xx"))  # featureless doc: excluded from scores
    return pd.DataFrame(rows, columns=["doc_id", "text", "lang"])


@pytest.fixture(scope="module")
def duck():
    con = duckdb.connect()
    con.register("emb", _emb_frame())
    con.register("documents", _dsir_docs())
    return con


@pytest.fixture(scope="module")
def frames(spark):
    emb = spark.createDataFrame(
        _emb_frame(), "vec_id long, embedding array<double>")
    docs = spark.createDataFrame(
        _dsir_docs(), "doc_id long, text string, lang string")
    return emb, docs


def _match(spark_df, duck_df, float_cols=()):
    got = spark_df.toPandas().reset_index(drop=True)
    want = duck_df.reset_index(drop=True)
    assert list(got.columns) == list(want.columns)
    assert len(got) == len(want)
    for c in got.columns:
        g, w = got[c], want[c]
        if c in float_cols:
            g = g.astype(float).round(6)
            w = w.astype(float).round(6)
            both_nan = g.isna() & w.isna()
            assert ((g == w) | both_nan).all(), \
                f"col {c}: {g[(g != w) & ~both_nan].head()} vs " \
                f"{w[(g != w) & ~both_nan].head()}"
        else:
            assert str(g.dtype) == str(w.dtype), \
                f"col {c}: dtype {g.dtype} != {w.dtype}"
            assert g.equals(w), f"col {c} differs"


SEMDEDUP_SQL = """
WITH e AS (SELECT vec_id AS id, CAST(embedding AS DOUBLE[]) AS v FROM emb),
cents AS (SELECT id AS cid, v AS cvec FROM e
          ORDER BY md5(CAST(id AS VARCHAR)) LIMIT {n}),
scored AS (SELECT e.id, e.v, c.cid,
                  list_cosine_similarity(e.v, c.cvec) AS ccos
           FROM e CROSS JOIN cents c),
ranked AS (SELECT *, row_number() OVER (PARTITION BY id
                     ORDER BY ccos DESC, cid ASC) AS r FROM scored),
assign AS (SELECT id, v, cid, round(ccos, 6) AS cent_cos
           FROM ranked WHERE r = 1),
sized AS (SELECT cid FROM assign GROUP BY cid
          HAVING count(*) > 1 AND count(*) <= {cap}),
p AS (SELECT a.* FROM assign a JOIN sized USING (cid)),
dropped AS (
  SELECT DISTINCT a.id FROM p a JOIN p b USING (cid)
  WHERE a.id <> b.id
    AND round(list_cosine_similarity(a.v, b.v), 6) >= {thr}
    AND (b.cent_cos < a.cent_cos
         OR (b.cent_cos = a.cent_cos AND b.id < a.id)))
SELECT a.id AS vec_id, a.cid, a.cent_cos, d.id IS NULL AS is_kept
FROM assign a LEFT JOIN dropped d USING (id)
ORDER BY vec_id
"""


def test_semdedup_matches_duckdb(frames, duck):
    emb, _ = frames
    got = semdedup(emb, n_clusters=4, threshold=0.95).orderBy("vec_id")
    want = duck.execute(
        SEMDEDUP_SQL.format(n=4, cap=1000, thr=0.95)).fetchdf()
    _match(got, want, float_cols=("cent_cos",))


def test_semdedup_prunes_planted_groups(frames):
    emb, _ = frames
    out = semdedup(emb, n_clusters=4, threshold=0.95).toPandas() \
        .set_index("vec_id")
    for base, sz in DUP_GROUPS.items():
        ids = list(range(base, base + sz))
        kept = [i for i in ids if out.loc[i, "is_kept"]]
        # identical centroid-cos within the group -> min-id survivor
        assert kept == [base], f"group {base}: kept {kept}"
        # the whole group shares one cluster (scaled copies score the
        # same cosine against every centroid)
        assert out.loc[ids, "cid"].nunique() == 1


def test_semdedup_cap_is_lossless_and_reported(frames):
    emb, _ = frames
    # cap below every cluster size: no pairs generated, everything kept
    out = semdedup(emb, n_clusters=4, threshold=0.95, max_cluster=1)
    assert out.filter(~F.col("is_kept")).count() == 0
    over = semdedup_over_cap(emb, n_clusters=4, max_cluster=1).toPandas()
    assert over["sz"].sum() == len(_emb_frame())  # every cluster reported


DSIR_W_SQL = """
WITH base AS (
  SELECT doc_id AS id,
         list_filter(string_split(lower(regexp_replace(trim(text),
                     '\\s+', ' ', 'g')), ' '), x -> x <> '') AS ws,
         (lang = 'en') AS is_t
  FROM documents),
feats0 AS (
  SELECT id, unnest(ws) AS feat, is_t FROM base
  UNION ALL
  SELECT id, unnest(CASE WHEN len(ws) >= 2 THEN list_transform(
             generate_series(1, len(ws) - 1),
             i -> ws[i] || ' ' || ws[i + 1])
         ELSE [] END) AS feat, is_t FROM base),
f AS (SELECT id, CAST(CAST('0x' || substr(md5(feat), 1, 8) AS BIGINT)
             % {B} AS INTEGER) AS bucket, any_value(is_t) AS is_t,
             count(*) AS n
      FROM feats0 GROUP BY id, bucket),
raw_b AS (SELECT bucket, sum(n) AS cr FROM f GROUP BY bucket),
tgt_b AS (SELECT bucket, sum(n) AS ct FROM f WHERE is_t GROUP BY bucket),
rt AS (SELECT sum(cr) AS tr FROM raw_b),
tt AS (SELECT sum(ct) AS tt FROM tgt_b),
lrt AS (
  SELECT r.bucket,
         round(ln(((coalesce(t.ct, 0) + {a}) / (tt.tt + {a} * {B}))
                  / ((r.cr + {a}) / (rt.tr + {a} * {B}))), 12) AS lr
  FROM raw_b r LEFT JOIN tgt_b t USING (bucket)
  CROSS JOIN rt CROSS JOIN tt)
SELECT id, CAST(sum(n) AS BIGINT) AS n_feats,
       round(CAST(sum(CAST(n * lr AS DECIMAL(24,10))) AS DOUBLE), 6)
         AS logw
FROM f JOIN lrt USING (bucket) GROUP BY id ORDER BY id
"""


def test_dsir_logweights_match_duckdb(frames, duck):
    _, docs = frames
    got = dsir_logweights(docs, F.col("lang") == "en",
                          n_buckets=256).orderBy("id")
    want = duck.execute(DSIR_W_SQL.format(B=256, a=1.0)).fetchdf()
    _match(got, want, float_cols=("logw",))


def test_dsir_target_docs_outweigh_noise(frames):
    _, docs = frames
    w = dsir_logweights(docs, F.col("lang") == "en", n_buckets=256) \
        .join(docs.select(F.col("doc_id").alias("id"), "lang"), "id") \
        .toPandas()
    mean_t = w[w.lang == "en"].logw.mean()
    mean_n = w[w.lang != "en"].logw.mean()
    assert mean_t > mean_n + 1.0, (mean_t, mean_n)
    # featureless doc excluded
    assert (len(w) == len(_dsir_docs()) - 1)


def test_dsir_select_matches_duckdb(frames, duck):
    _, docs = frames
    got = dsir_select(docs, F.col("lang") == "en", k=40, n_buckets=256)
    sql = f"""
WITH w AS ({DSIR_W_SQL.format(B=256, a=1.0)})
SELECT id, n_feats, logw,
       round(logw + -ln(-ln(
         CAST('0x' || substr(md5('dsir' || CAST(id AS VARCHAR)), 1, 12)
              AS BIGINT) / 281474976710656.0)), 6) AS _skey
FROM w ORDER BY _skey DESC, id ASC LIMIT 40
"""
    _match(got, duck.execute(sql).fetchdf(),
           float_cols=("logw", "_skey"))


def test_dsir_select_biases_toward_target(frames):
    _, docs = frames
    sel = dsir_select(docs, F.col("lang") == "en", k=60, n_buckets=256) \
        .join(docs.select(F.col("doc_id").alias("id"), "lang"), "id") \
        .toPandas()
    # 1/3 of the corpus is target; the selection should be mostly target
    assert (sel.lang == "en").mean() > 0.7


# ---- LSH parameter tuning (pure planning arithmetic, no Spark) ----

def test_lsh_tuning_brackets_threshold_and_is_optimal():
    from vlm_ocr_doc_reader_spark.datapipe.dedup import (lsh_collision_prob,
                                                         lsh_tuning)
    got = lsh_tuning(0.8, 16)
    assert got["bands"] * got["rows_per_band"] == got["n_hashes_used"] <= 16
    # the S-curve must actually separate: collide above, miss below
    b, r = got["bands"], got["rows_per_band"]
    assert lsh_collision_prob(0.95, b, r) > 0.8
    assert lsh_collision_prob(0.3, b, r) < 0.05
    # brute-force optimality over every factorization <= budget
    def masses(b, r):
        fp = sum(lsh_collision_prob((i + 0.5) / 1000, b, r)
                 for i in range(1000) if (i + 0.5) / 1000 < 0.8) / 1000
        fn = sum(1 - lsh_collision_prob((i + 0.5) / 1000, b, r)
                 for i in range(1000) if (i + 0.5) / 1000 >= 0.8) / 1000
        return fp + fn
    best = min(masses(h // r, r)
               for h in range(2, 17) for r in range(1, h + 1) if h % r == 0)
    assert abs(masses(b, r) - best) < 1e-12


def test_lsh_tuning_fn_weight_lowers_crossover():
    from vlm_ocr_doc_reader_spark.datapipe.dedup import lsh_tuning
    balanced = lsh_tuning(0.8, 64)
    recall_first = lsh_tuning(0.8, 64, fn_weight=10.0)
    # paying more for misses pushes the curve left (collide earlier)
    assert recall_first["crossover"] <= balanced["crossover"]
    assert recall_first["fn_mass"] <= balanced["fn_mass"]


def test_lsh_tuning_rejects_bad_inputs():
    from vlm_ocr_doc_reader_spark.datapipe.dedup import lsh_tuning
    with pytest.raises(ValueError):
        lsh_tuning(1.0, 16)
    with pytest.raises(ValueError):
        lsh_tuning(0.8, 1)


def test_semdedup_refined_clusters_still_prune_groups(frames):
    """Lloyd-refined clustering (the paper's k-means) keeps the
    invariants: schema identical, exactly one survivor per planted
    scaled-copy group (copies co-cluster under ANY centroid set since
    their cosine to every centroid is identical), full row coverage."""
    emb, _ = frames
    out = semdedup(emb, n_clusters=4, threshold=0.95,
                   refine_iters=2).toPandas().set_index("vec_id")
    assert len(out) == len(_emb_frame())
    for base, sz in DUP_GROUPS.items():
        ids = list(range(base, base + sz))
        kept = [i for i in ids if out.loc[i, "is_kept"]]
        assert kept == [base], f"group {base}: kept {kept}"
