"""HTML -> span-table source (sources/readers.py html_to_spans): the
north-rule "HTML boilerplate strip" front door feeding the existing
classify/order/extract pipeline unchanged."""

import pyspark.sql.functions as F

from vlm_ocr_doc_reader_spark.sources.readers import html_to_spans

PAGE = """
<html><head><title>Widget Manual</title>
<style>body { color: red }</style>
<script>var tracking = 1;</script></head>
<body>
<nav><a href="/">Home</a> <a href="/about">About</a></nav>
<h1>Widget Assembly Guide</h1>
<p>Attach the flange to the spindle before tightening the bolts.
This prevents the housing from warping under load.</p>
<img src="fig1.png">
<p><a href="/buy">Buy now</a></p>
<footer>Copyright 2024 Widgets Inc. All rights reserved.</footer>
</body></html>
"""


def _spans(spark, pages):
    df = spark.createDataFrame(pages, "doc_id string, html string")
    rows = html_to_spans(df).collect()
    return {r["doc_id"]: [tuple(s) for s in r["spans"]] for r in rows}


def test_html_block_kinds_and_order(spark):
    spans = _spans(spark, [("d1", PAGE)])["d1"]
    kinds = [s[0] for s in spans]
    texts = {s[0]: s[1] for s in spans}
    # title + h1 are headings; style/script/nav/footer content is boilerplate
    assert kinds.count("heading") == 2
    assert "Widget Assembly Guide" in texts["heading"] or any(
        s[1] == "Widget Assembly Guide" for s in spans if s[0] == "heading")
    boiler = [s[1] for s in spans if s[0] == "boilerplate"]
    assert any("tracking" in b for b in boiler)       # script content
    assert any("Copyright" in b for b in boiler)      # footer content
    assert any("Home" in b for b in boiler)           # nav content
    # the real paragraph survives as text
    body = [s[1] for s in spans if s[0] == "text"]
    assert any("flange" in t for t in body)
    # image span carries the src as media_ref
    img = [s for s in spans if s[0] == "image"]
    assert len(img) == 1 and img[0][2] == "fig1.png"
    # the link-only block is kind=link
    assert any(s[0] == "link" and s[1] == "Buy now" for s in spans)
    # offsets are dense document order
    assert [s[3] for s in spans] == list(range(len(spans)))


def test_html_malformed_never_raises(spark):
    spans = _spans(spark, [
        ("ok", "<p>fine</p>"),
        ("broken", "<div><p>unclosed <b>mess <<<< &nonsense;"),
        ("empty", ""),
        ("null", None),
    ])
    assert any(s[1] == "fine" for s in spans["ok"])
    assert isinstance(spans["broken"], list)   # tolerant parse, no raise
    assert spans["empty"] == []
    assert spans["null"] == []


def test_html_feeds_extraction_pipeline(spark):
    """End-to-end: web page -> spans -> the engine's extract plan; the
    boilerplate never reaches the output, the content does."""
    from vlm_ocr_doc_reader_spark.plans.extract import extract
    df = spark.createDataFrame([("d1", PAGE)], "doc_id string, html string")
    out = extract(html_to_spans(df))      # (doc_id, spans nested)
    spans = out.select(F.explode("spans").alias("s")) \
        .select("s.kind", "s.text").collect()
    texts = [r["text"] for r in spans if r["kind"] == "text"]
    assert any("flange" in t for t in texts)
    all_text = " ".join(t for t in (r["text"] for r in spans) if t)
    assert "Copyright" not in all_text
    assert "tracking" not in all_text


def test_html_deterministic_across_partitionings(spark):
    pages = [(f"d{i}", PAGE.replace("Widget", f"Widget{i}"))
             for i in range(20)]
    df = spark.createDataFrame(pages, "doc_id string, html string")
    a = sorted(map(str, html_to_spans(df).collect()))
    b = sorted(map(str, html_to_spans(df.repartition(7)).collect()))
    assert a == b


def test_density_classify_numwords_tree(spark):
    """The published NumWordsRules branches, exercised directly: link
    blocks rejected, short blocks saved by contentful neighbors, the
    after-link branch demanding more words."""
    from vlm_ocr_doc_reader_spark.operators.classify import density_classify
    long20 = " ".join(f"w{i}" for i in range(20))   # > 16 words
    long45 = " ".join(f"v{i}" for i in range(45))   # > 40 words
    rows = [
        # doc a: link block rejected outright; following long text kept
        # via the after-link branch (45 > 40)
        ("a", 0, "Home About Contact", "link"),
        ("a", 1, long45, "text"),
        # doc b: short block saved by its long NEXT neighbor
        ("b", 0, "short lead-in", "text"),
        ("b", 1, long20, "text"),
        # doc c: isolated short block -> boilerplate
        ("c", 0, "tiny", "text"),
        # doc d: boilerplate kind always rejected, image always kept
        ("d", 0, long20, "boilerplate"),
        ("d", 1, None, "image"),
    ]
    df = spark.createDataFrame(rows,
                               "doc_id string, offset int, text string, "
                               "kind string")
    out = {(r["doc_id"], r["offset"]): r["keep"]
           for r in density_classify(df).collect()}
    assert out[("a", 0)] is False          # link density > 1/3
    assert out[("a", 1)] is True           # after-link: 45 > 40
    assert out[("b", 0)] is True           # next neighbor 20 > 15
    assert out[("b", 1)] is True           # own words > 16
    assert out[("c", 0)] is False          # isolated short
    assert out[("d", 0)] is False          # boilerplate kind
    assert out[("d", 1)] is True           # media anchor passes


def test_density_classify_after_link_branch_is_stricter(spark):
    from vlm_ocr_doc_reader_spark.operators.classify import density_classify
    words30 = " ".join(f"x{i}" for i in range(30))
    rows = [("a", 0, "nav nav nav", "link"), ("a", 1, words30, "text"),
            ("b", 0, "prose " * 6, "text"), ("b", 1, words30, "text")]
    df = spark.createDataFrame(rows,
                               "doc_id string, offset int, text string, "
                               "kind string")
    out = {(r["doc_id"], r["offset"]): r["keep"]
           for r in density_classify(df).collect()}
    # 30 words: NOT enough right after a link block (needs > 40)...
    assert out[("a", 1)] is False
    # ...but plenty after an ordinary text block (> 16)
    assert out[("b", 1)] is True


def test_img_inside_boilerplate_container_is_boilerplate(spark):
    """A nav logo or footer tracking pixel must NOT survive the strip as
    kind='image' (density_classify keeps image spans unconditionally —
    the r5 advice leak): inside script/style/nav/header/footer/aside the
    <img> becomes a boilerplate span (media_ref still recorded for
    lineage), while a body <img> stays kind='image'."""
    page = ('<html><body><nav><img src="logo.png">Home</nav>'
            '<p>Real content paragraph with enough words to keep.</p>'
            '<img src="fig.png">'
            '<footer><img src="pixel.gif"></footer></body></html>')
    spans = _spans(spark, [("d", page)])["d"]
    by_ref = {s[2]: s[0] for s in spans if s[2] is not None}
    assert by_ref["logo.png"] == "boilerplate"
    assert by_ref["pixel.gif"] == "boilerplate"
    assert by_ref["fig.png"] == "image"
    # and the boilerplate image spans carry no text payload
    assert all(s[1] is None for s in spans if s[2] is not None)
