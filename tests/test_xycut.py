"""XY-cut unit tests (pure spec, no Spark): known layouts -> known order."""

from vlm_ocr_doc_reader_spark.extraction.spec import xy_cut_order


def test_two_column_page():
    # title across the page, then left column top/bottom, right col top/bottom
    boxes = [
        (100, 10, 900, 60),     # 0 title
        (100, 100, 480, 200),   # 1 left-top
        (100, 220, 480, 320),   # 2 left-bottom
        (520, 100, 900, 200),   # 3 right-top
        (520, 220, 900, 320),   # 4 right-bottom
    ]
    assert xy_cut_order(boxes) == [0, 1, 2, 3, 4]


def test_shuffled_input_same_reading_order():
    boxes = [
        (520, 220, 900, 320),   # right-bottom
        (100, 10, 900, 60),     # title
        (100, 220, 480, 320),   # left-bottom
        (520, 100, 900, 200),   # right-top
        (100, 100, 480, 200),   # left-top
    ]
    assert xy_cut_order(boxes) == [1, 4, 2, 3, 0]


def test_rows_before_columns():
    # two stacked full-width rows, each with two columns
    boxes = [
        (0, 0, 40, 10), (60, 0, 100, 10),      # row 1: L, R
        (0, 20, 40, 30), (60, 20, 100, 30),    # row 2: L, R
    ]
    assert xy_cut_order(boxes) == [0, 1, 2, 3]


def test_overlapping_boxes_fall_back_to_yx():
    boxes = [(0, 5, 10, 15), (5, 0, 15, 10), (2, 2, 12, 12)]
    # no clean gap -> sorted by (y0, x0, idx)
    assert xy_cut_order(boxes) == [1, 2, 0]


def test_degenerate():
    assert xy_cut_order([]) == []
    assert xy_cut_order([(1, 2, 3, 4)]) == [0]
    same = [(0, 0, 10, 10)] * 4
    assert xy_cut_order(same) == [0, 1, 2, 3]  # idx tiebreak, deterministic
