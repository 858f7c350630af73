"""Table/dataset matching (reference proj/match.py semantics):
exact column-set equality, closest-match symmetric-difference report,
matched-table-set → dataset selection."""

import pytest

from smcchecker_spark.match import match, match_columns


SCHEMAS = {
    "tbl_images": ["image_id", "bytes", "w", "h", "fmt", "caption", "phash"],
    "tbl_captions": ["image_id", "caption", "lang"],
    "tbl_meta": ["image_id", "w", "h"],
}

DATASETS = {
    "images_full": ["tbl_images", "tbl_captions"],
    "images_lite": ["tbl_meta"],
}


def test_exact_match_ignores_order_and_dupes():
    table, entry = match_columns(
        ["caption", "image_id", "lang", "caption"], SCHEMAS
    )
    assert table == "tbl_captions" and entry.matched


def test_closest_match_report():
    # one column off tbl_meta: extra 'fmt', missing 'h'
    table, entry = match_columns(["image_id", "w", "fmt"], SCHEMAS)
    assert table is None and not entry.matched
    assert entry.closest_tbl == "tbl_meta"
    assert entry.in_tab_not_table == ("fmt",)
    assert entry.in_table_not_tab == ("h",)


def test_closest_match_tie_breaks_first_in_registry():
    # equidistant from everything → first registry entry wins (iloc[0])
    schemas = {"a": ["x", "y"], "b": ["x", "z"]}
    _, entry = match_columns(["x", "q"], schemas)
    assert entry.closest_tbl == "a"


def test_match_dataset_selection(spark):
    dfs = {
        "Sheet1": spark.createDataFrame(
            [], "image_id string, bytes binary, w int, h int, fmt string, "
                "caption string, phash long"
        ),
        "Sheet2": spark.createDataFrame(
            [], "image_id string, caption string, lang string"
        ),
    }
    dataset, report, out = match(dfs, SCHEMAS, DATASETS)
    assert dataset == "images_full"
    assert set(out) == {"tbl_images", "tbl_captions"}  # re-keyed
    assert {e.sheetname: e.tablename for e in report} == {
        "Sheet1": "tbl_images",
        "Sheet2": "tbl_captions",
    }


def test_match_no_dataset_and_unmatched_sheet(spark):
    dfs = {
        "Weird": spark.createDataFrame([], "image_id string, w int, fmt string"),
    }
    dataset, report, out = match(dfs, SCHEMAS, DATASETS)
    assert dataset == ""  # no dataset claims the (empty) matched set... or
    # rather: no tables matched → matched set {} != any dataset's set
    assert set(out) == {"Weird"}  # unmatched keeps its sheet name
    assert report[0].closest_tbl == "tbl_meta"


def test_duplicate_dataset_table_sets_rejected(spark):
    dfs = {
        "S": spark.createDataFrame([], "image_id string, w int, h int"),
    }
    bad = {"d1": ["tbl_meta"], "d2": ["tbl_meta"]}
    with pytest.raises(ValueError, match="2 datasets"):
        match(dfs, SCHEMAS, bad)
