"""End-to-end /upload lifecycle parity (SURVEY.md §3.1): a multi-sheet
submission goes match → preprocess (trim + case-fix) → core checks →
custom-tier gating → verdicts, mirroring /root/reference/proj/main.py's
pipeline shape with the engine's Spark-native steps."""

from pyspark.sql import functions as F

from smcchecker_spark import clean
from smcchecker_spark.constraints import (
    InLookup,
    MaxLength,
    NotNull,
    Suite,
    ValidationContext,
)
from smcchecker_spark.match import match
from smcchecker_spark.run import ValidationRunner

SCHEMAS = {
    "tbl_images": ["image_id", "fmt", "caption", "part_id"],
}
DATASETS = {"images": ["tbl_images"]}


def test_upload_lifecycle(spark):
    # 1. ingest: one "sheet" with messy values — padded whitespace,
    # wrong-case fmt, one NULL caption, one overlong caption
    rows = [
        ("i1", "  PNG ", "a caption", 0),
        ("i2", "jpeg", None, 0),
        ("i3", "png", "x" * 30, 1),
        ("i4", "bmp", "ok", 1),  # fmt not in lookup
    ]
    sheet = spark.createDataFrame(
        rows, "image_id string, fmt string, caption string, part_id int"
    )

    # 2. match (exact column-set → table name, dataset selection)
    dataset, report, dfs = match({"Sheet1": sheet}, SCHEMAS, DATASETS)
    assert dataset == "images" and set(dfs) == {"tbl_images"}
    assert all(e.matched for e in report)

    # 3. preprocess: trim + case-fix fmt against the lookup
    lu = spark.createDataFrame([("png",), ("jpeg",)], "fmt string")
    cleaned = clean.clean_data(
        dfs["tbl_images"], case_fix_lookups={"fmt": (lu, "fmt")}
    )
    got_fmts = {r["image_id"]: r["fmt"] for r in cleaned.collect()}
    assert got_fmts["i1"] == "png"  # trimmed AND case-fixed
    assert got_fmts["i4"] == "bmp"  # no lookup match → left as-is

    # 4+5. core checks + custom tier (gated per partition) + verdicts
    suite = Suite(
        name="images_core",
        table="tbl_images",
        constraints=[
            NotNull("caption"),
            MaxLength("caption", max_length=20),
            InLookup("fmt", lookup="lu_fmt", lookup_key="fmt"),
        ],
        custom_constraints=[NotNull("image_id")],
    )
    ctx = ValidationContext(lookups={"lu_fmt": lu})
    res = ValidationRunner(suite, ctx, row_id_col="image_id").run(cleaned)

    got = {(r["row_id"], r["check_name"]) for r in res.violations.collect()}
    assert got == {
        ("i2", "notnull_caption"),
        ("i3", "maxlength_caption"),
        ("i4", "inlookup_fmt_lu_fmt"),
    }
    # every partition had a core error → the custom tier ran nowhere
    verd = {r["part_id"]: r["status"] for r in res.verdicts.collect()}
    assert verd == {0: "fail", 1: "fail"}
    # messages aggregate per row (reference generic.py:25-51 semantics)
    msgs = {r["row_id"]: r["error_message"] for r in res.messages_per_row().collect()}
    assert "empty value" in msgs["i2"]
