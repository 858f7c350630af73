"""Table/dataset matching — the ingest pipeline's step 2 (SURVEY.md §3.1).

Reference: /root/reference/proj/match.py — each submitted sheet is matched
to a target table by EXACT column-set equality (:54-57); an unmatched
sheet gets a closest-match report built from the minimum-symmetric-
difference candidate (:65-92, first row wins a tie :81); the set of
matched tables then selects the dataset (:134-151, no-match → "").

Spark shape: matching is schema-level metadata work — sets of column
names against a declarative schema registry (the stand-in for the
reference's live ``information_schema`` scan, proj/match.py:18-26) — so
it runs driver-side on ``df.columns``; no data is read. The returned
mapping renames each matched DataFrame to its table name, mirroring the
reference's ``all_dfs`` re-keying (:103).
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame


@dataclass(frozen=True)
class MatchReportEntry:
    """One row of the closest-match report (proj/match.py:84-92,112-123).

    ``tablename`` is set (and the closest-* fields empty) on an exact
    match; on a miss it is "" and ``closest_tbl`` names the candidate
    with the minimum symmetric difference.
    """

    sheetname: str
    tablename: str
    in_tab_not_table: tuple[str, ...]  # submitted columns the table lacks
    in_table_not_tab: tuple[str, ...]  # table columns the submission lacks
    closest_tbl: str

    @property
    def matched(self) -> bool:
        return bool(self.tablename)


def match_columns(
    columns: list[str], schemas: dict[str, list[str]]
) -> tuple[str | None, MatchReportEntry]:
    """Match one column set against the schema registry.

    Exact column-SET equality like the reference (:54-57 — order and
    duplicates are irrelevant); on a miss, the closest candidate by
    symmetric-difference size, first-in-registry-order winning ties
    (:76-81 ``iloc[0]``).
    """
    cols = set(columns)
    for table, schema in schemas.items():
        if set(schema) == cols:
            return table, MatchReportEntry("", table, (), (), "")
    closest_tbl, closest_schema = min(
        schemas.items(),
        key=lambda kv: (len(set(kv[1]).symmetric_difference(cols)),),
    )
    return None, MatchReportEntry(
        "",
        "",
        tuple(sorted(cols - set(closest_schema))),
        tuple(sorted(set(closest_schema) - cols)),
        closest_tbl,
    )


def match(
    dfs: dict[str, DataFrame],
    schemas: dict[str, list[str]],
    datasets: dict[str, list[str]] | None = None,
) -> tuple[str, list[MatchReportEntry], dict[str, DataFrame]]:
    """Match every submitted DataFrame; select the dataset.

    Returns ``(dataset_name, report, matched_dfs)`` where ``matched_dfs``
    is re-keyed by matched table name (unmatched sheets keep their sheet
    name), and ``dataset_name`` is "" when the matched table set selects
    no dataset (proj/match.py:138-147). Raises if two datasets claim the
    same table set (the reference's assert :136).
    """
    report: list[MatchReportEntry] = []
    matched_tables: list[str] = []
    out: dict[str, DataFrame] = {}
    for sheet, df in dfs.items():
        table, entry = match_columns(list(df.columns), schemas)
        entry = MatchReportEntry(
            sheet,
            entry.tablename,
            entry.in_tab_not_table,
            entry.in_table_not_tab,
            entry.closest_tbl,
        )
        report.append(entry)
        if table is not None:
            matched_tables.append(table)
            out[table] = df
        else:
            out[sheet] = df

    dataset = ""
    if datasets:
        hits = [
            name
            for name, tables in datasets.items()
            if set(tables) == set(matched_tables)
        ]
        if len(hits) > 1:
            raise ValueError(
                f"matched {len(hits)} datasets {hits} — table sets in the "
                "dataset registry must be unique (proj/match.py:136)"
            )
        dataset = hits[0] if hits else ""
    return dataset, report, out
