"""Pin the driver-window registration order (no Spark session needed).

The round driver's correctness pass checks only the FIRST 50 registry
entries in insertion order, so ordering is load-bearing: a query that never
lands in the window never gets the hard rows+schema+hash driver signal.

Round-4 invariant (VERDICT r03 next-round #2): every registry query must be
driver-green within the last two rounds. CORRECTNESS_r03.json covers 50
queries; the other 30 were green only in CORRECTNESS_r02 — those MUST sit
inside r04's 50-entry window, and everything left outside must carry a
green r03 row.
"""

import json
import pathlib

from use_clickhouse_2_analyze_mysql_binlog_spark import queries_registry as R

WINDOW = 50
REPO = pathlib.Path(__file__).resolve().parents[1]


def _green(correctness_path: pathlib.Path) -> set[str]:
    doc = json.loads(correctness_path.read_text())
    return {
        n
        for n, row in doc.items()
        if row.get("hash_match") or row.get("err") == "no_oracle"
    }


R03_GREEN = _green(REPO / "CORRECTNESS_r03.json")
R02_GREEN = _green(REPO / "CORRECTNESS_r02.json")

# New or implementation-changed in round 4 — no (current) driver proof, so
# they must be in-window.
R4_CHANGED = [
    "sequence_pack",
    "dedup_ngram_jaccard",
    "binlog_gap_report",
    "window_funnel",
    "ch_dashboard_rollup",
    "tokens_per_source_stats",
]

HEADLINE = [
    "transaction_stats",
    "top_transaction_by_size",
    "top_transaction_by_spend_time",
    "top_transaction_by_affected_rows",
    "transaction_result_table",
]


def test_priority_names_all_registered():
    missing = [n for n in R.DRIVER_WINDOW_PRIORITY if n not in R.QUERIES]
    assert not missing, f"typo or unregistered query in priority list: {missing}"


def test_priority_list_has_no_duplicates():
    assert len(R.DRIVER_WINDOW_PRIORITY) == len(set(R.DRIVER_WINDOW_PRIORITY))


def test_r02_only_greens_inside_driver_window():
    """The 30 queries whose only green row is r02 (rotated out in r03) must
    re-enter the window this round or their proof ages out."""
    window = set(list(R.QUERIES)[:WINDOW])
    r02_only = [n for n in R.QUERIES if n in R02_GREEN and n not in R03_GREEN]
    assert r02_only, "expected r02-only-green queries; did the window move?"
    fell_out = [n for n in r02_only if n not in window]
    assert not fell_out, (
        f"r02-only-green queries outside the r04 window (proof ages out): "
        f"{fell_out}"
    )


def test_changed_and_headline_inside_driver_window():
    window = set(list(R.QUERIES)[:WINDOW])
    for name in R4_CHANGED + HEADLINE:
        if name not in R.QUERIES:
            continue  # not yet registered this round
        assert name in window, f"{name} fell outside the {WINDOW}-entry window"


def test_queries_outside_window_were_green_in_r03():
    """Everything past the window must already carry a green r03 row, so
    every registry query is green within the r03∪r04 window."""
    overflow = list(R.QUERIES)[WINDOW:]
    not_proven = [n for n in overflow if n not in R03_GREEN]
    assert not not_proven, (
        f"queries past position {WINDOW} without a green r03 row: {not_proven}"
    )


def test_oracles_cover_queries():
    """Every query has an oracle unless explicitly rows-only by design."""
    rows_only = {
        "embedding_kmeans",
        "size_quantiles_approx",
        "daily_distinct_gtids_approx",
    }
    missing = [n for n in R.QUERIES if n not in R.ORACLES and n not in rows_only]
    assert missing == [], f"queries silently lacking an oracle: {missing}"
