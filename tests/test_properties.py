"""Property-based tests (hypothesis) for pure operator logic.

Spark-free: these pin down the algebraic properties the distributed
operators rely on, at a per-function granularity the oracle-parity tests
can't isolate.
"""

import datetime as dt

from hypothesis import assume, given, settings
from hypothesis import strategies as st

from use_clickhouse_2_analyze_mysql_binlog_spark.plans.storage import retention_cutoff
from use_clickhouse_2_analyze_mysql_binlog_spark.streaming.stateful_job import (
    _sessionize,
)

rows = st.lists(
    st.tuples(
        st.integers(0, 10**9),  # ts_ms
        st.integers(0, 10**6),  # pos
        st.integers(0, 10**4),  # size
        st.integers(0, 10**3),  # affected
    ),
    min_size=1,
    max_size=60,
)


@given(rows, st.integers(1, 10**6))
@settings(max_examples=200, deadline=None)
def test_sessionize_partitions_input(rs, gap_ms):
    sessions = _sessionize(rs, gap_ms)
    # partition: every row appears exactly once, sorted within sessions
    flat = [r for s in sessions for r in s]
    assert sorted(flat) == sorted(rs)
    for s in sessions:
        assert s == sorted(s)
        # intra-session gaps < gap_ms
        assert all(b[0] - a[0] < gap_ms for a, b in zip(s, s[1:]))
    # inter-session gaps >= gap_ms (sessions are maximal)
    for s1, s2 in zip(sessions, sessions[1:]):
        assert s2[0][0] - s1[-1][0] >= gap_ms


@given(rows, st.integers(1, 10**6))
@settings(max_examples=100, deadline=None)
def test_sessionize_order_invariant(rs, gap_ms):
    assert _sessionize(rs, gap_ms) == _sessionize(list(reversed(rs)), gap_ms)


@given(
    st.dates(dt.date(2000, 1, 31), dt.date(2030, 12, 31)),
    st.integers(0, 120),
)
@settings(max_examples=200, deadline=None)
def test_retention_cutoff_properties(today, months):
    cut = retention_cutoff(today, months)
    # exactly `months` calendar months back
    assert (today.year * 12 + today.month) - (cut.year * 12 + cut.month) == months
    # day clamped, never past today's day-of-month
    assert cut.day <= today.day
    # monotone: longer retention -> earlier (or equal) cutoff
    assert retention_cutoff(today, months + 1) <= cut


# ---------------------------------------------------------------------------
# CH translator join-rewriter parsers (r07): text-level properties
# ---------------------------------------------------------------------------

_ident = st.from_regex(r"[a-z][a-z0-9_]{0,8}", fullmatch=True).filter(
    lambda s: s not in {"on", "using", "as", "any", "join", "left", "inner",
                        "array", "not", "and", "or", "in", "is"}
)


@given(
    left=_ident, right=_ident, alias=st.none() | _ident,
    keys=st.lists(_ident, min_size=1, max_size=4, unique=True),
    n_ws=st.integers(1, 3),
    kw=st.sampled_from(["ANY LEFT JOIN", "LEFT ANY JOIN", "any left join",
                        "ANY INNER JOIN", "ANY JOIN"]),
)
@settings(max_examples=150, deadline=None)
def test_any_join_rewrite_parser_properties(left, right, alias, keys, n_ws, kw):
    from use_clickhouse_2_analyze_mysql_binlog_spark.functions import ch_compat

    ws = " " * n_ws
    alias_sql = f" AS {alias}" if alias else ""
    q = (
        f"SELECT 1 FROM {left}{ws}{kw}{ws}{right}{alias_sql}{ws}"
        f"USING ({', '.join(keys)}) WHERE x = 1"
    )
    out = ch_compat.translate(q)
    # exactly one dedup window, partitioned by ALL the USING keys
    assert out.count("row_number() OVER") == 1
    assert f"PARTITION BY {', '.join(keys)}" in out
    # the strictness keyword is consumed; direction is preserved
    import re as _re

    assert not _re.search(r"\bANY\b", out, _re.IGNORECASE)
    if kw.upper().startswith(("ANY LEFT", "LEFT")):
        assert "LEFT JOIN (SELECT" in out
    # right side re-aliased so later references still resolve
    assert f"AS {alias or right} USING" in out
    # the trailing clause survives
    assert out.rstrip().endswith("WHERE x = 1")


@given(
    tbl=_ident, arr=_ident, alias=_ident, n_ws=st.integers(1, 3),
    kw=st.sampled_from(["ARRAY JOIN", "LEFT ARRAY JOIN", "left array join",
                        "INNER ARRAY JOIN"]),
)
@settings(max_examples=100, deadline=None)
def test_array_join_rewrite_parser_properties(tbl, arr, alias, n_ws, kw):
    from use_clickhouse_2_analyze_mysql_binlog_spark.functions import ch_compat

    ws = " " * n_ws
    q = f"SELECT 1 FROM {tbl}{ws}{kw}{ws}{arr} AS {alias} WHERE y = 2"
    out = ch_compat.translate(q)
    outer = "OUTER " if kw.lower().startswith("left") else ""
    assert f"LATERAL VIEW {outer}explode({arr}) __ch_aj AS {alias}" in out
    import re as _re

    assert not _re.search(r"\bARRAY\b", out, _re.IGNORECASE)
    assert out.rstrip().endswith("WHERE y = 2")


#: identifiers safe inside an ARRAY JOIN item list: item parsing ends on
#: clause keywords, and 'z9' is this test's fixed WHERE column
_aj_ident = _ident.filter(
    lambda s: s not in {"z9", "where", "group", "order", "limit", "having",
                        "union", "except", "intersect", "settings",
                        "format", "window", "right", "full", "cross",
                        "semi", "anti", "global", "asof"}
)


@given(
    tbl=_aj_ident,
    arrs=st.lists(_aj_ident, min_size=2, max_size=4, unique=True),
    aliases=st.lists(_aj_ident, min_size=4, max_size=4, unique=True),
    n_ws=st.integers(1, 3),
    kw=st.sampled_from(["ARRAY JOIN", "LEFT ARRAY JOIN",
                        "left array join"]),
)
@settings(max_examples=100, deadline=None)
def test_array_join_lockstep_parser_properties(tbl, arrs, aliases, n_ws, kw):
    """Text-level invariants of the lockstep rewrite: one explode, a
    zip_with fold naming every alias as a struct field, a size guard per
    extra array, and every select-list reference rewritten to the struct
    access."""
    from use_clickhouse_2_analyze_mysql_binlog_spark.functions import ch_compat

    assume(not set(arrs) & set(aliases) and tbl not in aliases)
    aliases = aliases[: len(arrs)]
    ws = " " * n_ws
    items = ", ".join(f"{a} AS {x}" for a, x in zip(arrs, aliases))
    sel = ", ".join(aliases)
    q = f"SELECT {sel} FROM {tbl}{ws}{kw}{ws}{items} WHERE z9 = 1"
    out = ch_compat.translate(q)
    import re as _re

    assert not _re.search(r"\bARRAY\b", out, _re.IGNORECASE)
    outer = "OUTER " if kw.lower().startswith("left") else ""
    assert f"LATERAL VIEW {outer}explode(" in out
    assert out.count("explode(") == 1 and out.count("zip_with(") == len(arrs) - 1
    # one size guard comparing the first array against every other
    for a in arrs[1:]:
        assert f"size({arrs[0]}) = size({a})" in out
    # every alias is a struct field and its select-list reference is
    # rewritten to the struct access (output name preserved)
    for x in aliases:
        assert f"AS {x}" in out
        assert f"__ch_ajz.{x}" in out
    assert out.rstrip().endswith("WHERE z9 = 1")


@given(
    left=_ident, right=_ident,
    alias=_ident,
    keys=st.lists(_ident, min_size=1, max_size=3, unique=True),
    tcol=_ident,
    n_ws=st.integers(1, 3),
    op=st.sampled_from([">=", ">", "<=", "<"]),
    kw=st.sampled_from(["ASOF JOIN", "ASOF LEFT JOIN", "LEFT ASOF JOIN",
                        "asof left join", "ASOF INNER JOIN"]),
    flipped=st.booleans(),
)
@settings(max_examples=150, deadline=None)
def test_asof_join_rewrite_parser_properties(
    left, right, alias, keys, tcol, n_ws, op, kw, flipped
):
    """Text-level invariants of the ASOF interval rewrite across random
    identifiers, whitespace, case, keyword order, inequality direction
    and operand orientation."""
    from use_clickhouse_2_analyze_mysql_binlog_spark.functions import ch_compat

    assume(tcol not in keys and alias != left)
    ws = " " * n_ws
    eq = " AND ".join(f"{left}.{k} = {alias}.{k}" for k in keys)
    flip = {">=": "<=", "<=": ">=", ">": "<", "<": ">"}
    ineq = (
        f"{alias}.{tcol} {flip[op]} {left}.{tcol}"
        if flipped
        else f"{left}.{tcol} {op} {alias}.{tcol}"
    )
    q = (
        f"SELECT {left}.a, {alias}.b FROM {left}{ws}{kw}{ws}{right} AS "
        f"{alias}{ws}ON {eq} AND {ineq} WHERE x = 1"
    )
    out = ch_compat.translate(q)
    import re as _re

    # ASOF keyword consumed; direction preserved
    assert not _re.search(r"\bASOF\b", out, _re.IGNORECASE)
    if "left" in kw.lower():
        assert "LEFT JOIN (SELECT" in out
    # exactly one neighbor window: lead for >=/>, lag for <=/<,
    # partitioned by ALL equality keys, ordered by the asof column
    win = "lead" if op in (">=", ">") else "lag"
    # definition + IS NULL guard + bound, exactly once each
    assert out.count("__ch_asof_nbr") == 3
    assert (
        f"{win}({tcol}) OVER (PARTITION BY {', '.join(keys)} "
        f"ORDER BY {tcol})" in out
    )
    # the neighbor bound closes the interval with the matching operator
    bound = {">=": " < ", ">": " <= ", "<=": " > ", "<": " >= "}[op]
    assert (
        f"({alias}.__ch_asof_nbr IS NULL OR "
        f"{left}.{tcol}{bound}{alias}.__ch_asof_nbr)" in out
    )
    # original ON condition survives verbatim; right side re-aliased
    assert eq in out and f"AS {alias} ON" in out
    assert out.rstrip().endswith("WHERE x = 1")
