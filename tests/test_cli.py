"""CLI surface tests: parser mapping (reference docopt flags — SURVEY.md
§2.10) and an end-to-end window run through the real entrypoint."""

import pytest

from use_clickhouse_2_analyze_mysql_binlog_spark import cli, schemas
from tests.conftest import SF_DIR


def test_parser_maps_reference_flags():
    args = cli.build_parser().parse_args(
        [
            "ingest",
            "--bootstrap-servers", "h1:9092",
            "--topic", "binlog",
            "--partition", "0",
            "--from-beginning",
            "--sync", "1000",
            "--sink", "/tmp/fact",
            "--checkpoint", "/tmp/ckpt",
        ]
    )
    assert args.offset == "beginning" and args.sync == 1000

    with pytest.raises(SystemExit):  # mutually exclusive offset modes
        cli.build_parser().parse_args(
            ["ingest", "--bootstrap-servers", "h", "--topic", "t",
             "--from-beginning", "--from-end", "--sink", "s",
             "--checkpoint", "c"]
        )


def test_cli_window_job_end_to_end(spark, tmp_path):
    src = str(tmp_path / "fact")
    schemas.binlog_view(schemas.load_table(spark, SF_DIR, "events")).write.parquet(src)
    rc = cli.main(
        [
            "window",
            "--source", src,
            "--results", str(tmp_path / "results"),
            "--checkpoint", str(tmp_path / "ckpt"),
            "--available-now",
        ]
    )
    assert rc == 0
    out = spark.read.parquet(str(tmp_path / "results" / "largest_transaction"))
    assert out.count() > 0
    assert "invertal" in out.columns  # [sic] reference column name


def test_cli_curate_end_to_end(spark, tmp_path, capsys):
    rc = cli.main(
        [
            "curate",
            "--source", f"{SF_DIR}/documents.parquet",
            "--output", str(tmp_path / "curated"),
            "--min-quality", "0.55",
            "--min-tokens", "8",
        ]
    )
    assert rc == 0
    out = spark.read.parquet(str(tmp_path / "curated"))
    assert "lang" in out.columns and out.count() > 0
    # lang-partitioned layout on disk
    assert any(p.name.startswith("lang=") for p in (tmp_path / "curated").iterdir())
    src_n = spark.read.parquet(f"{SF_DIR}/documents.parquet").count()
    assert out.count() < src_n  # quality gate + dedup dropped something


def test_cli_sessions_and_maintain(spark, tmp_path, capsys):
    src = str(tmp_path / "fact")
    binlog = schemas.binlog_view(schemas.load_table(spark, SF_DIR, "events"))
    binlog.write.parquet(src)
    rc = cli.main(
        [
            "sessions",
            "--source", src,
            "--output", str(tmp_path / "sessions"),
            "--checkpoint", str(tmp_path / "ckpt"),
            "--gap", "1800",
            "--available-now",
        ]
    )
    assert rc == 0
    # schema materialized even when no session is watermark-finalized yet
    out = spark.read.parquet(str(tmp_path / "sessions"))
    assert "transaction_size" in out.columns

    # maintenance: fragment a partitioned copy, then sweep+compact
    from use_clickhouse_2_analyze_mysql_binlog_spark.plans import storage

    fact = str(tmp_path / "fact_part")
    for i in range(3):
        storage.write_fact_table(binlog.filter(f"binlog_pos % 3 = {i}"), fact)
    rc = cli.main(["maintain", "--path", fact, "--retention-months", "1"])
    assert rc == 0
    assert "compacted=" in capsys.readouterr().out


def test_cli_sql_end_to_end(spark, tmp_path, capsys):
    out = str(tmp_path / "sql_out")
    rc = cli.main(
        [
            "sql",
            "--data-dir", SF_DIR,
            "--output", out,
            "SELECT event_type, count(*) AS n FROM binlog GROUP BY event_type",
        ]
    )
    assert rc == 0
    assert "rows=" in capsys.readouterr().out
    result = spark.read.parquet(out)
    assert result.columns == ["event_type", "n"]
    assert result.count() > 0


def test_cli_sql_prints(capsys):
    rc = cli.main(
        ["sql", "--data-dir", SF_DIR, "--limit", "3",
         "SELECT doc_id FROM documents ORDER BY doc_id LIMIT 3"]
    )
    assert rc == 0
    assert "doc_id" in capsys.readouterr().out


def test_cli_pipeline_end_to_end(spark, tmp_path, capsys):
    out = str(tmp_path / "pipeline_out")
    rc = cli.main(
        ["pipeline", "--source", f"{SF_DIR}/documents.parquet", "--output", out]
    )
    assert rc == 0
    printed = capsys.readouterr().out
    assert "train: docs=" in printed
    result = spark.read.parquet(out)
    assert set(result.select("split").distinct().toPandas()["split"]) <= {
        "train", "val", "test"
    }
    # curation + near-dup dedup strictly shrink the corpus
    n_in = spark.read.parquet(f"{SF_DIR}/documents.parquet").count()
    assert 0 < result.count() < n_in
    # split is a partition column -> split-pruned reads touch one subdir
    assert spark.read.parquet(f"{out}/split=train").count() > 0


def test_cli_analyze_list_and_run(capsys):
    rc = cli.main(["analyze", "--data-dir", SF_DIR, "--list"])
    out = capsys.readouterr().out
    assert rc == 0 and "window_funnel  [oracle]" in out
    assert "embedding_kmeans  [rows-only]" in out

    rc = cli.main(["analyze", "--data-dir", SF_DIR, "window_funnel"])
    out = capsys.readouterr().out
    assert rc == 0 and "users_reached" in out

    rc = cli.main(["analyze", "--data-dir", SF_DIR, "no_such_query"])
    assert rc == 2


def test_cli_analyze_check_rows_only_writes_output(capsys, tmp_path):
    """ADVICE r05 #4: analyze --check --output on a rows-only query used
    to return before the write, silently producing no parquet."""
    out = str(tmp_path / "kmeans_out")
    rc = cli.main([
        "analyze", "--data-dir", SF_DIR, "--check", "--output", out,
        "embedding_kmeans",
    ])
    assert rc == 0 and "rows-only" in capsys.readouterr().out
    import os

    assert os.path.isdir(out)


def test_cli_sql_clickhouse_dialect(capsys):
    rc = cli.main([
        "sql", "--data-dir", SF_DIR, "--dialect", "clickhouse",
        "SELECT toDate(execute_time) AS day, count() AS n "
        "FROM mysql_monitor.broker_binlog_local GROUP BY day ORDER BY day "
        "LIMIT 3 SETTINGS max_threads = 4",
    ])
    out = capsys.readouterr().out
    assert rc == 0 and "2024-01-01" in out


def test_cli_sql_clickhouse_dialect_join_rewrites(capsys):
    """The r07 join rewrites (ASOF strictness, in-place ARRAY JOIN) work
    through the CLI's --dialect clickhouse path end-to-end."""
    rc = cli.main([
        "sql", "--data-dir", SF_DIR, "--dialect", "clickhouse",
        "SELECT t.gtid, q.quote_size FROM "
        "(SELECT gtid, execute_time AS trade_time FROM "
        "mysql_monitor.broker_binlog_local WHERE binlog_pos % 2 = 0) AS t "
        "ASOF JOIN (SELECT gtid, execute_time AS quote_time, "
        "max(single_statement_size) AS quote_size FROM "
        "mysql_monitor.broker_binlog_local WHERE binlog_pos % 2 = 1 "
        "GROUP BY gtid, execute_time) AS q "
        "ON t.gtid = q.gtid AND t.trade_time >= q.quote_time LIMIT 3",
    ])
    out = capsys.readouterr().out
    assert rc == 0 and "quote_size" in out
    rc = cli.main([
        "sql", "--data-dir", SF_DIR, "--dialect", "clickhouse",
        "SELECT gtid, hit, count() AS n FROM mysql_monitor.broker_binlog_local "
        "ARRAY JOIN splitByChar(':', gtid) AS hit "
        "GROUP BY gtid, hit ORDER BY gtid, hit LIMIT 3",
    ])
    out = capsys.readouterr().out
    assert rc == 0 and "hit" in out


def test_cli_upsert_end_to_end(spark, tmp_path):
    """CLI upsert: maintained ReplacingMergeTree snapshot over a binlog
    stream; DML-only, tombstones surfaced."""
    from use_clickhouse_2_analyze_mysql_binlog_spark.operators import merge_tree
    from use_clickhouse_2_analyze_mysql_binlog_spark.sources.transform import (
        canal_entries_to_binlog,
    )
    from use_clickhouse_2_analyze_mysql_binlog_spark.streaming import upsert_job

    import pyspark.sql.functions as F

    binlog = canal_entries_to_binlog(
        schemas.canal_entries_view(schemas.load_table(spark, SF_DIR, "events")),
        ctime=F.to_timestamp(F.lit("2024-02-01 00:00:00")),
    )
    src = str(tmp_path / "fact")
    binlog.write.parquet(src)
    state = str(tmp_path / "state")
    rc = cli.main(
        [
            "upsert",
            "--source", src,
            "--state", state,
            "--checkpoint", str(tmp_path / "ckpt"),
            "--available-now",
        ]
    )
    assert rc == 0
    got = upsert_job.read_state(spark, state)
    want = merge_tree.replacing_merge_final(merge_tree.dml_rows(binlog))
    assert got.count() == want.count() > 0
    assert got.filter(F.col("is_deleted") == 1).count() > 0


def test_cli_pipeline_gopher_gate(spark, tmp_path, capsys):
    """--gopher pre-gates on the hard rules; the gated corpus is a strict
    subset of the ungated pipeline output universe."""
    out = str(tmp_path / "pipeline_gopher")
    rc = cli.main(
        [
            "pipeline",
            "--source", f"{SF_DIR}/documents.parquet",
            "--output", out,
            "--gopher",
        ]
    )
    assert rc == 0
    from use_clickhouse_2_analyze_mysql_binlog_spark.operators import text as T

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    gated_ids = {r.doc_id for r in T.gopher_gate(docs).select("doc_id").collect()}
    out_ids = {r.doc_id for r in spark.read.parquet(out).select("doc_id").collect()}
    assert 0 < len(out_ids) and out_ids <= gated_ids
    # the gate itself must drop something on this corpus or it proves nothing
    assert len(gated_ids) < docs.count()


def test_cli_analyze_check(capsys):
    """analyze --check runs the DuckDB oracle twin alongside and reports
    the driver-style row/schema/value verdict."""
    rc = cli.main(["analyze", "--data-dir", SF_DIR, "--check", "daily_event_counts_by_table"])
    out = capsys.readouterr().out
    assert rc == 0 and "schema=ok values=ok" in out

    rc = cli.main(["analyze", "--data-dir", SF_DIR, "--check", "embedding_kmeans"])
    out = capsys.readouterr().out
    assert rc == 0 and "rows-only" in out


def test_cli_analyze_explain(capsys):
    """analyze --explain prints the registry operator's formatted physical
    plan without executing — the same pushdown-inspection surface the sql
    command grew in r07, for named operators."""
    rc = cli.main([
        "analyze", "--data-dir", SF_DIR, "--explain", "daily_event_counts_by_table",
    ])
    out = capsys.readouterr().out
    assert rc == 0
    assert "== Physical Plan ==" in out and "HashAggregate" in out
    # no execution: the row-count footer of the normal path is absent
    assert "rows=" not in out


def test_cli_analyze_check_all_subset(capsys):
    """The full differential sweep as one CLI command, restricted with
    --only; exit 0 with all-green oracles."""
    rc = cli.main([
        "analyze", "--data-dir", SF_DIR, "--check", "--all",
        "--only", "daily_event_counts_by_table",
    ])
    out = capsys.readouterr().out
    assert rc == 0
    assert "daily_event_counts_by_table:" in out and "MISMATCH" not in out
    assert "mismatches: none" in out


def test_cli_dedup_stream_end_to_end(spark, tmp_path):
    """dedup-stream CLI: documents parquet -> incremental LSH dedup ->
    committed corpus, with --gopher pre-gating each batch."""
    from use_clickhouse_2_analyze_mysql_binlog_spark.streaming import (
        incremental_dedup_job,
    )

    src = str(tmp_path / "docs_src")
    good = (
        "the quick brown fox jumps over the lazy dog while the cat watches "
        "from the window and the birds sing in the morning light over the "
        "hills beyond the river where children play and dogs bark at noon"
    )
    spark.createDataFrame(
        [(1, good), (2, "tooshort"), (3, good)],
        "doc_id long, text string",
    ).write.parquet(src)
    corpus = str(tmp_path / "corpus")
    rc = cli.main([
        "dedup-stream", "--source", src, "--corpus", corpus,
        "--checkpoint", str(tmp_path / "ckpt"),
        "--available-now", "--gopher",
    ])
    assert rc == 0
    got = incremental_dedup_job.read_corpus(spark, corpus)
    # gopher dropped doc 2; exact dedup collapsed 1/3 to one survivor
    assert got.count() == 1


def test_cli_pipeline_line_dedup(spark, tmp_path):
    """pipeline --line-dedup-df N: planted boilerplate lines vanish from
    the written corpus while the prose survives curation + near-dup."""
    import pyspark.sql.functions as F

    src_docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    boiler = "subscribe to our newsletter for more updates every week"
    planted = src_docs.withColumn(
        "text", F.concat(F.col("text"), F.lit("\n" + boiler))
    )
    src = str(tmp_path / "docs_boiler")
    planted.write.parquet(src)
    out = str(tmp_path / "pipeline_ld")
    rc = cli.main([
        "pipeline", "--source", src, "--output", out, "--line-dedup-df", "2",
    ])
    assert rc == 0
    result = spark.read.parquet(out)
    assert result.count() > 0
    assert result.filter(F.col("text").contains(boiler)).count() == 0
    # prose text survived (some doc still has multi-word content)
    assert result.filter(F.length("text") > 50).count() > 0
    # ADVICE r06 #4: n_tokens describes the SHIPPED (rebuilt) text, not
    # the pre-dedup text the quality gate saw
    from use_clickhouse_2_analyze_mysql_binlog_spark.operators import text as t

    stale = result.filter(
        F.col("n_tokens") != F.size(t.tokens("text"))
    ).count()
    assert stale == 0


def test_cli_chain_runs_full_pipeline(spark, tmp_path):
    """`chain` runs the reference's whole system in one process: ingest
    drains the entries stream into the fact table, then the upsert
    row-state, rollup MV, and windowed result tables are maintained off
    the ingested fact — each final state equals the batch truth."""
    from pyspark.sql import functions as F

    from use_clickhouse_2_analyze_mysql_binlog_spark.operators import (
        merge_tree,
        rollups,
        transactions,
    )
    from use_clickhouse_2_analyze_mysql_binlog_spark.streaming import (
        rollup_job,
        upsert_job,
        window_job,
    )

    entries = str(tmp_path / "entries")
    schemas.canal_entries_view(
        schemas.load_table(spark, SF_DIR, "events")
    ).write.parquet(entries)
    fact = str(tmp_path / "fact")
    state, rollup = str(tmp_path / "state"), str(tmp_path / "rollup")
    results = str(tmp_path / "results")

    rc = cli.main([
        "chain", "--entries", entries, "--fact", fact, "--state", state,
        "--rollup", rollup, "--results", results,
        "--checkpoint", str(tmp_path / "ckpt"), "--available-now",
    ])
    assert rc == 0

    binlog = spark.read.parquet(fact).drop("day")

    # fact table == batch transform of the entries
    from use_clickhouse_2_analyze_mysql_binlog_spark.sources.transform import (
        canal_entries_to_binlog,
    )

    assert binlog.count() == canal_entries_to_binlog(
        spark.read.parquet(entries)
    ).count()

    # upsert state == batch replacing merge over the ingested fact
    want_state = merge_tree.replacing_merge_final(merge_tree.dml_rows(binlog))
    got_state = upsert_job.read_state(spark, state)
    assert got_state.exceptAll(want_state).count() == 0
    assert want_state.exceptAll(got_state).count() == 0

    # rollup MV == batch daily counts
    got_rollup = rollup_job.read_rollup(spark, rollup)
    want_rollup = rollups.daily_event_counts(binlog)
    assert got_rollup.exceptAll(want_rollup).count() == 0
    assert want_rollup.exceptAll(got_rollup).count() == 0

    # window results == batch result tables up to the final watermark
    import datetime as dt

    max_ts = binlog.agg(F.max("execute_time")).collect()[0][0]
    cutoff = (max_ts - dt.timedelta(minutes=5)).strftime("%Y-%m-%d %H:%M:%S")
    stats = transactions.transaction_stats(binlog)
    for metric, stem in transactions.METRICS.items():
        got = window_job.read_results(spark, results, stem)
        want = transactions.transaction_result_table(stats, metric).filter(
            F.col("end_time") <= F.lit(cutoff)
        )
        assert got.count() == want.count(), stem
        w = want.select(*got.columns)
        assert got.exceptAll(w).count() == 0 and w.exceptAll(got).count() == 0, stem


def test_cli_chain_continuous_mode(spark, tmp_path, monkeypatch):
    """The chain's continuous branch (production path): all four queries
    run concurrently on one session, downstream discovers fact files as
    ingest commits epochs. awaitAnyTermination is stubbed so the CLI
    returns while the queries stay live; the test then drains them and
    checks the rollup reflects the ingested fact."""
    from pyspark.sql.streaming import StreamingQueryManager

    from use_clickhouse_2_analyze_mysql_binlog_spark.operators import rollups
    from use_clickhouse_2_analyze_mysql_binlog_spark.streaming import rollup_job

    entries = str(tmp_path / "entries")
    schemas.canal_entries_view(
        schemas.load_table(spark, SF_DIR, "events")
    ).repartition(3).write.parquet(entries)
    fact = str(tmp_path / "fact")

    monkeypatch.setattr(
        StreamingQueryManager, "awaitAnyTermination", lambda self: None
    )
    rc = cli.main([
        "chain", "--entries", entries, "--fact", fact,
        "--state", str(tmp_path / "state"),
        "--rollup", str(tmp_path / "rollup"),
        "--results", str(tmp_path / "results"),
        "--checkpoint", str(tmp_path / "ckpt"),
    ])
    assert rc == 0
    live = [q for q in spark.streams.active]
    try:
        assert len(live) >= 4  # ingest + upsert + rollup + window
        for q in live:
            q.processAllAvailable()
        # one more pass: downstream file sources list the fact dir again
        # AFTER ingest finished its drain
        for q in live:
            q.processAllAvailable()
        binlog = spark.read.parquet(fact).drop("day")
        got = rollup_job.read_rollup(spark, str(tmp_path / "rollup"))
        want = rollups.daily_event_counts(binlog)
        assert got.exceptAll(want).count() == 0
        assert want.exceptAll(got).count() == 0
    finally:
        for q in live:
            q.stop()


def test_cli_sql_explain_and_show_sql(capsys):
    """--show-sql prints the translated Spark SQL (what the CH query
    became); --explain prints the formatted physical plan WITHOUT
    executing — the pushdown/join-strategy inspection surface."""
    rc = cli.main([
        "sql", "--data-dir", SF_DIR, "--dialect", "clickhouse",
        "--show-sql", "--explain",
        "SELECT toDate(execute_time) AS day, countIf(is_ddl = 1) AS n "
        "FROM mysql_monitor.broker_binlog_local GROUP BY day",
    ])
    out = capsys.readouterr().out
    assert rc == 0
    # the translation is visible...
    assert "to_date(execute_time)" in out and "count_if" in out
    # ...and the formatted plan (not rows) follows
    assert "== Physical Plan ==" in out and "HashAggregate" in out


def test_cli_migrate_ddl(capsys, tmp_path):
    """migrate-ddl translates a CH bootstrap script (the reference
    deployment's setup surface) into the storage/streaming plan, no
    SparkSession needed."""
    script = tmp_path / "setup.sql"
    script.write_text(
        "CREATE TABLE db.binlog_local (\n"
        "  `execute_time` DateTime, `gtid` String, `event_type` String\n"
        ") ENGINE = MergeTree() PARTITION BY toDate(execute_time) "
        "ORDER BY (execute_time, gtid) TTL execute_time + "
        "toIntervalMonth(30);\n"
        "CREATE TABLE db.daily (day Date, n UInt64) "
        "ENGINE = SummingMergeTree() ORDER BY (day);\n"
        "CREATE MATERIALIZED VIEW db.mv TO db.daily AS SELECT "
        "toDate(execute_time) AS day, count(*) AS n FROM db.binlog_local "
        "GROUP BY day\n",
        encoding="utf-8",
    )
    rc = cli.main(["migrate-ddl", str(script)])
    out = capsys.readouterr().out
    assert rc == 0
    assert "parsed 3 DDL objects" in out
    assert "[fact_table] db.binlog_local" in out
    assert "plans.storage.write_fact_table" in out
    assert "[retention] db.binlog_local" in out
    assert "[rollup_store] db.daily" in out
    assert "[materialized_view] db.mv" in out
    assert "streaming.rollup_job" in out
    rc = cli.main(["migrate-ddl", "--show-sql", str(script)])
    out = capsys.readouterr().out
    assert rc == 0 and "to_date(execute_time) AS day" in out


def test_cli_migrate_ddl_execute(spark, tmp_path, capsys):
    """--execute runs the MV batch twins (the POPULATE backfill) against
    a data dir with a user-supplied table mapping and writes each store."""
    script = tmp_path / "setup.sql"
    script.write_text(
        "CREATE TABLE mysql_monitor.broker_binlog_local ("
        "execute_time DateTime, gtid String, "
        "INDEX ix_gtid gtid TYPE bloom_filter(0.01) GRANULARITY 4, "
        "CONSTRAINT c_time CHECK execute_time >= "
        "toDateTime('1970-01-02 00:00:00'), "
        "CONSTRAINT c_gtid CHECK length(gtid) < 2, "
        "PROJECTION p_hourly (SELECT toHour(execute_time) AS hour, "
        "count() AS n GROUP BY toHour(execute_time))"
        ") ENGINE = MergeTree() ORDER BY (execute_time, gtid);\n"
        "CREATE TABLE db.daily (day Date, n UInt64) "
        "ENGINE = SummingMergeTree() ORDER BY (day);\n"
        "CREATE MATERIALIZED VIEW db.daily_mv TO db.daily AS SELECT "
        "toDate(execute_time) AS day, count(*) AS n "
        "FROM mysql_monitor.broker_binlog_local GROUP BY day;\n"
        "CREATE VIEW recent AS SELECT * FROM "
        "mysql_monitor.broker_binlog_local;\n"
        "CREATE MATERIALIZED VIEW db.daily_mv2 TO db.daily AS SELECT "
        "toDate(execute_time) AS day, count(*) AS n FROM recent "
        "GROUP BY day;\n"
        "CREATE TABLE db.type_counts ENGINE = MergeTree() ORDER BY (n) "
        "AS SELECT event_type, count() AS n FROM recent "
        "GROUP BY event_type\n",
        encoding="utf-8",
    )
    out = tmp_path / "stores"
    rc = cli.main([
        "migrate-ddl", str(script), "--execute",
        "--data-dir", SF_DIR, "--output-dir", str(out),
        "--table-map", "mysql_monitor.broker_binlog_local=binlog",
    ])
    printed = capsys.readouterr().out
    assert rc == 0 and "executed db.daily_mv: rows=" in printed
    # the plain view registered first; the MV selecting FROM it ran
    # and produced the same rollup as the direct MV
    assert "registered view recent" in printed
    assert "executed db.daily_mv2: rows=" in printed
    # CTAS materialized from the registered view
    assert "created db.type_counts AS SELECT: rows=" in printed
    ctas = spark.read.parquet(str(out / "type_counts"))
    assert ctas.count() > 0 and set(ctas.columns) == {"event_type", "n"}
    mv2 = spark.read.parquet(str(out / "daily_mv2"))
    mv1 = spark.read.parquet(str(out / "daily_mv"))
    assert {(str(r.day), r.n) for r in mv2.collect()} == {
        (str(r.day), r.n) for r in mv1.collect()
    }
    # constraint checks ran over the mapped view: the time invariant
    # holds, the planted length one is violated by every row
    assert ("constraint mysql_monitor.broker_binlog_local.c_time: "
            "violations=0" in printed)
    import re as _re

    m = _re.search(
        r"constraint mysql_monitor\.broker_binlog_local\.c_gtid: "
        r"violations=(\d+)", printed)
    assert m and int(m.group(1)) > 0
    # the skip-index surfaced its writer mapping in the plan
    assert "[skip_index] mysql_monitor.broker_binlog_local" in printed
    assert "bloom_filters={'gtid': 0.01}" in printed
    # the aggregate projection materialized like an in-table MV and
    # matches a direct groupBy over the same mapped view
    assert ("materialized projection "
            "mysql_monitor.broker_binlog_local.p_hourly" in printed)
    proj = spark.read.parquet(
        str(out / "broker_binlog_local__p_hourly")
    )
    got = spark.read.parquet(str(out / "daily_mv"))
    binlog = schemas.binlog_view(schemas.load_table(spark, SF_DIR, "events"))
    want_proj = {
        (r.hour, r.n)
        for r in binlog.selectExpr("hour(execute_time) AS hour")
        .groupBy("hour").count()
        .selectExpr("hour", "count AS n").collect()
    }
    assert {(r.hour, r.n) for r in proj.collect()} == want_proj
    want = binlog.groupBy(
        __import__("pyspark.sql.functions", fromlist=["to_date"]).to_date(
            "execute_time"
        ).alias("day")
    ).count()
    assert got.count() == want.count() > 0
    assert {r.day: r.n for r in got.collect()} == {
        r.day: r["count"] for r in want.collect()
    }
    # missing --data-dir/--output-dir is a usage error, not a crash
    assert cli.main(["migrate-ddl", str(script), "--execute"]) == 2


def test_cli_mutate(spark, tmp_path, capsys):
    """mutate runs one CH ALTER statement against a parquet fact path:
    DELETE WHERE (translated predicate), DROP PARTITION, and the
    schema-evolution plan for ADD COLUMN."""
    from use_clickhouse_2_analyze_mysql_binlog_spark.plans import storage

    path = str(tmp_path / "fact")
    binlog = schemas.binlog_view(schemas.load_table(spark, SF_DIR, "events"))
    storage.write_fact_table(binlog, path, files_per_day=1, mode="overwrite")
    n_total = binlog.count()
    n_err = binlog.where(
        "event_type = 'ERROR' AND to_date(execute_time) = DATE'2024-01-05'"
    ).count()
    assert n_err > 0
    rc = cli.main([
        "mutate",
        "ALTER TABLE db.binlog DELETE WHERE event_type = 'ERROR' AND "
        "toDate(execute_time) = toDate('2024-01-05')",
        "--path", path,
    ])
    printed = capsys.readouterr().out
    assert rc == 0 and "mutated delete: partitions=1" in printed
    assert storage.read_fact_table(spark, path).count() == n_total - n_err

    rc = cli.main([
        "mutate", "ALTER TABLE db.binlog DROP PARTITION '2024-01-06'",
        "--path", path,
    ])
    assert rc == 0 and "dropped" in capsys.readouterr().out

    rc = cli.main([
        "mutate",
        "ALTER TABLE db.binlog ADD COLUMN note String DEFAULT 'x'",
        "--path", path,
    ])
    out = capsys.readouterr().out
    assert rc == 0 and "schema evolution" in out and "coalesce" in out

    # OPTIMIZE DEDUPLICATE and TRUNCATE dispatch through the same command
    rc = cli.main([
        "mutate", "OPTIMIZE TABLE db.binlog FINAL DEDUPLICATE",
        "--path", path,
    ])
    out = capsys.readouterr().out
    assert rc == 0 and "optimize deduplicate" in out
    assert "merge semantics" in out  # the FINAL note
    rc = cli.main([
        "mutate", "TRUNCATE TABLE db.binlog", "--path", path,
    ])
    out = capsys.readouterr().out
    assert rc == 0 and "truncated: partitions=" in out
    import pathlib

    assert list(pathlib.Path(path).glob("day=*")) == []


def test_cli_maintain_ddl_ttl(spark, tmp_path, capsys):
    """maintain --ddl runs the table's own TTL action: the row-level
    DELETE WHERE form sweeps expired partitions dropping matching rows
    (the 2024-01 testdata is long past the 30-day TTL)."""
    from use_clickhouse_2_analyze_mysql_binlog_spark.plans import storage

    path = str(tmp_path / "fact")
    binlog = schemas.binlog_view(schemas.load_table(spark, SF_DIR, "events"))
    storage.write_fact_table(binlog, path, files_per_day=1, mode="overwrite")
    n_total = binlog.count()
    n_err = binlog.where("event_type = 'ERROR'").count()
    script = tmp_path / "setup.sql"
    script.write_text(
        "CREATE TABLE db.binlog (event_type String, execute_time "
        "DateTime, gtid String) ENGINE = MergeTree() "
        "ORDER BY (execute_time) "
        "TTL execute_time + toIntervalDay(30) "
        "DELETE WHERE event_type = 'ERROR'\n",
        encoding="utf-8",
    )
    rc = cli.main([
        "maintain", "--path", path, "--ddl", str(script),
        "--skip-compaction",
    ])
    printed = capsys.readouterr().out
    assert rc == 0 and "ttl delete-where:" in printed
    assert f"removed={n_err}" in printed
    got = storage.read_fact_table(spark, path)
    assert got.count() == n_total - n_err
    assert got.where("event_type = 'ERROR'").count() == 0
    # ambiguity is a usage error
    script2 = tmp_path / "two.sql"
    script2.write_text(
        script.read_text()
        + ";\nCREATE TABLE db.other (ts DateTime) ENGINE = MergeTree() "
        "ORDER BY (ts) TTL ts + toIntervalDay(7)\n",
        encoding="utf-8",
    )
    assert cli.main([
        "maintain", "--path", path, "--ddl", str(script2),
        "--skip-compaction",
    ]) == 2
    # --table disambiguates to the plain partition-drop form
    rc = cli.main([
        "maintain", "--path", path, "--ddl", str(script2),
        "--table", "db.other", "--skip-compaction",
    ])
    printed = capsys.readouterr().out
    assert rc == 0 and "dropped=" in printed


def test_cli_migrate_ddl_stream_projection(spark, tmp_path, capsys):
    """--stream accepts an aggregate PROJECTION (the in-table MV form)
    and publishes the merged store, equal to the batch truth."""
    script = tmp_path / "setup.sql"
    script.write_text(
        "CREATE TABLE mysql_monitor.broker_binlog_local ("
        "event_type String, execute_time DateTime, gtid String, "
        "single_statement_size UInt64, "
        "PROJECTION p_by_type (SELECT event_type, count() AS n, "
        "sum(single_statement_size) AS bytes GROUP BY event_type)) "
        "ENGINE = MergeTree() ORDER BY (execute_time, gtid)\n",
        encoding="utf-8",
    )
    binlog = schemas.binlog_view(schemas.load_table(spark, SF_DIR, "events"))
    src = str(tmp_path / "fact")
    binlog.write.parquet(src)
    out = tmp_path / "stores"
    rc = cli.main([
        "migrate-ddl", str(script), "--stream",
        "broker_binlog_local.p_by_type",
        "--source", src, "--checkpoint", str(tmp_path / "ckpt"),
        "--output-dir", str(out), "--available-now",
    ])
    printed = capsys.readouterr().out
    assert rc == 0 and "broker_binlog_local__p_by_type" in printed
    from use_clickhouse_2_analyze_mysql_binlog_spark.streaming import (
        rollup_job,
    )

    got = rollup_job.read_rollup(
        spark, str(out / "broker_binlog_local__p_by_type")
    )
    from pyspark.sql import functions as F

    want = binlog.groupBy("event_type").agg(
        F.count("*").alias("n"),
        F.sum("single_statement_size").alias("bytes"),
    )
    assert {(r.event_type, r.n, r.bytes) for r in got.collect()} == {
        (r.event_type, r.n, r.bytes) for r in want.collect()
    }


def test_cli_migrate_ddl_stream(spark, tmp_path, capsys):
    """migrate-ddl --stream runs one migrated MV as a streaming job
    (available-now) and publishes the merged Summing store."""
    script = tmp_path / "setup.sql"
    script.write_text(
        "CREATE TABLE db.daily (day Date, event_type String, n UInt64) "
        "ENGINE = SummingMergeTree() ORDER BY (day, event_type);\n"
        "CREATE MATERIALIZED VIEW db.daily_mv TO db.daily AS SELECT "
        "toDate(execute_time) AS day, event_type, count(*) AS n "
        "FROM mysql_monitor.broker_binlog_local GROUP BY day, event_type\n",
        encoding="utf-8",
    )
    binlog = schemas.binlog_view(schemas.load_table(spark, SF_DIR, "events"))
    src = str(tmp_path / "fact")
    binlog.write.parquet(src)
    out = tmp_path / "stores"
    rc = cli.main([
        "migrate-ddl", str(script), "--stream", "db.daily_mv",
        "--source", src, "--checkpoint", str(tmp_path / "ckpt"),
        "--output-dir", str(out), "--available-now",
    ])
    printed = capsys.readouterr().out
    assert rc == 0 and "streaming db.daily_mv" in printed
    from use_clickhouse_2_analyze_mysql_binlog_spark.streaming import rollup_job

    got = rollup_job.read_rollup(spark, str(out / "daily_mv"))
    from use_clickhouse_2_analyze_mysql_binlog_spark.operators import rollups

    want = rollups.daily_event_counts(binlog).withColumnRenamed(
        "event_count", "n"
    )
    assert {(str(r.day), r.event_type): r.n for r in got.collect()} == {
        (str(r.day), r.event_type): r.n for r in want.collect()
    }
    # missing required args is a usage error
    assert cli.main(["migrate-ddl", str(script), "--stream", "db.daily_mv"]) == 2


def test_cli_migrate_ddl_stream_aggregating(spark, tmp_path, capsys):
    """migrate-ddl --stream on an AggregatingMergeTree MV (round 8):
    the CLI path derives state_fns from the AggregateFunction column
    types, publishes STATE snapshots, and the finalized read equals the
    batch truth (exact value states; uniq within sketch tolerance)."""
    script = tmp_path / "setup.sql"
    script.write_text(
        "CREATE TABLE db.agg (day Date, event_type String, "
        "mx AggregateFunction(max, UInt64), "
        "u AggregateFunction(uniq, String)) "
        "ENGINE = AggregatingMergeTree() ORDER BY (day, event_type);\n"
        "CREATE MATERIALIZED VIEW db.agg_mv TO db.agg AS SELECT "
        "toDate(execute_time) AS day, event_type, "
        "maxState(single_statement_size) AS mx, uniqState(gtid) AS u "
        "FROM mysql_monitor.broker_binlog_local GROUP BY day, event_type\n",
        encoding="utf-8",
    )
    binlog = schemas.binlog_view(schemas.load_table(spark, SF_DIR, "events"))
    src = str(tmp_path / "fact")
    binlog.write.parquet(src)
    out = tmp_path / "stores"
    rc = cli.main([
        "migrate-ddl", str(script), "--stream", "db.agg_mv",
        "--source", src, "--checkpoint", str(tmp_path / "ckpt"),
        "--output-dir", str(out), "--available-now",
    ])
    assert rc == 0 and "streaming db.agg_mv" in capsys.readouterr().out
    from use_clickhouse_2_analyze_mysql_binlog_spark.streaming import rollup_job

    got = {
        (str(r.day), r.event_type): r
        for r in rollup_job.read_agg_rollup(
            spark, str(out / "agg_mv"), {"mx": "max", "u": "uniq"}
        ).collect()
    }
    binlog.createOrReplaceTempView("b")
    want = {
        (str(r.day), r.event_type): r
        for r in spark.sql(
            "SELECT to_date(execute_time) AS day, event_type, "
            "max(single_statement_size) AS mx, "
            "count(DISTINCT gtid) AS exact FROM b GROUP BY 1, 2"
        ).collect()
    }
    assert set(got) == set(want) and len(got) > 0
    for k, g in got.items():
        assert g.mx == want[k].mx, k
        assert abs(g.u - want[k].exact) <= max(2, 0.02 * want[k].exact), k


def test_cli_migrate_ddl_stream_r9_states(spark, tmp_path, capsys):
    """migrate-ddl --stream on an Aggregating MV with the round-9 state
    family (quantile histogram with a parametric level + groupArray):
    the CLI derives the fn tokens from the DDL types, streams state
    snapshots, and the finalized read equals the batch truth EXACTLY
    (the histogram is exact; quantileExact floor(level*n) indexing)."""
    script = tmp_path / "setup.sql"
    script.write_text(
        "CREATE TABLE db.q9 (day Date, event_type String, "
        "p90 AggregateFunction(quantile(0.9), UInt64), "
        "sizes AggregateFunction(groupArray, UInt64)) "
        "ENGINE = AggregatingMergeTree() ORDER BY (day, event_type);\n"
        "CREATE MATERIALIZED VIEW db.q9_mv TO db.q9 AS SELECT "
        "toDate(execute_time) AS day, event_type, "
        "quantileState(0.9)(single_statement_size) AS p90, "
        "groupArrayState(single_statement_size) AS sizes "
        "FROM mysql_monitor.broker_binlog_local GROUP BY day, event_type\n",
        encoding="utf-8",
    )
    binlog = schemas.binlog_view(schemas.load_table(spark, SF_DIR, "events"))
    src = str(tmp_path / "fact")
    binlog.write.parquet(src)
    out = tmp_path / "stores"
    rc = cli.main([
        "migrate-ddl", str(script), "--stream", "db.q9_mv",
        "--source", src, "--checkpoint", str(tmp_path / "ckpt"),
        "--output-dir", str(out), "--available-now",
    ])
    assert rc == 0 and "streaming db.q9_mv" in capsys.readouterr().out
    from use_clickhouse_2_analyze_mysql_binlog_spark.streaming import rollup_job

    got = {
        (str(r.day), r.event_type): (r.p90, sorted(r.sizes))
        for r in rollup_job.read_agg_rollup(
            spark, str(out / "q9_mv"),
            {"p90": "quantile@0.9", "sizes": "grouparray"},
        ).collect()
    }
    binlog.createOrReplaceTempView("b")
    want = {
        (str(r.day), r.event_type): (r.p90, sorted(r.sizes))
        for r in spark.sql(
            "SELECT to_date(execute_time) AS day, event_type, "
            "element_at(sort_array(collect_list(single_statement_size)), "
            " CAST(least(floor(0.9 * count(*)) + 1, count(*)) AS INT)) "
            " AS p90, "
            "collect_list(single_statement_size) AS sizes "
            "FROM b GROUP BY 1, 2"
        ).collect()
    }
    assert got == want and len(got) > 0


def test_cli_migrate_ddl_stream_r9b_states(spark, tmp_path, capsys):
    """migrate-ddl --stream on an Aggregating MV with the late-round-9
    state types (sumMap key→sum map + quantileTDigest log-quantized
    histogram): the CLI derives the fn tokens from the DDL types,
    streams state snapshots, and the finalized read equals the
    independently-derived batch truth EXACTLY (sumMap sums are exact;
    the tdigest read equals the quantized-multiset quantile because the
    quantizer is deterministic)."""
    script = tmp_path / "setup.sql"
    script.write_text(
        "CREATE TABLE db.q9b (day Date, "
        "type_sum AggregateFunction(sumMap, Array(UInt8), Array(UInt64)), "
        "p90 AggregateFunction(quantileTDigest(0.9), UInt64)) "
        "ENGINE = AggregatingMergeTree() ORDER BY (day);\n"
        "CREATE MATERIALIZED VIEW db.q9b_mv TO db.q9b AS SELECT "
        "toDate(execute_time) AS day, "
        "sumMapState(array(binlog_pos % 3), array(single_statement_size)) "
        "AS type_sum, "
        "quantileTDigestState(single_statement_size) AS p90 "
        "FROM mysql_monitor.broker_binlog_local GROUP BY day\n",
        encoding="utf-8",
    )
    binlog = schemas.binlog_view(schemas.load_table(spark, SF_DIR, "events"))
    src = str(tmp_path / "fact")
    binlog.write.parquet(src)
    out = tmp_path / "stores"
    rc = cli.main([
        "migrate-ddl", str(script), "--stream", "db.q9b_mv",
        "--source", src, "--checkpoint", str(tmp_path / "ckpt"),
        "--output-dir", str(out), "--available-now",
    ])
    assert rc == 0 and "streaming db.q9b_mv" in capsys.readouterr().out
    from use_clickhouse_2_analyze_mysql_binlog_spark.streaming import rollup_job

    got = {
        str(r.day): ((list(r.type_sum[0]), list(r.type_sum[1])), r.p90)
        for r in rollup_job.read_agg_rollup(
            spark, str(out / "q9b_mv"),
            {"type_sum": "summap", "p90": "quantiletdigest@0.9"},
        ).collect()
    }
    binlog.createOrReplaceTempView("b9b")
    per_day: dict = {}
    for r in spark.sql(
        "SELECT to_date(execute_time) AS day, binlog_pos % 3 AS kk, "
        "CAST(sum(single_statement_size) AS BIGINT) AS s "
        "FROM b9b GROUP BY day, kk"
    ).collect():
        per_day.setdefault(str(r.day), {})[r.kk] = r.s
    p90 = {
        str(r.day): r.p90
        for r in spark.sql(
            "SELECT day, element_at(sort_array(collect_list(q)), "
            " CAST(least(floor(0.9 * count(*)) + 1, count(*)) AS INT)) "
            " AS p90 "
            "FROM (SELECT to_date(execute_time) AS day, "
            " CASE WHEN x = 0 THEN x ELSE sign(x) * "
            " exp(bround(ln(abs(x)) * 128) / 128) END AS q "
            " FROM (SELECT execute_time, "
            "  CAST(single_statement_size AS DOUBLE) AS x FROM b9b)) "
            "GROUP BY day"
        ).collect()
    }
    want = {
        day: ((sorted(d), [d[k] for k in sorted(d)]), p90[day])
        for day, d in per_day.items()
    }
    assert got == want and len(got) > 0
