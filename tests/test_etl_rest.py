"""End-to-end tests for the REST DataSource + lead-activity pipeline —
the engine's reference-parity surface (R1-R16), driven against the
deterministic mock SFMC server.

Pins: flatten/clean semantics (R5-R9), cross-page dedup (R10/R12),
count-watermark page pruning (R3/R16), 401 re-auth retry (R2), and
idempotence (re-running incremental inserts nothing) — the reference
pipeline's core invariant (unique hash constraint + insert-ignore,
/root/reference/app/salesforce_extractor.py:66,214-217).
"""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest

from marketingcloud_etl_spark.etl.cli import main as cli_main
from marketingcloud_etl_spark.etl.lead_activity import bulk_extract, incremental_extract
from marketingcloud_etl_spark.sources.mock_sfmc import PAGE_SIZE, MockSfmcServer
from marketingcloud_etl_spark.sources.rest import plan_pages

N_ITEMS = 35  # 4 pages of 10; item[10] duplicates item[0]


@pytest.fixture()
def server():
    with MockSfmcServer(n_items=N_ITEMS) as s:
        yield s


def _bulk(spark, server, target) -> int:
    return bulk_extract(
        spark,
        base_url=server.base_url,
        target_path=str(target),
        auth_url=server.auth_url,
        client_id="id",
        client_secret="secret",
        page_size=PAGE_SIZE,
    )


def test_plan_pages_pruning_math():
    # R3: resume at the page holding the first un-ingested record
    assert plan_pages(35, 0, 10) == [1, 2, 3, 4]
    assert plan_pages(35, 34, 10) == [4]  # partial boundary page refetches
    assert plan_pages(35, 35, 10) == []  # nothing new → no fetch at all
    assert plan_pages(0, 0, 10) == []
    # exact page boundary: page 1 fully ingested → start at page 2
    assert plan_pages(2500 * 3, 2500, 2500) == [2, 3]


def test_bulk_flatten_clean_dedup(spark, server, tmp_path):
    target = tmp_path / "lead_activity"
    rows = _bulk(spark, server, target)
    # 35 raw items, one exact duplicate planted across the page boundary
    assert rows == N_ITEMS - 1

    df = spark.read.parquet(str(target))
    out = {r["lead_id"]: r for r in df.collect()}
    # R7: query strings stripped; R8: 256-char cap
    assert all("?" not in r["event_name"] for r in out.values())
    assert max(len(r["event_name"]) for r in out.values()) == 256
    # R6: missing keys → "" (never null)
    assert out["L-00011"]["session_id"] == ""
    assert df.filter(F.col("session_id").isNull()).count() == 0
    # R9: unparseable date → null, parseable → real timestamp
    assert out["L-00017"]["date"] is None
    assert out["L-00001"]["date"] is not None


def test_incremental_idempotent_and_pruned(spark, server, tmp_path):
    target = tmp_path / "lead_activity"
    rows = _bulk(spark, server, target)
    assert rows == N_ITEMS - 1

    server.page_calls.clear()
    result = incremental_extract(
        spark,
        base_url=server.base_url,
        target_path=str(target),
        auth_url=server.auth_url,
        client_id="id",
        client_secret="secret",
        page_size=PAGE_SIZE,
    )
    # idempotence: everything already present → nothing inserted
    assert result["inserted"] == 0
    # R3/R16 pruning: db_count=34 → only the probe (page 1) and the
    # boundary page (page 4) are ever fetched — pages 2-3 are pruned
    # inside the source's partition planning
    assert set(server.page_calls) <= {1, 4}
    assert spark.read.parquet(str(target)).count() == N_ITEMS - 1


def test_rest_source_401_reauth_retry(spark, server_factory=None):
    with MockSfmcServer(n_items=N_ITEMS, fail_first_with_401=True) as s:
        from marketingcloud_etl_spark.etl.lead_activity import read_lead_activity

        df = read_lead_activity(
            spark,
            base_url=s.base_url,
            auth_url=s.auth_url,
            client_id="id",
            client_secret="secret",
            page_size=PAGE_SIZE,
        )
        assert df.count() == N_ITEMS  # raw items (pre-dedup)
        # R2: the 401 triggered a re-auth — at least the initial auth + retry
        assert s.auth_calls >= 2


def test_cli_demo_bulk_then_incremental(spark, tmp_path):
    target = str(tmp_path / "cli_demo")
    r1 = cli_main(["bulk", "--demo", "--target", target])
    assert r1 == {"mode": "bulk", "rows": N_ITEMS - 1}
    r2 = cli_main(["incremental", "--demo", "--target", target])
    assert r2["mode"] == "incremental"
    assert r2["inserted"] == 0


def test_cli_env_var_config(spark, tmp_path, monkeypatch):
    """R18 parity: the reference reads its whole connection config from
    env (salesforce_extractor.py:36-44) — the CLI must accept the same
    variables as fallback for unset flags, and db_config_from_env must
    mirror USERNAME/PASSWORD/HOST/PORT/SCHEMA with the dotenv default
    schema 'uat'."""
    from marketingcloud_etl_spark.etl.cli import db_config_from_env
    from marketingcloud_etl_spark.sources.mock_sfmc import MockSfmcServer

    with MockSfmcServer(n_items=7) as s:
        monkeypatch.setenv("MKT_CLOUD_DATA_ENDPOINT", s.base_url)
        monkeypatch.setenv("MKT_CLOUD_AUTH_ENDPOINT", s.auth_url)
        monkeypatch.setenv("CLIENT_ID", "demo")
        monkeypatch.setenv("CLIENT_SECRET", "demo")
        target = str(tmp_path / "cli_env")
        # no --base-url/--auth-url/--client-* flags: env supplies them all
        r = cli_main(["bulk", "--target", target, "--page-size", "3"])
        assert r["mode"] == "bulk" and r["rows"] >= 1

    monkeypatch.setenv("USERNAME", "u")
    monkeypatch.setenv("PASSWORD", "p")
    monkeypatch.setenv("HOST", "db.internal")
    monkeypatch.setenv("PORT", "3306")
    monkeypatch.delenv("SCHEMA", raising=False)
    cfg = db_config_from_env()
    assert cfg["schema"] == "uat"  # the reference's dotenv default
    assert cfg["url"] == "jdbc:mysql://db.internal:3306/uat"
    monkeypatch.setenv("SCHEMA", "prod")
    assert db_config_from_env()["schema"] == "prod"


def test_partitioned_upsert_idempotent(spark, sf_dir, tmp_path):
    """Partitioned target (top level holds only partition dirs): the
    existence probe must still see it, or a re-run would double every
    row — the reviewer-found _SUCCESS-marker gap."""
    import os

    from marketingcloud_etl_spark.io import table as iotable
    from marketingcloud_etl_spark.sinks.upsert import upsert_parquet

    target = str(tmp_path / "events_part")
    e = iotable(spark, sf_dir, "events").select("event_id", "event_type", "value")
    r1 = upsert_parquet(e, target, key="event_id", partition_cols=["event_type"])
    assert r1["inserted"] > 0
    # simulate a committer that writes no top-level _SUCCESS marker
    marker = os.path.join(target, "_SUCCESS")
    if os.path.exists(marker):
        os.remove(marker)
    r2 = upsert_parquet(e, target, key="event_id", partition_cols=["event_type"])
    assert r2["inserted"] == 0
    assert spark.read.parquet(target).count() == r1["inserted"]


def test_streaming_rest_source_complete_pages(spark, server, tmp_path):
    """Streaming REST ingestion (rest_pages streamReader): the offset
    advances by COMPLETE pages only, so with 35 items / page size 10
    exactly 30 rows (pages 1-3) arrive and the still-filling page 4 is
    never fetched — no duplicate fetch, no partial-page re-read. A
    restart from the checkpoint ingests nothing new (offsets fully
    define progress)."""
    from marketingcloud_etl_spark.sources.rest import register_rest_source

    register_rest_source(spark)
    ck = str(tmp_path / "ck")

    def run_once(name):
        # memory sink refuses checkpoint recovery; foreachBatch +
        # parquet-append supports it (same pattern as the tws test)
        out_dir = str(tmp_path / name)

        def sink(batch_df, batch_id):
            batch_df.write.mode("append").parquet(out_dir)

        q = (
            spark.readStream.format("rest_pages")
            .options(
                base_url=server.base_url,
                auth_url=server.auth_url,
                client_id="id",
                client_secret="secret",
                page_size=PAGE_SIZE,
            )
            .load()
            .writeStream.foreachBatch(sink)
            .outputMode("append")
            .option("checkpointLocation", ck)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        try:
            return spark.read.parquet(out_dir)
        except Exception:
            return spark.createDataFrame([], "page int")  # nothing written

    out = run_once("rest_stream_1")
    assert out.count() == 30  # 3 complete pages; partial page 4 deferred
    pages = {r.page for r in out.select("page").distinct().collect()}
    assert pages == {1, 2, 3}
    # every page fetched exactly once: 30 raw rows, 29 distinct leads
    # (the corpus plants item[10] = item[0] across the page boundary —
    # the source delivers raw rows; dedup is the sink's job, R10/R12)
    assert out.select("keys.lead_id").distinct().count() == 29

    again = run_once("rest_stream_2")
    assert again.count() == 0  # restart: offset already at 3 complete pages
