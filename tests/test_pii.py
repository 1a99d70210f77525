"""PII detection/masking: hand-pinned semantics incl. the cross-engine
regex-subset edge cases (email-vs-ip overlap, masking order)."""

from __future__ import annotations

from pyspark.sql import functions as F

from feature_engineering_spark.operators.pii import (
    pii_signals,
    scrub_pii,
    scrub_text,
)


def test_pii_signals_and_scrub_hand_rows(spark):
    docs = spark.createDataFrame(
        [
            (1, "mail bob@site.example.com and sue@mail.example.org now"),
            (2, "server 10.20.30.40 and 192.168.1.1 up"),
            (3, "call +12025550147 today"),
            (4, "plain text with no pii at all"),
            # email whose domain is an ip: email fails (no alpha TLD), the
            # ip inside masks — fixed email -> ipv4 -> phone order
            (5, "admin@10.20.30.40 is the root login"),
        ],
        "doc_id long, text string",
    )
    sig = {r["doc_id"]: r for r in pii_signals(docs).collect()}
    assert (sig[1]["n_email"], sig[1]["n_ipv4"], sig[1]["n_phone"]) == (2, 0, 0)
    assert (sig[2]["n_email"], sig[2]["n_ipv4"]) == (0, 2)
    assert sig[3]["n_phone"] == 1
    assert not sig[4]["has_pii"]
    assert (sig[5]["n_email"], sig[5]["n_ipv4"]) == (0, 1)

    got = {r["doc_id"]: r["text"] for r in scrub_pii(docs).collect()}
    assert got[1] == "mail <EMAIL> and <EMAIL> now"
    assert got[2] == "server <IP> and <IP> up"
    assert got[3] == "call <PHONE> today"
    assert got[4] == "plain text with no pii at all"
    assert got[5] == "admin@<IP> is the root login"

    # schema is unchanged by the in-place scrub
    assert scrub_pii(docs).columns == docs.columns


def test_pii_scrub_is_scan_side(spark):
    """Zero shuffle: the masking pass must be a pure projection."""
    docs = spark.createDataFrame([(1, "a b c")], "doc_id long, text string")
    plan = (
        docs.select(scrub_text(F.col("text")))
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "Exchange" not in plan
