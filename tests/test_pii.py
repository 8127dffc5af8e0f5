"""operators/pii.py — redaction correctness and the SEQUENTIAL audit
contract (each pattern counts on the text after the previous patterns'
replacements)."""

from __future__ import annotations

from spotify_etl_pipeline_spark.operators.pii import pii_scrub


def _one(spark, text: str) -> dict:
    df = spark.createDataFrame([(1, text)], "doc_id long, text string")
    return pii_scrub(df, "text").collect()[0].asDict()


def test_each_pattern_redacts_and_counts(spark):
    r = _one(
        spark,
        "mail a.b+c@ex-1.org call +1-555-0042 host 10.2.0.1 "
        "id 123-45-6789 acct 4111111111111111 done",
    )
    assert r["n_email"] == 1 and "<EMAIL>" in r["clean_text"]
    assert r["n_phone"] == 1 and "<PHONE>" in r["clean_text"]
    assert r["n_ipv4"] == 1 and "<IP>" in r["clean_text"]
    assert r["n_ssn"] == 1 and "<ID>" in r["clean_text"]
    assert r["n_card"] == 1 and "<CARD>" in r["clean_text"]
    # nothing pattern-shaped survives
    assert "@" not in r["clean_text"]
    assert "4111" not in r["clean_text"]
    assert "555" not in r["clean_text"]


def test_sequential_counts_never_double_count(spark):
    # the ssn-shaped run sits INSIDE an email local part: the email
    # pattern (earlier in the chain) owns it, so n_ssn sees the
    # already-redacted text and counts 0
    r = _one(spark, "write to user123-45-6789x@ex.com today")
    assert r["n_email"] == 1
    assert r["n_ssn"] == 0
    assert "123-45-6789" not in r["clean_text"]


def test_clean_text_passthrough_when_no_pii(spark):
    r = _one(spark, "key agg row scan slow fast table")
    assert r["clean_text"] == r["text"]
    assert (
        r["n_email"] == r["n_ssn"] == r["n_phone"] == r["n_ipv4"]
        == r["n_card"] == 0
    )


def test_multiple_hits_counted(spark):
    r = _one(spark, "a@b.io c@d.io 10.0.0.1 10.0.0.2 10.0.0.3")
    assert r["n_email"] == 2 and r["n_ipv4"] == 3
    assert r["clean_text"] == "<EMAIL> <EMAIL> <IP> <IP> <IP>"
