"""PII redaction kernel (operators/pii.py) — planted-example semantics
plus a no-Python-UDF plan check (the kernel must stay whole-stage
codegen: regex built-ins only)."""

import pytest

from pyspark.sql import functions as F

from geoio_jl_spark.operators.pii import redact_pii


@pytest.fixture(scope="module")
def redacted(spark):
    rows = [
        (0, "write to alice.smith+spam@sub.example.co.uk today"),
        (1, "server at 10.0.200.13 and backup 192.168.1.1"),
        (2, "call +1 555 010 4242 now"),
        (3, "mixed bob@x.io via 8.8.8.8 or +44 201 555 0199"),
        (4, "no pii here at all"),
        (5, "not an ip 1.2.3.4.5 still redacts the prefix"),
        (6, "semver 1.2.3 is not an ip"),
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    out = {r["doc_id"]: r for r in redact_pii(df).collect()}
    return out


def test_email_redaction(redacted):
    assert redacted[0]["clean_text"] == "write to <EMAIL> today"
    assert redacted[0]["n_emails"] == 1


def test_ip_redaction(redacted):
    assert redacted[1]["clean_text"] == "server at <IP> and backup <IP>"
    assert redacted[1]["n_ips"] == 2


def test_phone_redaction(redacted):
    assert redacted[2]["clean_text"] == "call <PHONE> now"
    assert redacted[2]["n_phones"] == 1


def test_mixed_kinds(redacted):
    r = redacted[3]
    assert r["clean_text"] == "mixed <EMAIL> via <IP> or <PHONE>"
    assert (r["n_emails"], r["n_ips"], r["n_phones"]) == (1, 1, 1)


def test_clean_text_untouched(redacted):
    r = redacted[4]
    assert r["clean_text"] == "no pii here at all"
    assert (r["n_emails"], r["n_ips"], r["n_phones"]) == (0, 0, 0)


def test_dotted_quint(redacted):
    # leftmost-first: the first four octets match, the trailing .5 stays
    assert redacted[5]["clean_text"] == "not an ip <IP>.5 still redacts the prefix"


def test_semver_not_ip(redacted):
    assert redacted[6]["clean_text"] == "semver 1.2.3 is not an ip"
    assert redacted[6]["n_ips"] == 0


def test_plan_stays_codegen(spark):
    """No Python crossing: the plan must contain no BatchEvalPython /
    ArrowEvalPython node — regex redaction is a pure mapper."""
    df = spark.createDataFrame([(1, "a@b.co")], ["doc_id", "text"])
    plan = redact_pii(df)._jdf.queryExecution().executedPlan().toString()
    assert "EvalPython" not in plan


def test_card_luhn_validation(spark):
    """Only Luhn-valid digit runs are redacted: the checksum runs in
    pure SQL, not just the regex shape."""
    rows = [
        (0, "pay 4532015112830366 now"),           # valid 16-digit
        (1, "ref 1234567890123456 code"),          # invalid checksum
        (2, "amex 379354508162306 works"),         # valid 15-digit
        (3, "visa 4111111111111111 and bad 4111111111111112"),
        (4, "short 123456789012 stays"),           # < 13 digits
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    out = {r["doc_id"]: r for r in redact_pii(df).collect()}
    assert out[0]["clean_text"] == "pay <CARD> now"
    assert out[0]["n_cards"] == 1
    assert out[1]["clean_text"] == "ref 1234567890123456 code"
    assert out[1]["n_cards"] == 0
    assert out[2]["clean_text"] == "amex <CARD> works"
    assert out[3]["clean_text"] == "visa <CARD> and bad 4111111111111112"
    assert out[3]["n_cards"] == 1
    assert out[4]["clean_text"] == "short 123456789012 stays"


def test_card_embedded_run_not_overredacted(spark):
    """A candidate's digit run embedded in a longer token is NOT a
    match of the \\b-anchored pattern and must survive redaction."""
    df = spark.createDataFrame(
        [(0, "pay 4532015112830366 ref a4532015112830366b")],
        ["doc_id", "text"])
    r = redact_pii(df).collect()[0]
    assert r["clean_text"] == "pay <CARD> ref a4532015112830366b"
    assert r["n_cards"] == 1
