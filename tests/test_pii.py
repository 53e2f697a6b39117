"""PII detection/redaction: counts, replacement, and no-op on clean text."""

from pyspark.sql import functions as F

from grafink_spark.llm import pii as pi


def test_counts_and_redaction(spark):
    df = spark.createDataFrame(
        [
            (1, "mail a.user+x@sub.example.org or b@c.io now"),
            (2, "call +1 415-555-0199 or visit 192.168.0.1 twice 10.0.0.2"),
            (3, "nothing sensitive here"),
        ],
        "doc_id long, text string",
    )
    got = {
        r["doc_id"]: r.asDict()
        for r in pi.redact_pii(pi.pii_counts(df), out_col="red").collect()
    }
    assert (got[1]["n_email"], got[1]["n_phone"], got[1]["n_ipv4"]) == (2, 0, 0)
    assert got[1]["red"] == "mail <EMAIL> or <EMAIL> now"
    assert (got[2]["n_email"], got[2]["n_phone"], got[2]["n_ipv4"]) == (0, 1, 2)
    assert got[2]["red"] == "call <PHONE> or visit <IP> twice <IP>"
    assert got[3]["red"] == got[3]["text"]


def test_redact_in_place(spark):
    df = spark.createDataFrame([(1, "x y@z.org x")], "doc_id long, text string")
    out = pi.redact_pii(df)
    assert out.columns == ["doc_id", "text"]
    assert out.where(F.col("text") == "x <EMAIL> x").count() == 1


def test_k_anonymity_audit_flags(spark):
    from grafink_spark.llm.pii import k_anonymity_audit

    rows = (
        [("us", "a", "x")] * 6          # big, diverse? sensitive all 'x'
        + [("us", "b", "x"), ("us", "b", "y")] * 3  # big + diverse
        + [("fr", "a", "x"), ("fr", "a", "y")]      # small group
    )
    df = spark.createDataFrame(rows, "nation string, seg string, s string")
    out = {
        (r.nation, r.seg): r
        for r in k_anonymity_audit(
            df, ["nation", "seg"], sensitive_col="s", k=5, l_div=2
        ).collect()
    }
    assert out[("us", "a")].group_size == 6
    assert out[("us", "a")].at_risk          # diversity 1 < 2
    assert not out[("us", "b")].at_risk      # size 6, diversity 2
    assert out[("fr", "a")].at_risk          # size 2 < k
    # without a sensitive column only the size rule applies
    out2 = {
        (r.nation, r.seg): r
        for r in k_anonymity_audit(df, ["nation", "seg"], k=5).collect()
    }
    assert not out2[("us", "a")].at_risk
    assert out2[("fr", "a")].at_risk
    assert out2[("us", "a")].n_sensitive is None
