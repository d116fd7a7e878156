"""pii_scrub: mask tokens, counts, and dialect-neutral regex pinning."""

from ophois_spark.operators.textops import pii_scrub


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_pii_scrub_masks_and_counts(spark):
    rows = [
        (1, "reach me at a.b-c_d@ex-ample.co.uk now"),   # multi-dot domain
        (2, "10.0.0.1 and 255.255.255.255"),             # two IPs
        (3, "call +1-800-555-0199 today"),               # intl phone
        (4, "x@y.com +1-555-123456"),                    # adjacent kinds
        (5, "call +12 34"),                              # too short: no phone
        (6, ""),                                         # empty
    ]
    out = {r.doc_id: r for r in pii_scrub(_docs(spark, rows)).collect()}
    assert (out[1].n_emails, out[1].n_ipv4, out[1].n_phones) == (1, 0, 0)
    assert (out[2].n_emails, out[2].n_ipv4, out[2].n_phones) == (0, 2, 0)
    assert (out[3].n_emails, out[3].n_ipv4, out[3].n_phones) == (0, 0, 1)
    assert (out[4].n_emails, out[4].n_ipv4, out[4].n_phones) == (1, 0, 1)
    assert (out[5].n_pii, out[6].n_pii) == (0, 0)
    # full-string redaction is the contract: lengths of masked strings
    assert out[1].scrubbed_len == len("reach me at <EMAIL> now")
    assert out[2].scrubbed_len == len("<IP> and <IP>")
    assert out[3].scrubbed_len == len("call <PHONE> today")
    assert out[4].scrubbed_len == len("<EMAIL> <PHONE>")


def test_pii_scrub_duckdb_dialect_parity(spark):
    """The same patterns must match identically under RE2 (DuckDB) —
    the cross-engine contract the gate relies on, pinned on the
    adversarial strings above rather than only the overlay corpus."""
    import duckdb

    from ophois_spark.operators.textops import (
        PII_EMAIL_RE,
        PII_IPV4_RE,
        PII_PHONE_RE,
    )

    rows = [
        (1, "reach me at a.b-c_d@ex-ample.co.uk now"),
        (2, "10.0.0.1 and 255.255.255.255"),
        (3, "call +1-800-555-0199 today"),
        (4, "x@y.com +1-555-123456"),
        (5, "call +12 34"),
        (6, "a@b.c.d odd trailing single-letter tld"),
        (7, "999.999.999.999 not-an-ip still matches the syntax"),
    ]
    spark_out = {
        r.doc_id: (r.n_emails, r.n_ipv4, r.n_phones, r.scrubbed_md5)
        for r in pii_scrub(_docs(spark, rows)).collect()
    }
    con = duckdb.connect()
    for doc_id, text in rows:
        e, i, p, h = con.execute(
            f"""SELECT len(regexp_extract_all(?, '{PII_EMAIL_RE}')),
                       len(regexp_extract_all(?, '{PII_IPV4_RE}')),
                       len(regexp_extract_all(?, '{PII_PHONE_RE}')),
                       md5(regexp_replace(regexp_replace(regexp_replace(
                           ?, '{PII_EMAIL_RE}', '<EMAIL>', 'g'),
                           '{PII_IPV4_RE}', '<IP>', 'g'),
                           '{PII_PHONE_RE}', '<PHONE>', 'g'))""",
            [text, text, text, text],
        ).fetchone()
        assert spark_out[doc_id] == (e, i, p, h), (doc_id, text)
