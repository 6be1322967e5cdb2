"""PII-redaction semantics on synthetic rows containing real-shaped PII
(the registry corpus is PII-free, so the oracle gate alone can't pin the
regexes), cross-checked against DuckDB running the same patterns."""

import duckdb
import pandas as pd

from flink_emqx_connector_spark.plans.text_features import (
    _PII_EMAIL,
    _PII_IPV4,
    _PII_PHONE,
    pii_redact,
)

_ROWS = [
    (1, "contact alice.smith+spam@ex-ample.co.uk or bob@test.io today"),
    (2, "server at 10.0.255.1 and 192.168.1.17 responded"),
    (3, "call +14155552671 or +442071838750 now"),
    (4, "mixed: x@y.org from 8.8.8.8 dial +4930123456"),
    (5, "clean text with no pii at all"),
    (6, "not-pii: a@b (no tld), 1.2.3 (short), +123 (short)"),
]


def _duck_expected():
    con = duckdb.connect()
    con.register("t", pd.DataFrame(_ROWS, columns=["doc_id", "text"]))
    return {
        r[0]: r[1:]
        for r in con.sql(
            f"""
            SELECT doc_id,
                   len(regexp_extract_all(text, '{_PII_EMAIL}')),
                   len(regexp_extract_all(text, '{_PII_IPV4}')),
                   len(regexp_extract_all(text, '{_PII_PHONE}')),
                   md5(regexp_replace(regexp_replace(regexp_replace(text,
                       '{_PII_EMAIL}', '<EMAIL>', 'g'),
                       '{_PII_IPV4}', '<IP>', 'g'),
                       '{_PII_PHONE}', '<PHONE>', 'g'))
            FROM t
            """
        ).fetchall()
    }


def test_pii_redact_matches_duckdb(spark):
    df = spark.createDataFrame(_ROWS, "doc_id long, text string")
    got = {
        r["doc_id"]: (r["n_emails"], r["n_ipv4"], r["n_phones"], r["clean_fp"])
        for r in pii_redact(df).collect()
    }
    assert got == _duck_expected()


def test_pii_counts_and_placeholders(spark):
    df = spark.createDataFrame(_ROWS, "doc_id long, text string")
    got = {r["doc_id"]: r for r in pii_redact(df).collect()}
    assert (got[1]["n_emails"], got[1]["n_ipv4"], got[1]["n_phones"]) == (2, 0, 0)
    assert (got[2]["n_emails"], got[2]["n_ipv4"], got[2]["n_phones"]) == (0, 2, 0)
    assert (got[3]["n_emails"], got[3]["n_ipv4"], got[3]["n_phones"]) == (0, 0, 2)
    assert (got[4]["n_emails"], got[4]["n_ipv4"], got[4]["n_phones"]) == (1, 1, 1)
    assert (got[5]["n_emails"], got[5]["n_ipv4"], got[5]["n_phones"]) == (0, 0, 0)
    # near-misses must NOT match (no tld / 3 octets / too-short phone)
    assert (got[6]["n_emails"], got[6]["n_ipv4"], got[6]["n_phones"]) == (0, 0, 0)
