"""Cross-engine PII regex parity (operators/curation.py PII_PATTERNS):
the documents_pii_stats oracle runs the IDENTICAL pattern strings on
DuckDB (RE2) and Spark (Java regex) — this suite pins that the two
dialects agree on an adversarial corpus of boundary cases, so a parity
break surfaces here as a named string, not as an opaque hash mismatch
in the two-SF sweep."""

from __future__ import annotations

import duckdb
from pyspark.sql import functions as F

from iot_sensor_data_pipeline_spark.operators.curation import (
    PII_PATTERNS,
    pii_hit_counts,
    pii_redact,
)

# deliberately nasty: overlaps between classes, near-misses, unicode,
# pattern-order interactions (card before phone), boundary digits
ADVERSARIAL = [
    "plain text no pii at all",
    "a@b.co",
    "not-an-email@",
    "@nope.com",
    "user.name+tag@sub.domain.org trailing",
    "999-99-9999",  # ssn shape
    "123-45-678",  # one digit short
    "ssn inside 123-45-6789th word",
    "4111 1111 1111 1111",  # 16-digit card
    "1234567890123",  # 13 bare digits
    "123456789012",  # 12 digits: below card floor
    "4111-1111-1111-1111 and 415-555-0173",  # card then phone
    "(415) 555-0173",
    "+1 415.555.0173",
    "415 555 0173 ext 9",
    "1.2.3.4",
    "999.999.999.999",  # ip shape (pattern is precision-leaning)
    "10.20.30.40.50",  # five octets
    "v1.2.3.4000",  # version-ish
    "mixed a@b.co 10.20.30.40 123-45-6789 4111 1111 1111 1111 415-555-0173",
    "émile@exämple.org",  # non-ascii localpart/host
    "phone? 5551234567",
    "a@b.co.a@c.io",  # adjacent emails
    "",
]


def test_hit_counts_and_redaction_agree_with_duckdb(spark):
    sdf = spark.createDataFrame([(i, s) for i, s in enumerate(ADVERSARIAL)],
                                "i long, t string")
    redacted_len = (F.length("t") - F.length(pii_redact(F.col("t")))).alias("shrink")
    srows = {
        r.i: tuple(r)[1:]
        for r in sdf.select("i", *pii_hit_counts(F.col("t")), redacted_len).collect()
    }

    con = duckdb.connect()
    counts = ", ".join(
        f"len(regexp_extract_all(t, '{pat}')) AS n_{name}"
        for name, pat, _ in PII_PATTERNS
    )
    chain = "t"
    for _, pat, token in PII_PATTERNS:
        chain = f"regexp_replace({chain}, '{pat}', '{token}', 'g')"
    con.execute("CREATE TABLE adv (i BIGINT, t VARCHAR)")
    con.executemany("INSERT INTO adv VALUES (?, ?)",
                    [(i, s) for i, s in enumerate(ADVERSARIAL)])
    drows = {
        r[0]: tuple(r)[1:]
        for r in con.execute(
            f"SELECT i, {counts}, length(t) - length({chain}) FROM adv"
        ).fetchall()
    }

    for i, s in enumerate(ADVERSARIAL):
        assert srows[i] == drows[i], (s, srows[i], drows[i])


def test_some_adversarial_rows_actually_hit(spark):
    """Guard against a vacuous parity test: the corpus must produce
    nonzero hits in every PII class."""
    sdf = spark.createDataFrame([(s,) for s in ADVERSARIAL], "t string")
    totals = sdf.select(*pii_hit_counts(F.col("t"))).groupBy().sum().first()
    assert all(v and v > 0 for v in totals), totals
