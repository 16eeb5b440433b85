"""PII detection / redaction over the ``documents`` table — the
training-data-pipeline scrub stage (emails / IPv4 / phone numbers →
``[EMAIL]`` / ``[IP]`` / ``[PHONE]`` placeholders), the same family as
the reference's email harvesting (contrib/seo.py:587-643 EmailMixin)
run in reverse: find the addresses, then REMOVE them.

The synthetic ``documents.text`` is PII-free, so the pipeline and its
DuckDB oracle both run over a deterministic AUGMENTATION of the table:
each doc gets an email derived from ``doc_id`` appended, every 2nd doc
an IPv4, every 5th a phone number — the injection is part of the query
definition, expressed identically in pandas and SQL, so it scales with
the sf tables and the oracle exercises real match/redact behavior
(non-zero counts) instead of vacuously passing on zero PII.

Patterns are ASCII-only ([0-9], [A-Za-z]) so Python ``re`` and
DuckDB's RE2 agree byte-for-byte; both engines use leftmost greedy
matching for these alternation-free patterns.
"""

from __future__ import annotations

import re

import numpy as np
import pandas as pd

from kryptone_ray.pipelines.common import T, partial_sum_count

EMAIL_RE = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
IPV4_RE = r"\b[0-9]{1,3}(?:\.[0-9]{1,3}){3}\b"
PHONE_RE = r"\+1555[0-9]{4}"


def augment(df: pd.DataFrame) -> pd.Series:
    """Deterministic PII injection from doc_id (SQL mirror in
    Q_PII_REDACTION_SQL — same arithmetic, same literals)."""
    ids = df["doc_id"]
    aug = (df["text"] + " user" + (ids % 97).astype(str)
           + "@ex" + (ids % 7).astype(str) + ".com")
    # gates use doc_id // 20 — raw doc_id % k is perfectly correlated
    # with the source column, which would make per-source counts all-or-
    # nothing instead of mixed
    ip = np.where(
        (ids // 20) % 2 == 0,
        " " + (ids % 256).astype(str) + "." + ((ids * 7) % 256).astype(str)
        + "." + ((ids * 13) % 256).astype(str) + "." + (ids % 100).astype(str),
        "")
    phone = np.where((ids // 20) % 5 == 0,
                     " +1555" + (ids % 10000).astype(str).str.zfill(4), "")
    return aug + ip + phone


class PiiRedactor:
    """Actor-pool redaction stage: regexes compiled ONCE per actor in
    ``__init__`` (stateful-stage convention), vectorized pandas str ops
    per ``__call__``. Emits per-doc PII counts + the post-redaction
    text length; the text itself never leaves the stage (only the
    scrubbed stats shuffle)."""

    def __init__(self) -> None:
        self.email = re.compile(EMAIL_RE)
        self.ipv4 = re.compile(IPV4_RE)
        self.phone = re.compile(PHONE_RE)

    def __call__(self, df: pd.DataFrame) -> pd.DataFrame:
        t = augment(df)
        n_em = t.str.count(self.email)
        t = t.str.replace(self.email, "[EMAIL]", regex=True)
        n_ip = t.str.count(self.ipv4)
        t = t.str.replace(self.ipv4, "[IP]", regex=True)
        n_ph = t.str.count(self.phone)
        t = t.str.replace(self.phone, "[PHONE]", regex=True)
        return pd.DataFrame({
            "source": df["source"],
            "n_emails": n_em.astype("int64"),
            "n_ips": n_ip.astype("int64"),
            "n_phones": n_ph.astype("int64"),
            "clean_chars": t.str.len().astype("int64"),
        })


def q_pii_redaction(sf_dir: str) -> pd.DataFrame:
    """Per-source PII census after redaction: how many emails / IPs /
    phones were scrubbed and the total surviving characters. Actor pool
    (compiled-regex state), per-batch partial aggregation — the shuffle
    carries 20 source rows, never text. Pool size 2 so the stage never
    saturates a small Ray session (the 4-CPU test fixture deadlocks
    read tasks behind a 4-actor pool); at cluster scale the pool rides
    block parallelism, not pool width."""
    ds = T(sf_dir, "documents", columns=["doc_id", "source", "text"])
    ds = ds.map_batches(PiiRedactor, batch_format="pandas",
                        batch_size=8192, concurrency=2)
    out = partial_sum_count(
        ds, keys=["source"],
        sums={"total_emails": "n_emails", "total_ips": "n_ips",
              "total_phones": "n_phones", "total_clean_chars": "clean_chars"},
        count_name="n_docs",
    )
    return out.sort_values("source").reset_index(drop=True)


Q_PII_REDACTION_SQL = rf"""
WITH aug AS (
  SELECT source,
         text || ' user' || (doc_id % 97) || '@ex' || (doc_id % 7) || '.com'
              || CASE WHEN (doc_id // 20) % 2 = 0
                      THEN ' ' || (doc_id % 256) || '.' || ((doc_id * 7) % 256)
                           || '.' || ((doc_id * 13) % 256) || '.' || (doc_id % 100)
                      ELSE '' END
              || CASE WHEN (doc_id // 20) % 5 = 0
                      THEN ' +1555' || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0')
                      ELSE '' END AS t
  FROM documents
), r1 AS (
  SELECT source, len(regexp_extract_all(t, '{EMAIL_RE}')) AS n_em,
         regexp_replace(t, '{EMAIL_RE}', '[EMAIL]', 'g') AS t
  FROM aug
), r2 AS (
  SELECT source, n_em, len(regexp_extract_all(t, '{IPV4_RE}')) AS n_ip,
         regexp_replace(t, '{IPV4_RE}', '[IP]', 'g') AS t
  FROM r1
), r3 AS (
  SELECT source, n_em, n_ip,
         len(regexp_extract_all(t, '{PHONE_RE}')) AS n_ph,
         regexp_replace(t, '{PHONE_RE}', '[PHONE]', 'g') AS t
  FROM r2
)
SELECT source,
       CAST(sum(n_em) AS BIGINT) AS total_emails,
       CAST(sum(n_ip) AS BIGINT) AS total_ips,
       CAST(sum(n_ph) AS BIGINT) AS total_phones,
       CAST(sum(length(t)) AS BIGINT) AS total_clean_chars,
       count(*) AS n_docs
FROM r3 GROUP BY source ORDER BY source
"""
