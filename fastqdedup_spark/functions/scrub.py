"""PII / link scrubbing for training-data pipelines.

Emails, URLs, and IPv4 literals are the classic pre-training scrub
targets (C4, RefinedWeb, FineWeb all ship variants). The reference
engine has no analog — this extends the graft's LLM-pipeline operator
set next to functions/text.py and functions/repetition.py.

Scale design: pure `regexp_count` / `regexp_replace` column
expressions — JVM-side, one projection over the scan, no shuffle, no
Python. The patterns are deliberately restricted to the syntax subset
that Java regex and RE2 (DuckDB) interpret identically, so the SQL
oracle can replay them byte-for-byte: character classes, bounded
repetition, `\\b` word boundaries — no lookaround, no backreferences.

Scrub order is part of the contract: URLs first (a URL may embed an
email- or IP-shaped substring), then emails, then bare IPv4s. Counts
are taken on the RAW text, independently per category.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import Column

URL_RE = r"https?://[^\s]+"
EMAIL_RE = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
IPV4_RE = r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b"

URL_TOKEN = "<URL>"
EMAIL_TOKEN = "<EMAIL>"
IP_TOKEN = "<IP>"


from fastqdedup_spark.functions import as_column as _c


def pii_counts(col: "str | Column") -> Column:
    """struct(n_urls, n_emails, n_ips) counted on the raw text."""
    c = _c(col)
    return F.struct(
        F.regexp_count(c, F.lit(URL_RE)).cast("long").alias("n_urls"),
        F.regexp_count(c, F.lit(EMAIL_RE)).cast("long").alias("n_emails"),
        F.regexp_count(c, F.lit(IPV4_RE)).cast("long").alias("n_ips"),
    )


def scrub_pii(col: "str | Column") -> Column:
    """Text with URLs -> <URL>, emails -> <EMAIL>, IPv4s -> <IP>,
    replaced in that order (URL first so an embedded email/IP inside a
    URL is swallowed by the URL token, matching the oracle)."""
    c = _c(col)
    out = F.regexp_replace(c, URL_RE, URL_TOKEN)
    out = F.regexp_replace(out, EMAIL_RE, EMAIL_TOKEN)
    out = F.regexp_replace(out, IPV4_RE, IP_TOKEN)
    return out
