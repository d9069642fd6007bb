"""PII/link scrubbing (functions/scrub.py)."""

from fastqdedup_spark.functions.scrub import pii_counts, scrub_pii


def _run(spark, texts):
    df = spark.createDataFrame([(t,) for t in texts], "t string")
    rows = df.select(
        pii_counts("t").alias("c"), scrub_pii("t").alias("s")
    ).collect()
    return [(r["c"]["n_urls"], r["c"]["n_emails"], r["c"]["n_ips"], r["s"]) for r in rows]


def test_counts_and_scrub(spark):
    got = _run(
        spark,
        [
            "plain text no pii",
            "mail me at bob@example.com now",
            "see https://a.example.org/x?q=1 and http://b.io",
            "host 10.0.0.1 and 192.168.7.254",
            "mixed u@d.org https://x.io/p 1.2.3.4",
        ],
    )
    assert got[0] == (0, 0, 0, "plain text no pii")
    assert got[1] == (0, 1, 0, "mail me at <EMAIL> now")
    assert got[2] == (2, 0, 0, "see <URL> and <URL>")
    assert got[3] == (0, 0, 2, "host <IP> and <IP>")
    assert got[4] == (1, 1, 1, "mixed <EMAIL> <URL> <IP>")


def test_url_swallows_embedded_email_and_ip(spark):
    # counts are per-category on RAW text (the embedded shapes DO
    # count), but the scrub replaces the URL first, so the embedded
    # email/IP never survive into the output as separate tokens
    (got,) = _run(spark, ["go http://u@h.example.com/10.0.0.1/x end"])
    n_urls, n_emails, n_ips, scrubbed = got
    assert n_urls == 1
    assert scrubbed == "go <URL> end"


def test_ip_word_boundary(spark):
    # version-ish strings with >4 octets must not produce stray <IP>
    # fragments mid-token: \b\d{1,3}(\.\d{1,3}){3}\b still matches the
    # leading 4 octets of 1.2.3.4.5 (boundary sits at the dot), so the
    # contract is "leftmost-longest 4-octet run replaced", identically
    # in Java regex and RE2 — pin it so a regex tweak can't silently
    # diverge from the SQL oracle
    (got,) = _run(spark, ["v 1.2.3.4.5 w"])
    assert got[3] == "v <IP>.5 w"


def test_plan_is_single_projection_no_shuffle(spark):
    df = spark.createDataFrame([("x",)], "t string").select(
        pii_counts("t").alias("c"), scrub_pii("t").alias("s")
    )
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan
    assert "EvalPython" not in plan
