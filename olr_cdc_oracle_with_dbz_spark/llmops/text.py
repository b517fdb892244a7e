"""Text analysis operators for training-data pipelines (SURVEY §2B L5/L6).

Language-ID, quality scoring, token counting, TF-IDF keyword scoring, and
rolling-hash fingerprinting — all as single-pass, codegen'd column
expressions (no Python in the hot path), each exact-checked vs DuckDB.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from olr_cdc_oracle_with_dbz_spark.catalog import Catalog, key_bounds
from olr_cdc_oracle_with_dbz_spark.functions.generators import explode_once
from olr_cdc_oracle_with_dbz_spark.registry import register
from olr_cdc_oracle_with_dbz_spark.plans.canonical import ordered, presort_ranges, presort_static, ordered_static

#: minimal per-language marker-word lists (n-gram-heuristic lang id)
_LANG_MARKERS = {
    "en": ("the", "a", "of", "and", "to"),
    "es": ("el", "la", "de", "los", "y"),
    "de": ("der", "die", "das", "und", "ist"),
    "fr": ("le", "la", "les", "et", "est"),
    "zh": ("的", "是", "了", "在", "我"),
}

_STOPWORDS = ("the", "a", "of", "and", "to", "in", "is")

# BPE-ish token pattern: letter runs, digit runs, single other non-space
_TOKEN_RE = "[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]"


@register(
    "l5_text_stats",
    oracle="""
    WITH t AS (
      SELECT doc_id, n_chars,
             string_split(lower(text), ' ') AS ts,
             regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]') AS bpe
      FROM documents
    )
    SELECT doc_id,
           len(ts) AS n_tokens,
           len(bpe) AS n_bpe_tokens,
           n_chars,
           len(list_distinct(ts)) AS n_distinct,
           ROUND(CAST(n_chars AS DOUBLE) / len(ts), 6) AS chars_per_token,
           ROUND(CAST(len(list_filter(ts, x -> list_contains(
                 ['the','a','of','and','to','in','is'], x))) AS DOUBLE) / len(ts), 6)
             AS stopword_ratio
    FROM t ORDER BY doc_id
    """,
    tags=("llm", "text"),
)
def l5_text_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """L5: token counts (whitespace + BPE-ish regex), char & stopword stats."""
    d = Catalog(spark, sf_dir).documents
    ts = F.split(F.lower("text"), " ")
    bpe = F.regexp_extract_all(F.col("text"), F.lit(_TOKEN_RE), F.lit(0))
    stop_arr = F.array(*[F.lit(s) for s in _STOPWORDS])
    n_stop = F.size(F.filter(ts, lambda x: F.array_contains(stop_arr, x)))
    # range-partition BEFORE the tokenize projection: the sampled range
    # sort above it evaluated the split/regex expressions twice
    return (
        d.select("doc_id", "text", "n_chars")
        .transform(presort_static, key_bounds(sf_dir, "documents"), "doc_id")
        .select(
            "doc_id",
            F.size(ts).alias("n_tokens"),
            F.size(bpe).alias("n_bpe_tokens"),
            "n_chars",
            F.size(F.array_distinct(ts)).alias("n_distinct"),
            F.round(F.col("n_chars").cast("double") / F.size(ts), 6).alias("chars_per_token"),
            F.round(n_stop.cast("double") / F.size(ts), 6).alias("stopword_ratio"),
        )
        .sortWithinPartitions("doc_id")
    )


def _lang_score_sql(lang: str) -> str:
    arr = ", ".join(f"'{w}'" for w in _LANG_MARKERS[lang])
    return f"len(list_filter(ts, x -> list_contains([{arr}], x)))"


@register(
    "l5b_lang_id",
    oracle=f"""
    WITH t AS (SELECT doc_id, lang, string_split(lower(text), ' ') AS ts FROM documents),
    scored AS (
      SELECT doc_id, lang,
             {', '.join(f"{_lang_score_sql(lg)} AS s_{lg}" for lg in _LANG_MARKERS)}
      FROM t
    )
    SELECT doc_id, lang AS actual_lang,
           CASE GREATEST(s_en, s_es, s_de, s_fr, s_zh)
             WHEN s_en THEN 'en' WHEN s_es THEN 'es' WHEN s_de THEN 'de'
             WHEN s_fr THEN 'fr' ELSE 'zh' END AS predicted_lang
    FROM scored ORDER BY doc_id
    """,
    tags=("llm", "text"),
)
def l5b_lang_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    """L5b: marker-word language ID (first-match tie-break en>es>de>fr>zh)."""
    d = Catalog(spark, sf_dir).documents
    ts = F.split(F.lower("text"), " ")
    def _contains(words):
        arr = F.array(*[F.lit(w) for w in words])
        # single-arg lambda: a two-arg lambda would make F.filter pass the
        # element index as the second argument
        return lambda x: F.array_contains(arr, x)

    scores = {
        lg: F.size(F.filter(ts, _contains(words))) for lg, words in _LANG_MARKERS.items()
    }
    best = F.greatest(*scores.values())
    pred = (
        F.when(scores["en"] == best, "en")
        .when(scores["es"] == best, "es")
        .when(scores["de"] == best, "de")
        .when(scores["fr"] == best, "fr")
        .otherwise("zh")
    )
    # range-before-tokenize: see l5_text_stats
    return (
        d.select("doc_id", "lang", "text")
        .transform(presort_static, key_bounds(sf_dir, "documents"), "doc_id")
        .select(
            "doc_id", F.col("lang").alias("actual_lang"), pred.alias("predicted_lang")
        )
        .sortWithinPartitions("doc_id")
    )


@register(
    "l5c_quality_score",
    oracle="""
    WITH t AS (
      SELECT doc_id, n_chars, string_split(lower(text), ' ') AS ts FROM documents
    )
    SELECT doc_id,
           ROUND(
             least(CAST(len(ts) AS DOUBLE) / 100, 1.0) * 0.5
             + least(CAST(len(list_distinct(ts)) AS DOUBLE) / len(ts) * 2, 1.0) * 0.3
             + (CASE WHEN len(ts) >= 5 AND n_chars >= 20 THEN 0.2 ELSE 0.0 END)
           , 6) AS quality
    FROM t ORDER BY doc_id
    """,
    tags=("llm", "text"),
)
def l5c_quality_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """L5c: deterministic quality score (length + lexical diversity + floor)."""
    d = Catalog(spark, sf_dir).documents
    ts = F.split(F.lower("text"), " ")
    n = F.size(ts).cast("double")
    quality = (
        F.least(n / 100, F.lit(1.0)) * 0.5
        + F.least(F.size(F.array_distinct(ts)).cast("double") / n * 2, F.lit(1.0)) * 0.3
        + F.when((F.size(ts) >= 5) & (F.col("n_chars") >= 20), 0.2).otherwise(0.0)
    )
    # range-before-tokenize: see l5_text_stats
    return (
        d.select("doc_id", "text", "n_chars")
        .transform(presort_static, key_bounds(sf_dir, "documents"), "doc_id")
        .select("doc_id", F.round(quality, 6).alias("quality"))
        .sortWithinPartitions("doc_id")
    )


_KEYWORDS = ("spark", "join", "merge", "window", "hash")


@register(
    "l6_tfidf",
    oracle=f"""
    WITH t AS (
      SELECT doc_id, string_split(lower(text), ' ') AS ts FROM documents
    ), n_docs AS (SELECT COUNT(*) AS n FROM documents),
    kw AS (SELECT unnest([{', '.join(repr(k) for k in _KEYWORDS)}]) AS kw),
    tf AS (
      SELECT doc_id, kw,
             CAST(len(list_filter(ts, x -> x = kw)) AS DOUBLE) / len(ts) AS tf
      FROM t CROSS JOIN kw
    ), df AS (
      SELECT kw, COUNT(*) FILTER (WHERE tf > 0) AS df FROM tf GROUP BY kw
    )
    SELECT t.doc_id, t.kw AS kw,
           ROUND(t.tf * ln(CAST(n_docs.n AS DOUBLE) / greatest(df.df, 1)), 8) AS tfidf
    FROM tf t JOIN df ON t.kw = df.kw CROSS JOIN n_docs
    WHERE t.tf > 0
    ORDER BY t.doc_id, t.kw
    """,
    tags=("llm", "text"),
)
def l6_tfidf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """L6: exact TF-IDF for a fixed keyword set (SQL-expressible form).

    tf = keyword count / token count; idf = ln(N / df). The spark.ml
    HashingTF+IDF pipeline covers the open-vocabulary form; this exact
    variant is the hash-checked contract.
    """
    d = Catalog(spark, sf_dir).documents
    ts = F.split(F.lower("text"), " ")
    docs = d.select("doc_id", ts.alias("ts"))
    # corpus size as a broadcast 1-row frame, not a driver .count(): no
    # extra job / driver sync barrier per query — the scalar rides the plan
    n_docs = F.broadcast(docs.agg(F.count(F.lit(1)).alias("n_docs")))
    # One explode pass over tokens, filtered to the keyword set BEFORE any
    # shuffle (a per-keyword array rescan — docs × keywords — measured ~10×
    # the cost). ``counted`` is tiny post-aggregation; both consumers hash
    # on its groupBy exchange, so the explode runs once (ReusedExchange).
    toks = explode_once(
        docs, ["doc_id", F.size("ts").alias("n_toks")], F.col("ts"), "kw"
    ).filter(F.col("kw").isin(list(_KEYWORDS)))
    counted = toks.groupBy("doc_id", "n_toks", "kw").agg(
        F.count(F.lit(1)).alias("cnt")
    )
    df_counts = counted.groupBy("kw").agg(F.count(F.lit(1)).alias("df"))
    return (
        counted.join(F.broadcast(df_counts), "kw")
        .crossJoin(n_docs)
        .select(
            "doc_id",
            "kw",
            F.round(
                (F.col("cnt").cast("double") / F.col("n_toks"))
                * F.log(
                    F.col("n_docs").cast("double") / F.greatest(F.col("df"), F.lit(1))
                ),
                8,
            ).alias("tfidf"),
        )
        .transform(ordered_static, key_bounds(sf_dir, "documents"), "doc_id", "kw")
    )


@register(
    "l7_fingerprint",
    oracle="""
    WITH t AS (
      SELECT doc_id, string_split(lower(text), ' ') AS ts FROM documents
    )
    SELECT doc_id,
           list_reduce(
             list_prepend(CAST(7 AS BIGINT),
               list_transform(ts, x ->
                 CAST(('0x' || substr(md5(x), 1, 15)) AS BIGINT) % 65536)),
             (acc, x) -> (acc * 31 + x) % 1000000007) AS fingerprint
    FROM t ORDER BY doc_id
    """,
    tags=("llm", "text"),
)
def l7_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """L7: rolling polynomial hash fingerprint over the token stream.

    acc = (acc·31 + h(token)) mod 1e9+7, seeded 7 — order-sensitive (unlike
    simhash), so re-ordered near-dups fingerprint differently. The oracle
    computes the definitional fold with every intermediate < 2^35; this
    side evaluates the identical value through the vectorized closed form
    below (property-tested equal to the rolling fold in
    tests/test_property.py).
    """
    import hashlib

    import numpy as np
    import pandas as pd

    d = Catalog(spark, sf_dir).documents
    P = 1_000_000_007

    def fp_batches(batches):
        # The rolling fold acc←(acc·31+x) mod P closed-forms to
        # 7·31ⁿ + Σ xᵢ·31^(n-1-i) (mod P), so the whole document vectorizes:
        # power tables 31^(64j) and 31^(0..63) mod P compose any exponent
        # with one multiply. Token hashes are md5-derived (cross-engine
        # contract) and memoized per worker — vocabulary is Zipf-bounded,
        # so occurrences collapse to distinct-token hashes. The expression
        # form (transform + aggregate HOF) evaluated the lambda per element
        # interpreted: 7.7 s at sf1 vs ~1.5 s here; both are zero-shuffle.
        cache: dict[str, int] = {}
        small = np.empty(64, dtype=np.int64)
        small[0] = 1
        for i in range(1, 64):
            small[i] = small[i - 1] * 31 % P
        big = [1]  # big[j] = 31^(64j) mod P, grown on demand
        step64 = pow(31, 64, P)

        def h16(tok: str) -> int:
            v = cache.get(tok)
            if v is None:
                if len(cache) >= 1_000_000:
                    cache.clear()
                v = int(hashlib.md5(tok.encode()).hexdigest()[:15], 16) % 65536
                cache[tok] = v
            return v

        for pdf in batches:
            out = np.empty(len(pdf), dtype=np.int64)
            for i, text in enumerate(pdf["text"]):
                toks = text.lower().split(" ")
                n = len(toks)
                while len(big) <= n // 64:
                    big.append(big[-1] * step64 % P)
                hs = np.fromiter((h16(t) for t in toks), dtype=np.int64, count=n)
                k = np.arange(n - 1, -1, -1)  # exponent of token i is n-1-i
                pw = (
                    np.asarray(big, dtype=np.int64)[k >> 6] * small[k & 63]
                ) % P
                # xᵢ < 2¹⁶ and pw < 2³⁰ → products < 2⁴⁶; reduced mod P
                # before the sum so int64 stays exact at any token count
                out[i] = (int(((hs * pw) % P).sum()) + 7 * pow(31, n, P)) % P
            yield pd.DataFrame({"doc_id": pdf["doc_id"].values, "fingerprint": out})

    return (
        d.select("doc_id", "text")
        .transform(presort_static, key_bounds(sf_dir, "documents"), "doc_id")  # BEFORE the kernel:
        # must not re-execute it (3.9 s → 0.6 s at sf1, canonical.py)
        .mapInPandas(fp_batches, "doc_id bigint, fingerprint bigint")
        .sortWithinPartitions("doc_id")
    )


#: PII patterns in the Java-regex ∩ RE2 dialect intersection
_EMAIL_RE = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
_PHONE_RE = r"\+?[0-9][0-9()\s.-]{7,}[0-9]"


@register(
    "l5d_redact_pii",
    oracle=f"""
    WITH seeded AS (
      SELECT doc_id,
             text || ' contact user' || doc_id || '@example.com or +1-555-'
                  || lpad(CAST(doc_id AS VARCHAR), 7, '0') || ' now' AS t
      FROM documents
    ), r1 AS (
      SELECT doc_id, t,
             regexp_replace(t, '{_EMAIL_RE}', '<EMAIL>', 'g') AS t1
      FROM seeded
    )
    SELECT doc_id,
           len(regexp_extract_all(t, '{_EMAIL_RE}'))  AS n_emails,
           len(regexp_extract_all(t1, '{_PHONE_RE}')) AS n_phones,
           md5(regexp_replace(t1, '{_PHONE_RE}', '<PHONE>', 'g')) AS clean_md5
    FROM r1 ORDER BY doc_id
    """,
    tags=("llm", "text"),
)
def l5d_redact_pii(spark: SparkSession, sf_dir: str) -> DataFrame:
    """L5d: PII redaction (emails, phone numbers) with redaction counts.

    The synthetic corpus carries no PII, so both engines seed identical
    deterministic PII per document before redacting — the check proves
    pattern parity and replacement behavior, not luck of the data.

    The four regex passes run through pyarrow's RE2 kernels
    (``count_substring_regex`` / ``replace_substring_regex``) inside
    ``mapInPandas`` rather than codegen'd ``regexp_replace``:
    java.util.regex is a backtracking engine and measured 4× slower than
    the Arrow/RE2 path on this workload (sf0.1 1.0 s → 0.6 s; the gap
    widens with data — sf1 showed 11 s vs DuckDB-RE2's 0.4 s). Still a
    pure map — no shuffle, Arrow-batched — and the patterns live in the
    Java-regex ∩ RE2 intersection so results are bit-identical (asserted
    against the expression form in tests). Output md5 via hashlib matches
    both engines' md5.
    """
    import hashlib

    import pandas as pd
    import pyarrow as pa
    import pyarrow.compute as pc

    d = Catalog(spark, sf_dir).documents
    seeded = F.concat(
        F.col("text"),
        F.lit(" contact user"),
        F.col("doc_id").cast("string"),
        F.lit("@example.com or +1-555-"),
        F.lpad(F.col("doc_id").cast("string"), 7, "0"),
        F.lit(" now"),
    )

    def redact(batches):
        for pdf in batches:
            arr = pa.array(pdf["t"], type=pa.string())
            n_em = pc.count_substring_regex(arr, _EMAIL_RE)
            t1 = pc.replace_substring_regex(arr, _EMAIL_RE, "<EMAIL>")
            n_ph = pc.count_substring_regex(t1, _PHONE_RE)
            t2 = pc.replace_substring_regex(t1, _PHONE_RE, "<PHONE>")
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"].values,
                    "n_emails": n_em.to_numpy(zero_copy_only=False).astype("int32"),
                    "n_phones": n_ph.to_numpy(zero_copy_only=False).astype("int32"),
                    "clean_md5": [
                        hashlib.md5(s.encode()).hexdigest() for s in t2.to_pylist()
                    ],
                }
            )

    return (
        d.select("doc_id", seeded.alias("t"))
        .transform(presort_static, key_bounds(sf_dir, "documents"), "doc_id")  # pre-kernel
        .mapInPandas(redact, "doc_id bigint, n_emails int, n_phones int, clean_md5 string")
        .sortWithinPartitions("doc_id")
    )


@register(
    "l5e_boilerplate",
    oracle="""
    WITH toks AS (
      SELECT DISTINCT doc_id, unnest(string_split(lower(text), ' ')) AS tok
      FROM documents
    ), n_docs AS (SELECT COUNT(DISTINCT doc_id) AS n FROM documents),
    df AS (
      SELECT tok, COUNT(*) AS d FROM toks GROUP BY tok
    ), boiler AS (
      SELECT tok FROM df, n_docs WHERE d >= 0.5 * n
    )
    SELECT t.doc_id,
           COUNT(*) AS n_distinct_toks,
           COUNT(*) FILTER (WHERE b.tok IS NOT NULL) AS n_boiler,
           ROUND(CAST(COUNT(*) FILTER (WHERE b.tok IS NOT NULL) AS DOUBLE)
                 / COUNT(*), 6) AS boiler_ratio
    FROM toks t LEFT JOIN boiler b ON t.tok = b.tok
    GROUP BY t.doc_id ORDER BY t.doc_id
    """,
    tags=("llm", "text"),
)
def l5e_boilerplate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """L5e: boilerplate detection — tokens present in ≥50% of documents,
    per-doc boilerplate ratio (cleaning signal: near-1 docs are template).

    Two aggregations over one explode (document frequency is corpus-wide,
    then broadcast back); at 100 TB the boiler set is tiny and broadcast,
    the explode is map-side — shuffle ∝ distinct (doc, token).
    """
    d = Catalog(spark, sf_dir).documents
    # per-doc token DEDUP in-row (array_distinct before the explode) — the
    # same plan shape as _jaccard_pairs' shingles: the old
    # dropDuplicates([doc_id, tok]) was a full (doc, token) shuffle, and the
    # per-doc distinct count is a free size() on the deduped array
    dts = d.select(
        "doc_id", F.array_distinct(F.split(F.lower("text"), " ")).alias("dts")
    )
    toks = explode_once(
        dts, ["doc_id", F.size("dts").alias("n_distinct_toks")], F.col("dts"), "tok"
    )
    # corpus size as a broadcast scalar frame (no driver .count() job)
    n_docs = F.broadcast(d.agg(F.count_distinct("doc_id").alias("n_docs")))
    boiler = (
        toks.groupBy("tok")
        .agg(F.count(F.lit(1)).alias("d"))
        .crossJoin(n_docs)
        .filter(F.col("d") >= 0.5 * F.col("n_docs"))
        .select("tok", F.lit(True).alias("is_boiler"))
    )
    per_doc = (
        toks.join(F.broadcast(boiler), "tok", "left")
        .groupBy("doc_id", "n_distinct_toks")
        .agg(F.count(F.when(F.col("is_boiler"), 1)).alias("n_boiler"))
    )
    return per_doc.select(
        "doc_id",
        "n_distinct_toks",
        "n_boiler",
        F.round(F.col("n_boiler").cast("double") / F.col("n_distinct_toks"), 6).alias(
            "boiler_ratio"
        ),
    ).transform(ordered_static, key_bounds(sf_dir, "documents"), "doc_id")


@register(
    "l8_curation_pipeline",
    oracle=f"""
    WITH q AS (
      SELECT doc_id, text, string_split(lower(text), ' ') AS ts, n_chars
      FROM documents
    ), scored AS (
      SELECT doc_id, text,
             least(CAST(len(ts) AS DOUBLE) / 100, 1.0) * 0.5
             + least(CAST(len(list_distinct(ts)) AS DOUBLE) / len(ts) * 2, 1.0) * 0.3
             + (CASE WHEN len(ts) >= 5 AND n_chars >= 20 THEN 0.2 ELSE 0.0 END)
               AS quality
      FROM q
    ), keep AS (
      SELECT MIN(doc_id) AS doc_id
      FROM scored WHERE quality >= 0.5
      GROUP BY md5(lower(trim(text)))
    )
    SELECT s.doc_id,
           ROUND(s.quality, 6) AS quality,
           md5(regexp_replace(regexp_replace(s.text,
               '{_EMAIL_RE}', '<EMAIL>', 'g'),
               '{_PHONE_RE}', '<PHONE>', 'g')) AS clean_md5
    FROM scored s JOIN keep k ON s.doc_id = k.doc_id
    ORDER BY s.doc_id
    """,
    tags=("llm", "text", "pipeline"),
)
def l8_curation_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """L8: end-to-end curation — quality gate → exact dedup → PII redaction.

    The composed training-data flow: score every document, keep those
    above the quality bar, collapse exact duplicates (lowest doc_id
    survives), redact PII from the survivors. One declarative plan —
    Catalyst pipelines the filter into the scan, the dedup is one shuffle
    on the content hash, redaction is a codegen'd map over survivors only
    (filter-before-expensive-work ordering matters at 100 TB).
    """
    d = Catalog(spark, sf_dir).documents
    ts = F.split(F.lower("text"), " ")
    n = F.size(ts).cast("double")
    quality = (
        F.least(n / 100, F.lit(1.0)) * 0.5
        + F.least(F.size(F.array_distinct(ts)).cast("double") / n * 2, F.lit(1.0)) * 0.3
        + F.when((F.size(ts) >= 5) & (F.col("n_chars") >= 20), 0.2).otherwise(0.0)
    )
    scored = d.select("doc_id", "text", quality.alias("quality"))
    # dedup as min-doc_id-per-content-key via ONE window over the quality
    # survivors — the groupBy(ck)+self-join form scanned the corpus twice
    # and shuffled it twice (once on ck, once on doc_id, text riding both)
    w = Window.partitionBy(F.md5(F.lower(F.trim("text")))).orderBy("doc_id")
    clean = F.md5(
        F.regexp_replace(
            F.regexp_replace("text", _EMAIL_RE, "<EMAIL>"), _PHONE_RE, "<PHONE>"
        )
    )
    return (
        scored.filter(F.col("quality") >= 0.5)
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)  # lowest doc_id survives per content key
        .select("doc_id", F.round("quality", 6).alias("quality"), clean.alias("clean_md5"))
        .transform(ordered_static, key_bounds(sf_dir, "documents"), "doc_id")
    )
