"""Training-data pipeline operators over documents/embeddings (task mandate).

Deduplication (exact + MinHash-LSH + n-gram Jaccard), text analysis
(language-ID heuristic, quality scoring, token counting, fingerprinting) and
similarity search (brute-force cosine top-k; LSH-bucketed variant) — each as
a queries() entry with a DuckDB oracle where ANSI-SQL-expressible.

Parity discipline: every hash is md5/sha256 (identical in Spark and DuckDB),
every float is rounded identically on both sides, shingling uses 1-based
substr in both engines.
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from pcd_spark.relational.queries import load, q

REGISTRY: dict = {}


def qt(name: str, sql: str | None):
    def deco(fn):
        REGISTRY[name] = {"spark": fn, "sql": sql}
        return fn
    return deco


def _spread(df):
    """Round-robin-widen a narrow scan before CPU-dense per-row work.

    A single-row-group parquet file scans as ONE task no matter how many
    cores the session has, so an O(hashes x len) stage like the minhash
    fold serializes on one core (measured at sf0.1 local[32]: the x10
    signature stage dropped 9.9 s -> 1.2 s with this). Only widens when the
    scan is narrower than 2x the session width — at 100 TB scans carry
    thousands of row-group splits and this is a no-op; when it does fire,
    the shuffle moves each projected row once, amortized by the
    per-character hashing that follows."""
    spark = df.sparkSession
    width = spark.sparkContext.defaultParallelism * 2
    if df.rdd.getNumPartitions() < width:
        return df.repartition(width)
    return df


# =========================================================================
# deduplication
# =========================================================================

@qt(
    "x1_dedup_exact",
    """SELECT sha256(text) AS content_sha,
              MIN(doc_id) AS keep_id, COUNT(*) AS n_copies
       FROM documents GROUP BY sha256(text)""",
)
def x1(spark, sf):
    # exact dedup: hash-groupBy on content digest; at 100 TB the digest is
    # computed scan-side and only (sha, id) shuffles — never the text
    d = load(spark, sf, "documents")
    return (
        d.select(F.sha2("text", 256).alias("content_sha"), "doc_id")
        .groupBy("content_sha")
        .agg(F.min("doc_id").alias("keep_id"), F.count("*").alias("n_copies"))
    )


_MINHASH_SEEDS = ["s1", "s2", "s3", "s4"]


def _minhash_sql(seed: str) -> str:
    return (
        f"list_min(list_transform(range(1, GREATEST(LENGTH(text) - 4, 1) + 1), "
        f"i -> md5('{seed}' || SUBSTR(text, i, 5))))"
    )


@qt(
    "x2_minhash_signature",
    "SELECT doc_id, "
    + ", ".join(f"{_minhash_sql(s)} AS mh_{s}" for s in _MINHASH_SEEDS)
    + " FROM documents WHERE LENGTH(text) >= 5",
)
def x2(spark, sf):
    # MinHash: shingle(5-char) -> md5(seed||shingle) -> min per seed.
    # Vectorized JVM-side via higher-order functions; no Python.
    d = _spread(load(spark, sf, "documents").filter(F.length("text") >= 5))
    cols = [F.col("doc_id")]
    for s in _MINHASH_SEEDS:
        cols.append(_minhash_col(s).alias(f"mh_{s}"))
    return d.select(*cols)


def _minhash_col(seed: str):
    # Constant-memory form: fold the shingle positions with a running min
    # (F.aggregate) instead of materializing an O(len) ARRAY of 32-char md5
    # strings per row (array_min(transform(...)) — round 1's form — holds
    # ~3.2 MB of hash strings in flight for a 100 KB doc; the fold holds
    # one). Identical result: min over the same shingle-hash set. The init
    # sentinel "g" sorts after every md5 hex ([0-9a-f]{32}) and can never
    # win because text length >= 5 is enforced by the callers.
    # NB: the lambda must take exactly ONE arg — pyspark passes (element,
    # index) to two-arg lambdas, which would silently replace the seed.
    def shingle_hash(i):
        return F.md5(F.concat(F.lit(seed), F.expr("text").substr(i, F.lit(5))))

    return F.aggregate(
        F.sequence(F.lit(1), F.greatest(F.length("text") - 4, F.lit(1))),
        F.lit("g"),
        lambda acc, i: F.least(acc, shingle_hash(i)),
    )


@qt(
    "x3_minhash_lsh_buckets",
    f"""SELECT band_key, COUNT(*) AS bucket_size,
               MIN(doc_id) AS min_doc, MAX(doc_id) AS max_doc
        FROM (
          SELECT doc_id,
                 md5({_minhash_sql("s1")} || {_minhash_sql("s2")}) AS band_key
          FROM documents WHERE LENGTH(text) >= 5)
        GROUP BY band_key HAVING COUNT(*) >= 1""",
)
def x3(spark, sf):
    # LSH banding: hash 2 minhashes into a band key; same-bucket docs are
    # near-dup candidates. Candidate verification is a bucket-local join —
    # the shuffle key is the band, so cost scales with bucket sizes, not n^2.
    d = _spread(load(spark, sf, "documents").filter(F.length("text") >= 5))
    return (
        d.select(
            "doc_id",
            F.md5(F.concat(_minhash_col("s1"), _minhash_col("s2"))).alias("band_key"),
        )
        .groupBy("band_key")
        .agg(
            F.count("*").alias("bucket_size"),
            F.min("doc_id").alias("min_doc"),
            F.max("doc_id").alias("max_doc"),
        )
    )


@qt(
    "x4_ngram_jaccard_pairs",
    """WITH sh AS (
         SELECT doc_id,
                list_distinct(list_transform(range(1, LENGTH(text) - 3),
                                             i -> SUBSTR(text, i, 4))) AS grams
         FROM documents WHERE n_chars BETWEEN 100 AND 200
       ),
       pairs AS (
         SELECT a.doc_id AS d1, b.doc_id AS d2,
                LEN(list_intersect(a.grams, b.grams)) AS inter,
                LEN(a.grams) + LEN(b.grams)
                  - LEN(list_intersect(a.grams, b.grams)) AS uni
         FROM sh a JOIN sh b ON a.doc_id < b.doc_id
       )
       SELECT d1, d2, ROUND(CAST(inter AS DOUBLE) / uni, 4) AS jaccard
       FROM pairs WHERE CAST(inter AS DOUBLE) / uni > 0.3""",
)
def x4(spark, sf):
    # n-gram Jaccard near-dup via an INVERTED INDEX, not an all-pairs theta
    # join (round 1 planned a BroadcastNestedLoopJoin — a cartesian that
    # dies the moment the slice grows). Exact same output: a pair sharing
    # zero grams has J = 0 < threshold, so equi-joining the exploded
    # (gram, doc) postings enumerates every qualifying candidate, and the
    # per-pair match count IS |intersection| — no array_intersect, no
    # second pass over text. Cost = sum over grams of freq^2 (the standard
    # set-similarity-join shape; prefix filtering is the known refinement,
    # and x3/v3 are the approximate scale paths).
    d = _spread(
        load(spark, sf, "documents").filter(F.col("n_chars").between(100, 200))
    )
    sh = d.select(
        "doc_id",
        F.array_distinct(
            F.transform(
                F.sequence(F.lit(1), F.length("text") - 4),
                lambda i: F.expr("text").substr(i, F.lit(4)),
            )
        ).alias("grams"),
    ).localCheckpoint(eager=True)  # GC-scoped, not a session-lifetime persist
    sizes = sh.select("doc_id", F.size("grams").alias("sz"))
    post = sh.select("doc_id", F.explode("grams").alias("gram"))
    inter_df = (
        post.select(F.col("doc_id").alias("d1"), "gram")
        .join(post.select(F.col("doc_id").alias("d2"), "gram"), "gram")
        .filter(F.col("d1") < F.col("d2"))
        .groupBy("d1", "d2")
        .agg(F.count("*").alias("inter"))
    )
    # sizes is 2 ints per doc — leave the join strategy to the planner/AQE:
    # broadcast when the slice is small, shuffle join when it isn't
    pairs = (
        inter_df.join(
            sizes.select(F.col("doc_id").alias("d1"), F.col("sz").alias("s1")), "d1"
        )
        .join(
            sizes.select(F.col("doc_id").alias("d2"), F.col("sz").alias("s2")), "d2"
        )
    )
    uni = F.col("s1") + F.col("s2") - F.col("inter")
    jac = F.col("inter").cast("double") / uni
    return pairs.select(
        "d1", "d2", F.round(jac, 4).alias("jaccard")
    ).filter(jac > 0.3)


# =========================================================================
# text analysis
# =========================================================================

def _count_occurrences(col, token: str):
    return (
        F.length(col) - F.length(F.replace(col, F.lit(token), F.lit("")))
    ) / len(token)


@qt(
    "x5_token_count",
    """SELECT doc_id,
              LEN(string_split_regex(TRIM(text), '\\s+')) AS n_tokens,
              LEN(regexp_extract_all(text, '[a-zA-Z0-9]+')) AS n_words
       FROM documents WHERE LENGTH(TRIM(text)) > 0""",
)
def x5(spark, sf):
    d = load(spark, sf, "documents").filter(F.length(F.trim("text")) > 0)
    return d.select(
        "doc_id",
        F.size(F.split(F.trim("text"), r"\s+")).alias("n_tokens"),
        F.size(
            F.regexp_extract_all(F.col("text"), F.lit("([a-zA-Z0-9]+)"), F.lit(1))
        ).alias("n_words"),
    )


@qt(
    "x6_quality_score",
    """SELECT doc_id,
              ROUND(CAST(LEN(regexp_extract_all(text, '[.,;:!?]')) AS DOUBLE)
                    / LENGTH(text), 6) AS punct_ratio,
              ROUND(CAST(LEN(string_split_regex(TRIM(text), '\\s+')) AS DOUBLE)
                    / LENGTH(text), 6) AS token_density,
              CASE WHEN LENGTH(text) BETWEEN 50 AND 5000 THEN 1 ELSE 0 END AS len_ok
       FROM documents WHERE LENGTH(TRIM(text)) > 0""",
)
def x6(spark, sf):
    d = load(spark, sf, "documents").filter(F.length(F.trim("text")) > 0)
    punct = F.size(
        F.regexp_extract_all(F.col("text"), F.lit("([.,;:!?])"), F.lit(1))
    ).cast("double")
    toks = F.size(F.split(F.trim("text"), r"\s+")).cast("double")
    return d.select(
        "doc_id",
        F.round(punct / F.length("text"), 6).alias("punct_ratio"),
        F.round(toks / F.length("text"), 6).alias("token_density"),
        F.when(F.length("text").between(50, 5000), 1).otherwise(0).alias("len_ok"),
    )


_LANG_MARKERS = {
    "en": [" the ", " and "],
    "es": [" el ", " que "],
    "de": [" der ", " und "],
    "fr": [" le ", " et "],
}


@qt(
    "x7_langid_heuristic",
    """SELECT doc_id,
       CASE GREATEST(
         (LENGTH(text) - LENGTH(REPLACE(text, ' the ', ''))) / 5
           + (LENGTH(text) - LENGTH(REPLACE(text, ' and ', ''))) / 5,
         (LENGTH(text) - LENGTH(REPLACE(text, ' el ', ''))) / 4
           + (LENGTH(text) - LENGTH(REPLACE(text, ' que ', ''))) / 5,
         (LENGTH(text) - LENGTH(REPLACE(text, ' der ', ''))) / 5
           + (LENGTH(text) - LENGTH(REPLACE(text, ' und ', ''))) / 5,
         (LENGTH(text) - LENGTH(REPLACE(text, ' le ', ''))) / 4
           + (LENGTH(text) - LENGTH(REPLACE(text, ' et ', ''))) / 4)
       WHEN (LENGTH(text) - LENGTH(REPLACE(text, ' the ', ''))) / 5
           + (LENGTH(text) - LENGTH(REPLACE(text, ' and ', ''))) / 5 THEN 'en'
       WHEN (LENGTH(text) - LENGTH(REPLACE(text, ' el ', ''))) / 4
           + (LENGTH(text) - LENGTH(REPLACE(text, ' que ', ''))) / 5 THEN 'es'
       WHEN (LENGTH(text) - LENGTH(REPLACE(text, ' der ', ''))) / 5
           + (LENGTH(text) - LENGTH(REPLACE(text, ' und ', ''))) / 5 THEN 'de'
       ELSE 'fr' END AS pred_lang
       FROM documents""",
)
def x7(spark, sf):
    # marker-token language ID: score = occurrence count of language-specific
    # stopwords; winner = highest score with a pinned tie order (en,es,de,fr).
    d = load(spark, sf, "documents")
    scores = {
        lang: sum(_count_occurrences(F.col("text"), t) for t in toks)
        for lang, toks in _LANG_MARKERS.items()
    }
    best = F.greatest(*scores.values())
    pred = (
        F.when(best == scores["en"], "en")
        .when(best == scores["es"], "es")
        .when(best == scores["de"], "de")
        .otherwise("fr")
    )
    return d.select("doc_id", pred.alias("pred_lang"))


@qt(
    "x8_fingerprint",
    """SELECT doc_id,
              md5(LOWER(regexp_replace(text, '[^a-zA-Z0-9]', '', 'g'))) AS fp
       FROM documents""",
)
def x8(spark, sf):
    # normalization fingerprint: case/punct/whitespace-insensitive digest
    d = _spread(load(spark, sf, "documents"))
    return d.select(
        "doc_id",
        F.md5(F.lower(F.regexp_replace("text", "[^a-zA-Z0-9]", ""))).alias("fp"),
    )


# =========================================================================
# similarity search over embeddings
# =========================================================================

def _cos(e1, e2):
    dot = F.aggregate(
        F.zip_with(e1, e2, lambda a, b: a * b), F.lit(0.0), lambda acc, x: acc + x
    )
    n1 = F.sqrt(
        F.aggregate(F.transform(e1, lambda a: a * a), F.lit(0.0), lambda acc, x: acc + x)
    )
    n2 = F.sqrt(
        F.aggregate(F.transform(e2, lambda a: a * a), F.lit(0.0), lambda acc, x: acc + x)
    )
    return dot / (n1 * n2)


@qt(
    "v1_cosine_topk",
    """WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS emb FROM embeddings),
       probes AS (SELECT * FROM e WHERE vec_id < 5),
       scored AS (
         SELECT p.vec_id AS probe_id, c.vec_id AS cand_id,
                ROUND(list_dot_product(p.emb, c.emb)
                      / (SQRT(list_dot_product(p.emb, p.emb))
                         * SQRT(list_dot_product(c.emb, c.emb))), 6) AS cosine
         FROM probes p JOIN e c ON p.vec_id <> c.vec_id)
       SELECT probe_id, cand_id, cosine FROM (
         SELECT *, ROW_NUMBER() OVER (PARTITION BY probe_id
                                      ORDER BY cosine DESC, cand_id ASC) AS rn
         FROM scored) WHERE rn <= 3""",
)
def v1(spark, sf):
    # brute-force cosine top-k (the exactness baseline for ANN); probes are
    # broadcast so the big side streams — at scale this is the verify path
    # for the LSH/IVF candidate generator (v2)
    e = load(spark, sf, "embeddings").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("emb")
    )
    probes = e.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("probe_id"), F.col("emb").alias("pemb")
    )
    cand = e.select(F.col("vec_id").alias("cand_id"), F.col("emb").alias("cemb"))
    scored = (
        F.broadcast(probes)
        .join(cand, F.col("probe_id") != F.col("cand_id"))
        .select(
            "probe_id",
            "cand_id",
            F.round(_cos(F.col("pemb"), F.col("cemb")), 6).alias("cosine"),
        )
    )
    w = Window.partitionBy("probe_id").orderBy(F.desc("cosine"), F.asc("cand_id"))
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 3)
        .select("probe_id", "cand_id", "cosine")
    )


@qt(
    "v2_lsh_sign_buckets",
    """WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS emb FROM embeddings)
       SELECT bucket, COUNT(*) AS n_vecs, MIN(vec_id) AS min_vec
       FROM (SELECT vec_id,
                    CASE WHEN emb[1] >= 0 THEN 4 ELSE 0 END
                    + CASE WHEN emb[2] >= 0 THEN 2 ELSE 0 END
                    + CASE WHEN emb[3] >= 0 THEN 1 ELSE 0 END AS bucket
             FROM e)
       GROUP BY bucket""",
)
def v2(spark, sf):
    # sign-LSH bucketing (random-hyperplane family with axis-aligned planes —
    # deterministic, no rand()): ANN candidates come from the same bucket,
    # turning the n^2 search into per-bucket joins.
    e = load(spark, sf, "embeddings").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("emb")
    )
    bucket = (
        F.when(F.col("emb")[0] >= 0, 4).otherwise(0)
        + F.when(F.col("emb")[1] >= 0, 2).otherwise(0)
        + F.when(F.col("emb")[2] >= 0, 1).otherwise(0)
    )
    return (
        e.select("vec_id", bucket.alias("bucket"))
        .groupBy("bucket")
        .agg(F.count("*").alias("n_vecs"), F.min("vec_id").alias("min_vec"))
    )


# =========================================================================
# multimodal + vectorized-UDF surface (J2/J3 + task mandate)
# =========================================================================

@qt(
    "j2_blob_digest",
    """SELECT doc_id AS blob_id,
              CAST(strlen(text) AS BIGINT) AS n_bytes,
              sha256(text) AS digest
       FROM documents""",
)
def j2(spark, sf):
    # mapInPandas over binary media: digest/size computed scan-side; the
    # blob column never shuffles (multimodal.py)
    from pcd_spark.relational.multimodal import documents_as_blobs, extract_features

    blobs = documents_as_blobs(load(spark, sf, "documents"))
    return extract_features(blobs).select("blob_id", "n_bytes", "digest")


@qt("m2_blob_features", None)  # deterministic fake embed; array<float> output
def m2(spark, sf):
    from pcd_spark.relational.multimodal import documents_as_blobs, extract_features

    blobs = documents_as_blobs(load(spark, sf, "documents"))
    return extract_features(blobs).select("blob_id", "feat")


@qt(
    "m3_frame_sample",
    """SELECT blob_id, CAST(frame_no AS BIGINT) AS frame_no,
              CAST(frame_no * 1000 AS BIGINT) AS byte_offset
       FROM (SELECT doc_id AS blob_id,
                    UNNEST(range(0, GREATEST(CAST(strlen(text) / 1000 AS INT), 1)))
                      AS frame_no
             FROM documents)""",
)
def m3(spark, sf):
    from pcd_spark.relational.multimodal import documents_as_blobs, frame_sample

    blobs = documents_as_blobs(load(spark, sf, "documents"))
    return frame_sample(blobs, every_n=1000).select(
        "blob_id",
        F.col("frame_no").cast("long").alias("frame_no"),
        F.col("byte_offset").cast("long").alias("byte_offset"),
    )


@qt(
    "j3_scalar_pandas_udf",
    """SELECT event_id, ROUND(LN(1 + value) * 2, 6) AS scored
       FROM events WHERE value >= 0""",
)
def j3(spark, sf):
    # J3: Arrow-vectorized Series->Series UDF (the sanctioned Python path).
    # NB: defined via lambda because `from __future__ import annotations`
    # stringifies hints, which pandas_udf's type-hint inference rejects.
    import numpy as np
    from pyspark.sql.functions import pandas_udf

    score = pandas_udf(lambda v: np.round(np.log1p(v) * 2, 6), "double")

    e = load(spark, sf, "events").filter(F.col("value") >= 0)
    return e.select("event_id", score("value").alias("scored"))


@qt(
    "h9_map_functions",
    """SELECT event_id, 1 AS n_keys, ROUND(value, 4) AS got_val
       FROM events""",
)
def h9(spark, sf):
    e = load(spark, sf, "events")
    m = F.create_map(F.col("event_type"), F.round("value", 4))
    return e.select(
        "event_id",
        F.size(F.map_keys(m)).alias("n_keys"),
        F.element_at(m, F.col("event_type")).alias("got_val"),
    )


@qt("d5_approx_count_distinct", None)  # HLL sketch: engine-specific values
def d5(spark, sf):
    li = load(spark, sf, "lineitem")
    return li.agg(
        F.approx_count_distinct("l_partkey", 0.01).alias("approx_parts"),
        F.approx_count_distinct("l_orderkey", 0.01).alias("approx_orders"),
    )


# =========================================================================
# SimHash + embedding near-dup (dedup family, task mandate)
# =========================================================================

_SIMHASH_BITS = 48  # 12 hex chars of md5 -> fits BIGINT in both engines


def _simhash_sql() -> str:
    sums = ", ".join(
        f"SUM(CASE WHEN (hv >> {b}) & 1 = 1 THEN 1 ELSE -1 END) AS s{b}"
        for b in range(_SIMHASH_BITS)
    )
    assemble = " + ".join(
        f"CASE WHEN s{b} >= 0 THEN (CAST(1 AS BIGINT) << {b}) ELSE CAST(0 AS BIGINT) END"
        for b in range(_SIMHASH_BITS)
    )
    return f"""WITH toks AS (
         SELECT doc_id, UNNEST(regexp_extract_all(LOWER(text), '[a-z0-9]+')) AS tok
         FROM documents),
       h AS (SELECT doc_id,
                    CAST(concat('0x', SUBSTR(md5(tok), 1, 12)) AS BIGINT) AS hv
             FROM toks),
       s AS (SELECT doc_id, {sums} FROM h GROUP BY doc_id)
       SELECT doc_id, {assemble} AS simhash FROM s"""


@qt("x9_simhash", _simhash_sql())
def x9(spark, sf):
    # SimHash document fingerprint: token -> 48-bit md5 fragment; per bit,
    # majority vote over tokens (tie -> 1). One explode + one hash-groupBy
    # with 48 codegen'd SUMs — shuffle carries (doc_id, 48 longs), never the
    # text; near-dup candidates are then hamming-close fingerprints.
    # _spread: the explode + 48 partial SUMs all run in the scan stage, so a
    # single-row-group fixture file serializes the whole hash workload on
    # one core without it (no-op on multi-split data).
    d = _spread(load(spark, sf, "documents"))
    toks = d.select(
        "doc_id",
        F.explode(
            F.regexp_extract_all(F.lower("text"), F.lit("([a-z0-9]+)"), F.lit(1))
        ).alias("tok"),
    )
    h = toks.select(
        "doc_id",
        F.conv(F.substring(F.md5("tok"), 1, 12), 16, 10).cast("long").alias("hv"),
    )
    sums = h.groupBy("doc_id").agg(
        *[
            F.sum(
                F.when(F.shiftright(F.col("hv"), b).bitwiseAND(F.lit(1)) == 1, 1)
                .otherwise(-1)
            ).alias(f"s{b}")
            for b in range(_SIMHASH_BITS)
        ]
    )
    simhash = None
    for b in range(_SIMHASH_BITS):
        term = F.when(F.col(f"s{b}") >= 0, F.lit(1).cast("long") * (1 << b)).otherwise(
            F.lit(0).cast("long")
        )
        simhash = term if simhash is None else simhash + term
    return sums.select("doc_id", simhash.alias("simhash"))


@qt(
    "v3_embedding_neardup",
    """WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS emb FROM embeddings),
       b AS (SELECT vec_id, emb,
                    CASE WHEN emb[1] >= 0 THEN 8 ELSE 0 END
                    + CASE WHEN emb[2] >= 0 THEN 4 ELSE 0 END
                    + CASE WHEN emb[3] >= 0 THEN 2 ELSE 0 END
                    + CASE WHEN emb[4] >= 0 THEN 1 ELSE 0 END AS bucket
             FROM e),
       pairs AS (
         SELECT a.vec_id AS v1, c.vec_id AS v2,
                ROUND(list_dot_product(a.emb, c.emb)
                      / (SQRT(list_dot_product(a.emb, a.emb))
                         * SQRT(list_dot_product(c.emb, c.emb))), 6) AS cosine
         FROM b a JOIN b c ON a.bucket = c.bucket AND a.vec_id < c.vec_id)
       SELECT v1, v2, cosine FROM pairs WHERE cosine >= 0.35""",
)
def v3(spark, sf):
    # embedding-cosine near-dup, the scale path: sign-LSH bucket join (the
    # shuffle key is the bucket -> cost scales with bucket sizes, not n^2),
    # exact cosine verification inside each bucket. False negatives are the
    # LSH recall tradeoff; v1 is the exactness baseline.
    e = load(spark, sf, "embeddings").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("emb")
    )
    bucket = (
        F.when(F.col("emb")[0] >= 0, 8).otherwise(0)
        + F.when(F.col("emb")[1] >= 0, 4).otherwise(0)
        + F.when(F.col("emb")[2] >= 0, 2).otherwise(0)
        + F.when(F.col("emb")[3] >= 0, 1).otherwise(0)
    )
    b = e.select("vec_id", "emb", bucket.alias("bucket"))
    a = b.select(F.col("vec_id").alias("v1"), F.col("emb").alias("e1"), "bucket")
    c = b.select(F.col("vec_id").alias("v2"), F.col("emb").alias("e2"), "bucket")
    pairs = a.join(c, ["bucket"]).filter(F.col("v1") < F.col("v2"))
    cos = F.round(_cos(F.col("e1"), F.col("e2")), 6)
    return pairs.select("v1", "v2", cos.alias("cosine")).filter(
        F.col("cosine") >= 0.35
    )


_IVF_CELLS = 8


@qt(
    "v4_ivf_topk",
    f"""WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS emb FROM embeddings),
       cent AS (SELECT vec_id AS cid, emb AS cemb FROM e
                ORDER BY vec_id LIMIT {_IVF_CELLS}),
       asg AS (
         SELECT vec_id, emb, cid FROM (
           SELECT e.vec_id, e.emb, c.cid,
                  ROW_NUMBER() OVER (
                    PARTITION BY e.vec_id
                    ORDER BY ROUND(list_dot_product(e.emb, c.cemb)
                          / (SQRT(list_dot_product(e.emb, e.emb))
                             * SQRT(list_dot_product(c.cemb, c.cemb))), 6) DESC,
                      c.cid ASC) AS rn
           FROM e CROSS JOIN cent c) WHERE rn = 1),
       probes AS (SELECT vec_id AS probe_id, emb AS pemb, cid FROM asg
                  WHERE vec_id < 5),
       scored AS (
         SELECT p.probe_id, a.vec_id AS cand_id,
                ROUND(list_dot_product(p.pemb, a.emb)
                      / (SQRT(list_dot_product(p.pemb, p.pemb))
                         * SQRT(list_dot_product(a.emb, a.emb))), 6) AS cosine
         FROM probes p JOIN asg a ON p.cid = a.cid AND p.probe_id <> a.vec_id)
       SELECT probe_id, cand_id, cosine FROM (
         SELECT *, ROW_NUMBER() OVER (PARTITION BY probe_id
                                      ORDER BY cosine DESC, cand_id ASC) AS rn
         FROM scored) WHERE rn <= 3""",
)
def v4(spark, sf):
    # IVF (inverted-file) ANN: a deterministic coarse quantizer — the
    # _IVF_CELLS lowest-vec_id vectors are the centroids (no rand(); a
    # k-means refinement would keep the same plan shape) — assigns every
    # vector to its nearest cell via a BROADCAST cross join against the tiny
    # centroid table; search then probes only the query's own cell (nprobe=1),
    # so the candidate join keys on cell id and cost scales with cell sizes,
    # not n^2. This is the third ANN family next to sign-LSH (v2/v3):
    # IVF partitions by data geometry, LSH by random projections; recall
    # tradeoff vs the v1 exact baseline is the standard IVF one.
    e = load(spark, sf, "embeddings").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("emb")
    )
    cent = e.orderBy("vec_id").limit(_IVF_CELLS).select(
        F.col("vec_id").alias("cid"), F.col("emb").alias("cemb")
    )
    w_asg = Window.partitionBy("vec_id").orderBy(
        F.desc(F.round(_cos(F.col("emb"), F.col("cemb")), 6)), F.asc("cid")
    )
    asg = (
        e.crossJoin(F.broadcast(cent))
        .withColumn("rn", F.row_number().over(w_asg))
        .filter(F.col("rn") == 1)
        .select("vec_id", "emb", "cid")
    )
    probes = asg.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("probe_id"), F.col("emb").alias("pemb"), "cid"
    )
    scored = (
        F.broadcast(probes)
        .join(asg, "cid")
        .filter(F.col("probe_id") != F.col("vec_id"))
        .select(
            "probe_id",
            F.col("vec_id").alias("cand_id"),
            F.round(_cos(F.col("pemb"), F.col("emb")), 6).alias("cosine"),
        )
    )
    w = Window.partitionBy("probe_id").orderBy(F.desc("cosine"), F.asc("cand_id"))
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 3)
        .select("probe_id", "cand_id", "cosine")
    )


@qt("v5_kmeans_clusters", None)
def v5(spark, sf):
    # distributed Lloyd's k-means (pcd_spark.vector.kmeans): the LEARNED
    # counterpart of v4's fixed coarse quantizer — embedding clustering for
    # cluster-balanced sampling / domain discovery, and the trainer for a
    # real IVF index. Iterative (one Spark job per iteration, O(k*dim)
    # driver state), so no ANSI-SQL oracle: exactness is pinned against the
    # numpy Lloyd's oracle in tests/test_kmeans.py; the driver records the
    # rows-only check. Deterministic init = the k lowest-vec_id vectors.
    from pcd_spark.vector import kmeans

    e = load(spark, sf, "embeddings").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("emb")
    )
    asg = kmeans(e, k=8, vec_col="emb", id_col="vec_id", max_iter=5)
    sizes = asg.groupBy("cluster").agg(F.count("*").alias("n_members"))
    return asg.join(F.broadcast(sizes), "cluster").select(
        "vec_id", "cluster", "n_members"
    )


_X11_SQL = """
WITH d AS (SELECT doc_id, string_split(text, ' ') AS words
           FROM documents WHERE LENGTH(text) > 0),
arrm AS (
  SELECT doc_id, len(words) AS n_words,
    CASE WHEN len(words) >= 2 THEN ROUND(1.0
      - len(list_distinct(list_transform(generate_series(1, len(words)-1),
            i -> array_to_string(words[i:i+1], ' ')))) * 1.0 / (len(words)-1), 6)
      ELSE 0.0 END AS dup_2gram_frac,
    CASE WHEN len(words) >= 3 THEN ROUND(1.0
      - len(list_distinct(list_transform(generate_series(1, len(words)-2),
            i -> array_to_string(words[i:i+2], ' ')))) * 1.0 / (len(words)-2), 6)
      ELSE 0.0 END AS dup_3gram_frac
  FROM d),
topw AS (
  SELECT doc_id, ROUND(MAX(cnt) * 1.0 / SUM(cnt), 6) AS top_word_frac
  FROM (SELECT doc_id, w, COUNT(*) cnt FROM d, unnest(words) t(w)
        GROUP BY doc_id, w)
  GROUP BY doc_id)
SELECT arrm.doc_id, n_words, top_word_frac, dup_2gram_frac, dup_3gram_frac
FROM arrm JOIN topw USING (doc_id)
"""


def _wgrams(words, n: int):
    # word n-grams via 1-based slice over a guarded ascending sequence
    # (F.sequence(1, x) with x < 1 silently generates a DESCENDING range —
    # callers must pre-filter size(words) >= n)
    return F.transform(
        F.sequence(F.lit(1), F.size(words) - (n - 1)),
        lambda i: F.concat_ws(" ", F.slice(words, i, n)),
    )


@qt("x11_repetition_metrics", _X11_SQL)
def x11(spark, sf):
    # Gopher-style repetition quality signals [PUB: Rae et al. 2021,
    # "Scaling Language Models: ... Gopher", §A1.1]: fraction of duplicate
    # word n-grams + most-frequent-word share. The n-gram fractions are pure
    # per-row array expressions (codegen, zero shuffle); the top-word share
    # is the scalable explode->two-hash-agg shape — per-doc state never
    # exceeds the doc's distinct-word count, so a 100 TB corpus streams.
    d = _spread(
        load(spark, sf, "documents")
        .filter(F.length("text") > 0)
        .select("doc_id", F.split("text", " ").alias("words"))
    )
    w = F.col("words")

    def dup_frac(n: int):
        grams = _wgrams(w, n)
        total = F.size(w) - (n - 1)
        return F.when(
            F.size(w) >= n,
            F.round(
                1.0 - F.size(F.array_distinct(grams)).cast("double") / total, 6
            ),
        ).otherwise(F.lit(0.0))

    arrm = d.select(
        "doc_id",
        F.size(w).alias("n_words"),
        dup_frac(2).alias("dup_2gram_frac"),
        dup_frac(3).alias("dup_3gram_frac"),
    )
    topw = (
        d.select("doc_id", F.explode(w).alias("word"))
        .groupBy("doc_id", "word")
        .agg(F.count("*").alias("cnt"))
        .groupBy("doc_id")
        .agg(
            F.round(F.max("cnt").cast("double") / F.sum("cnt"), 6).alias(
                "top_word_frac"
            )
        )
    )
    return arrm.join(topw, "doc_id").select(
        "doc_id", "n_words", "top_word_frac", "dup_2gram_frac", "dup_3gram_frac"
    )


@qt(
    "x12_decontamination",
    """WITH d AS (SELECT doc_id, string_split(text, ' ') words FROM documents
                  WHERE len(string_split(text, ' ')) >= 3),
       grams AS (SELECT doc_id, array_to_string(words[i:i+2], ' ') g
                 FROM d, unnest(generate_series(1, len(words)-2)) t(i)),
       bench AS (SELECT DISTINCT g FROM grams WHERE doc_id % 50 = 0)
       SELECT doc_id, COUNT(DISTINCT g) AS hit_grams
       FROM grams JOIN bench USING (g) WHERE doc_id % 50 <> 0
       GROUP BY doc_id""",
)
def x12(spark, sf):
    # Benchmark decontamination: flag training docs sharing any word n-gram
    # with a held-out benchmark set (the standard n-gram-overlap test-set
    # leak check; n is a knob — 3 here because the synthetic vocabulary is
    # tiny, 8-13 on natural text). The benchmark slice is deterministic
    # (doc_id % 50). Scale shape: benchmark gram sets are SMALL by nature
    # (benchmarks are, even when the corpus is 100 TB) -> broadcast them and
    # the corpus side never shuffles; per-doc dedup of hit grams is one
    # hash-agg keyed by doc.
    d = (
        load(spark, sf, "documents")
        .select("doc_id", F.split("text", " ").alias("words"))
        .filter(F.size("words") >= 3)
    )
    grams = d.select("doc_id", F.explode(_wgrams(F.col("words"), 3)).alias("g"))
    bench = (
        grams.filter(F.col("doc_id") % 50 == 0).select("g").distinct()
    )
    return (
        grams.filter(F.col("doc_id") % 50 != 0)
        .join(F.broadcast(bench), "g")
        .groupBy("doc_id")
        .agg(F.countDistinct("g").alias("hit_grams"))
    )


_PII_EMAIL = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
_PII_ENTITY = r"\b(customer|supplier)\b"


@qt(
    "x13_pii_scrub",
    f"""SELECT doc_id,
         len(regexp_extract_all(text, '{_PII_EMAIL}')) AS n_emails,
         len(regexp_extract_all(text, '{_PII_ENTITY}')) AS n_entity_terms,
         sha256(regexp_replace(regexp_replace(text,
             '{_PII_EMAIL}', '<EMAIL>', 'g'),
             '{_PII_ENTITY}', '<ENT>', 'g')) AS scrubbed_sha
       FROM documents""",
)
def x13(spark, sf):
    # PII scrubbing pass: pattern redaction (email regex — the real-world
    # pattern, 0 hits on this synthetic corpus by construction) + term-list
    # redaction (entity words standing in for name lists, which DO hit).
    # Emitting sha256(scrubbed) instead of the scrubbed text keeps the
    # redaction result hash-verifiable without carrying the fat column
    # through the shuffle — same discipline as x1. All JVM regex, no Python.
    d = load(spark, sf, "documents")
    scrubbed = F.regexp_replace(
        F.regexp_replace("text", _PII_EMAIL, "<EMAIL>"), _PII_ENTITY, "<ENT>"
    )
    return d.select(
        "doc_id",
        F.size(F.regexp_extract_all("text", F.lit(_PII_EMAIL), F.lit(0))).alias(
            "n_emails"
        ),
        F.size(F.regexp_extract_all("text", F.lit(_PII_ENTITY), F.lit(0))).alias(
            "n_entity_terms"
        ),
        F.sha2(scrubbed, 256).alias("scrubbed_sha"),
    )


@qt(
    "x10_neardup_clusters",
    f"""WITH RECURSIVE
        sig AS (
          SELECT doc_id,
                 md5({_minhash_sql("s1")} || {_minhash_sql("s2")}) AS band_a,
                 md5({_minhash_sql("s3")} || {_minhash_sql("s4")}) AS band_b
          FROM documents WHERE LENGTH(text) >= 5),
        e1 AS (SELECT MIN(doc_id) OVER (PARTITION BY band_a) AS src,
                      doc_id AS dst FROM sig),
        e2 AS (SELECT MIN(doc_id) OVER (PARTITION BY band_b) AS src,
                      doc_id AS dst FROM sig),
        edges AS (SELECT src, dst FROM e1 WHERE src <> dst
                  UNION SELECT src, dst FROM e2 WHERE src <> dst),
        sym AS (SELECT src, dst FROM edges UNION SELECT dst, src FROM edges),
        reach(v, u) AS (
          SELECT doc_id, doc_id FROM sig
          UNION
          SELECT r.v, e.dst FROM reach r JOIN sym e ON e.src = r.u)
        SELECT v AS doc_id, MIN(u) AS cluster,
               (MIN(u) = v) AS is_canonical
        FROM reach GROUP BY v""",
)
def x10(spark, sf):
    # End-to-end near-dup DEDUP CLUSTERING — the production MinHash-LSH
    # pipeline shape (two bands of two minhashes -> transitive closure ->
    # canonical representative), composed from this engine's own pieces:
    # x2's signatures, x3's banding, and the K4 connected-components
    # superstep engine. Two design choices carry it to 10^12 docs:
    #   1. a doc in MULTIPLE bands makes same-bucket an OVERLAPPING
    #      relation, so clusters need transitive closure (CC), not a
    #      groupBy — this is why dedup needs the graph engine at all;
    #   2. buckets become STAR edges (bucket-min -> member), never member
    #      pair cliques: O(n * bands) edges total even when a degenerate
    #      bucket holds millions of docs, with identical components.
    # Cluster id = MIN doc_id in the closure (CC's exact semantics);
    # is_canonical marks the one doc per cluster a dedup pass would keep.
    clusters = neardup_cluster_assignments(
        load(spark, sf, "documents")
    )
    return clusters.select(
        "doc_id",
        "cluster",
        (F.col("cluster") == F.col("doc_id")).alias("is_canonical"),
    )


def neardup_cluster_assignments(d):
    """The x10/x14 SHARED pipeline stage: MinHash signatures (x2) -> LSH
    star edges (x3) -> K4 connected components -> (doc_id, cluster) for
    every doc with len(text) >= 5, cluster = MIN doc_id of the closure.
    Factored so a real pipeline (and bench.py) computes it ONCE and feeds
    both the cluster listing (x10) and the keep-best policy (x14) —
    recomputing signatures per consumer was the round-2 suite's biggest
    avoidable cost."""
    from pcd_spark.graph.cc import connected_components

    d = _spread(d.filter(F.length("text") >= 5))
    # eager localCheckpoint, not persist: the returned plan still references
    # sig, so an in-function persist could never be unpersisted — it leaked
    # cached blocks for the session lifetime (ADVICE r2). Checkpoint blocks
    # are freed by the ContextCleaner when the caller drops the result.
    sig = d.select(
        "doc_id",
        F.md5(F.concat(_minhash_col("s1"), _minhash_col("s2"))).alias("band_a"),
        F.md5(F.concat(_minhash_col("s3"), _minhash_col("s4"))).alias("band_b"),
    ).localCheckpoint(eager=True)
    star = []
    for band in ("band_a", "band_b"):
        bmin = sig.groupBy(band).agg(F.min("doc_id").alias("src"))
        star.append(
            sig.join(bmin, band)
            .filter(F.col("src") != F.col("doc_id"))
            .select("src", F.col("doc_id").alias("dst"))
        )
    edges = star[0].unionByName(star[1])
    # the star graph is O(n_docs) edges — far below session width; CC's
    # adaptive_num_parts default right-sizes the superstep shuffles to it
    cc = connected_components(edges)
    return sig.join(
        cc, sig["doc_id"] == cc["vid"], "left"
    ).select(
        "doc_id",
        F.coalesce("component", "doc_id").alias("cluster"),
    )


@qt(
    "x14_dedup_keep_best",
    f"""WITH RECURSIVE
        sig AS (
          SELECT doc_id,
                 md5({_minhash_sql("s1")} || {_minhash_sql("s2")}) AS band_a,
                 md5({_minhash_sql("s3")} || {_minhash_sql("s4")}) AS band_b
          FROM documents WHERE LENGTH(text) >= 5),
        e1 AS (SELECT MIN(doc_id) OVER (PARTITION BY band_a) AS src,
                      doc_id AS dst FROM sig),
        e2 AS (SELECT MIN(doc_id) OVER (PARTITION BY band_b) AS src,
                      doc_id AS dst FROM sig),
        edges AS (SELECT src, dst FROM e1 WHERE src <> dst
                  UNION SELECT src, dst FROM e2 WHERE src <> dst),
        sym AS (SELECT src, dst FROM edges UNION SELECT dst, src FROM edges),
        reach(v, u) AS (
          SELECT doc_id, doc_id FROM sig
          UNION
          SELECT r.v, e.dst FROM reach r JOIN sym e ON e.src = r.u),
        clus AS (SELECT v AS doc_id, MIN(u) AS cluster FROM reach GROUP BY v),
        alldocs AS (
          SELECT d.doc_id, COALESCE(c.cluster, d.doc_id) AS cluster, d.n_chars
          FROM documents d LEFT JOIN clus c ON d.doc_id = c.doc_id)
        SELECT cluster, keep_doc_id, n_members, chars_removed FROM (
          SELECT cluster, doc_id AS keep_doc_id,
                 ROW_NUMBER() OVER (PARTITION BY cluster
                                    ORDER BY n_chars DESC, doc_id) AS rn,
                 COUNT(*) OVER (PARTITION BY cluster) AS n_members,
                 CAST(SUM(n_chars) OVER (PARTITION BY cluster)
                   - MAX(n_chars) OVER (PARTITION BY cluster)
                      AS BIGINT) AS chars_removed
          FROM alldocs) WHERE rn = 1""",
)
def x14(spark, sf):
    # Dedup KEEP-BEST policy — the step after x10's clustering that a
    # training-data pipeline actually ships: per near-dup cluster, keep ONE
    # representative chosen by a quality key (here longest text, doc_id
    # tie-break — swap in x6's quality score for a learned policy) and
    # account for what was dropped. Plan shape: the x10 cluster assignment
    # (LSH star edges -> K4 connected components, O(n·bands) edges) followed
    # by ONE hash-agg keyed on cluster using the deterministic-argmax
    # min(struct) idiom (D6) — no sort-window over the corpus, so the
    # reduction stays map-side-combinable at 10^12 docs. chars_removed uses
    # MAX(n_chars): the kept doc IS the longest by the quality key, so the
    # subtraction never needs a second pass or a self-join.
    d = load(spark, sf, "documents").select("doc_id", "text", "n_chars")
    return dedup_keep_best(d, neardup_cluster_assignments(d))


def dedup_keep_best(d, clusters):
    """x14's policy stage over a precomputed (doc_id, cluster) assignment
    (see neardup_cluster_assignments): per cluster, one hash-agg argmax on
    the quality key. Separated so the expensive clustering stage is
    computed once per pipeline run, not once per consumer."""
    # O(n_docs) rows on both sides — join strategy is the planner/AQE's
    # call (broadcast at test scale, shuffle join at corpus scale)
    clustered = d.join(clusters, "doc_id", "left").select(
        "doc_id",
        F.coalesce("cluster", "doc_id").alias("cluster"),
        "n_chars",
    )
    best = F.min(F.struct((-F.col("n_chars")).alias("nk"), F.col("doc_id")))
    return clustered.groupBy("cluster").agg(
        best.getField("doc_id").alias("keep_doc_id"),
        F.count("*").alias("n_members"),
        (F.sum("n_chars") - F.max("n_chars")).alias("chars_removed"),
    )


@qt(
    "x15_split_assignment",
    """SELECT doc_id,
              CASE WHEN substring(md5(CAST(doc_id AS VARCHAR)), 1, 2) < 'e6'
                     THEN 'train'
                   WHEN substring(md5(CAST(doc_id AS VARCHAR)), 1, 2) < 'f3'
                     THEN 'val'
                   ELSE 'test' END AS split
       FROM documents""",
)
def x15(spark, sf):
    # Deterministic train/val/test SPLIT ASSIGNMENT — the step every
    # training-data pipeline needs between curation and tokenization. The
    # split key is the md5 of the stable doc id, split by hex-prefix
    # thresholds ('e6' = 230/256 ~ 0.9, 'f3' = 243/256 ~ 0.95): pure string
    # comparison, so the SAME assignment is reproducible in any engine
    # (Spark here, DuckDB oracle, a downstream tokenizer in Ray) without
    # sharing code — the property that matters when the split must never
    # drift across reprocessing runs at 10^12 docs. Stateless per-row
    # expression: no shuffle, no Python, scales embarrassingly.
    d = load(spark, sf, "documents")
    h2 = F.substring(F.md5(F.col("doc_id").cast("string")), 1, 2)
    return d.select(
        "doc_id",
        F.when(h2 < "e6", "train")
        .when(h2 < "f3", "val")
        .otherwise("test")
        .alias("split"),
    )


_X16_SQL = """
WITH d AS (SELECT doc_id, string_split(text, ' ') AS words
           FROM documents WHERE len(string_split(text, ' ')) >= 8),
ch AS (SELECT doc_id,
              md5(array_to_string(
                list_slice(words, (i - 1) * 8 + 1, (i - 1) * 8 + 8), ' '))
                AS chunk_md5
       FROM d, UNNEST(generate_series(
                 1, CAST(FLOOR(len(words) / 8.0) AS BIGINT))) t(i)),
occ AS (SELECT chunk_md5, COUNT(DISTINCT doc_id) AS nd
        FROM ch GROUP BY chunk_md5)
SELECT doc_id,
       COUNT(*) AS n_chunks,
       CAST(SUM(CASE WHEN nd > 1 THEN 1 ELSE 0 END) AS BIGINT)
         AS n_shared_chunks,
       ROUND(SUM(CASE WHEN nd > 1 THEN 1 ELSE 0 END) * 1.0 / COUNT(*), 6)
         AS shared_frac
FROM ch JOIN occ USING (chunk_md5)
GROUP BY doc_id
"""


@qt("x16_cross_doc_chunks", _X16_SQL)
def x16(spark, sf):
    # CROSS-document chunk dedup signal [PUB: Penedo et al. 2023 RefinedWeb
    # line-level dedup; Lee et al. 2022 "Deduplicating Training Data ..."]:
    # split each doc into disjoint 8-word chunks, hash them, and report per
    # doc what fraction of its chunks also occur in ANOTHER doc — the
    # partial-overlap signal that whole-doc dedup (x1) misses and within-doc
    # repetition (x11) does not look for; a pipeline drops or trims docs
    # above a shared_frac threshold. Scale shape: only (chunk_md5, doc_id)
    # pairs ever shuffle — the digest is computed scan-side and the text
    # never leaves its partition; chunk frequency is a hash-agg with
    # map-side combine, so a 100 TB corpus streams through. Disjoint
    # (stride = width) chunks keep the blow-up factor at 1x the corpus,
    # where sliding shingles would be 8x.
    CH = 8
    d = _spread(
        load(spark, sf, "documents")
        .select("doc_id", F.split("text", " ").alias("words"))
        .filter(F.size("words") >= CH)
    )
    n_chunks = F.floor(F.size("words") / CH).cast("int")
    chunks = d.select(
        "doc_id",
        F.explode(
            F.transform(
                F.sequence(F.lit(1), n_chunks),
                lambda i: F.md5(
                    F.concat_ws(" ", F.slice("words", (i - 1) * CH + 1, CH))
                ),
            )
        ).alias("chunk_md5"),
    )
    occ = chunks.groupBy("chunk_md5").agg(
        F.countDistinct("doc_id").alias("nd")
    )
    shared = (F.col("nd") > 1).cast("long")
    return (
        chunks.join(occ, "chunk_md5")
        .groupBy("doc_id")
        .agg(
            F.count("*").alias("n_chunks"),
            F.sum(shared).alias("n_shared_chunks"),
            F.round(F.sum(shared) / F.count("*"), 6).alias("shared_frac"),
        )
    )


_X17_SQL = """
WITH d AS (
  SELECT doc_id,
         len(string_split(text, ' ')) AS n_tokens,
         substring(md5(CAST(doc_id AS VARCHAR)), 1, 1) AS bucket,
         md5(CAST(doc_id AS VARCHAR)) AS ord
  FROM documents WHERE LENGTH(text) > 0),
c AS (
  SELECT doc_id, bucket, n_tokens,
         COALESCE(SUM(n_tokens) OVER (
           PARTITION BY bucket ORDER BY ord, doc_id
           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS start_tok
  FROM d)
SELECT doc_id, bucket, n_tokens,
       CAST(start_tok AS BIGINT) AS start_tok,
       CAST(FLOOR(start_tok / 256.0) AS BIGINT) AS first_chunk,
       CAST(FLOOR((start_tok + n_tokens - 1) / 256.0) AS BIGINT) AS last_chunk
FROM c
"""


@qt("x17_sequence_packing", _X17_SQL)
def x17(spark, sf):
    # SEQUENCE PACKING, concat-and-chunk — the step between curation and
    # the trainer: documents are concatenated in a deterministic shuffled
    # order and sliced into fixed 256-token context chunks; each doc's
    # output row says which chunks it lands in (a doc may straddle a chunk
    # boundary — that IS the standard pretraining packing; padding-free
    # "first-fit" variants trade this simplicity for fragmentation
    # bookkeeping). Two design choices carry it to 10^12 docs:
    #   1. the pack ORDER is md5(doc_id) — a deterministic shuffle that
    #      decorrelates adjacent source docs, reproducible in any engine
    #      (same x15 portability argument), no RNG state;
    #   2. packing streams are per-BUCKET (md5 first hex char, 16 streams):
    #      the cumulative sum windows over each bucket independently, so
    #      there is no global sort and no sequential scan — buckets are the
    #      unit of parallelism, and widening to 256/4096 buckets is a
    #      substring change.
    from pyspark.sql import Window

    d = (
        load(spark, sf, "documents")
        .filter(F.length("text") > 0)
        .select(
            "doc_id",
            F.size(F.split("text", " ")).alias("n_tokens"),
            F.substring(F.md5(F.col("doc_id").cast("string")), 1, 1).alias(
                "bucket"
            ),
            F.md5(F.col("doc_id").cast("string")).alias("ord"),
        )
    )
    w = (
        Window.partitionBy("bucket")
        .orderBy("ord", "doc_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    start = F.coalesce(F.sum("n_tokens").over(w), F.lit(0))
    c = d.select("doc_id", "bucket", "n_tokens", start.alias("start_tok"))
    return c.select(
        "doc_id",
        "bucket",
        "n_tokens",
        F.col("start_tok").cast("long").alias("start_tok"),
        F.floor(F.col("start_tok") / 256).cast("long").alias("first_chunk"),
        F.floor((F.col("start_tok") + F.col("n_tokens") - 1) / 256)
        .cast("long")
        .alias("last_chunk"),
    )


_X18_SQL = """
SELECT doc_id, tier,
       CASE WHEN tier = 'high' THEN TRUE
            WHEN tier = 'mid'
              THEN substring(md5('ds1-' || CAST(doc_id AS VARCHAR)), 1, 2) < '80'
            ELSE substring(md5('ds1-' || CAST(doc_id AS VARCHAR)), 1, 2) < '1a'
       END AS kept
FROM (SELECT doc_id,
             CASE WHEN n_chars >= 150 THEN 'high'
                  WHEN n_chars >= 80 THEN 'mid'
                  ELSE 'low' END AS tier
      FROM documents)
"""


@qt("x18_quality_downsample", _X18_SQL)
def x18(spark, sf):
    # QUALITY-TIERED DOWNSAMPLING — the curation step that reshapes a
    # corpus's quality mix without an RNG [PUB: the standard practice behind
    # quality-pareto data mixes, e.g. Penedo et al. 2023; Xie et al. 2023
    # DSIR resamples by importance weights the same way]: bucket docs into
    # quality tiers (pinned here by length band — swap in x6's score in
    # production) and keep a tier-specific fraction decided by an md5
    # hex-prefix threshold, exactly k/256 per tier ('80' = 128/256 = 1/2,
    # '1a' = 26/256 ~ 0.102). Same engine-portability argument as x15: the
    # keep/drop decision is a pure string function of the doc id (salted so
    # it is independent of x15's split assignment), so ANY engine
    # reproduces it bit-for-bit — no RNG state, no shuffle, stateless
    # per-row; 10^12 docs stream.
    d = load(spark, sf, "documents")
    tier = (
        F.when(F.col("n_chars") >= 150, "high")
        .when(F.col("n_chars") >= 80, "mid")
        .otherwise("low")
    )
    h2 = F.substring(
        F.md5(F.concat(F.lit("ds1-"), F.col("doc_id").cast("string"))), 1, 2
    )
    return d.select(
        "doc_id",
        tier.alias("tier"),
        F.when(tier == "high", F.lit(True))
        .when(tier == "mid", h2 < "80")
        .otherwise(h2 < "1a")
        .alias("kept"),
    )


@qt("v6_pq_topk", None)  # learned quantizer (iterative k-means); numpy-pinned
def v6(spark, sf):
    # V6: product-quantized ADC top-k — the memory side of the production
    # IVF-PQ stack (v4 prunes WHICH candidates are scored, PQ compresses
    # HOW: 64 doubles become m=8 codes, the shrink that fits 10^12-vector
    # indexes in cluster RAM). Codebooks are m independent V5 k-means
    # runs (deterministic init); scoring ships only the kilobyte LUT
    # tensor and streams the codes column. Rows-only driver check (the
    # quantizer is iterative); the numpy mirror + cluster-recall pins live
    # in tests/test_pq.py. On these near-uniform synthetic embeddings
    # id-level recall is data-limited (all distances concentrate) — the
    # documented reason quality is pinned on clustered fixtures instead.
    from pcd_spark.vector import pq_topk, train_pq

    e = load(spark, sf, "embeddings").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("emb")
    )
    books = train_pq(e, m=8, k=16, max_iter=4)
    probes = [
        (r["vec_id"], r["emb"])
        for r in e.filter(F.col("vec_id") < 5).collect()
    ]
    return pq_topk(e, probes, books, topk=3).orderBy(
        "probe_id", "approx_dist", "cand_id"
    )


@qt("v7_ivfpq_topk", None)  # learned coarse+fine quantizers; numpy/cluster-pinned
def v7(spark, sf):
    # V7: the COMPOSED production ANN stack — IVF cells prune which
    # candidates are scored (v4's role, here with learned V5 cells),
    # PQ codes over the residuals x - centroid compress how (v6's role,
    # the Jégou IVFADC construction). nprobe=2 cells per query; residual
    # encoding is what gives within-cell discrimination (raw-vector PQ
    # ties same-cell codes). Rows-only driver check; mechanics and
    # cluster/id-level recall pinned in tests/test_pq.py.
    from pcd_spark.vector import ivfpq_topk

    e = load(spark, sf, "embeddings").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("emb")
    )
    probes = [
        (r["vec_id"], r["emb"])
        for r in e.filter(F.col("vec_id") < 5).collect()
    ]
    return ivfpq_topk(
        e, probes, ncells=8, m=8, k=16, nprobe=2, topk=3, max_iter=4
    ).orderBy("probe_id", "approx_dist", "cand_id")


_X19_SQL = """
SELECT source,
       COUNT(*) AS n_docs,
       CAST(SUM(CASE WHEN n_chars BETWEEN 50 AND 5000 THEN 1 ELSE 0 END)
            AS BIGINT) AS n_len_ok,
       ROUND(AVG(n_chars), 4) AS mean_chars,
       COUNT(DISTINCT lang) AS n_langs,
       ROUND(CAST(COUNT(DISTINCT md5(text)) AS DOUBLE) / COUNT(*), 6)
         AS uniq_ratio,
       CASE WHEN CAST(COUNT(DISTINCT md5(text)) AS DOUBLE) / COUNT(*) >= 0.8
             AND CAST(SUM(CASE WHEN n_chars BETWEEN 50 AND 5000
                               THEN 1 ELSE 0 END) AS DOUBLE)
                 / COUNT(*) >= 0.5
            THEN TRUE ELSE FALSE END AS keep_source
FROM documents GROUP BY source
"""


@qt("x19_source_quality_gate", _X19_SQL)
def x19(spark, sf):
    # X19 (round 3): SOURCE-LEVEL QUALITY GATING — the curation step web
    # pipelines run ABOVE the per-doc filters: aggregate per source/domain
    # (doc count, length-band pass rate, exact-dup rate via content digest,
    # language spread) and keep or drop the WHOLE source [PUB: the
    # domain-level filters of RefinedWeb (Penedo et al. 2023) and Gopher
    # (Rae et al. 2021) work at this granularity]. Plan shape: digests are
    # computed scan-side, the only shuffle keys are (source, md5) for the
    # two-phase distinct and source for the main agg — map-side combinable,
    # text never shuffles, no windows. A 10^12-doc corpus with 10^7 sources
    # reduces to 10^7 rows.
    d = load(spark, sf, "documents")
    len_ok = F.when(F.col("n_chars").between(50, 5000), 1).otherwise(0)
    agg = d.groupBy("source").agg(
        F.count("*").alias("n_docs"),
        F.sum(len_ok).alias("n_len_ok"),
        F.round(F.avg("n_chars"), 4).alias("mean_chars"),
        F.countDistinct("lang").alias("n_langs"),
        F.countDistinct(F.md5("text")).alias("n_uniq"),
    )
    uniq_ratio = F.col("n_uniq").cast("double") / F.col("n_docs")
    return agg.select(
        "source",
        "n_docs",
        "n_len_ok",
        "mean_chars",
        "n_langs",
        F.round(uniq_ratio, 6).alias("uniq_ratio"),
        (
            (uniq_ratio >= 0.8)
            & (F.col("n_len_ok").cast("double") / F.col("n_docs") >= 0.5)
        ).alias("keep_source"),
    )


_X20_SQL = """
WITH d AS (SELECT doc_id, source, string_split(text, ' ') AS words
           FROM documents WHERE len(string_split(text, ' ')) >= 5),
g AS (SELECT doc_id, source,
             array_to_string(list_slice(words, i, i + 4), ' ') AS gram
      FROM d, UNNEST(generate_series(1, len(words) - 4)) t(i)),
boiler AS (SELECT source, gram
           FROM (SELECT DISTINCT source, gram, doc_id FROM g)
           GROUP BY source, gram HAVING COUNT(*) >= 3)
SELECT g.doc_id,
       COUNT(*) AS n_grams,
       CAST(SUM(CASE WHEN b.gram IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT)
         AS n_boiler_grams,
       ROUND(CAST(SUM(CASE WHEN b.gram IS NOT NULL THEN 1 ELSE 0 END)
                  AS DOUBLE) / COUNT(*), 6) AS boilerplate_frac
FROM g LEFT JOIN boiler b ON g.source = b.source AND g.gram = b.gram
GROUP BY g.doc_id
"""


@qt("x20_boilerplate_grams", _X20_SQL)
def x20(spark, sf):
    # X20 (round 3): FREQUENCY-BASED BOILERPLATE DETECTION — the CCNet /
    # RefinedWeb cleaning signal [PUB: Wenzek et al. 2020 dedupe repeated
    # paragraphs by frequency; here the unit is the sliding 5-word gram
    # keyed BY SOURCE, since boilerplate (headers, footers, nav text)
    # repeats within a site]: a gram seen in >= 3 distinct docs of the same
    # source is boilerplate; each doc reports what fraction of its grams
    # are. Plan shape: one explode (5x row blow-up, fixed factor), a
    # two-phase distinct-count keyed (source, gram) — never all-pairs —
    # and one equi-join back on the same key; AQE handles the skewed
    # head grams. DuckDB mirrors it exactly (md5-free: the gram strings
    # themselves are the keys in both engines).
    d = _spread(
        load(spark, sf, "documents")
        .select("doc_id", "source", F.split("text", " ").alias("words"))
        .filter(F.size("words") >= 5)
    )
    g = d.select(
        "doc_id",
        "source",
        F.explode(
            F.transform(
                F.sequence(F.lit(1), F.size("words") - 4),
                lambda i: F.concat_ws(" ", F.slice("words", i, 5)),
            )
        ).alias("gram"),
    ).localCheckpoint(eager=True)  # reused by the count and the join-back
    boiler = (
        g.select("source", "gram", "doc_id")
        .distinct()
        .groupBy("source", "gram")
        .agg(F.count("*").alias("nd"))
        .filter(F.col("nd") >= 3)
        .select("source", "gram", F.lit(True).alias("is_boiler"))
    )
    per_doc = g.join(boiler, ["source", "gram"], "left").groupBy("doc_id").agg(
        F.count("*").alias("n_grams"),
        F.sum(F.when(F.col("is_boiler"), 1).otherwise(0)).alias(
            "n_boiler_grams"
        ),
    )
    return per_doc.select(
        "doc_id",
        "n_grams",
        "n_boiler_grams",
        F.round(
            F.col("n_boiler_grams").cast("double") / F.col("n_grams"), 6
        ).alias("boilerplate_frac"),
    )


@qt(
    "x21_word_entropy",
    """WITH toks AS (SELECT doc_id, unnest(string_split(text, ' ')) AS w
                     FROM documents WHERE length(text) > 0),
       cnt AS (SELECT doc_id, w, CAST(COUNT(*) AS DOUBLE) AS c
               FROM toks WHERE w <> '' GROUP BY 1, 2),
       tot AS (SELECT doc_id, SUM(c) AS n, COUNT(*) AS k FROM cnt GROUP BY 1)
       SELECT c.doc_id,
              CAST(t.n AS BIGINT) AS n_words,
              CAST(t.k AS BIGINT) AS n_types,
              ROUND(-SUM((c.c / t.n) * LOG2(c.c / t.n)), 6) AS word_entropy,
              ROUND(t.k / t.n, 6) AS ttr
       FROM cnt c JOIN tot t USING (doc_id)
       GROUP BY c.doc_id, t.n, t.k""",
)
def x21(spark, sf):
    """X21: word-distribution quality signals — unigram word entropy and
    type-token ratio per document. Low-entropy / low-TTR documents are
    keyboard-mash, SEO keyword stuffing, and template spam; both are
    standard pretraining-quality features alongside X6/X11 [PUB: Rae et
    al. 2021 (Gopher) quality heuristics].

    Spark shape: a per-doc histogram is awkward for builtins (no
    reduce-by-key inside an array) and ruinous as an explode+groupBy at
    100 TB — (doc_id, word) would shuffle the whole tokenized corpus. One
    Arrow-batched pandas UDF computes all four stats scan-side per row:
    zero shuffle, text never leaves the scan stage. The DuckDB oracle IS
    the explode+groupBy form — affordable at sf0.01, and its agreement
    proves the UDF semantics."""
    import numpy as np
    import pandas as pd
    from pyspark.sql.functions import pandas_udf

    # no type hints: `from __future__ import annotations` stringifies them,
    # which pandas_udf's hint inference rejects (same note as j3) — the
    # annotation-free form takes the legacy SCALAR path, Series -> DataFrame
    def _stats(texts):
        out = {"n_words": [], "n_types": [], "word_entropy": [], "ttr": []}
        for s in texts:
            toks = [t for t in (s or "").split(" ") if t]
            n = len(toks)
            if n == 0:
                out["n_words"].append(0)
                out["n_types"].append(0)
                out["word_entropy"].append(0.0)
                out["ttr"].append(0.0)
                continue
            _, counts = np.unique(np.asarray(toks, dtype=object),
                                  return_counts=True)
            p = counts / n
            out["n_words"].append(n)
            out["n_types"].append(len(counts))
            out["word_entropy"].append(round(float(-(p * np.log2(p)).sum()), 6))
            out["ttr"].append(round(len(counts) / n, 6))
        return pd.DataFrame(out)

    stats = pandas_udf(
        _stats,
        "struct<n_words:long, n_types:long, word_entropy:double, ttr:double>",
    )
    d = load(spark, sf, "documents").filter(F.length("text") > 0)
    return d.select("doc_id", stats("text").alias("s")).select(
        "doc_id", "s.n_words", "s.n_types", "s.word_entropy", "s.ttr"
    )


@qt(
    "x22_containment_pairs",
    """WITH sh AS (
         SELECT doc_id,
                list_distinct(list_transform(range(1, LENGTH(text) - 3),
                                             i -> SUBSTR(text, i, 4))) AS grams
         FROM documents WHERE n_chars BETWEEN 100 AND 200
       )
       SELECT a.doc_id AS container, b.doc_id AS contained,
              ROUND(CAST(LEN(list_intersect(a.grams, b.grams)) AS DOUBLE)
                    / LEN(b.grams), 4) AS containment
       FROM sh a JOIN sh b ON a.doc_id <> b.doc_id
       WHERE CAST(LEN(list_intersect(a.grams, b.grams)) AS DOUBLE)
             / LEN(b.grams) > 0.5""",
)
def x22(spark, sf):
    """X22: asymmetric shingle CONTAINMENT — c(b in a) = |grams(a) n
    grams(b)| / |grams(b)|. Jaccard (x4) is symmetric and misses subset
    reuse: a long page quoting a short doc verbatim has low Jaccard (union
    is dominated by the long side) but containment ~1.0 — the quote/
    boilerplate-reuse signal a dedup pipeline needs BESIDE near-dup pairs
    [PUB: Broder 1997 resemblance vs containment; Shrivastava & Li 2015
    asymmetric minwise hashing].

    Spark shape: the same inverted-index set-similarity join as x4 (postings
    equi-join counts the intersection; never an all-pairs theta join), with
    d1 != d2 kept DIRECTED so each ordered pair scores against the contained
    side's gram count. Same 100-TB story as x4: cost = sum over grams of
    freq^2, prefix filtering is the known refinement, x3/v3 the approximate
    scale paths."""
    d = _spread(
        load(spark, sf, "documents").filter(F.col("n_chars").between(100, 200))
    )
    sh = d.select(
        "doc_id",
        F.array_distinct(
            F.transform(
                F.sequence(F.lit(1), F.length("text") - 4),
                lambda i: F.expr("text").substr(i, F.lit(4)),
            )
        ).alias("grams"),
    ).localCheckpoint(eager=True)  # GC-scoped, not a session-lifetime persist
    sizes = sh.select("doc_id", F.size("grams").alias("sz"))
    post = sh.select("doc_id", F.explode("grams").alias("gram"))
    inter_df = (
        post.select(F.col("doc_id").alias("container"), "gram")
        .join(post.select(F.col("doc_id").alias("contained"), "gram"), "gram")
        .filter(F.col("container") != F.col("contained"))
        .groupBy("container", "contained")
        .agg(F.count("*").alias("inter"))
    )
    cont = F.col("inter").cast("double") / F.col("sz")
    return (
        inter_df.join(
            sizes.select(F.col("doc_id").alias("contained"), "sz"), "contained"
        )
        .select(
            "container", "contained", F.round(cont, 4).alias("containment")
        )
        .filter(cont > 0.5)
    )


_X23_SQL = """
WITH toks AS (SELECT doc_id, unnest(string_split(text, ' ')) AS term
              FROM documents),
  tf AS (SELECT doc_id, term, COUNT(*) AS tf
         FROM toks WHERE term <> '' GROUP BY 1, 2),
  nd AS (SELECT COUNT(*) AS n_docs FROM documents),
  idf AS (SELECT term, COUNT(*) AS df FROM tf GROUP BY 1)
SELECT doc_id, term, tf, tfidf, CAST(rnk AS INT) AS rnk FROM (
  SELECT t.doc_id, t.term, t.tf,
         ROUND(t.tf * LN((nd.n_docs + 1.0) / (i.df + 1.0)), 6) AS tfidf,
         ROW_NUMBER() OVER (
           PARTITION BY t.doc_id
           ORDER BY ROUND(t.tf * LN((nd.n_docs + 1.0) / (i.df + 1.0)), 6)
                    DESC, t.term ASC) AS rnk
  FROM tf t JOIN idf i USING (term) CROSS JOIN nd)
WHERE rnk <= 3
"""


@qt("x23_tfidf_topk", _X23_SQL)
def x23(spark, sf):
    """X23: TF-IDF top-3 terms per document — the classic keyword /
    topical-signature extractor [PUB: Sparck Jones 1972; the smoothed
    idf = ln((N+1)/(df+1)) form is scikit-learn's]. Downstream uses:
    topic routing, per-source vocabulary drift, near-dup triage.

    Spark shape for 100 TB: the only corpus-sized shuffle carries
    (doc_id, term, tf) triples — term counts hash-aggregate with map-side
    combine so the exploded token stream never crosses the wire raw. The
    document-frequency table is vocabulary-sized (tiny vs corpus) and
    rejoins on an equi-key; the final top-3 is a per-doc window over <=
    |vocab per doc| rows. N is one O(1) scalar. Rank key is the ROUNDED
    score on BOTH engines so mathematically-equal-but-differently-computed
    ln() values (1-ulp libm skew) cannot flip the cross-engine order;
    the deterministic tiebreak is term ASC."""
    d = load(spark, sf, "documents")
    n_docs = d.count()  # one scalar job, O(1) driver state
    toks = _spread(d.select("doc_id", F.explode(F.split("text", " ")).alias("term")))
    tf = (
        toks.filter(F.col("term") != "")
        .groupBy("doc_id", "term")
        .agg(F.count("*").alias("tf"))
        .localCheckpoint(eager=True)  # reused: df count + score join
    )
    idf = tf.groupBy("term").agg(F.count("*").alias("df"))
    score = F.round(
        F.col("tf")
        * F.log((F.lit(n_docs) + F.lit(1.0)) / (F.col("df") + F.lit(1.0))),
        6,
    )
    scored = tf.join(idf, "term").select(
        "doc_id", "term", "tf", score.alias("tfidf")
    )
    w = Window.partitionBy("doc_id").orderBy(
        F.desc("tfidf"), F.asc("term")
    )
    return scored.withColumn(
        "rnk", F.row_number().over(w)
    ).filter(F.col("rnk") <= 3)


@qt(
    "v8_cosine_range",
    """WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS emb
                  FROM embeddings),
       probes AS (SELECT * FROM e WHERE vec_id < 5)
       SELECT probe_id, cand_id, cosine FROM (
         SELECT p.vec_id AS probe_id, c.vec_id AS cand_id,
                ROUND(list_dot_product(p.emb, c.emb)
                      / (SQRT(list_dot_product(p.emb, p.emb))
                         * SQRT(list_dot_product(c.emb, c.emb))), 6) AS cosine
         FROM probes p JOIN e c ON p.vec_id <> c.vec_id)
       WHERE cosine >= 0.25""",
)
def v8(spark, sf):
    """V8: cosine RANGE search — all candidates within a similarity ball
    (cosine ≥ τ) of each probe, the retrieval mode dedup-by-similarity and
    recall-evaluation use when the answer set size is unknown (top-k's
    fixed k under/over-fetches; Weber et al. 1998 call this ε-range
    search). Same broadcast-probes / stream-the-big-side shape as v1: the
    corpus never shuffles, the filter runs scan-side, and output is
    O(matches), not O(n·probes). Threshold compares the ROUNDED score on
    both engines so a boundary pair cannot flip on 1-ulp fold-order skew
    (v1/v3's proven discipline)."""
    e = load(spark, sf, "embeddings").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("emb")
    )
    probes = e.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("probe_id"), F.col("emb").alias("pemb")
    )
    cand = e.select(F.col("vec_id").alias("cand_id"), F.col("emb").alias("cemb"))
    return (
        F.broadcast(probes)
        .join(cand, F.col("probe_id") != F.col("cand_id"))
        .select(
            "probe_id",
            "cand_id",
            F.round(_cos(F.col("pemb"), F.col("cemb")), 6).alias("cosine"),
        )
        .filter(F.col("cosine") >= 0.25)
    )


_EMB_DIM = 64  # embeddings.parquet vector width (TESTDATA.md)
_SQ8_LEVELS = 256  # 8-bit codes


@qt(
    "v9_sq8_topk",
    """WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS emb FROM embeddings),
       dims AS (SELECT unnest(emb) AS v, generate_subscripts(emb, 1) AS i FROM e),
       stat AS (SELECT list(mn ORDER BY i) AS mins, list(mx ORDER BY i) AS maxs
                FROM (SELECT i, MIN(v) AS mn, MAX(v) AS mx FROM dims GROUP BY i)),
       enc AS (SELECT vec_id,
                      list_transform(emb, (x, i) ->
                        LEAST(255, CAST(FLOOR((x - mins[i]) / (maxs[i] - mins[i])
                                              * 256.0) AS BIGINT))) AS codes
               FROM e CROSS JOIN stat),
       rec AS (SELECT vec_id,
                      list_transform(codes, (c, i) ->
                        mins[i] + (CAST(c AS DOUBLE) + 0.5)
                                  * (maxs[i] - mins[i]) / 256.0) AS remb
               FROM enc CROSS JOIN stat),
       probes AS (SELECT vec_id AS probe_id, emb AS pemb FROM e WHERE vec_id < 5),
       scored AS (
         SELECT p.probe_id, r.vec_id AS cand_id,
                ROUND(list_dot_product(p.pemb, r.remb)
                      / (SQRT(list_dot_product(p.pemb, p.pemb))
                         * SQRT(list_dot_product(r.remb, r.remb))), 6) AS cosine_sq8
         FROM probes p JOIN rec r ON p.probe_id <> r.vec_id)
       SELECT probe_id, cand_id, cosine_sq8 FROM (
         SELECT *, ROW_NUMBER() OVER (PARTITION BY probe_id
                                      ORDER BY cosine_sq8 DESC, cand_id ASC) AS rn
         FROM scored) WHERE rn <= 3""",
)
def v9(spark, sf):
    """V9: int8 scalar quantization (SQ8) top-k — the last member of the
    faiss-style index family next to brute force (v1), sign-LSH (v2/v3),
    IVF (v4), k-means (v5), PQ/ADC (v6) and IVF-PQ (v7). Per-dimension
    min/max learned in ONE global hash agg; each float64 vector is encoded
    to 64 one-byte codes (8x smaller on the wire and in cache than the
    double form, 4x smaller than float32 — at 100 TB the candidate table
    a search streams is cut by that factor); search is asymmetric: the raw
    float probe scores against midpoint-reconstructed candidates
    (r_i = min_i + (code_i + 0.5) * span_i / 256).

    Determinism/oracle discipline: the stats row is collected to the
    driver (O(dim) scalars — the k-means-centroid rule) and attached as
    literal arrays; min/max are exact (no float summation), the
    encode/decode expression trees are written with IDENTICAL association
    order in the Spark and DuckDB forms so IEEE double arithmetic is
    bit-equal, and the cosine is rounded to 6 dp before the top-k window
    (v1/v3's fold-order rule). Codes use floor((x-min)/span*256) clamped
    to 255 so x=max cannot overflow the byte range. Plan shape is v8's:
    probes BROADCAST (BuildLeft), candidates stream scan-side through one
    narrow projection, top-k via a probe-partitioned window."""
    e = load(spark, sf, "embeddings").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("emb")
    )
    stat = e.agg(
        F.array(*[F.min(F.col("emb")[i]) for i in range(_EMB_DIM)]).alias("mins"),
        F.array(*[F.max(F.col("emb")[i]) for i in range(_EMB_DIM)]).alias("maxs"),
    ).first()
    minl = F.array(*[F.lit(float(v)) for v in stat["mins"]])
    maxl = F.array(*[F.lit(float(v)) for v in stat["maxs"]])

    def _enc(x, i):
        mn = F.element_at(minl, i + F.lit(1))
        mx = F.element_at(maxl, i + F.lit(1))
        return F.least(
            F.lit(255).cast("long"),
            F.floor((x - mn) / (mx - mn) * F.lit(256.0)),
        )

    def _dec(c, i):
        mn = F.element_at(minl, i + F.lit(1))
        mx = F.element_at(maxl, i + F.lit(1))
        return mn + (c.cast("double") + F.lit(0.5)) * (mx - mn) / F.lit(256.0)

    codes = e.select("vec_id", F.transform("emb", _enc).alias("codes"))
    rec = codes.select("vec_id", F.transform("codes", _dec).alias("remb"))
    probes = e.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("probe_id"), F.col("emb").alias("pemb")
    )
    scored = (
        F.broadcast(probes)
        .join(rec, F.col("probe_id") != F.col("vec_id"))
        .select(
            "probe_id",
            F.col("vec_id").alias("cand_id"),
            F.round(_cos(F.col("pemb"), F.col("remb")), 6).alias("cosine_sq8"),
        )
    )
    w = Window.partitionBy("probe_id").orderBy(F.desc("cosine_sq8"), F.asc("cand_id"))
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 3)
        .select("probe_id", "cand_id", "cosine_sq8")
    )


# =========================================================================
# D15: exact heavy hitters with bounded-memory candidate pruning
# (round 3 continuation)
# =========================================================================

_D15_PHI = 0.02  # report words with frequency >= PHI * total tokens


def _mg_candidates(local_bar: float, capacity: int):
    """Partition-local Misra-Gries candidate stage for d15 (factored out so
    the trim path and the never-drops-a-hitter guarantee are unit-testable
    at tiny capacities). Returns a mapInPandas kernel over a single `word`
    column.

    Hot path is VECTORIZED: each Arrow batch is counted with pandas
    `value_counts` (one C pass over the tokens — a per-element Python loop
    here would be the only per-token Python in the repo), then MERGED into
    the bounded summary with the mergeable-MG rule [PUB: Agarwal et al.
    2012, "Mergeable summaries"]: add counts, and if more than `capacity`
    keys survive, subtract the (capacity+1)-th largest count from all and
    drop the non-positive. The merged summary keeps the MG invariant
    [Misra & Gries 1982]: stored(w) >= true(w) - n_p/(capacity+1).

    A word that can still reach the partition-local bar therefore
    satisfies stored >= local_bar - n_p/(capacity+1) — the emission test —
    so the candidate set is a SUPERSET of every true heavy hitter...
    PROVIDED that bound is positive. When local_bar <= n_p/(capacity+1)
    the summary genuinely cannot certify (a qualifying word may have been
    trimmed to zero), so the kernel RAISES with the capacity that would
    suffice instead of silently returning an incomplete candidate set —
    d15's exactness contract is refuse-or-exact, never best-effort. At
    d15's defaults (capacity 4096, phi 0.02) the raise needs ~82x
    partition skew past the mean."""
    import pandas as pd

    def kernel(batches):
        counters: dict = {}
        n_p = 0
        for pdf in batches:
            vc = pdf["word"].value_counts()
            n_p += int(vc.sum())
            for w, c in vc.items():
                counters[w] = counters.get(w, 0) + int(c)
            if len(counters) > capacity:
                # mergeable-MG trim: subtract the (capacity+1)-th largest
                vals = sorted(counters.values(), reverse=True)
                sub = vals[capacity]
                counters = {
                    w: c - sub for w, c in counters.items() if c > sub
                }
        deficit = n_p / (capacity + 1)
        bar = local_bar - deficit
        if n_p > 0 and bar <= 0:
            raise RuntimeError(
                "heavy-hitter candidate stage: partition holds "
                f"{n_p} tokens but the local bar is {local_bar:.1f} — the "
                f"MG deficit {deficit:.1f} swallows it, so the summary "
                "cannot certify a candidate superset. Raise the capacity "
                f"above {int(n_p / local_bar)} (or lower phi / rebalance "
                "partitions)."
            )
        out = [w for w, c in counters.items() if c >= bar]
        yield pd.DataFrame({"word": out})

    return kernel


@qt(
    "d15_heavy_hitters",
    f"""WITH tok AS (SELECT UNNEST(string_split_regex(TRIM(text), '\\s+'))
                       AS word
                     FROM documents WHERE LENGTH(TRIM(text)) > 0),
        n AS (SELECT COUNT(*) AS total FROM tok)
        SELECT word, CAST(COUNT(*) AS BIGINT) AS cnt
        FROM tok GROUP BY word
        HAVING COUNT(*) >= (SELECT CEIL({_D15_PHI} * total) FROM n)""",
)
def d15(spark, sf):
    """D15: exact phi-heavy hitters (words with count >= phi*N) via
    Misra-Gries candidate pruning + exact recount [PUB: Misra & Gries
    1982; the MG-merge candidates + rescan construction of Agarwal et al.
    2012 "Mergeable summaries"].

    Why not just groupBy(word).count()? That shuffles the full vocabulary
    — at 100 TB the distinct-token domain (typos, hashes, code literals)
    is billions of keys, almost all of which lose to the HAVING filter
    AFTER being shuffled. The scale-safe form prunes BEFORE the shuffle:

      pass 1 (no shuffle): each partition runs a bounded Misra-Gries
        summary (K counters) inside ONE mapInPandas iterator and emits
        only words whose partition-LOCAL lower-bound count can still reach
        the global bar: stored >= T/P - n_p/(K+1). Correctness: a word
        with global count >= T has local count >= T/P in >= 1 partition
        (pigeonhole), and MG undercounts by at most n_p/(K+1), so every
        true heavy hitter survives into the candidate set. Candidate
        volume is <= K per partition regardless of skew or vocabulary.
      pass 2: exact recount restricted to the candidate set — a broadcast
        semi join (candidates are <= K*P rows, kilobytes), then ONE
        map-side-combined hash agg whose shuffle carries only candidate
        words, then the exact >= T filter. Output counts are EXACT, which
        is why the DuckDB oracle is the plain GROUP BY / HAVING form.

    The local bar T/P uses the ACTUAL runtime partition count, and the MG
    deficit term n_p/(K+1) uses the per-partition item count measured in
    the same pass — both sides of the guarantee are computed, not assumed
    (partition imbalance lowers the emission bar, never drops a hitter)."""
    import math

    d = load(spark, sf, "documents").filter(F.length(F.trim("text")) > 0)
    # token count WITHOUT exploding: scan-side size(split), one tiny agg
    n_total = int(
        d.select(
            F.sum(F.size(F.split(F.trim("text"), r"\s+"))).alias("n")
        ).first()["n"]
    )
    t_bar = math.ceil(_D15_PHI * n_total)
    words = _spread(d.select("text")).select(
        F.explode(F.split(F.trim("text"), r"\s+")).alias("word")
    )
    n_parts = max(1, words.rdd.getNumPartitions())
    # MG capacity 4096 bounds executor memory independent of vocabulary
    cand = (
        words.mapInPandas(
            _mg_candidates(t_bar / n_parts, 4096), "word string"
        )
        .distinct()
    )
    return (
        words.join(F.broadcast(cand), "word", "left_semi")
        .groupBy("word")
        .agg(F.count("*").cast("long").alias("cnt"))
        .filter(F.col("cnt") >= t_bar)
    )


# =========================================================================
# V10: MMR diversified re-ranking (round 3 continuation)
# =========================================================================

@qt("v10_mmr_rerank", None)  # iterative greedy; numpy-pinned in pytest
def v10(spark, sf):
    """V10: maximal-marginal-relevance re-ranking of V1's exact top-k
    [PUB: Carbonell & Goldstein, SIGIR 1998]: from each probe's top-20
    cosine candidates, greedily select 5 maximizing
    lambda*sim(probe, c) - (1-lambda)*max_{s in selected} sim(c, s) —
    the standard redundancy-removal step between retrieval and a training
    batch / RAG context (near-identical candidates waste the budget).

    Spark shape: candidate generation is V1's broadcast-probes plan
    (top-20 per probe via the per-probe window); the greedy selection is
    inherently sequential in k but embarrassingly parallel ACROSS probes,
    so it runs as ONE applyInPandas over probe_id groups — each group is
    a 20-row pandas frame (20x20 numpy sims, microseconds); no vector
    ever returns to the driver. At 10^9 probes this is one shuffle keyed
    by probe_id of 20-row groups. Not SQL-expressible (the selection is a
    data-dependent loop) -> rows-only; exactness is pinned by a pure-
    numpy mirror and a golden hash in pytest. Ties break on cand_id ASC
    via a 1e-12 epsilon-free two-key sort inside the kernel, determinism
    is hash-free, and scores are rounded AFTER selection."""
    import numpy as np
    import pandas as pd

    lam, topk_in, topk_out = 0.7, 20, 5
    e = load(spark, sf, "embeddings").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("emb")
    )
    probes = e.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("probe_id"), F.col("emb").alias("pemb")
    )
    cand = e.select(F.col("vec_id").alias("cand_id"), F.col("emb").alias("cemb"))
    scored = (
        F.broadcast(probes)
        .join(cand, F.col("probe_id") != F.col("cand_id"))
        .select(
            "probe_id",
            "cand_id",
            "cemb",
            # 9-dp rounded rank key: JVM fold order vs a numpy mirror's
            # pairwise dot can disagree by 1 ulp; rounding keeps the
            # top-20 cutoff and the greedy argmax cross-implementation
            # stable (the v8/v9/v11 discipline), without moving any
            # genuinely distinct score
            F.round(_cos(F.col("pemb"), F.col("cemb")), 9).alias("cosine"),
        )
    )
    w = Window.partitionBy("probe_id").orderBy(F.desc("cosine"), F.asc("cand_id"))
    top = scored.withColumn("rn", F.row_number().over(w)).filter(
        F.col("rn") <= topk_in
    )

    def mmr_apply(pdf):
        # deterministic candidate order: relevance DESC, cand_id ASC; the
        # greedy argmax then breaks score ties toward the lower cand_id
        pdf = pdf.sort_values(["cosine", "cand_id"], ascending=[False, True])
        ids = pdf["cand_id"].to_numpy()
        rel = pdf["cosine"].to_numpy()
        mat = np.stack(pdf["cemb"].to_numpy())
        norm = np.linalg.norm(mat, axis=1)
        sims = (mat @ mat.T) / np.outer(norm, norm)
        rows = []
        chosen: list = []
        avail = list(range(len(ids)))
        probe = int(pdf["probe_id"].iloc[0])
        while avail and len(chosen) < topk_out:
            if chosen:
                red = sims[np.ix_(avail, chosen)].max(axis=1)
            else:
                red = np.zeros(len(avail))
            score = lam * rel[avail] - (1.0 - lam) * red
            best = int(np.argmax(score))  # first max = lowest cand_id on tie
            pick = avail[best]
            chosen.append(pick)
            avail.pop(best)
            rows.append((probe, len(chosen), int(ids[pick]), round(float(score[best]), 6)))
        return pd.DataFrame(
            rows, columns=["probe_id", "rank", "cand_id", "mmr_score"]
        )

    return top.groupBy("probe_id").applyInPandas(
        mmr_apply,
        "probe_id long, rank int, cand_id long, mmr_score double",
    )


# =========================================================================
# X24: overlapping-shingle shared spans (round 3 continuation)
# =========================================================================

_X24_W = 8  # shingle width, matching x16's chunk width for direct contrast


@qt(
    "x24_shared_spans",
    f"""WITH d AS (SELECT doc_id, string_split(TRIM(text), ' ') AS arr
                   FROM documents WHERE LENGTH(TRIM(text)) > 0),
        win AS (SELECT doc_id, i AS pos,
                       md5(array_to_string(
                         list_slice(arr, i, i + {_X24_W} - 1), ' ')) AS g
                FROM d, UNNEST(generate_series(1, len(arr) - {_X24_W} + 1))
                     AS r(i)),
        f AS (SELECT g FROM win GROUP BY g
              HAVING COUNT(DISTINCT doc_id) > 1),
        marked AS (SELECT w.doc_id, w.pos,
                          CASE WHEN f.g IS NULL THEN 0 ELSE 1 END AS sh
                   FROM win w LEFT JOIN f ON f.g = w.g),
        runs AS (SELECT doc_id, sh,
                        pos - ROW_NUMBER() OVER (PARTITION BY doc_id, sh
                                                 ORDER BY pos) AS grp
                 FROM marked),
        runlen AS (SELECT doc_id, COUNT(*) AS rl FROM runs
                   WHERE sh = 1 GROUP BY doc_id, grp),
        mx AS (SELECT doc_id, MAX(rl) AS max_run FROM runlen GROUP BY doc_id),
        agg AS (SELECT doc_id, COUNT(*) AS n_windows, SUM(sh) AS n_shared
                FROM marked GROUP BY doc_id)
        SELECT agg.doc_id,
               CAST(agg.n_windows AS BIGINT) AS n_windows,
               CAST(agg.n_shared AS BIGINT) AS n_shared,
               ROUND(1.0 * agg.n_shared / agg.n_windows, 6) AS shared_frac,
               CAST(COALESCE(mx.max_run, 0) AS BIGINT) AS max_run
        FROM agg LEFT JOIN mx USING (doc_id)""",
)
def x24(spark, sf):
    """X24: cross-document shared-SPAN detection over OVERLAPPING 8-word
    shingles — per doc: how many of its sliding windows also appear in
    another document, and the longest consecutive run of such windows (the
    "longest duplicated span" signal). This is the exact-substring dedup
    criterion of Lee et al. 2022 ("Deduplicating Training Data Makes
    Language Models Better") at shingle granularity: x16's DISJOINT chunks
    measure how much of a doc is duplicated; the overlapping form also
    finds WHERE, and a max_run of r windows certifies a verbatim shared
    substring of r + W - 1 tokens — the thing one actually cuts.

    Spark shape: shingle hashes are generated SCAN-SIDE (one narrow
    transform over sequence + posexplode — text never shuffles; only
    (md5, doc_id, pos) rows do). The corpus-wide frequency is one hash agg
    keyed by the 16-byte digest; overlapping windows make this O(tokens)
    shuffle rows vs x16's O(tokens/W) — that 8x is the price of span
    localization and is the documented reason BOTH ops exist (x16 as the
    cheap filter, x24 on the suspects). The run-length step is the E7
    gaps-and-islands form: all three windows partition by doc_id, reusing
    ONE doc-keyed Exchange, never a partition-less window."""
    d = load(spark, sf, "documents").filter(F.length(F.trim("text")) > 0)
    arr = F.split(F.trim("text"), " ")
    w = _X24_W
    d = d.select("doc_id", arr.alias("arr")).filter(F.size("arr") >= w)
    grams = F.transform(
        F.sequence(F.lit(1), F.size("arr") - (w - 1)),
        lambda i: F.md5(F.concat_ws(" ", F.slice("arr", i, w))),
    )
    win = d.select("doc_id", F.posexplode(grams).alias("pos0", "g")).select(
        "doc_id", (F.col("pos0") + 1).alias("pos"), "g"
    )
    shared = (
        win.groupBy("g")
        .agg(F.count_distinct("doc_id").alias("nd"))
        .filter(F.col("nd") > 1)
        .select("g")
    )
    marked = win.join(shared.withColumn("sh1", F.lit(1)), "g", "left").select(
        "doc_id", "pos", F.coalesce("sh1", F.lit(0)).alias("sh")
    )
    wrun = Window.partitionBy("doc_id", "sh").orderBy("pos")
    runs = marked.withColumn(
        "grp", F.col("pos") - F.row_number().over(wrun)
    )
    runlen = (
        runs.filter(F.col("sh") == 1)
        .groupBy("doc_id", "grp")
        .agg(F.count("*").alias("rl"))
    )
    mx = runlen.groupBy("doc_id").agg(F.max("rl").alias("max_run"))
    agg = marked.groupBy("doc_id").agg(
        F.count("*").alias("n_windows"), F.sum("sh").alias("n_shared")
    )
    return agg.join(mx, "doc_id", "left").select(
        "doc_id",
        F.col("n_windows").cast("long").alias("n_windows"),
        F.col("n_shared").cast("long").alias("n_shared"),
        F.round(F.col("n_shared") / F.col("n_windows"), 6).alias(
            "shared_frac"
        ),
        F.coalesce("max_run", F.lit(0)).cast("long").alias("max_run"),
    )


# =========================================================================
# V11: ANN recall evaluation (round 3 continuation)
# =========================================================================

_V11_K = 10


@qt(
    "v11_ann_recall",
    f"""WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS emb
                   FROM embeddings),
        cent AS (SELECT vec_id AS cid, emb AS cemb FROM e
                 ORDER BY vec_id LIMIT {_IVF_CELLS}),
        asg AS (
          SELECT vec_id, emb, cid FROM (
            SELECT e.vec_id, e.emb, c.cid,
                   ROW_NUMBER() OVER (
                     PARTITION BY e.vec_id
                     ORDER BY ROUND(list_dot_product(e.emb, c.cemb)
                           / (SQRT(list_dot_product(e.emb, e.emb))
                              * SQRT(list_dot_product(c.cemb, c.cemb))), 6)
                       DESC, c.cid ASC) AS rn
            FROM e CROSS JOIN cent c) WHERE rn = 1),
        probes AS (SELECT vec_id AS probe_id, emb AS pemb, cid FROM asg
                   WHERE vec_id < 5),
        exact AS (
          SELECT probe_id, cand_id FROM (
            SELECT p.probe_id, c.vec_id AS cand_id,
                   ROW_NUMBER() OVER (PARTITION BY p.probe_id
                     ORDER BY ROUND(list_dot_product(p.pemb, c.emb)
                           / (SQRT(list_dot_product(p.pemb, p.pemb))
                              * SQRT(list_dot_product(c.emb, c.emb))), 6)
                       DESC, c.vec_id ASC) AS rn
            FROM probes p JOIN e c ON p.probe_id <> c.vec_id)
          WHERE rn <= {_V11_K}),
        approx AS (
          SELECT probe_id, cand_id FROM (
            SELECT p.probe_id, a.vec_id AS cand_id,
                   ROW_NUMBER() OVER (PARTITION BY p.probe_id
                     ORDER BY ROUND(list_dot_product(p.pemb, a.emb)
                           / (SQRT(list_dot_product(p.pemb, p.pemb))
                              * SQRT(list_dot_product(a.emb, a.emb))), 6)
                       DESC, a.vec_id ASC) AS rn
            FROM probes p JOIN asg a ON p.cid = a.cid
                                    AND p.probe_id <> a.vec_id)
          WHERE rn <= {_V11_K})
        SELECT x.probe_id,
               CAST(COUNT(*) AS BIGINT) AS n_exact,
               CAST(COUNT(a.cand_id) AS BIGINT) AS n_hit,
               ROUND(COUNT(a.cand_id) * 1.0 / COUNT(*), 4) AS recall
        FROM exact x LEFT JOIN approx a
          ON a.probe_id = x.probe_id AND a.cand_id = x.cand_id
        GROUP BY x.probe_id""",
)
def v11(spark, sf):
    """V11: ANN recall@k evaluation — per probe, the fraction of V1's
    EXACT top-10 that V4's IVF (nprobe=1) candidate search returns. The
    operator every vector-search deployment runs before trusting an index
    [PUB: Jegou et al. 2011 report exactly this curve]: recall quantifies
    the IVF pruning loss, and tracking it per probe (not just the mean)
    exposes the cell-boundary probes that motivate nprobe > 1.

    Spark shape: both retrieval arms reuse their operators' own plans (v1
    broadcast-probes exact scan; v4 broadcast-centroid assignment +
    cell-keyed equi-join), then ONE left join on (probe_id, cand_id) and
    ONE hash agg. Rank keys are the 6-dp ROUNDED cosines with cand_id
    tiebreak on BOTH engines (v4's proven discipline), so the top-k SETS
    are cross-engine identical and recall is fully SQL-oracle-checkable —
    which is the point: the evaluation op must itself be exact."""
    k = _V11_K
    e = load(spark, sf, "embeddings").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("emb")
    )
    cent = e.orderBy("vec_id").limit(_IVF_CELLS).select(
        F.col("vec_id").alias("cid"), F.col("emb").alias("cemb")
    )
    w_asg = Window.partitionBy("vec_id").orderBy(
        F.desc(F.round(_cos(F.col("emb"), F.col("cemb")), 6)), F.asc("cid")
    )
    asg = (
        e.crossJoin(F.broadcast(cent))
        .withColumn("rn", F.row_number().over(w_asg))
        .filter(F.col("rn") == 1)
        .select("vec_id", "emb", "cid")
    )
    probes = asg.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("probe_id"), F.col("emb").alias("pemb"), "cid"
    )
    wk = Window.partitionBy("probe_id").orderBy(
        F.desc("cosine"), F.asc("cand_id")
    )
    exact = (
        F.broadcast(probes.drop("cid"))
        .join(
            e.select(F.col("vec_id").alias("cand_id"), F.col("emb").alias("cemb2")),
            F.col("probe_id") != F.col("cand_id"),
        )
        .select(
            "probe_id",
            "cand_id",
            F.round(_cos(F.col("pemb"), F.col("cemb2")), 6).alias("cosine"),
        )
        .withColumn("rn", F.row_number().over(wk))
        .filter(F.col("rn") <= k)
        .select("probe_id", "cand_id")
    )
    approx = (
        F.broadcast(probes)
        .join(asg, "cid")
        .filter(F.col("probe_id") != F.col("vec_id"))
        .select(
            "probe_id",
            F.col("vec_id").alias("cand_id"),
            F.round(_cos(F.col("pemb"), F.col("emb")), 6).alias("cosine"),
        )
        .withColumn("rn", F.row_number().over(wk))
        .filter(F.col("rn") <= k)
        .select("probe_id", F.col("cand_id").alias("a_cand"))
    )
    # Both arms share the embeddings-scan lineage; explicit string aliases
    # make the equi-key predicates resolve cross-frame (kills the Catalyst
    # "trivially true" self-join warning).
    ex, ap = exact.alias("ex"), approx.alias("ap")
    return (
        ex.join(
            ap,
            (F.col("ex.probe_id") == F.col("ap.probe_id"))
            & (F.col("ex.cand_id") == F.col("ap.a_cand")),
            "left",
        )
        .select(F.col("ex.probe_id").alias("probe_id"), "cand_id", "a_cand")
        .groupBy("probe_id")
        .agg(
            F.count("*").cast("long").alias("n_exact"),
            F.count("a_cand").cast("long").alias("n_hit"),
            F.round(F.count("a_cand") / F.count("*"), 4).alias("recall"),
        )
    )


# =========================================================================
# X25: bigram language-model quality score (round 3 continuation)
# =========================================================================

_X25_V = 512  # vocabulary size: top words by count, everything else -> <unk>
_X25_A = 0.5  # add-alpha smoothing mass


@qt(
    "x25_lm_quality",
    f"""WITH d AS (SELECT doc_id,
                        list_filter(string_split(TRIM(text), ' '),
                                    t -> t <> '') AS arr
                 FROM documents WHERE LENGTH(TRIM(text)) > 0),
      uni AS (SELECT w, COUNT(*) AS c
              FROM (SELECT unnest(arr) AS w FROM d) GROUP BY 1),
      vocab AS (SELECT w, c FROM uni ORDER BY c DESC, w ASC LIMIT {_X25_V}),
      vn AS (SELECT COUNT(*) + 1 AS vocab_n FROM vocab),
      unk AS (SELECT COALESCE(SUM(c), 0) AS uc FROM uni
              WHERE w NOT IN (SELECT w FROM vocab)),
      c1 AS (SELECT w, c FROM vocab
             UNION ALL SELECT '<unk>', uc FROM unk),
      big AS (SELECT b.doc_id,
                     COALESCE(v1.w, '<unk>') AS w1,
                     COALESCE(v2.w, '<unk>') AS w2
              FROM (SELECT doc_id, arr[i] AS w1r, arr[i+1] AS w2r
                    FROM d, UNNEST(generate_series(1, len(arr) - 1)) AS r(i)
                    WHERE len(arr) >= 2) b
              LEFT JOIN vocab v1 ON v1.w = b.w1r
              LEFT JOIN vocab v2 ON v2.w = b.w2r),
      dtf AS (SELECT doc_id, w1, w2, COUNT(*) AS dtf FROM big GROUP BY 1,2,3),
      c2 AS (SELECT w1, w2, SUM(dtf) AS c2 FROM dtf GROUP BY 1, 2),
      sc AS (SELECT t.doc_id, t.dtf,
                    CAST(ROUND(LOG2((c2.c2 + {_X25_A})
                                    / (c1.c + {_X25_A} * vn.vocab_n))
                               * 10000000, 0) AS BIGINT) AS lpi
             FROM dtf t JOIN c2 USING (w1, w2) JOIN c1 ON c1.w = t.w1
             CROSS JOIN vn)
      SELECT doc_id, CAST(SUM(dtf) AS BIGINT) AS n_bigrams,
             ROUND(SUM(dtf * lpi) / (10000000.0 * SUM(dtf)), 6) AS lm_score
      FROM sc GROUP BY doc_id""",
)
def x25(spark, sf):
    """X25: bigram language-model quality score — the CCNet/KenLM-style
    perplexity filter [PUB: Wenzek et al. 2020 (CCNet); Heafield 2011
    (KenLM)]: train unigram+bigram counts on the corpus itself (top-V
    vocabulary, tail pooled into <unk>), then score each document by its
    mean smoothed bigram log2-probability. Low scores flag
    out-of-distribution text (mash, boilerplate soup, wrong-language
    residue) — the standard pretraining quality signal next to X6's
    surface ratios and X21's entropy.

    Semantics pinned for exactness: vocabulary = top {_X25_V} words by
    (count DESC, word ASC); P(w2|w1) = (c2 + a)/(c1(w1) + a*(V+1)) with
    a = {_X25_A}; per-bigram log2 is quantized to integer 1e-7 micro-units
    on BOTH engines (the k19 lesson) so the per-doc weighted mean is exact
    integer arithmetic — no float fold-order skew can flip the value hash;
    the single final division of exact integers is rounded to 6 dp.

    Spark shape for 100 TB: bigrams are generated SCAN-SIDE from the token
    array (transform over sequence — text never crosses a shuffle); the
    model tables are vocabulary-sized (vocab via TakeOrderedAndProject
    top-V, c1 broadcast) and the <unk> mass + V are O(1) collected scalars
    emitted as literals (k37 discipline — joining them would plan a BNLJ).
    The one corpus-sized shuffle carries (doc_id, w1, w2) with map-side
    combine into per-doc bigram-type counts; c2 re-aggregates THAT (much
    smaller) table, and scoring is two equi joins plus one doc-keyed
    hash agg. Model-training and scoring are separate scans by design —
    at corpus scale the model pass runs on a sample tier."""
    d = load(spark, sf, "documents").filter(F.length(F.trim("text")) > 0)
    toks = d.select(
        "doc_id",
        F.filter(
            F.split(F.trim("text"), " "), lambda x: x != F.lit("")
        ).alias("arr"),
    )
    uni = (
        _spread(toks)
        .select(F.explode("arr").alias("w"))
        .groupBy("w")
        .agg(F.count("*").alias("c"))
        .localCheckpoint(eager=True)  # vocab-sized; reused (vocab + unk mass)
    )
    vocab = (
        uni.orderBy(F.desc("c"), F.asc("w"))
        .limit(_X25_V)
        .localCheckpoint(eager=True)  # reused: two mapping joins + c1
    )
    vocab_n = vocab.count() + 1  # O(1) scalar: |vocab| + <unk>
    unk_c = (
        uni.join(vocab.select("w"), "w", "left_anti")
        .agg(F.coalesce(F.sum("c"), F.lit(0)).alias("uc"))
        .first()["uc"]
    )  # O(1) scalar: pooled tail mass
    c1 = vocab.unionByName(
        spark.createDataFrame([("<unk>", int(unk_c))], "w string, c long")
    )
    n = F.size("arr")
    big = (
        _spread(toks.filter(n >= 2))
        .select(
            "doc_id",
            F.explode(
                F.transform(
                    F.sequence(F.lit(1), F.size("arr") - 1),
                    lambda i: F.struct(
                        F.element_at(F.col("arr"), i).alias("w1r"),
                        F.element_at(F.col("arr"), i + 1).alias("w2r"),
                    ),
                )
            ).alias("bg"),
        )
        .select("doc_id", "bg.w1r", "bg.w2r")
    )
    v1m = F.broadcast(vocab.select(F.col("w").alias("w1m")))
    v2m = F.broadcast(vocab.select(F.col("w").alias("w2m")))
    mapped = (
        big.join(v1m, F.col("w1r") == F.col("w1m"), "left")
        .join(v2m, F.col("w2r") == F.col("w2m"), "left")
        .select(
            "doc_id",
            F.coalesce("w1m", F.lit("<unk>")).alias("w1"),
            F.coalesce("w2m", F.lit("<unk>")).alias("w2"),
        )
    )
    dtf = (
        mapped.groupBy("doc_id", "w1", "w2")
        .agg(F.count("*").alias("dtf"))
        .localCheckpoint(eager=True)  # bigram-type-sized; reused (c2 + score)
    )
    c2 = dtf.groupBy("w1", "w2").agg(F.sum("dtf").alias("c2"))
    c1w = F.broadcast(c1.select(F.col("w").alias("w1"), F.col("c").alias("c1")))
    p = (F.col("c2") + F.lit(_X25_A)) / (
        F.col("c1") + F.lit(_X25_A * vocab_n)
    )
    lpi = F.round(F.log2(p) * F.lit(10000000.0), 0).cast("long")
    scored = (
        dtf.join(c2, ["w1", "w2"])
        .join(c1w, "w1")
        .select("doc_id", "dtf", lpi.alias("lpi"))
    )
    return scored.groupBy("doc_id").agg(
        F.sum("dtf").cast("long").alias("n_bigrams"),
        F.round(
            F.sum(F.col("dtf") * F.col("lpi"))
            / (F.lit(10000000.0) * F.sum("dtf")),
            6,
        ).alias("lm_score"),
    )


# =========================================================================
# V12: k-NN graph construction (round 3 continuation)
# =========================================================================

_V12_K = 5  # neighbors kept per vector


@qt(
    "v12_knn_graph",
    f"""WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS emb
                 FROM embeddings),
      b AS (SELECT vec_id, emb,
                   CASE WHEN emb[1] >= 0 THEN 8 ELSE 0 END
                   + CASE WHEN emb[2] >= 0 THEN 4 ELSE 0 END
                   + CASE WHEN emb[3] >= 0 THEN 2 ELSE 0 END
                   + CASE WHEN emb[4] >= 0 THEN 1 ELSE 0 END AS bucket
            FROM e),
      scored AS (
        SELECT a.vec_id AS src, c.vec_id AS dst,
               ROUND(list_dot_product(a.emb, c.emb)
                     / (SQRT(list_dot_product(a.emb, a.emb))
                        * SQRT(list_dot_product(c.emb, c.emb))), 6) AS cosine
        FROM b a JOIN b c ON a.bucket = c.bucket
                         AND a.vec_id <> c.vec_id)
      SELECT src, dst, cosine, CAST(rnk AS INT) AS rnk FROM (
        SELECT *, ROW_NUMBER() OVER (PARTITION BY src
                                     ORDER BY cosine DESC, dst ASC) AS rnk
        FROM scored) WHERE rnk <= {_V12_K}""",
)
def v12(spark, sf):
    """V12: k-NN graph construction — every vector's top-{_V12_K} cosine
    neighbors among its sign-LSH bucket candidates, emitted as a directed
    edge table (src, dst, cosine, rnk). This is the operator that BRIDGES
    the vector family into the graph engine: semantic near-dup clustering,
    label propagation over embedding similarity, and graph-based dedup all
    start from exactly this edge table (x10 builds its graph from MinHash
    buckets; v12 builds the embedding-space analogue) [PUB: Dong, Moses &
    Li, WWW 2011 (NN-Descent) motivates the k-NN-graph-as-primitive view;
    the LSH candidate generation is Charikar 2002 sign hashing, v2's
    construction].

    Exactness: candidates are the vector's own 4-bit sign bucket (the v3
    rule — deterministic, oracle-expressible); rank key is the 6-dp ROUNDED
    cosine with dst ASC tiebreak on BOTH engines (v4's discipline), so the
    per-src top-k SETS are cross-engine identical. Missed cross-bucket
    neighbors are the documented LSH recall tradeoff; v1 is the exactness
    baseline and v11 is the evaluation harness that measures exactly this.

    Spark shape for 100 TB: the self-join keys on the BUCKET (cost scales
    with sum of squared bucket sizes, never n^2 — more hash bits + multi-
    probe tighten buckets at scale); the top-k is a per-src keyed window
    over in-bucket candidates only. Vectors shuffle once, keyed by bucket;
    no vector reaches the driver."""
    e = load(spark, sf, "embeddings").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("emb")
    )
    bucket = (
        F.when(F.col("emb")[0] >= 0, 8).otherwise(0)
        + F.when(F.col("emb")[1] >= 0, 4).otherwise(0)
        + F.when(F.col("emb")[2] >= 0, 2).otherwise(0)
        + F.when(F.col("emb")[3] >= 0, 1).otherwise(0)
    )
    b = e.select("vec_id", "emb", bucket.alias("bucket"))
    a = b.select(F.col("vec_id").alias("src"), F.col("emb").alias("e1"), "bucket")
    c = b.select(F.col("vec_id").alias("dst"), F.col("emb").alias("e2"), "bucket")
    scored = (
        a.join(c, ["bucket"])
        .filter(F.col("src") != F.col("dst"))
        .select(
            "src",
            "dst",
            F.round(_cos(F.col("e1"), F.col("e2")), 6).alias("cosine"),
        )
    )
    w = Window.partitionBy("src").orderBy(F.desc("cosine"), F.asc("dst"))
    return (
        scored.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= _V12_K)
        .select("src", "dst", "cosine", "rnk")
    )


# =========================================================================
# X26: segment-level cross-doc dedup with document reconstruction
# =========================================================================

_X26_W = 12  # words per segment (stands in for newline-split lines here)


_X26_SQL = f"""
WITH d AS (SELECT doc_id, string_split(COALESCE(text, ''), ' ') AS words
     FROM documents),
seg AS (SELECT doc_id, i,
          md5(array_to_string(
            list_slice(words, (i - 1) * {_X26_W} + 1,
                       (i - 1) * {_X26_W} + {_X26_W}), ' ')) AS m
        FROM d, UNNEST(generate_series(
          1, CAST(FLOOR(len(words) / {_X26_W}.0) AS BIGINT))) t(i)),
win AS (SELECT m, MIN(doc_id) AS keeper FROM seg GROUP BY m),
fl AS (SELECT s.doc_id, s.i, (s.doc_id = w.keeper) AS keep
       FROM seg s JOIN win w USING (m)),
agg AS (SELECT doc_id,
          COUNT(*) AS n_segments,
          CAST(SUM(CASE WHEN keep THEN 0 ELSE 1 END) AS BIGINT) AS n_dropped,
          list_sort(list(i) FILTER (WHERE keep)) AS kept_is
        FROM fl GROUP BY doc_id)
SELECT d.doc_id,
       COALESCE(a.n_segments, 0) AS n_segments,
       COALESCE(a.n_dropped, 0) AS n_dropped,
       COALESCE(array_to_string(list_concat(
         [array_to_string(list_slice(d.words, (i - 1) * {_X26_W} + 1,
                                     (i - 1) * {_X26_W} + {_X26_W}), ' ')
          for i in COALESCE(a.kept_is, [])],
         CASE WHEN len(d.words) % {_X26_W} > 0
           THEN [array_to_string(list_slice(d.words,
                  CAST(FLOOR(len(d.words) / {_X26_W}.0) AS BIGINT)
                    * {_X26_W} + 1,
                  len(d.words)), ' ')]
           ELSE [] END), ' '), '') AS kept_text
FROM d LEFT JOIN agg a USING (doc_id)
"""


@qt("x26_segment_dedup_rewrite", _X26_SQL)
def x26(spark, sf):
    """X26: segment-level cross-doc dedup that REWRITES the document —
    the CCNet / RefinedWeb "drop duplicated lines, keep the remainder"
    curation op [PUB: Wenzek et al. 2020 CCNet line-dedup; Penedo et al.
    2023 RefinedWeb §G.2]. x16 only SCORES partial overlap; x26 applies
    the edit: each disjoint {_X26_W}-word segment is kept in exactly the
    lowest-doc_id document containing it (deterministic keep-first) and
    dropped everywhere else, and the surviving segments plus the
    sub-segment tail are reassembled in original order into kept_text.
    Output: (doc_id, n_segments, n_dropped, kept_text) — one row per input
    doc, so the op composes as a corpus->corpus rewrite stage.

    Scale shape for 100 TB: segment text never shuffles — the md5 is
    computed scan-side and only (m, doc_id, i) triplets enter the
    winner agg (map-side-combined MIN) and the keep/drop join; the per-doc
    result collapses to an O(segments/doc) int array, and full text moves
    exactly ONCE, co-keyed by doc_id, for the reconstruction join. The
    alternative (routing segment text through the m-keyed shuffle) would
    move the whole corpus through the skewed hash space; this shape moves
    16-byte digests there instead. Within-doc repeats in the keeper doc
    are kept (x11/x16 are the within-doc signals); the keep-first policy
    matches x14's deterministic keep-best discipline with doc_id as the
    quality key.
    """
    W = _X26_W
    d = load(spark, sf, "documents").select(
        "doc_id",
        # NULL text would poison F.size (-1) downstream; both engines
        # treat it as the empty doc
        F.split(F.coalesce("text", F.lit("")), " ").alias("words"),
    )
    n_full = F.floor(F.size("words") / W).cast("int")
    segs = (
        _spread(d.filter(F.size("words") >= W))
        .select(
            "doc_id",
            F.explode(
                F.transform(
                    F.sequence(F.lit(1), F.floor(F.size("words") / W).cast("int")),
                    lambda i: F.struct(
                        i.alias("i"),
                        F.md5(
                            F.concat_ws(
                                " ", F.slice("words", (i - 1) * W + 1, W)
                            )
                        ).alias("m"),
                    ),
                )
            ).alias("s"),
        )
        .select("doc_id", "s.i", "s.m")
    )
    win = segs.groupBy("m").agg(F.min("doc_id").alias("keeper"))
    fl = segs.join(win, "m").select(
        "doc_id", "i", (F.col("doc_id") == F.col("keeper")).alias("keep")
    )
    agg = fl.groupBy("doc_id").agg(
        F.count("*").alias("n_segments"),
        F.sum(F.when(F.col("keep"), 0).otherwise(1)).alias("n_dropped"),
        F.sort_array(F.collect_list(F.when(F.col("keep"), F.col("i")))).alias(
            "kept_is"
        ),
    )
    rec = d.join(agg, "doc_id", "left")
    kept_is = F.coalesce("kept_is", F.array().cast("array<int>"))
    pieces = F.transform(
        kept_is, lambda i: F.concat_ws(" ", F.slice("words", (i - 1) * W + 1, W))
    )
    tail_len = F.size("words") - n_full * W
    tail = F.when(
        tail_len > 0,
        F.array(F.concat_ws(" ", F.slice("words", n_full * W + 1, tail_len))),
    ).otherwise(F.array().cast("array<string>"))
    return rec.select(
        "doc_id",
        F.coalesce("n_segments", F.lit(0)).alias("n_segments"),
        F.coalesce("n_dropped", F.lit(0)).alias("n_dropped"),
        F.array_join(F.concat(pieces, tail), " ").alias("kept_text"),
    )


# =========================================================================
# V13: Matryoshka prefix-dim screen + exact re-rank
# =========================================================================

_V13_PD = 32  # prefix dims scored in the screening pass
_V13_C = 100  # candidates kept per probe after the screen
_V13_K = 10   # final exact top-k


_V13_SQL = f"""
WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS emb FROM embeddings),
probes AS (SELECT vec_id AS probe_id, emb AS pemb,
                  list_slice(emb, 1, {_V13_PD}) AS pp
           FROM e WHERE vec_id < 5),
s1 AS (SELECT p.probe_id, c.vec_id AS cand_id,
              ROUND(list_dot_product(p.pp, list_slice(c.emb, 1, {_V13_PD}))
                / (SQRT(list_dot_product(p.pp, p.pp))
                   * SQRT(list_dot_product(list_slice(c.emb, 1, {_V13_PD}),
                                           list_slice(c.emb, 1, {_V13_PD})))),
                6) AS prefix_cosine
       FROM probes p JOIN e c ON p.probe_id <> c.vec_id),
cand AS (SELECT probe_id, cand_id, prefix_cosine FROM (
           SELECT *, ROW_NUMBER() OVER (PARTITION BY probe_id
                       ORDER BY prefix_cosine DESC, cand_id ASC) AS rn
           FROM s1) WHERE rn <= {_V13_C}),
s2 AS (SELECT c.probe_id, c.cand_id, c.prefix_cosine,
              ROUND(list_dot_product(p.pemb, f.emb)
                / (SQRT(list_dot_product(p.pemb, p.pemb))
                   * SQRT(list_dot_product(f.emb, f.emb))), 6) AS cosine
       FROM cand c
       JOIN e f ON c.cand_id = f.vec_id
       JOIN probes p ON c.probe_id = p.probe_id)
SELECT probe_id, cand_id, cosine, prefix_cosine, CAST(rnk AS INT) AS rnk
FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY probe_id
                  ORDER BY cosine DESC, cand_id ASC) AS rnk
      FROM s2) WHERE rnk <= {_V13_K}
"""


@qt("v13_matryoshka_rerank", _V13_SQL)
def v13(spark, sf):
    """V13: two-stage ANN — a cheap cosine screen over the FIRST {_V13_PD}
    of 64 dims keeps {_V13_C} candidates per probe, then the exact 64-dim
    cosine re-ranks them to top-{_V13_K} [PUB: Kusupati et al. 2022
    "Matryoshka Representation Learning" — prefix subvectors of an
    MRL-trained embedding preserve ranking; the screen-then-rerank shape
    is the standard two-stage retrieval cascade]. Complements v4 (IVF
    routes by PARTITION, v13 cheapens the SCORE — production stacks use
    both: coarse cells, then prefix screen inside the probed cells).
    Operating point measured at sf0.01 on these UNTRAINED random
    embeddings (worst case — the prefix carries only its proportional
    share of energy): recall@10 = 0.88 vs the exact v1 baseline at half
    the screening FLOPs and 20% exact fetches; MRL-trained embeddings
    concentrate energy in the prefix, so production recall is higher at
    far smaller prefixes. Pinned in tests/test_round3_ops.py.

    Scale shape for 100 TB: the screening scan reads a 4x-narrower vector
    (at rest this is a separate prefix column / first PQ segment, so the
    scan itself is narrow — here the slice happens scan-side which is the
    same FLOP shape), probes broadcast as in v1, and the exact pass
    touches only O(probes x {_V13_C}) full vectors fetched by a
    broadcast-semi equi-join on vec_id — the full-width corpus is never
    re-scanned for scoring. Cross-engine exactness: BOTH rank keys are
    6-dp rounded with cand_id-ASC tiebreaks on BOTH engines (v4's
    discipline), so candidate sets and final ranks are identical."""
    e = load(spark, sf, "embeddings").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("emb")
    )
    probes = e.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("probe_id"),
        F.col("emb").alias("pemb"),
        F.slice("emb", 1, _V13_PD).alias("pp"),
    )
    s1 = (
        F.broadcast(probes.select("probe_id", "pp"))
        .join(
            e.select(
                F.col("vec_id").alias("cand_id"),
                F.slice("emb", 1, _V13_PD).alias("cp"),
            ),
            F.col("probe_id") != F.col("cand_id"),
        )
        .select(
            "probe_id",
            "cand_id",
            F.round(_cos(F.col("pp"), F.col("cp")), 6).alias("prefix_cosine"),
        )
    )
    w1 = Window.partitionBy("probe_id").orderBy(
        F.desc("prefix_cosine"), F.asc("cand_id")
    )
    cand = (
        s1.withColumn("rn", F.row_number().over(w1))
        .filter(F.col("rn") <= _V13_C)
        .select("probe_id", "cand_id", "prefix_cosine")
    )
    s2 = (
        e.join(
            F.broadcast(cand), e["vec_id"] == cand["cand_id"]
        )
        .join(
            F.broadcast(probes.select("probe_id", "pemb")), "probe_id"
        )
        .select(
            "probe_id",
            "cand_id",
            F.round(_cos(F.col("pemb"), F.col("emb")), 6).alias("cosine"),
            "prefix_cosine",
        )
    )
    w2 = Window.partitionBy("probe_id").orderBy(
        F.desc("cosine"), F.asc("cand_id")
    )
    return (
        s2.withColumn("rnk", F.row_number().over(w2))
        .filter(F.col("rnk") <= _V13_K)
        .select("probe_id", "cand_id", "cosine", "prefix_cosine", "rnk")
    )


# =========================================================================
# X27: temperature-scaled source mixing (round 3 continuation)
# =========================================================================

_X27_TAU = 0.5   # temperature: p_s ∝ tokens_s^τ (τ=1 natural, τ→0 uniform)
_X27_BUDGET = 0.5  # sampled budget as a fraction of the corpus's tokens


_X27_SQL = f"""
WITH t AS (SELECT doc_id, source,
                  CAST(len(string_split(text, ' ')) AS DOUBLE) AS ntok
           FROM documents),
s AS (SELECT source, SUM(ntok) AS stok FROM t GROUP BY source),
g AS (SELECT SUM(stok) AS tot, SUM(SQRT(stok)) AS z FROM s),
r AS (SELECT source,
             ROUND(LEAST(1.0,
               {_X27_BUDGET} * g.tot * (SQRT(s.stok) / g.z) / s.stok), 6)
               AS rate
      FROM s, g)
SELECT t.doc_id, t.source, r.rate,
       (r.rate >= 1.0
        OR substring(md5('mix1-' || CAST(t.doc_id AS VARCHAR)), 1, 6)
           < printf('%06x', CAST(ROUND(r.rate * 16777216, 0) AS BIGINT)))
         AS kept
FROM t JOIN r USING (source)
"""


@qt("x27_source_mixing", _X27_SQL)
def x27(spark, sf):
    """X27: temperature-scaled source mixing — the multilingual/multi-source
    sampling rule [PUB: Conneau & Lample 2019 XLM §3.1; Xue et al. 2021 mT5
    α-sampling; Xie et al. 2023 DoReMi is the learned refinement]: target
    share p_s ∝ tokens_s^τ (τ={_X27_TAU} here — big sources damped, small
    sources boosted), per-source keep-rate = min(1, B·p_s/tokens_s) against
    a {_X27_BUDGET}-of-corpus token budget, applied per doc by the x15/x18
    salted-md5 hex threshold, so the SAME doc set is reproduced by any
    engine with md5 — no RNG state anywhere.

    Scale shape for 100 TB: the per-source statistics table is O(sources)
    (hash agg with map-side combine over (source, ntok) — text never
    shuffles), the rate table broadcasts, and the keep decision is a
    stateless per-row expression; 10^12 docs stream through one scan +
    one broadcast join. Cross-engine exactness: rates are 6-dp rounded on
    BOTH engines before the threshold is derived, and the threshold
    comparison is fixed-width lowercase hex (lexicographic == numeric);
    rate >= 1 short-circuits so the 7-hex-digit boundary case never
    reaches the string compare."""
    d = load(spark, sf, "documents").select(
        "doc_id",
        "source",
        F.size(F.split("text", " ")).cast("double").alias("ntok"),
    )
    s = d.groupBy("source").agg(F.sum("ntok").alias("stok"))
    g = s.agg(
        F.sum("stok").alias("tot"), F.sum(F.sqrt("stok")).alias("z")
    )
    r = (
        s.crossJoin(F.broadcast(g))
        .select(
            "source",
            F.round(
                F.least(
                    F.lit(1.0),
                    F.lit(_X27_BUDGET)
                    * F.col("tot")
                    * (F.sqrt("stok") / F.col("z"))
                    / F.col("stok"),
                ),
                6,
            ).alias("rate"),
        )
    )
    thr = F.format_string(
        "%06x", F.round(F.col("rate") * 16777216, 0).cast("long")
    )
    h6 = F.substring(
        F.md5(F.concat(F.lit("mix1-"), F.col("doc_id").cast("string"))), 1, 6
    )
    return (
        d.join(F.broadcast(r), "source")
        .select(
            "doc_id",
            "source",
            "rate",
            ((F.col("rate") >= 1.0) | (h6 < thr)).alias("kept"),
        )
    )


# =========================================================================
# V14: SemDeDup — semantic dedup via cluster-then-prune
# =========================================================================

_V14_K = 8      # coarse clusters (scales with corpus size in production)
_V14_THETA = 0.35  # duplicate threshold on 6-dp rounded cosine (v3's scale)


@qt("v14_semdedup", None)  # k-means is iterative: rows-only driver check;
# numpy-mirrored + golden-hashed in pytest
def v14(spark, sf):
    """V14: SemDeDup [PUB: Abbas et al. 2023, "SemDeDup: Data-efficient
    learning at web-scale through semantic deduplication"] — k-means the
    embedding space (v5's deterministic Lloyd engine), then WITHIN each
    cluster mark every vector that has a same-cluster neighbor with
    cosine >= {_V14_THETA} and a smaller vec_id as a semantic duplicate
    (keep-lowest-id, the x14/x26 deterministic keep policy). Output:
    (vec_id, cluster, kept). This is the semantic complement of x1/x10:
    exact and MinHash dedup catch verbatim/near-verbatim text; SemDeDup
    catches paraphrases and re-encodings that share no n-grams.

    Scale shape for 100 TB: the pairwise pass is confined within
    clusters — the SemDeDup design point: k grows with the corpus so
    E[cluster size] stays bounded, making the quadratic term
    O(n²/k) with cluster-keyed shuffles only (never a global n²); the
    k-means stage itself is the v5 engine (O(k·dim) driver state,
    map-side-combined updates). Exactness: flags are numpy-mirrored
    given the cluster assignment, k-means determinism is v5's (pinned
    there), and the whole output is sf0.01 golden-hashed."""
    from pcd_spark.vector.kmeans import kmeans

    e = load(spark, sf, "embeddings").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("emb")
    )
    # coarse cells only — SemDeDup does not need Lloyd convergence (Abbas
    # et al. run 1 epoch); 10 capped iterations halve the query cost
    asg = kmeans(e, k=_V14_K, vec_col="emb", id_col="vec_id", max_iter=10)
    m = e.join(asg, "vec_id").select("vec_id", "emb", "cluster")
    a = m.select(
        F.col("vec_id").alias("v1"), F.col("emb").alias("e1"), "cluster"
    )
    b = m.select(
        F.col("vec_id").alias("v2"), F.col("emb").alias("e2"), "cluster"
    )
    dups = (
        a.join(b, ["cluster"])
        .filter(F.col("v1") < F.col("v2"))
        .filter(F.round(_cos(F.col("e1"), F.col("e2")), 6) >= _V14_THETA)
        .select(F.col("v2").alias("vec_id"))
        .distinct()
    )
    return (
        m.join(dups.withColumn("_dup", F.lit(True)), "vec_id", "left")
        .select(
            "vec_id",
            "cluster",
            F.coalesce(~F.col("_dup"), F.lit(True)).alias("kept"),
        )
    )


# =========================================================================
# X28: end-to-end curation pipeline (composition capstone)
# =========================================================================

_X28_SQL = f"""
WITH x26 AS ({_X26_SQL}),
rw AS (SELECT x26.doc_id, d.source, x26.n_segments, x26.n_dropped,
              x26.kept_text,
              len(string_split(x26.kept_text, ' ')) AS ntok
       FROM x26 JOIN documents d USING (doc_id)),
gated AS (SELECT * FROM rw
          WHERE ntok >= 10
            AND (n_segments = 0 OR n_dropped * 2 <= n_segments)),
s AS (SELECT source, CAST(SUM(ntok) AS DOUBLE) AS stok
      FROM gated GROUP BY source),
g AS (SELECT SUM(stok) AS tot, SUM(SQRT(stok)) AS z FROM s),
r AS (SELECT source,
             ROUND(LEAST(1.0,
               {_X27_BUDGET} * g.tot * (SQRT(s.stok) / g.z) / s.stok), 6)
               AS rate
      FROM s, g),
mixed AS (SELECT gated.*, r.rate FROM gated JOIN r USING (source)
          WHERE r.rate >= 1.0
             OR substring(md5('mix1-' || CAST(doc_id AS VARCHAR)), 1, 6)
                < printf('%06x', CAST(ROUND(r.rate * 16777216, 0) AS BIGINT)))
SELECT doc_id, source,
       CASE WHEN substring(md5(CAST(doc_id AS VARCHAR)), 1, 2) < 'e6'
              THEN 'train'
            WHEN substring(md5(CAST(doc_id AS VARCHAR)), 1, 2) < 'f3'
              THEN 'val'
            ELSE 'test' END AS split,
       CAST(ntok AS BIGINT) AS n_tokens_kept
FROM mixed
"""


@qt("x28_curation_pipeline", _X28_SQL)
def x28(spark, sf):
    """X28: the full curation pipeline as ONE declarative plan — segment
    dedup rewrite (x26) → post-rewrite quality gate (>=10 surviving
    tokens AND at most half the segments dropped) → temperature-scaled
    source mixing over the SURVIVORS' token mass (x27's rule — rates
    reflect what actually remains after dedup+gating, the order a real
    pipeline uses) → x15 split assignment. Output: (doc_id, source,
    split, n_tokens_kept) for every surviving doc. This is the
    composition capstone: a reference user's end-to-end corpus build is
    one queries() entry, one Catalyst plan, one DuckDB-checkable result.

    Scale shape inherits from its stages — the only corpus-sized
    shuffles are x26's digest-keyed winner agg and the doc_id-keyed
    reconstruction join; the mixing stats are O(sources) and broadcast;
    gate and split are stateless per-row. Every stage's exactness is
    already pinned individually (x26/x27/x15 driver rows + pytest); this
    query pins the COMPOSITION cross-engine."""
    rewritten = x26(spark, sf)
    d = load(spark, sf, "documents").select("doc_id", "source")
    rw = rewritten.join(d, "doc_id").select(
        "doc_id",
        "source",
        "n_segments",
        "n_dropped",
        F.size(F.split("kept_text", " ")).alias("ntok"),
    )
    gated = rw.filter(
        (F.col("ntok") >= 10)
        & ((F.col("n_segments") == 0)
           | (F.col("n_dropped") * 2 <= F.col("n_segments")))
    )
    s = gated.groupBy("source").agg(
        F.sum(F.col("ntok").cast("double")).alias("stok")
    )
    g = s.agg(F.sum("stok").alias("tot"), F.sum(F.sqrt("stok")).alias("z"))
    r = s.crossJoin(F.broadcast(g)).select(
        "source",
        F.round(
            F.least(
                F.lit(1.0),
                F.lit(_X27_BUDGET) * F.col("tot")
                * (F.sqrt("stok") / F.col("z")) / F.col("stok"),
            ),
            6,
        ).alias("rate"),
    )
    thr = F.format_string(
        "%06x", F.round(F.col("rate") * 16777216, 0).cast("long")
    )
    h6 = F.substring(
        F.md5(F.concat(F.lit("mix1-"), F.col("doc_id").cast("string"))), 1, 6
    )
    mixed = gated.join(F.broadcast(r), "source").filter(
        (F.col("rate") >= 1.0) | (h6 < thr)
    )
    h2 = F.substring(F.md5(F.col("doc_id").cast("string")), 1, 2)
    return mixed.select(
        "doc_id",
        "source",
        F.when(h2 < "e6", "train")
        .when(h2 < "f3", "val")
        .otherwise("test")
        .alias("split"),
        F.col("ntok").cast("long").alias("n_tokens_kept"),
    )


# =========================================================================
# V15: 1-bit binary sign quantization + Hamming top-k (round 3 cont.)
# =========================================================================


@qt(
    "v15_hamming_topk",
    """WITH probes AS (SELECT vec_id AS probe_id, embedding AS pemb
                       FROM embeddings WHERE vec_id < 5),
       scored AS (
         SELECT p.probe_id, e.vec_id AS cand_id,
                (SELECT COUNT(*) FROM generate_series(1, 64) g(i)
                 WHERE (p.pemb[i] > 0) <> (e.embedding[i] > 0)) AS hamming
         FROM probes p JOIN embeddings e ON e.vec_id <> p.probe_id)
       SELECT probe_id, cand_id, hamming FROM (
         SELECT *, ROW_NUMBER() OVER (PARTITION BY probe_id
                                      ORDER BY hamming ASC, cand_id ASC) AS rn
         FROM scored) WHERE rn <= 3""",
)
def v15(spark, sf):
    """V15: binary (1-bit sign) quantization + Hamming top-k — the most
    compressed member of the index family (v1 exact, v2/v3 sign-LSH
    buckets, v4 IVF, v6/v7 PQ, v9 SQ8): each 64-dim float vector becomes
    ONE long (bit i = embedding[i] > 0), a 512x wire/cache reduction, and
    distance is a single XOR + POPCOUNT per candidate — pure codegen'd
    integer ops, no float math in the scan loop [PUB: Charikar STOC 2002
    (sign random projections); the packed-popcount search is the standard
    "binary quantization" path in faiss/modern vector stores]. Wider
    vectors pack into ceil(dim/64) longs; the sf tables are 64-dim so one
    suffices (TESTDATA.md).

    Exactness/oracle discipline: Hamming distance is an INTEGER — no
    rounding rules needed; the DuckDB oracle computes the same
    sign-disagreement count dimension-wise (no packing), so the value
    equality it checks is packing-independent. Ties (many, in a 64-bit
    code space) break by cand_id ASC on both engines. Plan shape is
    v8/v9's broadcast-probes scan: probes BuildLeft, the one-long-per-row
    encoded table streams scan-side."""
    e = load(spark, sf, "embeddings").select("vec_id", "embedding")
    code = F.lit(0).cast("long")
    for i in range(_EMB_DIM):
        code = code.bitwiseOR(
            F.when(
                F.col("embedding")[i] > 0,
                F.lit((1 << i) if i < 63 else -(1 << 63)).cast("long"),
            ).otherwise(F.lit(0).cast("long"))
        )
    enc = e.select("vec_id", code.alias("code"))
    probes = enc.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("probe_id"), F.col("code").alias("pcode")
    )
    scored = (
        F.broadcast(probes)
        .join(enc, F.col("probe_id") != F.col("vec_id"))
        .select(
            "probe_id",
            F.col("vec_id").alias("cand_id"),
            F.bit_count(F.col("pcode").bitwiseXOR(F.col("code")))
            .cast("long")
            .alias("hamming"),
        )
    )
    w = Window.partitionBy("probe_id").orderBy(F.asc("hamming"), F.asc("cand_id"))
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 3)
        .select("probe_id", "cand_id", "hamming")
    )


# =========================================================================
# round-3 fifth continuation: chunking, semantic decontamination, k-center
# =========================================================================

_CHUNK_W = 40  # tokens per chunk
_CHUNK_S = 30  # stride (10-token overlap)


@qt(
    "x29_chunk_documents",
    f"""WITH t AS (SELECT doc_id, string_split(text, ' ') AS toks
                   FROM documents),
        n AS (SELECT doc_id, toks, len(toks) AS n,
                     CASE WHEN len(toks) <= {_CHUNK_W} THEN 1
                          ELSE CAST(CEIL((len(toks) - {_CHUNK_W}) / {_CHUNK_S}.0)
                                    AS BIGINT) + 1 END AS n_chunks
              FROM t),
        c AS (SELECT doc_id, toks, n, UNNEST(range(n_chunks)) AS chunk_id
              FROM n),
        s AS (SELECT doc_id, chunk_id,
                     list_slice(toks, chunk_id * {_CHUNK_S} + 1,
                                LEAST(chunk_id * {_CHUNK_S} + {_CHUNK_W}, n))
                       AS ctoks
              FROM c)
        SELECT doc_id, chunk_id, len(ctoks) AS n_tokens,
               MD5(array_to_string(ctoks, ' ')) AS chunk_md5
        FROM s ORDER BY doc_id, chunk_id""",
)
def x29(spark, sf):
    """X29: sliding-window document chunking with overlap — the standard
    pretraining/RAG segmentation step (fixed token window w=40, stride
    s=30, so consecutive chunks share a 10-token overlap; every document
    yields >= 1 chunk and the tail chunk is the ragged remainder). All
    codegen'd array ops: split -> sequence/posexplode over the chunk count
    -> slice -> array_join -> md5; the text is tokenized ONCE scan-side and
    only (doc_id, chunk_id, n_tokens, md5) ever shuffles — at 100 TB the
    chunk table is a fingerprint stream, not a text copy (x16's discipline;
    chunk_md5 keys downstream chunk-level dedup). Chunk-count law
    n<=w -> 1 else ceil((n-w)/s)+1 is computed identically on both
    engines."""
    d = load(spark, sf, "documents")
    toks = F.split(F.col("text"), " ")
    n = F.size(toks)
    n_chunks = F.when(n <= _CHUNK_W, F.lit(1).cast("long")).otherwise(
        F.ceil((n - F.lit(_CHUNK_W)) / F.lit(float(_CHUNK_S))).cast("long") + 1
    )
    base = d.select("doc_id", toks.alias("toks"), n.alias("n"), n_chunks.alias("nc"))
    exploded = base.select(
        "doc_id",
        "toks",
        "n",
        F.posexplode(F.sequence(F.lit(0).cast("long"), F.col("nc") - 1)).alias(
            "_pos", "chunk_id"
        ),
    )
    ctoks = F.slice(
        F.col("toks"), F.col("chunk_id").cast("int") * _CHUNK_S + 1, _CHUNK_W
    )
    return exploded.select(
        "doc_id",
        "chunk_id",
        F.size(ctoks).alias("n_tokens"),
        F.md5(F.array_join(ctoks, " ")).alias("chunk_md5"),
    ).orderBy("doc_id", "chunk_id")


_DECON_TAU = 0.30  # cosine threshold: benchmark-overlap flag
_DECON_BENCH = 20  # vec_id < 20 = the "benchmark" embedding set


@qt(
    "x30_semantic_decontamination",
    f"""WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS emb
                   FROM embeddings),
        bench AS (SELECT * FROM e WHERE vec_id < {_DECON_BENCH}),
        corpus AS (SELECT * FROM e WHERE vec_id >= {_DECON_BENCH}),
        scored AS (
          SELECT c.vec_id,
                 MAX(ROUND(list_dot_product(c.emb, b.emb)
                           / (SQRT(list_dot_product(c.emb, c.emb))
                              * SQRT(list_dot_product(b.emb, b.emb))), 6))
                   AS max_cos
          FROM corpus c CROSS JOIN bench b
          GROUP BY c.vec_id)
        SELECT vec_id, max_cos,
               CAST(max_cos >= {_DECON_TAU} AS INT) AS contaminated
        FROM scored ORDER BY vec_id""",
)
def x30(spark, sf):
    """X30: SEMANTIC decontamination — x12's n-gram benchmark-overlap
    check, upgraded to embedding space: a corpus item is flagged when its
    max cosine against ANY benchmark vector reaches tau (paraphrased eval
    leakage that exact n-gram matching misses; the embedding-similarity
    decontamination step in Gemini/Llama data cards). Same scale shape as
    x12/v1: the benchmark side is SMALL even when the corpus is 100 TB, so
    it broadcasts and the corpus streams scan-side through one
    codegen'd max-agg — output is O(corpus rows), no shuffle of
    embeddings. Threshold compares the ROUNDED score (v8's discipline) so
    a boundary pair cannot flip engines."""
    e = load(spark, sf, "embeddings").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("emb")
    )
    bench = e.filter(F.col("vec_id") < _DECON_BENCH).select(
        F.col("vec_id").alias("bid"), F.col("emb").alias("bemb")
    )
    corpus = e.filter(F.col("vec_id") >= _DECON_BENCH)
    scored = (
        F.broadcast(bench)
        .join(corpus)
        .groupBy("vec_id")
        .agg(
            F.max(F.round(_cos(F.col("emb"), F.col("bemb")), 6)).alias("max_cos")
        )
    )
    return scored.select(
        "vec_id",
        "max_cos",
        (F.col("max_cos") >= _DECON_TAU).cast("int").alias("contaminated"),
    ).orderBy("vec_id")


_KCENTER_K = 6


def _kcenter_sql(k: int) -> str:
    """Unrolled k-center CTE chain (the oracle is non-iterative SQL by
    construction: k is a compile-time constant, so the greedy loop unrolls
    into k LIMIT-1 selections — same dominance arithmetic as the engine)."""
    dist = (
        "ROUND(SQRT(GREATEST({x}.nn - 2 * list_dot_product({x}.emb, c.emb)"
        " + c.nn, 0)), 6)"
    )
    parts = [
        """WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS emb,
                      list_dot_product(CAST(embedding AS DOUBLE[]),
                                       CAST(embedding AS DOUBLE[])) AS nn
               FROM embeddings),
        c1 AS (SELECT vec_id, emb, nn FROM e ORDER BY vec_id LIMIT 1),
        d1 AS (SELECT e.vec_id, e.emb, e.nn, {d} AS md
               FROM e CROSS JOIN c1 c)""".format(d=dist.format(x="e"))
    ]
    for i in range(2, k + 1):
        parts.append(
            f"""c{i} AS (SELECT vec_id, emb, nn, md FROM d{i - 1}
                 ORDER BY md DESC, vec_id ASC LIMIT 1)"""
        )
        if i < k:
            parts.append(
                """d{i} AS (SELECT d.vec_id, d.emb, d.nn,
                     LEAST(d.md, {dd}) AS md
                 FROM d{p} d CROSS JOIN c{i} c)""".format(
                    i=i, p=i - 1, dd=dist.format(x="d")
                )
            )
    sel = ["SELECT 1 AS sel_rank, vec_id, 0.0 AS sel_dist FROM c1"]
    sel += [
        f"SELECT {i} AS sel_rank, vec_id, md AS sel_dist FROM c{i}"
        for i in range(2, k + 1)
    ]
    return ",\n".join(parts) + "\n" + "\nUNION ALL ".join(sel) + "\nORDER BY sel_rank"


@qt("v16_kcenter_coreset", _kcenter_sql(_KCENTER_K))
def v16(spark, sf):
    """V16: greedy k-center coreset (farthest-point traversal) — the
    2-approximation to the k-center cover [PUB: Gonzalez 1985 "Clustering
    to minimize the maximum intercluster distance"; Har-Peled 2011 coreset
    surveys] and the standard DIVERSITY-sampling primitive for training-data
    curation (pick the k most mutually-distant exemplars; complements
    x18's quality-tiered and x27's source-mix sampling, which are
    frequency-based). Seed = smallest vec_id, then k-1 rounds of
    argmax-of-min-distance. Engine shape per round: ONE codegen'd
    TakeOrderedAndProject top-1 over the running min-distance column
    (distributed top-k, no global sort) + a broadcast-literal distance
    update — driver state is O(k x dim), the k-means/v5 budget. Distances
    are ROUNDED (6 dp) BEFORE the argmax on BOTH engines with vec_id ASC
    tie-break, so 1-ulp fold-order skew cannot flip a selection (v8's
    proven discipline). Euclidean via the dot-product identity
    ||a-b||^2 = nn_a - 2<a,b> + nn_b: per-row self-norms are computed once
    scan-side; at 100 TB each round streams the corpus once, shuffles
    nothing but the top-1."""
    e = (
        load(spark, sf, "embeddings")
        .select("vec_id", F.col("embedding").cast("array<double>").alias("emb"))
        .withColumn(
            "nn",
            F.aggregate(
                F.transform("emb", lambda a: a * a),
                F.lit(0.0),
                lambda acc, x: acc + x,
            ),
        )
        .persist()
    )

    def dist_to(center_emb, center_nn):
        clit = F.array(*[F.lit(float(v)) for v in center_emb])
        dot = F.aggregate(
            F.zip_with("emb", clit, lambda a, b: a * b),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
        return F.round(
            F.sqrt(F.greatest(F.col("nn") - 2 * dot + F.lit(float(center_nn)), F.lit(0.0))),
            6,
        )

    first = e.orderBy("vec_id").limit(1).collect()[0]
    centers = [(1, int(first["vec_id"]), 0.0)]
    cur = e.withColumn("md", dist_to(first["emb"], first["nn"]))
    for i in range(2, _KCENTER_K + 1):
        top = cur.orderBy(F.desc("md"), F.asc("vec_id")).limit(1).collect()[0]
        centers.append((i, int(top["vec_id"]), float(top["md"])))
        if i < _KCENTER_K:
            cur = cur.withColumn(
                "md", F.least(F.col("md"), dist_to(top["emb"], top["nn"]))
            )
    e.unpersist()
    return spark.createDataFrame(
        centers, "sel_rank int, vec_id long, sel_dist double"
    ).orderBy("sel_rank")


@qt(
    "x31_lsh_calibration",
    f"""WITH d AS (SELECT doc_id, text FROM documents
                   WHERE n_chars BETWEEN 100 AND 200),
        sig AS (SELECT doc_id,
                       {_minhash_sql("s1")} AS m1, {_minhash_sql("s2")} AS m2,
                       {_minhash_sql("s3")} AS m3, {_minhash_sql("s4")} AS m4
                FROM d),
        bands AS (SELECT doc_id, MD5('1' || m1 || m2) AS bk FROM sig
                  UNION ALL
                  SELECT doc_id, MD5('2' || m3 || m4) AS bk FROM sig),
        cand AS (SELECT DISTINCT a.doc_id AS d1, b.doc_id AS d2
                 FROM bands a JOIN bands b
                   ON a.bk = b.bk AND a.doc_id < b.doc_id),
        sh AS (SELECT doc_id,
                      list_distinct(list_transform(range(1, LENGTH(text) - 3),
                                                   i -> SUBSTR(text, i, 4)))
                        AS grams
               FROM d),
        tp AS (SELECT a.doc_id AS d1, b.doc_id AS d2
               FROM sh a JOIN sh b ON a.doc_id < b.doc_id
               WHERE CAST(LEN(list_intersect(a.grams, b.grams)) AS DOUBLE)
                     / (LEN(a.grams) + LEN(b.grams)
                        - LEN(list_intersect(a.grams, b.grams))) > 0.3),
        n AS (SELECT (SELECT COUNT(*) FROM cand) AS n_cand,
                     (SELECT COUNT(*) FROM tp) AS n_true,
                     (SELECT COUNT(*)
                      FROM cand c JOIN tp t
                        ON c.d1 = t.d1 AND c.d2 = t.d2) AS n_hit)
        SELECT n_cand, n_true, n_hit,
               ROUND(CAST(n_hit AS DOUBLE) / NULLIF(n_cand, 0), 6)
                 AS precision_lsh,
               ROUND(CAST(n_hit AS DOUBLE) / NULLIF(n_true, 0), 6)
                 AS recall_lsh
        FROM n""",
)
def x31(spark, sf):
    """X31: MinHash-LSH calibration report — MEASURED precision/recall of
    the x3-style banding (B=2 bands x R=2 rows over the x2 seeds) against
    exact 4-gram Jaccard > 0.3 (x4's inverted-index truth) on the bounded
    document slice. This is the tuning loop a 100 TB dedup pipeline runs
    before committing to a (B, R) choice [PUB: Leskovec, Rajaraman &
    Ullman, "Mining of Massive Datasets" ch. 3 — the S-curve
    1-(1-J^R)^B]: theory predicts the threshold, this op measures where
    the operating point actually lands on YOUR corpus (shingle length,
    doc-length mix, and seed count all move it). Runs on a sampled slice
    by design — calibration needs a measurable truth set, and exact
    Jaccard truth is only affordable on a bounded cohort; the chosen
    (B, R) then applies corpus-wide through x3/x10. All three counts are
    integers (no float discipline needed until the final two ROUND'd
    ratios); the three 1-row counts cross-join as broadcast scalars
    (x27/x28's exempted literal-build pattern)."""
    d = _spread(
        load(spark, sf, "documents")
        .filter(F.col("n_chars").between(100, 200))
        .select("doc_id", "text")
    )
    sig = d.select(
        "doc_id",
        _minhash_col("s1").alias("m1"),
        _minhash_col("s2").alias("m2"),
        _minhash_col("s3").alias("m3"),
        _minhash_col("s4").alias("m4"),
    ).localCheckpoint(eager=True)  # signatures feed both band arms once
    bands = sig.select(
        "doc_id", F.md5(F.concat(F.lit("1"), "m1", "m2")).alias("bk")
    ).unionByName(
        sig.select("doc_id", F.md5(F.concat(F.lit("2"), "m3", "m4")).alias("bk"))
    )
    cand = (
        bands.select(F.col("doc_id").alias("d1"), "bk")
        .join(bands.select(F.col("doc_id").alias("d2"), "bk"), "bk")
        .filter(F.col("d1") < F.col("d2"))
        .select("d1", "d2")
        .distinct()
        .localCheckpoint(eager=True)  # reused: n_cand count + hit join
    )
    sh = d.select(
        "doc_id",
        F.array_distinct(
            F.transform(
                F.sequence(F.lit(1), F.length("text") - 4),
                lambda i: F.expr("text").substr(i, F.lit(4)),
            )
        ).alias("grams"),
    ).localCheckpoint(eager=True)
    sizes = sh.select("doc_id", F.size("grams").alias("sz"))
    post = sh.select("doc_id", F.explode("grams").alias("gram"))
    inter_df = (
        post.select(F.col("doc_id").alias("d1"), "gram")
        .join(post.select(F.col("doc_id").alias("d2"), "gram"), "gram")
        .filter(F.col("d1") < F.col("d2"))
        .groupBy("d1", "d2")
        .agg(F.count("*").alias("inter"))
    )
    tp = (
        inter_df.join(sizes.withColumnRenamed("doc_id", "d1")
                      .withColumnRenamed("sz", "sz1"), "d1")
        .join(sizes.withColumnRenamed("doc_id", "d2")
              .withColumnRenamed("sz", "sz2"), "d2")
        .filter(
            F.col("inter").cast("double")
            / (F.col("sz1") + F.col("sz2") - F.col("inter"))
            > 0.3
        )
        .select("d1", "d2")
        .localCheckpoint(eager=True)  # reused: n_true count + hit join
    )
    n_cand = cand.agg(F.count("*").alias("n_cand"))
    n_true = tp.agg(F.count("*").alias("n_true"))
    n_hit = cand.join(tp, ["d1", "d2"]).agg(F.count("*").alias("n_hit"))
    return (
        n_cand.crossJoin(n_true)
        .crossJoin(n_hit)
        .select(
            "n_cand",
            "n_true",
            "n_hit",
            F.round(
                F.col("n_hit").cast("double") / F.nullif(F.col("n_cand"), F.lit(0)),
                6,
            ).alias("precision_lsh"),
            F.round(
                F.col("n_hit").cast("double") / F.nullif(F.col("n_true"), F.lit(0)),
                6,
            ).alias("recall_lsh"),
        )
    )


_SOURCE_CAP = 15  # max documents kept per source (binds at every sf)


@qt(
    "x32_source_caps",
    f"""SELECT doc_id, source, src_rank FROM (
          SELECT doc_id, source,
                 ROW_NUMBER() OVER (
                   PARTITION BY source
                   ORDER BY MD5(CAST(doc_id AS VARCHAR)), doc_id) AS src_rank
          FROM documents)
        WHERE src_rank <= {_SOURCE_CAP}
        ORDER BY source, src_rank""",
)
def x32(spark, sf):
    """X32: per-source document caps — the per-domain cap step every
    web-corpus curation pipeline applies (an over-crawled domain must not
    dominate the training mix; caps are the blunt-but-standard complement
    to x27's temperature mixing, which RESAMPLES rates but never bounds an
    individual source). Selection within a source is a deterministic
    hash-rank (md5 of the doc id — x15/x18's engine-portable RNG-free
    discipline), so the kept set is reproducible at any parallelism and
    identical cross-engine; doc_id tiebreak makes the order total even
    under md5 collisions. The window partitions BY SOURCE (never
    partitionless — the repo's plan-sweep rule), so at 100 TB each
    source's rank runs partition-locally after one hash shuffle; only
    (doc_id, source) ever moves."""
    d = load(spark, sf, "documents").select("doc_id", "source")
    w = Window.partitionBy("source").orderBy(
        F.md5(F.col("doc_id").cast("string")), F.col("doc_id")
    )
    return (
        d.withColumn("src_rank", F.row_number().over(w))
        .filter(F.col("src_rank") <= _SOURCE_CAP)
        .orderBy("source", "src_rank")
    )


@qt(
    "x33_winnowing_fingerprints",
    """WITH norm AS (
         SELECT doc_id,
                LOWER(regexp_replace(text, '[^a-zA-Z0-9]', '', 'g')) AS s
         FROM documents),
       grams AS (
         SELECT doc_id,
                unnest(generate_series(1, LENGTH(s) - 7)) AS pos,
                LENGTH(s) - 7 AS ng, s
         FROM norm WHERE LENGTH(s) >= 8),
       keyed AS (
         SELECT doc_id, pos, ng,
                md5(substr(s, pos, 8))
                  || lpad(CAST(pos AS VARCHAR), 8, '0') AS key
         FROM grams),
       win AS (
         SELECT doc_id, pos, ng,
                MIN(key) OVER (PARTITION BY doc_id ORDER BY pos
                               ROWS BETWEEN CURRENT ROW AND 3 FOLLOWING)
                  AS sel
         FROM keyed)
       SELECT DISTINCT doc_id,
              CAST(substr(sel, 33, 8) AS BIGINT) AS pos,
              substr(sel, 1, 32) AS fp
       FROM win WHERE pos <= ng - 3
       ORDER BY doc_id, pos""",
)
def x33(spark, sf):
    """X33 (round 4): winnowing document fingerprints [PUB: Schleimer,
    Wilkerson & Aiken SIGMOD 2003 — the MOSS algorithm]. Selects the
    minimum k-gram hash (k=8 normalized chars) in every sliding window of
    w=4 consecutive grams, which guarantees: any verbatim overlap of
    length >= w+k-1 = 11 normalized chars between two documents SHARES at
    least one selected fingerprint — the positional, locality-guaranteed
    complement to X8 (whole-doc digest: position-blind) and X2/X3 (MinHash:
    probabilistic). This is the fingerprint family plagiarism/provenance
    scanners run corpus-wide; expected density 2/(w+1) keeps the index at
    ~1/3 of the gram count.

    Engine-portability trick: winnowing needs only SOME total order on
    gram hashes, so both engines order the md5 HEX STRING, and the
    rightmost-vs-leftmost tie rule is made explicit by minimizing
    md5hex || zero-padded-position (leftmost minimum) — one string MIN
    per window, no numeric hash conversion to drift between engines.
    Spark shape: scan-side normalize -> posexplode(sequence) gram
    generation -> ONE doc-keyed window MIN (partition key = shuffle key)
    -> distinct; at 100 TB the gram explosion never leaves its scan task
    and only selected fingerprints (~gram_count x 2/(w+1), deduped)
    shuffle for the distinct."""
    d = _spread(load(spark, sf, "documents")).select(
        "doc_id",
        F.lower(F.regexp_replace("text", "[^a-zA-Z0-9]", "")).alias("s"),
    ).filter(F.length("s") >= 8)
    grams = d.select(
        "doc_id",
        (F.length("s") - 7).alias("ng"),
        F.posexplode(F.sequence(F.lit(1), F.length("s") - 7)).alias(
            "_i", "pos"
        ),
        F.col("s"),
    ).select(
        "doc_id",
        "ng",
        "pos",
        F.concat(
            F.md5(F.col("s").substr(F.col("pos"), F.lit(8))),
            F.lpad(F.col("pos").cast("string"), 8, "0"),
        ).alias("key"),
    )
    w = Window.partitionBy("doc_id").orderBy("pos").rowsBetween(0, 3)
    sel = (
        grams.select("doc_id", "pos", "ng", F.min("key").over(w).alias("sel"))
        .filter(F.col("pos") <= F.col("ng") - 3)
        .select(
            "doc_id",
            F.substring("sel", 33, 8).cast("long").alias("pos"),
            F.substring("sel", 1, 32).alias("fp"),
        )
        .distinct()
    )
    return sel.orderBy("doc_id", "pos")


@qt(
    "x34_zipf_fit",
    """WITH toks AS (SELECT unnest(string_split(text, ' ')) AS w
                     FROM documents WHERE length(text) > 0),
       freq AS (SELECT w, CAST(COUNT(*) AS DOUBLE) AS f
                FROM toks WHERE w <> '' GROUP BY w),
       ranked AS (SELECT f, ROW_NUMBER() OVER (ORDER BY f DESC, w ASC) AS r
                  FROM freq),
       top AS (SELECT LN(r) AS x, LN(f) AS y FROM ranked WHERE r <= 200),
       s AS (SELECT COUNT(*) AS n, SUM(x) AS sx, SUM(y) AS sy,
                    SUM(x*x) AS sxx, SUM(y*y) AS syy, SUM(x*y) AS sxy
             FROM top)
       SELECT CAST(n AS BIGINT) AS n_ranks,
              ROUND((n*sxy - sx*sy) / (n*sxx - sx*sx), 6) AS zipf_slope,
              ROUND((sy - ((n*sxy - sx*sy) / (n*sxx - sx*sx)) * sx) / n, 6)
                AS intercept,
              ROUND(POWER(n*sxy - sx*sy, 2)
                    / ((n*sxx - sx*sx) * (n*syy - sy*sy)), 6) AS r2
       FROM s""",
)
def x34(spark, sf):
    """X34 (round 4): Zipf-law fit over the corpus token frequency
    spectrum [PUB: Zipf 1949; Piantadosi 2014 review] — OLS slope of
    ln(freq) on ln(rank) over the top-200 ranks, plus R^2. Natural text
    sits near slope -1 with high R^2; corpora polluted by templates,
    machine-generated spam, or truncation drift measurably (flatter
    slope, lower fit) — a one-row corpus-health gauge the curation
    pipeline (x19/x27/x32) reads before committing a mix, and a
    distribution-shift tripwire between ingestion snapshots.

    Same tokenizer as X21 (split on ' ', drop empties) so the two quality
    ops share one vocabulary definition. Spark shape: scan-side explode ->
    ONE word hash-agg (partial/map-side combinable) -> top-200 via the F3
    TakeOrderedAndProject pattern (limit BEFORE ranking, so the
    vocabulary never funnels through a partition-less Window — the
    global_rank/no-single-partition-Window house rule) -> rank the 200
    survivors -> one 6-term scalar agg; the regression is closed-form in
    the sums, no driver math beyond the final row."""
    toks = (
        _spread(load(spark, sf, "documents"))
        .filter(F.length("text") > 0)
        .select(F.explode(F.split("text", " ")).alias("w"))
        .filter(F.col("w") != "")
    )
    freq = toks.groupBy("w").agg(F.count("*").cast("double").alias("f"))
    # TakeOrderedAndProject bounds the set to 200 rows FIRST; the window
    # then ranks a literal-sized frame (its single partition is 200 rows
    # by construction, not the vocabulary)
    top200 = freq.orderBy(F.desc("f"), F.asc("w")).limit(200)
    ranked = top200.select(
        "f",
        F.row_number().over(Window.orderBy(F.desc("f"), F.asc("w"))).alias("r"),
    )
    top = ranked.select(F.log("r").alias("x"), F.log("f").alias("y"))
    s = top.agg(
        F.count("*").cast("double").alias("n"),
        F.sum("x").alias("sx"),
        F.sum("y").alias("sy"),
        F.sum(F.col("x") * F.col("x")).alias("sxx"),
        F.sum(F.col("y") * F.col("y")).alias("syy"),
        F.sum(F.col("x") * F.col("y")).alias("sxy"),
    )
    slope = (F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")) / (
        F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")
    )
    return s.select(
        F.col("n").cast("long").alias("n_ranks"),
        F.round(slope, 6).alias("zipf_slope"),
        F.round((F.col("sy") - slope * F.col("sx")) / F.col("n"), 6).alias(
            "intercept"
        ),
        F.round(
            F.pow(F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy"), 2)
            / (
                (F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx"))
                * (F.col("n") * F.col("syy") - F.col("sy") * F.col("sy"))
            ),
            6,
        ).alias("r2"),
    )


@qt(
    "v17_embedding_audit",
    """WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS emb
                  FROM embeddings),
       norms AS (SELECT vec_id, SQRT(list_dot_product(emb, emb)) AS nrm,
                        len(emb) AS dim
                 FROM e),
       nstat AS (SELECT COUNT(*) AS n, MAX(dim) AS dim,
                        AVG(nrm) AS mean_norm, STDDEV_POP(nrm) AS std_norm,
                        MIN(nrm) AS min_norm, MAX(nrm) AS max_norm
                 FROM norms),
       comp AS (SELECT unnest(generate_series(1, len(emb))) AS d,
                       unnest(emb) AS val
                FROM e),
       mvec AS (SELECT d, AVG(val) AS m FROM comp GROUP BY d),
       mnorm AS (SELECT SQRT(SUM(m*m)) AS mean_vec_norm FROM mvec)
       SELECT CAST(n AS BIGINT) AS n_vectors, CAST(dim AS BIGINT) AS dim,
              ROUND(mean_norm, 6) AS mean_norm,
              ROUND(std_norm, 6) AS std_norm,
              ROUND(min_norm, 6) AS min_norm,
              ROUND(max_norm, 6) AS max_norm,
              ROUND(mean_vec_norm / mean_norm, 6) AS anisotropy
       FROM nstat, mnorm""",
)
def v17(spark, sf):
    """V17 (round 4): embedding-space audit — norm distribution
    (mean/std/min/max) plus ANISOTROPY, the ratio ||mean vector|| /
    mean ||v|| [PUB: Ethayarajh EMNLP 2019 "How contextual are
    contextualized representations?"; Mu & Viswanath ICLR 2018 all-but-
    the-top]. Embeddings crammed into a narrow cone (anisotropy -> 1)
    make cosine scores saturate and ANN recall collapse; near 0 means a
    centered, well-spread space. This is the evaluate-before-trust gate
    for the whole V family: run it BEFORE building v4/v6 indexes, because
    a drifted encoder shows up here as one cheap row, not as a silent
    recall regression after the index is built.

    Spark shape: norms stay array-side (H8 aggregate/zip_with dot
    products, no explosion); the mean vector needs per-dimension sums, so
    ONE posexplode -> dim-keyed hash-agg (map-side combinable, output =
    dim rows) -> one scalar norm; the two 1-row branches meet in the
    x27/x28-exempted broadcast-scalar cross join."""
    e = load(spark, sf, "embeddings").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("emb")
    )
    norms = e.select(
        F.sqrt(
            F.aggregate(
                F.zip_with(F.col("emb"), F.col("emb"), lambda a, b: a * b),
                F.lit(0.0),
                lambda acc, x: acc + x,
            )
        ).alias("nrm"),
        F.size("emb").alias("dim"),
    )
    nstat = norms.agg(
        F.count("*").cast("long").alias("n_vectors"),
        F.max("dim").cast("long").alias("dim"),
        F.avg("nrm").alias("mean_norm"),
        F.stddev_pop("nrm").alias("std_norm"),
        F.min("nrm").alias("min_norm"),
        F.max("nrm").alias("max_norm"),
    )
    mvec = (
        e.select(F.posexplode("emb").alias("d", "val"))
        .groupBy("d")
        .agg(F.avg("val").alias("m"))
    )
    mnorm = mvec.agg(
        F.sqrt(F.sum(F.col("m") * F.col("m"))).alias("mean_vec_norm")
    )
    return nstat.crossJoin(mnorm).select(
        "n_vectors",
        "dim",
        F.round("mean_norm", 6).alias("mean_norm"),
        F.round("std_norm", 6).alias("std_norm"),
        F.round("min_norm", 6).alias("min_norm"),
        F.round("max_norm", 6).alias("max_norm"),
        F.round(F.col("mean_vec_norm") / F.col("mean_norm"), 6).alias(
            "anisotropy"
        ),
    )


@qt(
    "v18_ivf_nprobe_sweep",
    f"""WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS emb
                   FROM embeddings),
        cent AS (SELECT vec_id AS cid, emb AS cemb FROM e
                 ORDER BY vec_id LIMIT {_IVF_CELLS}),
        asg AS (
          SELECT vec_id, emb, cid FROM (
            SELECT e.vec_id, e.emb, c.cid,
                   ROW_NUMBER() OVER (
                     PARTITION BY e.vec_id
                     ORDER BY ROUND(list_dot_product(e.emb, c.cemb)
                           / (SQRT(list_dot_product(e.emb, e.emb))
                              * SQRT(list_dot_product(c.cemb, c.cemb))), 6)
                       DESC, c.cid ASC) AS rn
            FROM e CROSS JOIN cent c) WHERE rn = 1),
        probes AS (SELECT vec_id AS probe_id, emb AS pemb FROM e
                   WHERE vec_id < 5),
        exact AS (
          SELECT probe_id, cand_id FROM (
            SELECT p.probe_id, c.vec_id AS cand_id,
                   ROW_NUMBER() OVER (PARTITION BY p.probe_id
                     ORDER BY ROUND(list_dot_product(p.pemb, c.emb)
                           / (SQRT(list_dot_product(p.pemb, p.pemb))
                              * SQRT(list_dot_product(c.emb, c.emb))), 6)
                       DESC, c.vec_id ASC) AS rn
            FROM probes p JOIN e c ON p.probe_id <> c.vec_id)
          WHERE rn <= {_V11_K}),
        pc_rank AS (
          SELECT p.probe_id, c.cid,
                 ROW_NUMBER() OVER (PARTITION BY p.probe_id
                   ORDER BY ROUND(list_dot_product(p.pemb, c.cemb)
                         / (SQRT(list_dot_product(p.pemb, p.pemb))
                            * SQRT(list_dot_product(c.cemb, c.cemb))), 6)
                     DESC, c.cid ASC) AS prn
          FROM probes p CROSS JOIN cent c),
        swept AS (
          SELECT np.nprobe, r.probe_id, r.cid
          FROM pc_rank r,
               (SELECT unnest([1, 2, 4, {_IVF_CELLS}]) AS nprobe) np
          WHERE r.prn <= np.nprobe),
        approx AS (
          SELECT nprobe, probe_id, cand_id FROM (
            SELECT s.nprobe, s.probe_id, a.vec_id AS cand_id,
                   ROW_NUMBER() OVER (PARTITION BY s.nprobe, s.probe_id
                     ORDER BY ROUND(list_dot_product(p.pemb, a.emb)
                           / (SQRT(list_dot_product(p.pemb, p.pemb))
                              * SQRT(list_dot_product(a.emb, a.emb))), 6)
                       DESC, a.vec_id ASC) AS rn
            FROM swept s
            JOIN probes p ON p.probe_id = s.probe_id
            JOIN asg a ON a.cid = s.cid AND a.vec_id <> s.probe_id)
          WHERE rn <= {_V11_K}),
        xnp AS (
          SELECT np.nprobe, x.probe_id, x.cand_id
          FROM exact x,
               (SELECT unnest([1, 2, 4, {_IVF_CELLS}]) AS nprobe) np),
        hits AS (
          SELECT xnp.nprobe, xnp.probe_id,
                 COUNT(*) AS n_exact, COUNT(a.cand_id) AS n_hit
          FROM xnp LEFT JOIN approx a ON a.nprobe = xnp.nprobe
                            AND a.probe_id = xnp.probe_id
                            AND a.cand_id = xnp.cand_id
          GROUP BY xnp.nprobe, xnp.probe_id)
        SELECT CAST(nprobe AS BIGINT) AS nprobe,
               CAST(COUNT(*) AS BIGINT) AS n_probes,
               ROUND(AVG(n_hit * 1.0 / n_exact), 4) AS mean_recall,
               ROUND(MIN(n_hit * 1.0 / n_exact), 4) AS min_recall
        FROM hits GROUP BY nprobe ORDER BY nprobe""",
)
def v18(spark, sf, nprobes=(1, 2, 4, _IVF_CELLS)):
    """V18 (round 4): IVF nprobe-vs-recall sweep — recall@10 of the V4
    index at nprobe in {1, 2, 4, 8} against V1's exact top-10, per
    sweep point the mean AND worst probe [PUB: Jegou, Douze & Schmid
    TPAMI 2011 — the operating-curve every IVF deployment reads before
    picking nprobe]. The IVF counterpart of X31's LSH (B, R) calibration:
    V11 reports recall at ONE operating point, V18 sweeps the knob so
    the deployment sees where the curve saturates; nprobe = #cells is
    EXHAUSTIVE search, so its recall is exactly 1.0 — a built-in
    self-check row pinned in pytest.

    Spark shape: the probe->cell ranking is computed ONCE; the sweep
    attaches nprobe by EXPLODING a 4-element literal array per ranked row
    (narrow Generate — no join, no cross product) and filtering
    rank <= nprobe, so candidate fetch stays the cell-keyed equi-join and
    every window partitions by (nprobe, probe_id). Rank keys are 6-dp
    ROUNDED cosines + id tiebreak on BOTH engines (v4/v11's discipline),
    making the swept top-k sets cross-engine identical."""
    # guard (ADVICE r5): nprobe beyond the cell count is a caller bug —
    # prn <= nprobe would silently behave as exhaustive search (numpy-style
    # clamp), mislabeling the sweep row. nprobe == _IVF_CELLS IS the
    # legitimate exhaustive self-check row; anything above it raises.
    nprobes = [int(n) for n in nprobes]
    if not nprobes or min(nprobes) < 1 or max(nprobes) > _IVF_CELLS:
        raise ValueError(
            f"v18: nprobes must be within [1, {_IVF_CELLS}] (= #cells; the "
            f"top value is the exhaustive row), got {nprobes}"
        )
    k = _V11_K
    e = load(spark, sf, "embeddings").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("emb")
    )
    cent = e.orderBy("vec_id").limit(_IVF_CELLS).select(
        F.col("vec_id").alias("cid"), F.col("emb").alias("cemb")
    )
    w_asg = Window.partitionBy("vec_id").orderBy(
        F.desc(F.round(_cos(F.col("emb"), F.col("cemb")), 6)), F.asc("cid")
    )
    asg = (
        e.crossJoin(F.broadcast(cent))
        .withColumn("rn", F.row_number().over(w_asg))
        .filter(F.col("rn") == 1)
        .select("vec_id", "emb", "cid")
    )
    probes = e.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("probe_id"), F.col("emb").alias("pemb")
    )
    wk = Window.partitionBy("probe_id").orderBy(
        F.desc("cosine"), F.asc("cand_id")
    )
    exact = (
        F.broadcast(probes)
        .join(
            e.select(F.col("vec_id").alias("cand_id"), F.col("emb").alias("cemb2")),
            F.col("probe_id") != F.col("cand_id"),
        )
        .select(
            "probe_id",
            "cand_id",
            F.round(_cos(F.col("pemb"), F.col("cemb2")), 6).alias("cosine"),
        )
        .withColumn("rn", F.row_number().over(wk))
        .filter(F.col("rn") <= k)
        .select("probe_id", "cand_id")
    )
    w_pc = Window.partitionBy("probe_id").orderBy(
        F.desc(F.round(_cos(F.col("pemb"), F.col("cemb")), 6)), F.asc("cid")
    )
    pc_rank = (
        F.broadcast(probes)
        .crossJoin(F.broadcast(cent))
        .withColumn("prn", F.row_number().over(w_pc))
        .select("probe_id", "cid", "prn")
    )
    swept = pc_rank.select(
        "probe_id",
        "cid",
        "prn",
        F.explode(F.array(*[F.lit(n) for n in nprobes])).alias("nprobe"),
    ).filter(F.col("prn") <= F.col("nprobe"))
    wnk = Window.partitionBy("nprobe", "probe_id").orderBy(
        F.desc("cosine"), F.asc("cand_id")
    )
    approx = (
        swept.join(probes, "probe_id")
        .join(asg, "cid")
        .filter(F.col("vec_id") != F.col("probe_id"))
        .select(
            "nprobe",
            "probe_id",
            F.col("vec_id").alias("cand_id"),
            F.round(_cos(F.col("pemb"), F.col("emb")), 6).alias("cosine"),
        )
        .withColumn("rn", F.row_number().over(wnk))
        .filter(F.col("rn") <= k)
        .select("nprobe", "probe_id", F.col("cand_id").alias("a_cand"))
    )
    npdf = exact.select(
        "probe_id",
        "cand_id",
        F.explode(F.array(*[F.lit(n) for n in nprobes])).alias("nprobe"),
    )
    # Same-lineage frames (both arms read the embeddings scan); explicit
    # string aliases keep the three equi-key predicates cross-frame and
    # silence the Catalyst "trivially true" self-join warning.
    npx, apx = npdf.alias("npx"), approx.alias("apx")
    hits = (
        npx.join(
            apx,
            (F.col("npx.nprobe") == F.col("apx.nprobe"))
            & (F.col("npx.probe_id") == F.col("apx.probe_id"))
            & (F.col("npx.cand_id") == F.col("apx.a_cand")),
            "left",
        )
        .groupBy(F.col("npx.nprobe"), F.col("npx.probe_id"))
        .agg(
            F.count("*").alias("n_exact"),
            F.count("a_cand").alias("n_hit"),
        )
    )
    return (
        hits.groupBy("nprobe")
        .agg(
            F.count("*").cast("long").alias("n_probes"),
            F.round(F.avg(F.col("n_hit") / F.col("n_exact")), 4).alias(
                "mean_recall"
            ),
            F.round(F.min(F.col("n_hit") / F.col("n_exact")), 4).alias(
                "min_recall"
            ),
        )
        .select(F.col("nprobe").cast("long").alias("nprobe"),
                "n_probes", "mean_recall", "min_recall")
        .orderBy("nprobe")
    )
