"""Deduplication operators (reference D1/D2, SURVEY.md §2.8, generalized).

All variants keep the survivor with the lowest id — deterministic at any
parallelism.  Each is shuffle-native:

- exact:        one groupBy on a content hash (sha2), no joins
- minhash-LSH:  shingle → minhash signature → band keys → bucket join;
                candidates verified with exact Jaccard in a pandas UDF
- simhash:      64-bit simhash; near-dups = identical band of bits
                (4×16-bit bands ≙ hamming ≤ 3 heuristic), verified by
                full-signature hamming distance
- n-gram Jaccard: explode shingles → self-join on shingle → count shared
                → exact Jaccard filter (no approximation; heavier shuffle)
- embedding cosine: random-hyperplane LSH bucket join + exact cosine verify
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Window as W, functions as F, types as T

from ..textops import char_shingles, minhash_band_keys, normalize_surface, shingle_set

# ---------------------------------------------------------------------------
# exact dedup (D1 — sha256 content hash, create_faiss_index.py:19-37)
# ---------------------------------------------------------------------------

def exact_dedup(df: DataFrame, text_col: str, id_col: str) -> DataFrame:
    """Keep the lowest-id row per exact text content."""
    w = W.partitionBy(F.sha2(F.col(text_col), 256)).orderBy(id_col)
    return df.withColumn("_rn", F.row_number().over(w)).filter(F.col("_rn") == 1).drop("_rn")


def exact_dup_groups(df: DataFrame, text_col: str, id_col: str) -> DataFrame:
    """(content_hash, n_dups, keep_id) for groups with >1 member."""
    return (
        df.groupBy(F.sha2(F.col(text_col), 256).alias("content_hash"))
        .agg(F.count("*").alias("n_dups"), F.min(id_col).alias("keep_id"))
        .filter(F.col("n_dups") > 1)
    )


# ---------------------------------------------------------------------------
# minhash LSH near-dup
# ---------------------------------------------------------------------------

def _mh_bands_udf(mode: str):
    @F.pandas_udf(T.ArrayType(T.StringType()))
    def _mh_bands(texts: pd.Series) -> pd.Series:
        return texts.map(lambda t: minhash_band_keys(t or "", num_hashes=32, bands=8, mode=mode))
    return _mh_bands


def _jaccard_udf(mode: str):
    @F.pandas_udf(T.DoubleType())
    def _jaccard(a: pd.Series, b: pd.Series) -> pd.Series:
        out = []
        for x, y in zip(a, b):
            sx, sy = shingle_set(x or "", mode), shingle_set(y or "", mode)
            u = len(sx | sy)
            out.append(len(sx & sy) / u if u else 1.0)
        return pd.Series(out)
    return _jaccard


def minhash_near_dup_pairs(df: DataFrame, text_col: str, id_col: str,
                           threshold: float = 0.8, mode: str = "char") -> DataFrame:
    """Candidate pairs sharing >=1 of 8 minhash bands, verified by exact
    shingle Jaccard >= threshold.  Returns (a, b, jaccard), a < b.

    ``mode='char'``: char-3gram shingles (surface-form near-dup, J7).
    ``mode='word'``: word-bigram shingles (document near-dup) — the scale
    path that replaces the exact `ngram_jaccard_pairs_sqlable` self-join:
    shuffle is keyed on 4-minhash band keys (near-uniform content hashes),
    so cost tracks true near-dup density instead of the df² blowup of
    common shingles.
    """
    keyed = df.select(
        F.col(id_col).alias("id"), F.col(text_col).alias("txt"),
        F.explode(_mh_bands_udf(mode)(text_col)).alias("bkey"),
    )
    l, r = keyed.alias("l"), keyed.alias("r")
    pairs = (
        l.join(r, "bkey")
        .filter(F.col("l.id") < F.col("r.id"))
        .select(F.col("l.id").alias("a"), F.col("l.txt").alias("ta"),
                F.col("r.id").alias("b"), F.col("r.txt").alias("tb"))
        .dropDuplicates(["a", "b"])
    )
    return (
        pairs.withColumn("jaccard", F.round(_jaccard_udf(mode)("ta", "tb"), 6))
        .filter(F.col("jaccard") >= threshold)
        .select("a", "b", "jaccard")
    )


def minhash_dedup(df: DataFrame, text_col: str, id_col: str,
                  threshold: float = 0.8, mode: str = "char") -> DataFrame:
    """Drop near-duplicates: every row that matches a lower-id row goes."""
    dup_b = minhash_near_dup_pairs(df, text_col, id_col, threshold, mode).select(
        F.col("b").alias(id_col)).distinct()
    return df.join(dup_b, id_col, "left_anti")


# ---------------------------------------------------------------------------
# simhash
# ---------------------------------------------------------------------------

def _simhash64(text: str) -> int:
    from ..textops import _fnv1a

    toks = normalize_surface(text or "").split()
    if not toks:
        return 0
    acc = np.zeros(64, dtype=np.int64)
    shifts = np.arange(64, dtype=np.uint64)
    for tok in toks:
        h = np.uint64(_fnv1a(tok))
        bits = ((h >> shifts) & np.uint64(1)).astype(np.int64)
        acc += np.where(bits == 1, 1, -1)
    out = 0
    for i in range(64):
        if acc[i] > 0:
            out |= 1 << i
    return out - (1 << 63)  # to signed long


@F.pandas_udf(T.LongType())
def simhash_udf(texts: pd.Series) -> pd.Series:
    return texts.map(_simhash64)


def simhash_near_dup_pairs(df: DataFrame, text_col: str, id_col: str,
                           max_hamming: int = 3) -> DataFrame:
    """Pairs whose simhashes agree on >=1 of 8 8-bit bands AND have
    hamming distance <= max_hamming.  Returns (a, b, hamming).

    8 bands guarantee recall 1.0 for hamming <= 7 (pigeonhole); the final
    hamming filter is exact.  Candidate shuffle is keyed on the band
    values (near-uniform), never all-pairs.
    """
    sh = df.select(F.col(id_col).alias("id"), simhash_udf(text_col).alias("sh"))
    bands = sh.select(
        "id", "sh",
        F.explode(F.array(*[
            F.concat(F.lit(f"{i}:"), (F.shiftright("sh", i * 8).bitwiseAND(F.lit(0xFF))).cast("string"))
            for i in range(8)
        ])).alias("bkey"),
    )
    l, r = bands.alias("l"), bands.alias("r")
    pairs = (
        l.join(r, "bkey")
        .filter(F.col("l.id") < F.col("r.id"))
        .select(F.col("l.id").alias("a"), F.col("l.sh").alias("sa"),
                F.col("r.id").alias("b"), F.col("r.sh").alias("sb"))
        .dropDuplicates(["a", "b"])
    )
    hamming = F.bit_count(F.col("sa").bitwiseXOR(F.col("sb")))
    return pairs.withColumn("hamming", hamming).filter(
        F.col("hamming") <= max_hamming).select("a", "b", "hamming")


# ---------------------------------------------------------------------------
# exact n-gram Jaccard self-join (no LSH approximation)
# ---------------------------------------------------------------------------

@F.pandas_udf(T.ArrayType(T.LongType()))
def _shingle_arr(texts: pd.Series) -> pd.Series:
    # signed-long shingle hashes (Spark LongType)
    return texts.map(lambda t: [h - (1 << 63) for h in char_shingles(t or "")])


def ngram_jaccard_pairs(df: DataFrame, text_col: str, id_col: str,
                        threshold: float = 0.5) -> DataFrame:
    """Exact Jaccard over char-3gram shingle sets via explode + self-join.
    Returns (a, b, jaccard).  O(sum shared-shingle pairs) shuffle — the
    exact baseline the LSH variants approximate."""
    sh = df.select(F.col(id_col).alias("id"), _shingle_arr(text_col).alias("sh"))
    sizes = sh.select("id", F.size("sh").alias("n"))
    ex = sh.select("id", F.explode("sh").alias("g"))
    l, r = ex.alias("l"), ex.alias("r")
    shared = (
        l.join(r, "g")
        .filter(F.col("l.id") < F.col("r.id"))
        .groupBy(F.col("l.id").alias("a"), F.col("r.id").alias("b"))
        .agg(F.count("*").alias("inter"))
    )
    sa = sizes.select(F.col("id").alias("a"), F.col("n").alias("na"))
    sb = sizes.select(F.col("id").alias("b"), F.col("n").alias("nb"))
    return (
        shared.join(sa, "a").join(sb, "b")
        .withColumn("jaccard", F.col("inter") / (F.col("na") + F.col("nb") - F.col("inter")))
        .filter(F.col("jaccard") >= threshold)
        .select("a", "b", "jaccard")
    )


# ---------------------------------------------------------------------------
# word-bigram Jaccard — pure DataFrame-API variant (whole-stage codegen)
# ---------------------------------------------------------------------------

def _word_bigrams(text_col: str):
    """Distinct word-bigram shingles, built entirely with JVM expressions:
    normalize → split → transform(sequence) → array_distinct.  No Python."""
    norm = F.regexp_replace(F.lower(F.trim(text_col)), r"\s+", " ")
    w = F.split(norm, " ")
    grams = F.transform(
        F.sequence(F.lit(0), F.size(w) - 2),
        lambda i: F.concat(F.element_at(w, i + 1), F.lit(" "), F.element_at(w, i + 2)),
    )
    return F.when(F.size(w) >= 2, F.array_distinct(grams)).otherwise(F.array(norm))


def ngram_jaccard_pairs_sqlable(df: DataFrame, text_col: str, id_col: str,
                                threshold: float = 0.2) -> DataFrame:
    """Exact word-bigram Jaccard pairs >= threshold via explode + self-join.

    The SQL-expressible exact baseline the minhash/simhash variants
    approximate (oracle: NGRAM_JACCARD_SQL).  Shuffle is keyed on the
    shingle — at scale, drop ultra-common shingles (document frequency cap)
    before the join; here corpus shingles are near-unique per pair.
    Returns (a, b, jaccard) with jaccard rounded to 6.
    """
    sh = df.select(F.col(id_col).alias("id"), _word_bigrams(text_col).alias("grams"))
    sizes = sh.select("id", F.size("grams").alias("n"))
    ex = sh.select("id", F.explode("grams").alias("g"))
    l, r = ex.alias("l"), ex.alias("r")
    shared = (
        l.join(r, "g")
        .filter(F.col("l.id") < F.col("r.id"))
        .groupBy(F.col("l.id").alias("a"), F.col("r.id").alias("b"))
        .agg(F.count("*").alias("inter"))
    )
    sa = sizes.select(F.col("id").alias("a"), F.col("n").alias("na"))
    sb = sizes.select(F.col("id").alias("b"), F.col("n").alias("nb"))
    return (
        shared.join(sa, "a").join(sb, "b")
        .withColumn("jaccard", F.round(F.col("inter") / (F.col("na") + F.col("nb") - F.col("inter")), 6))
        .filter(F.col("jaccard") >= threshold)
        .select("a", "b", "jaccard")
    )


def ngram_jaccard_sql(table: str, text_col: str, id_col: str,
                      threshold: float = 0.2) -> str:
    """DuckDB oracle for `ngram_jaccard_pairs_sqlable` (same shingling)."""
    return f"""
        WITH d AS (SELECT {id_col} AS id,
                          regexp_replace(lower(trim({text_col})), '\\s+', ' ', 'g') AS nt
                   FROM {table}),
        w AS (SELECT id, string_split(nt, ' ') AS ws, nt FROM d),
        sh AS (SELECT id, CASE WHEN len(ws) >= 2
                     THEN list_distinct(list_transform(range(1, len(ws)),
                                        i -> ws[i] || ' ' || ws[i + 1]))
                     ELSE [nt] END AS grams FROM w),
        sizes AS (SELECT id, len(grams) AS n FROM sh),
        ex AS (SELECT id, unnest(grams) AS g FROM sh),
        shared AS (SELECT l.id AS a, r.id AS b, COUNT(*) AS inter
                   FROM ex l JOIN ex r USING (g) WHERE l.id < r.id GROUP BY 1, 2)
        SELECT a, b, ROUND(inter / (sa.n + sb.n - inter)::DOUBLE, 6) AS jaccard
        FROM shared JOIN sizes sa ON shared.a = sa.id JOIN sizes sb ON shared.b = sb.id
        WHERE ROUND(inter / (sa.n + sb.n - inter)::DOUBLE, 6) >= {threshold}
    """


# masked near-dup key: digits collapsed — boilerplate that differs only in
# numbers/refs groups together (reference remove_duplicate_paragraphs.py
# boilerplate examples).  Pure built-ins, SQL-expressible.

def masked_dup_groups(df: DataFrame, text_col: str, id_col: str,
                      min_group: int = 2) -> DataFrame:
    key = F.regexp_replace(
        F.regexp_replace(F.lower(F.trim(text_col)), r"\s+", " "), "[0-9]+", "#")
    return (
        df.groupBy(key.alias("dup_key"))
        .agg(F.count("*").alias("n_members"), F.min(id_col).alias("keep_id"))
        .filter(F.col("n_members") >= min_group)
    )


def masked_dup_groups_sql(table: str, text_col: str, id_col: str,
                          min_group: int = 2) -> str:
    return f"""
        SELECT regexp_replace(regexp_replace(lower(trim({text_col})), '\\s+', ' ', 'g'),
                              '[0-9]+', '#', 'g') AS dup_key,
               COUNT(*) AS n_members, MIN({id_col}) AS keep_id
        FROM {table} GROUP BY 1 HAVING COUNT(*) >= {min_group}
    """


# ---------------------------------------------------------------------------
# embedding-cosine near-dup (J6 analog: Annoy 6-NN angular)
# ---------------------------------------------------------------------------

N_HYPERPLANES = 12
_HP_CACHE: dict[tuple[int, int], np.ndarray] = {}


def _hyperplanes(dim: int, n: int = N_HYPERPLANES) -> np.ndarray:
    key = (dim, n)
    if key not in _HP_CACHE:
        _HP_CACHE[key] = np.random.default_rng(1234).standard_normal((n, dim))
    return _HP_CACHE[key]


def cosine_near_dup_pairs(df: DataFrame, vec_col: str, id_col: str,
                          threshold: float = 0.98, bands: int = 3) -> DataFrame:
    """Random-hyperplane LSH (sign bits, ``bands`` prefixes) + exact cosine
    verify >= threshold.  Mirrors the reference's near-dup rule
    (remove_duplicate_paragraphs.py:117-128: angular dist < 2*(1-0.98))."""

    def sign_keys(it):
        for pdf in it:
            mat = np.stack(pdf[vec_col].to_numpy())
            hp = _hyperplanes(mat.shape[1])
            bits = (mat @ hp.T) > 0  # (rows, planes)
            per_band = N_HYPERPLANES // bands
            rows = []
            for i, rid in enumerate(pdf[id_col]):
                for b in range(bands):
                    seg = bits[i, b * per_band : (b + 1) * per_band]
                    rows.append((int(rid), f"{b}:" + "".join("1" if x else "0" for x in seg)))
            yield pd.DataFrame(rows, columns=["id", "bkey"])

    keyed = df.select(F.col(id_col).alias(id_col), vec_col).mapInPandas(
        sign_keys, schema="id long, bkey string")
    vecs = df.select(F.col(id_col).alias("id"), F.col(vec_col).alias("v"))
    l, r = keyed.alias("l"), keyed.alias("r")
    cand = (
        l.join(r, "bkey")
        .filter(F.col("l.id") < F.col("r.id"))
        .select(F.col("l.id").alias("a"), F.col("r.id").alias("b"))
        .dropDuplicates(["a", "b"])
    )
    cand = (
        cand.join(vecs.withColumnRenamed("id", "a").withColumnRenamed("v", "va"), "a")
        .join(vecs.withColumnRenamed("id", "b").withColumnRenamed("v", "vb"), "b")
    )

    @F.pandas_udf(T.DoubleType())
    def _cos(va: pd.Series, vb: pd.Series) -> pd.Series:
        A = np.stack(va.to_numpy()).astype(np.float64)
        B = np.stack(vb.to_numpy()).astype(np.float64)
        num = (A * B).sum(axis=1)
        den = np.linalg.norm(A, axis=1) * np.linalg.norm(B, axis=1)
        return pd.Series(np.where(den > 0, num / den, 0.0))

    return (
        cand.withColumn("cosine", _cos("va", "vb"))
        .filter(F.col("cosine") >= threshold)
        .select("a", "b", "cosine")
    )
