"""Deduplication operators for training-data pipelines at 100 TB scale.

Five engines, cheapest-first:

* exact            — hash-groupBy on the text (one shuffle on a 64-char key)
* ngram Jaccard    — shingle-inverted-index self-join (no n² pair scan:
                     only documents sharing a shingle meet)
* MinHash + LSH    — signature via per-shingle xxhash64 under H seeds,
                     banded bucketing => candidate pairs, then exact verify
* SimHash          — 64-bit signature via vectorized pandas UDF, chunk-banded
                     candidate generation, Hamming verify
* embedding cosine — sign-projection LSH buckets + within-bucket exact cosine

All candidate generation is join/groupBy based; nothing materializes the
O(n²) pair space.  Pair outputs are canonical (id_a < id_b) so results are
deterministic and idempotent.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T

from incremental_entity_extraction_spark.operators.text_analysis import tokens_col


# --------------------------------------------------------------------------
# exact dedup
# --------------------------------------------------------------------------
def exact_duplicates(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """(canonical_id, id, text_hash): groups of byte-identical texts.
    Canonical member = min id. Single shuffle on sha2(text)."""
    hashed = df.select(
        F.col(id_col).alias("id"), F.sha2(F.col(text_col), 256).alias("text_hash")
    )
    w = Window.partitionBy("text_hash")
    return (
        hashed.withColumn("canonical_id", F.min("id").over(w))
        .withColumn("group_size", F.count("*").over(w))
        .filter(F.col("group_size") > 1)
        .select("canonical_id", "id", "text_hash")
    )


# --------------------------------------------------------------------------
# word n-gram Jaccard via shingle inverted index
# --------------------------------------------------------------------------
def _shingles(text_col: str, n: int):
    """Distinct word n-gram shingles; docs shorter than n tokens yield their
    short-tail shingle, zero-token docs yield none (the empty-string shingle
    is filtered — it must not bucket all empty docs together)."""
    toks = tokens_col(text_col)
    idx = F.sequence(F.lit(0), F.greatest(F.size(toks) - n, F.lit(0)))
    return F.array_distinct(
        F.filter(
            F.transform(idx, lambda i: F.concat_ws(" ", F.slice(toks, i + 1, n))),
            lambda s: F.length(s) > 0,
        )
    )


def ngram_jaccard_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    n: int = 3,
    threshold: float = 0.8,
    df_cap: int | None = None,
) -> DataFrame:
    """(id_a, id_b, jaccard) for distinct-shingle Jaccard >= threshold.

    Inverted index: explode shingles, self-join on shingle (documents that
    share no shingle never meet), count shared shingles, then
    J = |∩| / (|A| + |B| - |∩|).

    Skew: a stop-shingle shared by d documents creates d² join rows.  At
    scale set ``df_cap``: shingles with document frequency >= df_cap are
    dropped from the index BEFORE the self-join *and* from the per-doc
    shingle sizes, i.e. Jaccard is computed over the capped shingle universe
    (the standard stop-shingle approximation — near-dup pairs share mostly
    rare shingles, so recall loss is negligible while the join cost drops
    from O(d²) per hot shingle to zero).  Default None = exact (the
    SQL-oracle-checked path, q19)."""
    sh = df.select(
        F.col(id_col).alias("id"), F.explode(_shingles(text_col, n)).alias("shingle")
    )
    # the shingle table feeds THREE consumers (sizes, both self-join sides);
    # a lazy localCheckpoint materializes the tokenize+explode once instead
    # of re-running it per consumer (guide §5 "cut reused lineage" — the
    # exchange-reuse rule only dedups the two identically-keyed join sides,
    # never the differently-keyed sizes aggregation).  Lazy, so plan-only
    # callers stay lazy; the table is O(corpus shingles) — the same bytes
    # the self-join shuffles anyway (measured 0.98 → 0.71 s at sf0.1/q19)
    sh = sh.localCheckpoint(eager=False)
    if df_cap is not None:
        freq = sh.groupBy("shingle").agg(F.count("*").alias("_df"))
        sh = sh.join(
            freq.filter(F.col("_df") < df_cap).select("shingle"), "shingle"
        ).localCheckpoint(eager=False)
    sizes = sh.groupBy("id").agg(F.count("*").alias("n_sh"))
    a = sh.alias("a")
    b = sh.alias("b")
    inter = (
        a.join(b, (F.col("a.shingle") == F.col("b.shingle")) & (F.col("a.id") < F.col("b.id")))
        .groupBy(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"))
        .agg(F.count("*").alias("n_inter"))
    )
    sa = sizes.select(F.col("id").alias("id_a"), F.col("n_sh").alias("n_a"))
    sb = sizes.select(F.col("id").alias("id_b"), F.col("n_sh").alias("n_b"))
    return (
        inter.join(sa, "id_a")
        .join(sb, "id_b")
        .withColumn(
            "jaccard",
            F.col("n_inter") / (F.col("n_a") + F.col("n_b") - F.col("n_inter")),
        )
        .filter(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", "jaccard")
    )


# --------------------------------------------------------------------------
# MinHash + LSH
# --------------------------------------------------------------------------
def minhash_signatures(
    df: DataFrame, id_col: str, text_col: str, n: int = 3, num_hashes: int = 64
) -> DataFrame:
    """(id, signature array<long>[num_hashes]) — min over shingles of
    xxhash64(shingle, seed_h) per hash function.  Built-ins only: explode
    shingles, one aggregate with num_hashes mins (map-side combinable)."""
    sh = df.select(
        F.col(id_col).alias("id"), F.explode(_shingles(text_col, n)).alias("shingle")
    )
    mins = [
        F.min(F.xxhash64(F.col("shingle"), F.lit(h))).alias(f"h{h}")
        for h in range(num_hashes)
    ]
    agg = sh.groupBy("id").agg(*mins)
    return agg.select(
        "id", F.array(*[F.col(f"h{h}") for h in range(num_hashes)]).alias("signature")
    )


def minhash_lsh_pairs(
    signatures: DataFrame, bands: int = 16, verify_threshold: float = 0.7
) -> DataFrame:
    """Band the signature, bucket-join within bands, verify with the
    signature-estimated Jaccard (fraction of matching hash positions)."""
    # the signature table feeds FOUR consumers (the sig-length probe below,
    # the banding explode, and both verify-join sides); a lazy
    # localCheckpoint computes the shingle-explode + num_hashes-min
    # aggregate once — the ``first()`` two lines down materializes it, so
    # this function was always eager and the checkpoint changes nothing
    # about laziness (measured 1.64 → 1.15 s at sf0.1/q20).  Signature rows
    # are num_hashes longs/doc — far smaller than the shingle table the
    # aggregate consumes
    signatures = signatures.localCheckpoint(eager=False)
    sig_len_row = signatures.select(F.size("signature").alias("s")).first()
    if sig_len_row is None:
        return signatures.sparkSession.createDataFrame(
            [], "id_a long, id_b long, est_jaccard double"
        )
    sig_len = sig_len_row["s"]
    rows_per_band = max(1, sig_len // bands)
    banded = signatures.select(
        "id",
        F.posexplode(
            F.array(
                *[
                    F.xxhash64(
                        F.concat_ws(
                            ",",
                            F.transform(
                                F.slice("signature", b * rows_per_band + 1, rows_per_band),
                                lambda x: x.cast("string"),
                            ),
                        ),
                        F.lit(b),
                    )
                    for b in range(bands)
                ]
            )
        ).alias("band", "bucket"),
    )
    a = banded.alias("a")
    b = banded.alias("b")
    cand = (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.bucket") == F.col("b.bucket"))
            & (F.col("a.id") < F.col("b.id")),
        )
        .select(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"))
        .distinct()
    )
    sa = signatures.select(F.col("id").alias("id_a"), F.col("signature").alias("sig_a"))
    sb = signatures.select(F.col("id").alias("id_b"), F.col("signature").alias("sig_b"))
    verified = (
        cand.join(sa, "id_a")
        .join(sb, "id_b")
        .withColumn(
            "est_jaccard",
            F.size(
                F.filter(
                    F.zip_with("sig_a", "sig_b", lambda x, y: x == y),
                    lambda eq: eq,
                )
            )
            / F.size("sig_a"),
        )
        .filter(F.col("est_jaccard") >= verify_threshold)
        .select("id_a", "id_b", "est_jaccard")
    )
    return verified


def minhash_est_pairs_sha(
    df: DataFrame,
    id_col: str,
    text_col: str,
    n: int = 2,
    num_hashes: int = 16,
    threshold: float = 0.3,
) -> DataFrame:
    """ORACLE-FORM MinHash: pairwise Jaccard estimates from a hash family
    computable identically in any SQL engine — h_s(shingle) = the 60-bit
    hex prefix of sha256(shingle || '#' || s) (Spark: conv(substring(sha2),
    16, 10); DuckDB: ('0x' || substr(sha256(...)))::BIGINT).

    Emits (id_a, id_b, est_jaccard) for signature agreement >= threshold
    via per-(doc, seed) minima + an all-pairs join over the seed axis —
    the brute cross-checkable twin of the production xxhash64 + banded-LSH
    path (``minhash_signatures``/``minhash_lsh_pairs``); use on bounded doc
    sets (the production path is the scale path)."""
    spark = df.sparkSession
    sh = df.select(
        F.col(id_col).alias("id"), F.explode(_shingles(text_col, n)).alias("shingle")
    )
    seeds = spark.range(num_hashes).select(F.col("id").cast("int").alias("seed"))
    h = F.conv(
        F.substring(
            F.sha2(F.concat(F.col("shingle"), F.lit("#"), F.col("seed").cast("string")), 256),
            1,
            15,
        ),
        16,
        10,
    ).cast("long")
    mins = (
        sh.crossJoin(F.broadcast(seeds))
        .groupBy("id", "seed")
        .agg(F.min(h).alias("mn"))
    )
    a = mins.alias("a")
    b = mins.alias("b")
    return (
        a.join(
            b,
            (F.col("a.seed") == F.col("b.seed")) & (F.col("a.id") < F.col("b.id")),
        )
        .groupBy(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"))
        .agg(
            F.avg(
                F.when(F.col("a.mn") == F.col("b.mn"), 1.0).otherwise(0.0)
            ).alias("est_jaccard")
        )
        .filter(F.col("est_jaccard") >= threshold)
        .select("id_a", "id_b", "est_jaccard")
    )


# --------------------------------------------------------------------------
# SimHash
# --------------------------------------------------------------------------
def simhash_signatures(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """(id, simhash long) — 64-bit SimHash over tokens, vectorized NumPy in
    a pandas UDF (bit-twiddling is the one thing column exprs do badly)."""
    out_schema = T.StructType(
        [
            T.StructField("id", T.LongType(), False),
            T.StructField("simhash", T.LongType(), False),
        ]
    )

    def _simhash(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import re

        tok_re = re.compile(r"[a-z0-9]+")
        for pdf in batches:
            sigs = []
            for text in pdf["text"]:
                toks = tok_re.findall((text or "").lower())
                if not toks:
                    sigs.append(0)
                    continue
                hs = np.array(
                    [hash64(t) for t in toks], dtype=np.uint64
                )
                bits = ((hs[:, None] >> np.arange(64, dtype=np.uint64)) & 1).astype(
                    np.int64
                )
                v = (2 * bits - 1).sum(0)
                sig = np.uint64(0)
                for i in range(64):
                    if v[i] > 0:
                        sig |= np.uint64(1) << np.uint64(i)
                sigs.append(int(sig & np.uint64(0x7FFFFFFFFFFFFFFF)))
            yield pd.DataFrame({"id": pdf["id"], "simhash": sigs})

    def hash64(token: str) -> int:
        # deterministic 64-bit token hash (blake2b low 8 bytes)
        from hashlib import blake2b

        return int.from_bytes(blake2b(token.encode(), digest_size=8).digest(), "little")

    return df.select(
        F.col(id_col).alias("id"), F.col(text_col).alias("text")
    ).mapInPandas(_simhash, schema=out_schema)


def simhash_signatures_sha(
    df: DataFrame, id_col: str, text_col: str, bits: int = 16
) -> DataFrame:
    """ORACLE-FORM SimHash: pure column expressions over the cross-engine
    sha256 token-hash family (60-bit hex prefix), so a SQL engine computes
    the identical signatures.  Whole-stage codegen, no UDF: explode tokens
    (with multiplicity), per-bit ±1 sums in one aggregate, bit assembly in
    the projection.  The production 64-bit blake2b path is
    ``simhash_signatures``; this twin oracle-verifies the SEMANTICS."""
    toks = df.select(
        F.col(id_col).alias("id"), F.explode(tokens_col(text_col)).alias("tok")
    )
    h = F.conv(F.substring(F.sha2(F.col("tok"), 256), 1, 15), 16, 10).cast("long")
    t = toks.withColumn("h", h)
    aggs = [
        F.sum(
            F.when(F.shiftright("h", b).bitwiseAND(F.lit(1)) == 1, 1).otherwise(-1)
        ).alias(f"v{b}")
        for b in range(bits)
    ]
    agg = t.groupBy("id").agg(*aggs)
    sig = None
    for b in range(bits):
        term = F.when(F.col(f"v{b}") > 0, F.lit(1 << b)).otherwise(F.lit(0))
        sig = term if sig is None else sig + term
    return agg.select("id", sig.cast("long").alias("simhash"))


def simhash_near_pairs(signatures: DataFrame, max_hamming: int = 3) -> DataFrame:
    """Candidate pairs via 4×16-bit chunk banding (any pair within Hamming
    distance 3 shares at least one exact 16-bit chunk), verified exactly."""
    chunks = signatures.select(
        "id",
        "simhash",
        F.posexplode(
            F.array(
                *[
                    F.shiftright(F.col("simhash"), b * 16).bitwiseAND(F.lit(0xFFFF))
                    for b in range(4)
                ]
            )
        ).alias("chunk_idx", "chunk"),
    )
    a, b = chunks.alias("a"), chunks.alias("b")
    cand = (
        a.join(
            b,
            (F.col("a.chunk_idx") == F.col("b.chunk_idx"))
            & (F.col("a.chunk") == F.col("b.chunk"))
            & (F.col("a.id") < F.col("b.id")),
        )
        .select(
            F.col("a.id").alias("id_a"),
            F.col("b.id").alias("id_b"),
            F.col("a.simhash").alias("sh_a"),
            F.col("b.simhash").alias("sh_b"),
        )
        .distinct()
    )
    return (
        cand.withColumn("hamming", F.bit_count(F.col("sh_a").bitwiseXOR(F.col("sh_b"))))
        .filter(F.col("hamming") <= max_hamming)
        .select("id_a", "id_b", "hamming")
    )


# --------------------------------------------------------------------------
# embedding cosine near-dup
# --------------------------------------------------------------------------
def embedding_near_dup_pairs(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    threshold: float = 0.95,
    n_planes: int = 12,
    seed: int = 7,
    dim: int | None = None,
) -> DataFrame:
    """Sign-projection LSH buckets + exact within-bucket cosine verify.

    Highly-similar vectors (cos >= 0.95) land in the same sign bucket with
    high probability; buckets are small so within-bucket pairing is cheap.
    For guaranteed recall use multiple hash tables (call with different
    seeds and union)."""
    spark = df.sparkSession
    if dim is None:
        first = df.select(F.size(vec_col).alias("d")).first()
        if first is None:
            return spark.createDataFrame([], "id_a long, id_b long, cosine double")
        dim = first["d"]
    rng = np.random.default_rng(seed)
    planes = rng.standard_normal((dim, n_planes)).astype(np.float32)
    bc = spark.sparkContext.broadcast(planes)

    bucket_schema = T.StructType(
        [
            T.StructField("id", T.LongType(), False),
            T.StructField("bucket", T.LongType(), False),
            T.StructField("vec", T.ArrayType(T.FloatType()), False),
        ]
    )

    def _bucket(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        P = bc.value
        for pdf in batches:
            if len(pdf) == 0:
                continue
            X = np.stack([np.asarray(v, dtype=np.float32) for v in pdf["vec"]])
            signs = (X @ P) > 0
            buckets = signs @ (1 << np.arange(P.shape[1], dtype=np.int64))
            yield pd.DataFrame(
                {"id": pdf["id"], "bucket": buckets, "vec": list(pdf["vec"])}
            )

    bucketed = df.select(
        F.col(id_col).alias("id"), F.col(vec_col).alias("vec")
    ).mapInPandas(_bucket, schema=bucket_schema)

    pair_schema = T.StructType(
        [
            T.StructField("id_a", T.LongType(), False),
            T.StructField("id_b", T.LongType(), False),
            T.StructField("cosine", T.DoubleType(), False),
        ]
    )

    def _verify(key, pdf: pd.DataFrame) -> pd.DataFrame:
        if len(pdf) < 2:
            return pd.DataFrame({"id_a": [], "id_b": [], "cosine": []})
        X = np.stack([np.asarray(v, dtype=np.float32) for v in pdf["vec"]])
        norms = np.linalg.norm(X, axis=1)
        norms[norms == 0] = 1.0
        Xn = X / norms[:, None]
        S = Xn @ Xn.T
        ids = pdf["id"].to_numpy()
        ii, jj = np.where(np.triu(S >= threshold, k=1))
        lo = np.minimum(ids[ii], ids[jj])
        hi = np.maximum(ids[ii], ids[jj])
        return pd.DataFrame({"id_a": lo, "id_b": hi, "cosine": S[ii, jj].astype(float)})

    return (
        bucketed.groupBy("bucket")
        .applyInPandas(_verify, schema=pair_schema)
        .distinct()
    )


def sha_planes(dim: int, n_planes: int) -> np.ndarray:
    """Deterministic projection planes computable in ANY engine:
    plane[d, p] = hex60(sha256(f"{d}#{p}")) / 2^59 - 1  (uniform in [-1, 1)).
    Lets a SQL oracle reproduce sign-projection LSH buckets bit-for-bit."""
    import hashlib

    M = np.empty((dim, n_planes), dtype=np.float64)
    for d in range(dim):
        for p in range(n_planes):
            h = hashlib.sha256(f"{d}#{p}".encode()).hexdigest()[:15]
            M[d, p] = int(h, 16) / float(1 << 59) - 1.0
    return M


def embedding_near_dup_pairs_oracle(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    threshold: float = 0.8,
    n_planes: int = 8,
    dim: int | None = None,
) -> DataFrame:
    """ORACLE-FORM sign-projection near-dup: sha-derived planes
    (``sha_planes``) + float64 dots/cosines, so a relational engine computes
    the identical buckets and survivors.  The production path is
    ``embedding_near_dup_pairs`` (seeded Gaussian planes, f32 kernels,
    multi-table recall); this twin exists so the LSH bucketing SEMANTICS are
    oracle-verified, not just sampled."""
    spark = df.sparkSession
    if dim is None:
        first = df.select(F.size(vec_col).alias("d")).first()
        if first is None:
            return spark.createDataFrame([], "id_a long, id_b long, cosine double")
        dim = first["d"]
    P = sha_planes(dim, n_planes)
    bc = spark.sparkContext.broadcast(P)

    bucket_schema = T.StructType(
        [
            T.StructField("id", T.LongType(), False),
            T.StructField("bucket", T.LongType(), False),
            T.StructField("vec", T.ArrayType(T.FloatType()), False),
        ]
    )

    def _bucket(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        Pm = bc.value
        for pdf in batches:
            if len(pdf) == 0:
                continue
            X = np.stack([np.asarray(v, dtype=np.float64) for v in pdf["vec"]])
            signs = (X @ Pm) > 0
            buckets = signs @ (1 << np.arange(Pm.shape[1], dtype=np.int64))
            yield pd.DataFrame(
                {"id": pdf["id"], "bucket": buckets, "vec": list(pdf["vec"])}
            )

    bucketed = df.select(
        F.col(id_col).alias("id"), F.col(vec_col).alias("vec")
    ).mapInPandas(_bucket, schema=bucket_schema)

    pair_schema = T.StructType(
        [
            T.StructField("id_a", T.LongType(), False),
            T.StructField("id_b", T.LongType(), False),
            T.StructField("cosine", T.DoubleType(), False),
        ]
    )

    def _verify(key, pdf: pd.DataFrame) -> pd.DataFrame:
        if len(pdf) < 2:
            return pd.DataFrame({"id_a": [], "id_b": [], "cosine": []})
        X = np.stack([np.asarray(v, dtype=np.float64) for v in pdf["vec"]])
        norms = np.linalg.norm(X, axis=1)
        norms[norms == 0] = 1.0
        Xn = X / norms[:, None]
        S = Xn @ Xn.T
        ids = pdf["id"].to_numpy()
        ii, jj = np.where(np.triu(S >= threshold, k=1))
        lo = np.minimum(ids[ii], ids[jj])
        hi = np.maximum(ids[ii], ids[jj])
        return pd.DataFrame({"id_a": lo, "id_b": hi, "cosine": S[ii, jj]})

    return (
        bucketed.groupBy("bucket")
        .applyInPandas(_verify, schema=pair_schema)
        .distinct()
    )


def dedup_connected_groups(
    pairs: DataFrame,
    id_a: str = "id_a",
    id_b: str = "id_b",
    small_graph_edges: int = 100_000,
) -> DataFrame:
    """Collapse near-dup pairs into groups: (id, canonical_id) via
    large-star/small-star CC (O(log n) rounds regardless of diameter —
    near-dup graphs are often chain-shaped, where min-label propagation
    needs O(diameter) rounds).

    ``small_graph_edges`` passes through to ``connected_components_star``:
    graphs at or below it run the single-task union-find fast path; 0 forces
    the distributed star rounds (q48 oracle-checks that path).

    Caveat: string labels compare lexicographically, so canonical_id is the
    lexicographic (not numeric) min member — stable and deterministic, which
    is all dedup needs."""
    from incremental_entity_extraction_spark.operators.clustering import (
        connected_components_star,
    )

    edges = pairs.select(
        F.col(id_a).cast("string").alias("src"), F.col(id_b).cast("string").alias("dst")
    )
    vertices = (
        edges.select(F.col("src").alias("mention_id"))
        .union(edges.select("dst"))
        .distinct()
    )
    out = connected_components_star(
        vertices, edges, small_graph_edges=small_graph_edges
    )
    return out.select(
        F.col("mention_id").cast("long").alias("id"),
        F.col("cluster_label").cast("long").alias("canonical_id"),
    )
