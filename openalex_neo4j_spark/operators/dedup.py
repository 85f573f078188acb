"""Deduplication operator family for large-scale training-data pipelines.

Five strategies over a document table ``(doc_id, text, ...)``:

- :func:`exact_dedup` — hash-groupBy on md5(text) (one shuffle on the
  digest; map-side partial agg).
- :func:`first_wins_dedup` — deterministic winner per key via an
  ordered window (the determinism-hardened analog of the reference's
  dict first-insert-wins — importer.py:100-104, SURVEY §2.5 A1).
- :func:`minhash_dedup` — shingle -> MinHash -> LSH band-bucket join
  -> verified Jaccard -> connected components -> keep min doc per
  cluster. The scale path: candidates only form inside band buckets.
- :func:`simhash_signatures` — 16-bit SimHash from md5 nibbles
  (cross-engine-stable: the same SQL works in DuckDB for the oracle).
- :func:`ngram_jaccard_pairs` — exact token-shingle Jaccard for
  candidate pairs via an inverted-index self-join.

All hashing is md5-based so every signature is reproducible across
Spark, DuckDB, and plain Python (resume + oracle determinism).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

from openalex_neo4j_spark.operators.cc import connected_components


def exact_dedup(df: DataFrame, text_col: str = "text",
                id_col: str = "doc_id") -> DataFrame:
    """Keep the min-id representative of each exact-text group."""
    return (
        df.select(F.md5(F.col(text_col)).alias("digest"), F.col(id_col))
        .groupBy("digest")
        .agg(F.min(id_col).alias(id_col), F.count("*").alias("dup_count"))
    )


def first_wins_dedup(df: DataFrame, key_cols: list[str],
                     order_cols: list[str]) -> DataFrame:
    """Deterministic first-wins: one row per key, ordered winner."""
    w = Window.partitionBy(*key_cols).orderBy(*order_cols)
    return (
        df.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn")
    )


def _token_shingles(df: DataFrame, id_col: str, text_col: str,
                    k: int = 3) -> DataFrame:
    """(id, shingle) distinct word-k-shingles via posexplode + window-free
    slicing (pure SQL; same semantics as textnorm.shingles)."""
    arr = F.split(F.col(text_col), " ")
    sh = F.array_distinct(
        F.transform(
            F.sequence(F.lit(1), F.greatest(F.size(arr) - (k - 1), F.lit(1))),
            lambda i: F.concat_ws(" ", F.slice(arr, i, k)),
        )
    )
    return df.select(F.col(id_col).alias("id"),
                     F.explode(sh).alias("shingle")).distinct()


def minhash_signatures(df: DataFrame, id_col: str = "doc_id",
                       text_col: str = "text", num_hashes: int = 16,
                       k: int = 3) -> DataFrame:
    """(id, seed, minh): minh = min(md5('{seed}|{shingle}')) as a hex
    string — lexicographic min is engine-stable (Spark/DuckDB/Python).

    Plan shape (round-6 optimization, same discipline as
    linking._minhash_bands): row-local shingle array -> explode ->
    ``num_hashes`` md5 columns in one codegen projection -> ONE
    groupBy(id) with per-seed mins (map-side partial agg; one row per
    doc enters the exchange) -> row-local explode back to (seed, minh)
    rows. The previous shape paid three wide exchanges — a distinct on
    (id, shingle), then a ``num_hashes``-way seed explode feeding a
    sort-aggregate on (id, seed) that shuffled every (id, seed, md5)
    row — all removable because min() is insensitive to duplicate
    shingles and the per-seed mins commute with banding downstream.
    Output rows are bit-identical (verified against the frozen DuckDB
    oracle)."""
    arr = F.split(F.col(text_col), " ")
    shingle_arr = F.array_distinct(
        F.transform(
            F.sequence(F.lit(1), F.greatest(F.size(arr) - (k - 1), F.lit(1))),
            lambda i: F.concat_ws(" ", F.slice(arr, i, k)),
        )
    )
    sh = df.select(F.col(id_col).alias("id"),
                   F.explode(shingle_arr).alias("shingle"))
    hash_cols = [
        F.md5(F.concat_ws("|", F.lit(str(s)), F.col("shingle"))).alias(f"_h{s}")
        for s in range(num_hashes)
    ]
    per_id = (
        sh.select("id", *hash_cols)
        .groupBy("id")
        .agg(*[F.min(f"_h{s}").alias(f"_m{s}") for s in range(num_hashes)])
    )
    kv = F.array(*[
        F.struct(F.lit(s).alias("seed"), F.col(f"_m{s}").alias("minh"))
        for s in range(num_hashes)
    ])
    return per_id.select("id", F.explode(kv).alias("kv")).select(
        "id", F.col("kv.seed").alias("seed"), F.col("kv.minh").alias("minh"))


def minhash_bands(sigs: DataFrame, band_size: int = 2) -> DataFrame:
    """(id, band, band_key): group the signature into LSH bands."""
    return (
        sigs.withColumn("band", (F.col("seed") / band_size).cast("int"))
        .groupBy("id", "band")
        .agg(
            F.array_join(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("seed", "minh"))),
                    lambda s: s["minh"],
                ),
                "|",
            ).alias("band_key")
        )
    )


def minhash_candidates(bands: DataFrame,
                       max_bucket_df: int = 100) -> DataFrame:
    """(a, b) candidate pairs sharing any band bucket, a < b.

    Buckets holding more than ``max_bucket_df`` docs are dropped before
    the self-join: a bucket of m docs yields m^2/2 candidate rows, and
    a bucket that hot carries no near-dup signal (boilerplate bands).
    At 100 TB this cap is what keeps the join from going quadratic on
    skewed buckets; pass ``max_bucket_df=None`` to disable.
    """
    if max_bucket_df is not None:
        hot = (bands.groupBy("band", "band_key")
               .agg(F.count("*").alias("_df"))
               .filter(F.col("_df") > max_bucket_df)
               .select("band", "band_key"))
        bands = bands.join(hot, ["band", "band_key"], "left_anti")
    return (
        bands.alias("x")
        .join(
            bands.alias("y"),
            (F.col("x.band") == F.col("y.band"))
            & (F.col("x.band_key") == F.col("y.band_key"))
            & (F.col("x.id") < F.col("y.id")),
        )
        .select(F.col("x.id").alias("a"), F.col("y.id").alias("b"))
        .distinct()
    )


def shingle_jaccard(df: DataFrame, pairs: DataFrame, id_col: str = "doc_id",
                    text_col: str = "text", k: int = 3,
                    shingles: DataFrame | None = None) -> DataFrame:
    """Exact Jaccard over word-k-shingle sets for given (a, b) pairs.

    inter via inverted-index join on shingle; union = |A|+|B|-inter.
    Integer counts only -> the final double division is deterministic.

    ``shingles``: optionally pass a precomputed (id, shingle) frame
    (e.g. one the caller already materialized for candidate
    generation) — without it the shingle subtree is recomputed here
    for the intersection AND the size legs, and Catalyst cannot dedup
    the three column-pruned copies (round-6 plan audit: the
    q_ngram_jaccard plan carried four Generate+Exchange copies of the
    same shingle explode).
    """
    sh = (shingles if shingles is not None
          else _token_shingles(df, id_col, text_col, k))
    sizes = sh.groupBy("id").agg(F.count("*").alias("sz"))
    sa = sh.withColumnRenamed("id", "a")
    sb = sh.withColumnRenamed("id", "b")
    inter = (
        pairs.join(sa, "a").join(sb, ["b", "shingle"])
        .groupBy("a", "b")
        .agg(F.count("*").alias("inter"))
    )
    return (
        pairs.join(inter, ["a", "b"], "left")
        .na.fill({"inter": 0})
        .join(sizes.withColumnRenamed("id", "a")
                   .withColumnRenamed("sz", "sza"), "a")
        .join(sizes.withColumnRenamed("id", "b")
                   .withColumnRenamed("sz", "szb"), "b")
        .select(
            "a", "b",
            (F.col("inter").cast("double")
             / (F.col("sza") + F.col("szb") - F.col("inter"))).alias("jaccard"),
        )
    )


def minhash_dedup(df: DataFrame, id_col: str = "doc_id",
                  text_col: str = "text", threshold: float = 0.7,
                  num_hashes: int = 16, band_size: int = 2) -> DataFrame:
    """Near-dup clustering: LSH candidates -> Jaccard verify ->
    connected components -> (doc_id, cluster_rep)."""
    sigs = minhash_signatures(df, id_col, text_col, num_hashes)
    cand = minhash_candidates(minhash_bands(sigs, band_size))
    verified = shingle_jaccard(df, cand, id_col, text_col).filter(
        F.col("jaccard") >= threshold
    )
    if verified.isEmpty():
        return df.select(F.col(id_col),
                         F.col(id_col).alias("cluster_rep"))
    comp = connected_components(
        verified.select(F.col("a").cast("string").alias("src"),
                        F.col("b").cast("string").alias("dst"))
    )
    ids = df.select(F.col(id_col))
    joined = ids.join(
        comp.select(F.col("node").alias("_sid"),
                    F.col("component").alias("cluster_rep")),
        ids[id_col].cast("string") == F.col("_sid"),
        "left",
    )
    return joined.select(
        F.col(id_col),
        F.coalesce(F.col("cluster_rep"),
                   F.col(id_col).cast("string")).alias("cluster_rep"),
    )


def simhash_signatures(df: DataFrame, id_col: str = "doc_id",
                       text_col: str = "text", bits: int = 16) -> DataFrame:
    """16-bit SimHash from md5 hex nibbles, pure SQL (engine-stable).

    Token hash bits come from the first bits/4 hex chars of md5(tok);
    bit b of the signature is 1 iff sum over tokens of (2*bit_b - 1)
    is positive. Duplicate tokens count with multiplicity.

    Plan shape (round-6 optimization — the discipline
    simhash64_signatures already used): the ``bits`` per-bit
    contributions are ``bits`` conditional SUM aggregates inside a
    single groupBy(id) (map-side partial agg, whole-stage codegen; one
    row per doc enters the only exchange), and the final signature is
    packed row-locally from the per-bit sums. The previous shape
    exploded ``bits`` rows per token and paid two aggregation
    exchanges — (id, b) then (id). Identical output: bit b is set iff
    sum over tokens of (2*bit_b - 1) > 0, duplicate tokens with
    multiplicity, exactly as before.
    """
    nhex = bits // 4
    # Expressions are built as batched SQL strings (selectExpr /
    # F.expr), not per-call Column compositions: the ``bits``-wide
    # aggregate otherwise costs hundreds of py4j round trips PER QUERY
    # CONSTRUCTION — measured 0.45s of driver time per bench pass,
    # exceeding the 0.26s execution (guide §1.2 step 2: per-task —
    # here per-plan — work). The analyzed plan is identical.
    toks = df.selectExpr(f"`{id_col}` AS id",
                         f"explode(split(`{text_col}`, ' ')) AS tok"
                         ).filter("tok != ''")
    # materialize the md5 nibbles ONCE per token in a projection below
    # the aggregate — the ``bits`` aggregate expressions then do pure
    # integer arithmetic instead of each re-deriving
    # conv(substring(md5(tok))) (codegen subexpression elimination is
    # not guaranteed across independent aggregate expressions)
    nibs = toks.selectExpr("id", "md5(tok) AS _hx").selectExpr("id", *[
        f"CAST(conv(substring(_hx, {i + 1}, 1), 16, 10) AS INT) AS _n{i}"
        for i in range(nhex)
    ])
    per_id = nibs.groupBy("id").agg(*[
        F.expr(f"sum(CAST((shiftright(_n{b // 4}, {b % 4}) & 1) AS BIGINT)"
               f" * 2 - 1) AS _s{b}")
        for b in range(bits)
    ])
    pack = " + ".join(
        f"(CASE WHEN _s{b} > 0 THEN CAST({1 << b} AS BIGINT)"
        f" ELSE CAST(0 AS BIGINT) END)"
        for b in range(bits)
    )
    return per_id.selectExpr("id", f"CAST({pack} AS BIGINT) AS simhash")


def simhash64_signatures(df: DataFrame, id_col: str = "doc_id",
                         text_col: str = "text") -> DataFrame:
    """64-bit SimHash as FOUR 16-bit band columns (b0..b3) — round-2
    verdict item 8 (the 16-bit variant above stays as the small
    engine-stable oracle shape).

    Banded representation instead of one 64-bit long: bit 63 of a
    packed long needs unsigned semantics that SQL engines disagree on,
    2^b sums overflow BIGINT at b=63 and lose precision as doubles
    past 2^53 — while 4x16-bit ints are exact everywhere AND are
    precisely the pigeonhole buckets Hamming-distance candidate
    pairing needs (any pair within Hamming distance 3 of a 64-bit
    signature agrees on at least one of 4 bands).

    Token-hash bits come from the first 16 hex nibbles of md5(tok)
    (engine-stable: Spark == DuckDB == Python md5); bit b of the
    signature is 1 iff sum over tokens of (2*bit_b(tok) - 1) > 0,
    duplicate tokens counting with multiplicity.

    Plan shape: ONE shuffle — the 64 per-bit contributions are 64
    conditional aggregates inside a single groupBy (map-side partial
    agg, all whole-stage codegen; no 64-row-per-token explode).
    """
    # batched SQL strings for the same construction-cost reason as
    # simhash_signatures (64 aggregates = ~600 py4j calls otherwise)
    toks = df.selectExpr(f"`{id_col}` AS id",
                         f"explode(split(`{text_col}`, ' ')) AS tok"
                         ).filter("tok != ''")
    # nibbles materialized once per token below the aggregate (round-6:
    # same rationale as simhash_signatures — 64 aggregate expressions
    # must not each re-derive conv(substring(md5(tok))))
    nibs = toks.selectExpr("id", "md5(tok) AS _hx").selectExpr("id", *[
        f"CAST(conv(substring(_hx, {i + 1}, 1), 16, 10) AS INT) AS _n{i}"
        for i in range(16)
    ])
    per_id = nibs.groupBy("id").agg(*[
        F.expr(f"sum((shiftright(_n{b // 4}, {b % 4}) & 1) * 2 - 1)"
               f" AS _s{b}")
        for b in range(64)
    ])
    band_cols = []
    for k in range(4):
        pack = " + ".join(
            f"(CASE WHEN _s{16 * k + j} > 0 THEN {1 << j} ELSE 0 END)"
            for j in range(16)
        )
        band_cols.append(f"CAST({pack} AS INT) AS b{k}")
    return per_id.selectExpr("id", *band_cols)


def simhash64_near_duplicates(df: DataFrame, id_col: str = "doc_id",
                              text_col: str = "text",
                              max_hamming: int = 3) -> DataFrame:
    """(id_a, id_b, hamming) pairs with 64-bit SimHash Hamming distance
    <= ``max_hamming`` (<= 3 uses the 4-band pigeonhole exactly; larger
    thresholds would need more/narrower bands).

    Scale shape: candidates form ONLY inside equal (band_idx, value)
    buckets — never all-pairs — then one join back to the signature
    table verifies the true distance with ``bit_count(xor)`` per band.
    Same blocked-candidate discipline as MinHash/LSH above.
    """
    assert max_hamming <= 3, "4-band pigeonhole guarantees recall only to 3"
    sigs = simhash64_signatures(df, id_col, text_col)
    bands = sigs.select(
        "id",
        F.explode(F.array(*[
            F.struct(F.lit(k).alias("band_idx"),
                     F.col(f"b{k}").alias("value"))
            for k in range(4)
        ])).alias("bk"),
    ).select("id", F.col("bk.band_idx").alias("band_idx"),
             F.col("bk.value").alias("value"))
    cand = (
        bands.alias("x")
        .join(bands.alias("y"),
              (F.col("x.band_idx") == F.col("y.band_idx"))
              & (F.col("x.value") == F.col("y.value"))
              & (F.col("x.id") < F.col("y.id")))
        .select(F.col("x.id").alias("id_a"), F.col("y.id").alias("id_b"))
        .distinct()
    )
    sa = sigs.select(F.col("id").alias("id_a"),
                     *[F.col(f"b{k}").alias(f"a{k}") for k in range(4)])
    sb = sigs.select(F.col("id").alias("id_b"),
                     *[F.col(f"b{k}").alias(f"bb{k}") for k in range(4)])
    hamming = sum(
        F.bit_count(F.col(f"a{k}").bitwiseXOR(F.col(f"bb{k}")))
        for k in range(1, 4)
    ) + F.bit_count(F.col("a0").bitwiseXOR(F.col("bb0")))
    return (
        cand.join(sa, "id_a").join(sb, "id_b")
        .select("id_a", "id_b", hamming.cast("int").alias("hamming"))
        .filter(F.col("hamming") <= max_hamming)
    )
