"""Similarity search over an embedding column (``array<float>``).

- :func:`knn_bruteforce` — exact cosine top-k: the correctness baseline.
  Probe set × corpus cross join; fine when the probe side is small and
  broadcastable (the common "score a batch of queries" shape).
- :func:`near_duplicate_pairs` — all pairs above a cosine threshold
  (embedding-cosine near-dup dedup).
- :func:`lsh_ann_topk` — the scale path: deterministic random-hyperplane
  LSH buckets shrink the candidate set from |corpus| to |bucket| before
  exact scoring. Hyperplanes derive from md5 of (plane, dim) — no RNG
  state, so any executor regenerates them identically.

All dot products are built-in array expressions (``zip_with`` +
``aggregate``), cast to double *before* multiplication so the fold is
IEEE-identical to the DuckDB oracle's; scores are rounded to 4 dp before
ranking so cross-engine ULP noise cannot flip an ordering (ties break on
vec_id).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window, functions as F


def _as_double(arr: Column) -> Column:
    return F.transform(arr, lambda x: x.cast("double"))


def dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def norm_sq(a: Column) -> Column:
    return F.aggregate(
        F.transform(a, lambda x: x * x), F.lit(0.0), lambda acc, v: acc + v
    )


def _prepared(embeddings: DataFrame, id_col: str, vec_col: str) -> DataFrame:
    v = _as_double(F.col(vec_col))
    return embeddings.select(
        F.col(id_col), v.alias("_v"), norm_sq(v).alias("_nsq")
    )


def cosine(va: Column, vb: Column, nsq_a: Column, nsq_b: Column) -> Column:
    return F.round(dot(va, vb) / F.sqrt(nsq_a * nsq_b), 4)


def knn_bruteforce(embeddings: DataFrame, probes: DataFrame, k: int = 3,
                   id_col: str = "vec_id",
                   vec_col: str = "embedding") -> DataFrame:
    """Exact top-k cosine neighbors of each probe (self excluded).

    The probe side is broadcast — the corpus never shuffles; scoring is a
    map-side nested loop, then a per-probe top-k window on a tiny
    intermediate (|probes| * |corpus| rows reduced by rank<=k).
    """
    corpus = _prepared(embeddings, id_col, vec_col)
    p = _prepared(probes, id_col, vec_col).select(
        F.col(id_col).alias("probe_id"),
        F.col("_v").alias("_pv"), F.col("_nsq").alias("_pnsq"),
    )
    scored = (
        corpus.join(F.broadcast(p), F.col(id_col) != F.col("probe_id"))
        .select(
            "probe_id",
            F.col(id_col).alias("neighbor_id"),
            cosine(F.col("_pv"), F.col("_v"),
                   F.col("_pnsq"), F.col("_nsq")).alias("cos_sim"),
        )
    )
    return _topk(scored, k)


def near_duplicate_pairs(embeddings: DataFrame, threshold: float = 0.95,
                         id_col: str = "vec_id",
                         vec_col: str = "embedding") -> DataFrame:
    """All pairs (a<b) with cosine >= threshold. Exact — quadratic; at
    scale run it per LSH bucket (see lsh_ann_topk) instead of globally."""
    base = _prepared(embeddings, id_col, vec_col)
    a = base.select(F.col(id_col).alias("id_a"), F.col("_v").alias("_va"),
                    F.col("_nsq").alias("_na"))
    b = base.select(F.col(id_col).alias("id_b"), F.col("_v").alias("_vb"),
                    F.col("_nsq").alias("_nb"))
    return (
        a.join(b, F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b",
                cosine(F.col("_va"), F.col("_vb"),
                       F.col("_na"), F.col("_nb")).alias("cos_sim"))
        .filter(F.col("cos_sim") >= threshold)
    )


def near_duplicate_pairs_lsh(embeddings: DataFrame,
                             threshold: float = 0.95,
                             n_planes: int = 8,
                             n_bands: int = 2,
                             dim: int | None = None,
                             id_col: str = "vec_id",
                             vec_col: str = "embedding") -> DataFrame:
    """Scale path for :func:`near_duplicate_pairs`: exact-cosine verify
    restricted to hyperplane-band collisions.

    The ``n_planes`` hyperplanes are split into ``n_bands`` bands of
    ``n_planes // n_bands`` planes; a pair becomes a candidate when ALL
    sign bits agree within ANY band — the direct embedding analog of the
    MinHash band join (a single all-planes bucket would need all 8 signs
    to match, whose collision probability at cos ≥ 0.95 is only
    ``(1 - θ/π)^8 ≈ 0.43``; two 4-plane bands lift that to
    ``1 - (1 - p⁴)² ≈ 0.88``). Each band join is a keyed, balanced
    EQUI-join; candidates are deduped across bands, then verified with
    the exact cosine (approximate recall, exact precision — every
    emitted cos_sim is the true value). Bucket assignment uses plan-time
    literal hyperplanes — no driver action, exact DuckDB oracle.
    """
    assert n_planes % n_bands == 0
    if dim is None:
        raise ValueError(
            "near_duplicate_pairs_lsh requires dim (embedding "
            "dimensionality): the hyperplanes are plan-time literals — "
            "pass it from the table contract")
    band_size = n_planes // n_bands
    base = _prepared(embeddings, id_col, vec_col)
    v = F.col("_v")
    band_tables = []
    for bi in range(n_bands):
        # band key = band index in the high bits + the band's sign bits:
        # equal keys can only come from the same band
        key = F.lit(bi << band_size)
        for j in range(band_size):
            plane = F.array(*[
                F.lit(c) for c in _hyperplane(bi * band_size + j, dim)])
            key = key + F.when(F.round(dot(v, plane), 6) >= 0,
                               F.lit(1 << j)).otherwise(F.lit(0))
        band_tables.append(
            base.select(F.col(id_col).alias("id"), key.alias("band_key")))
    bands = band_tables[0]
    for other in band_tables[1:]:
        bands = bands.unionByName(other)
    cands = (
        bands.select(F.col("id").alias("id_a"), "band_key")
        .join(bands.select(F.col("id").alias("id_b"), "band_key"),
              "band_key")
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b")
        .distinct()
    )
    va = base.select(F.col(id_col).alias("id_a"), F.col("_v").alias("_va"),
                     F.col("_nsq").alias("_na"))
    vb = base.select(F.col(id_col).alias("id_b"), F.col("_v").alias("_vb"),
                     F.col("_nsq").alias("_nb"))
    return (
        cands.join(va, "id_a").join(vb, "id_b")
        .select("id_a", "id_b",
                cosine(F.col("_va"), F.col("_vb"),
                       F.col("_na"), F.col("_nb")).alias("cos_sim"))
        .filter(F.col("cos_sim") >= threshold)
    )


# ---------------------------------------------------------------------------
# scale path: random-hyperplane LSH
# ---------------------------------------------------------------------------


def _hyperplane(plane: int, dim: int) -> list[float]:
    """Deterministic pseudo-random unit-free hyperplane component signs,
    derived from md5 — reproducible on any executor with no broadcast,
    and mirrorable in the DuckDB oracle as literal arrays."""
    import hashlib

    comps = []
    for d in range(dim):
        h = hashlib.md5(f"plane:{plane}:{d}".encode()).digest()
        comps.append(1.0 if h[0] % 2 == 0 else -1.0)
    return comps


def with_lsh_bucket(embeddings: DataFrame, n_planes: int = 8,
                    dim: int | None = None, id_col: str = "vec_id",
                    vec_col: str = "embedding") -> DataFrame:
    """embedding → integer LSH bucket: sign pattern over n_planes
    deterministic hyperplanes, folded into one int column.

    ``dim`` (the embedding dimensionality) must be passed by the caller:
    the hyperplanes are plan-time literals, and inferring dim from the
    data would require a driver-side action during plan construction.
    The dot product is rounded to 6 dp before the sign test so the bucket
    assignment is reproducible across engines (exact DuckDB oracle).
    """
    if dim is None:
        raise ValueError(
            "with_lsh_bucket requires dim (embedding dimensionality): "
            "inferring it would need a driver-side action during plan "
            "construction — pass it from the table contract instead")
    v = _as_double(F.col(vec_col))
    bucket = F.lit(0)
    for p in range(n_planes):
        plane = F.array(*[F.lit(c) for c in _hyperplane(p, dim)])
        side = F.when(F.round(dot(v, plane), 6) >= 0,
                      F.lit(1 << p)).otherwise(F.lit(0))
        bucket = bucket + side
    return embeddings.withColumn("lsh_bucket", bucket)


def _l2_sq(v: Column, c: Column) -> Column:
    return F.aggregate(
        F.zip_with(v, c, lambda a, b: (a - b) * (a - b)),
        F.lit(0.0), lambda acc, x: acc + x,
    )


def _topk(scored: DataFrame, k: int) -> DataFrame:
    w = Window.partitionBy("probe_id").orderBy(
        F.col("cos_sim").desc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("probe_id", "neighbor_id", "cos_sim",
                F.col("rank").cast("int").alias("rank"))
    )


def ivf_ann_topk(embeddings: DataFrame, probes: DataFrame, k: int = 3,
                 n_centroids: int = 16, n_probe: int = 4,
                 id_col: str = "vec_id", vec_col: str = "embedding",
                 quantizer: str = "hash",
                 fit_fraction: float | None = None) -> DataFrame:
    """IVF (inverted-file) approximate top-k: coarse-quantize the corpus,
    search only the ``n_probe`` clusters nearest each probe.

    The classic IVF trade: one equi-join on cluster id instead of a cross
    join — candidates shrink by ~n_centroids/n_probe. Scores are exact
    cosine on the candidate set, same rounding/tie rules as the
    brute-force baseline, so IVF results are a subset of the exact ranking.

    Quantizers:

    - ``"hash"`` (default): the ``n_centroids`` corpus vectors with the
      smallest ``md5(id)`` — a deterministic random sample, selected with
      a distributed partial top-k (``TakeOrderedAndProject``, no global
      sort). The centroid set is aggregated into ONE array row and
      broadcast, so cluster assignment is a pure map-side expression:
      the corpus is NEVER shuffled (build or query), and the whole plan
      has an exact DuckDB oracle.
    - ``"kmeans"``: Lloyd-refined centroids via ``pyspark.ml`` — better
      cluster balance, costs an iterative fit. ``fit_fraction`` samples
      the fit input (set it well below 1.0 at scale; the assignment pass
      still covers the full corpus).
    """
    if quantizer == "kmeans":
        return _ivf_kmeans_topk(embeddings, probes, k, n_centroids, n_probe,
                                id_col, vec_col, fit_fraction)
    if quantizer != "hash":
        raise ValueError(f"unknown quantizer: {quantizer!r}")

    base = _prepared(embeddings, id_col, vec_col)
    cent = (
        base.orderBy(F.md5(F.col(id_col).cast("string")), F.col(id_col))
        .limit(n_centroids)
        .select(F.col(id_col).alias("cid"), F.col("_v").alias("_cv"))
    )
    # one row holding all centroids: broadcast-joined to corpus and probes
    # so argmin-over-centroids is a per-row array expression, zero shuffle
    carr = cent.agg(F.collect_list(F.struct("cid", "_cv")).alias("_cs"))

    def nearest(n: int) -> Column:
        dists = F.transform(
            F.col("_cs"),
            lambda c: F.struct(
                F.round(_l2_sq(F.col("_v"), c["_cv"]), 6).alias("d"),
                c["cid"].alias("cid"),
            ),
        )
        return F.slice(F.array_sort(dists), 1, n)

    corpus = (
        base.crossJoin(F.broadcast(carr))
        .select(F.col(id_col), F.col("_v"), F.col("_nsq"),
                nearest(1)[0]["cid"].alias("_cluster"))
    )
    p = (
        _prepared(probes, id_col, vec_col)
        .crossJoin(F.broadcast(carr))
        .select(
            F.col(id_col).alias("probe_id"),
            F.col("_v").alias("_pv"), F.col("_nsq").alias("_pnsq"),
            F.explode(F.transform(nearest(n_probe), lambda s: s["cid"]))
            .alias("_cluster"),
        )
    )
    scored = (
        corpus.join(F.broadcast(p), "_cluster")
        .filter(F.col(id_col) != F.col("probe_id"))
        .select(
            "probe_id", F.col(id_col).alias("neighbor_id"),
            cosine(F.col("_pv"), F.col("_v"),
                   F.col("_pnsq"), F.col("_nsq")).alias("cos_sim"),
        )
    )
    return _topk(scored, k)


def _ivf_kmeans_topk(embeddings: DataFrame, probes: DataFrame, k: int,
                     n_centroids: int, n_probe: int, id_col: str,
                     vec_col: str, fit_fraction: float | None) -> DataFrame:
    from pyspark.ml.clustering import KMeans
    from pyspark.ml.functions import array_to_vector

    base = embeddings.withColumn("_fv", array_to_vector(
        _as_double(F.col(vec_col))))
    fit_input = (base.sample(fraction=fit_fraction, seed=42)
                 if fit_fraction is not None else base)
    model = KMeans(k=n_centroids, seed=42, featuresCol="_fv",
                   predictionCol="_cluster").fit(fit_input)
    v = _as_double(F.col(vec_col))
    corpus = model.transform(base).select(
        F.col(id_col), v.alias("_v"), norm_sq(v).alias("_nsq"), "_cluster")

    # probe -> n_probe nearest centroids, computed as column expressions
    # over the (tiny, literal) centroid list — no second ML pass
    centers = [[float(x) for x in c] for c in model.clusterCenters()]
    p = _prepared(probes, id_col, vec_col)
    dists = F.array(*[
        F.struct(
            _l2_sq(F.col("_v"),
                   F.array(*[F.lit(x) for x in center])).alias("d"),
            F.lit(j).alias("c"),
        )
        for j, center in enumerate(centers)
    ])
    p = (
        p.withColumn("_near", F.slice(F.array_sort(dists), 1, n_probe))
        .select(
            F.col(id_col).alias("probe_id"),
            F.col("_v").alias("_pv"), F.col("_nsq").alias("_pnsq"),
            F.explode(F.col("_near.c")).alias("_cluster"),
        )
    )
    scored = (
        corpus.join(F.broadcast(p), "_cluster")
        .filter(F.col(id_col) != F.col("probe_id"))
        .select(
            "probe_id", F.col(id_col).alias("neighbor_id"),
            cosine(F.col("_pv"), F.col("_v"),
                   F.col("_pnsq"), F.col("_nsq")).alias("cos_sim"),
        )
    )
    return _topk(scored, k)


def _prepared_with_bucket(df: DataFrame, n_planes: int, dim: int,
                          id_col: str, vec_col: str) -> DataFrame:
    v = _as_double(F.col(vec_col))
    return with_lsh_bucket(df, n_planes, dim, id_col, vec_col).select(
        F.col(id_col), F.col("lsh_bucket"),
        v.alias("_v"), norm_sq(v).alias("_nsq"),
    )


def lsh_ann_topk(embeddings: DataFrame, probes: DataFrame, k: int = 3,
                 n_planes: int = 8, dim: int | None = None,
                 id_col: str = "vec_id",
                 vec_col: str = "embedding") -> DataFrame:
    """Approximate top-k: exact cosine, but only within the probe's LSH
    bucket. One equi-join on the bucket key replaces the cross join —
    the candidate set shrinks by ~2^n_planes, which is what survives at
    10^9-vector scale (bucket-key shuffle instead of broadcast-nested-loop;
    here the tiny probe side is broadcast so the corpus never shuffles).
    ``dim`` must come from the caller's table contract (see
    :func:`with_lsh_bucket`).
    """
    corpus = _prepared_with_bucket(embeddings, n_planes, dim, id_col, vec_col)
    p = _prepared_with_bucket(probes, n_planes, dim, id_col, vec_col).select(
        F.col(id_col).alias("probe_id"), F.col("lsh_bucket"),
        F.col("_v").alias("_pv"), F.col("_nsq").alias("_pnsq"),
    )
    scored = (
        corpus.join(F.broadcast(p), "lsh_bucket")
        .filter(F.col(id_col) != F.col("probe_id"))
        .select(
            "probe_id", F.col(id_col).alias("neighbor_id"),
            cosine(F.col("_pv"), F.col("_v"),
                   F.col("_pnsq"), F.col("_nsq")).alias("cos_sim"),
        )
    )
    return _topk(scored, k)
