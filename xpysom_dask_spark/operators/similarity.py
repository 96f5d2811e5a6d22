"""Similarity search over embedding columns (array<float>).

Tiers, all DataFrame-declarative with Arrow-GEMM kernels in the hot path
(never per-pair interpreted SQL lambdas — those run one interpreted call
per element per pair, ~100× slower than one BLAS GEMM per Arrow batch):

* ``cosine_topk`` — exact brute-force top-k: **broadcast** the (small)
  query set against the corpus scan, per-batch float64 GEMM + per-batch
  top-(k+1) pre-prune, exact window top-k on the survivors.  One corpus
  scan, no shuffle of the corpus — the correct 100 TB plan when queries
  are few.
* ``near_dup_pairs`` — exact all-pairs cosine ≥ threshold, executed as a
  distributed GEMM against a broadcast copy of the table.  Bounded by
  ``max_rows`` (broadcast must fit executor memory) and **enforces** the
  bound with an actionable error pointing at the LSH path.
* ``hyperplane_lsh_signatures`` / ``lsh_near_dup_pairs`` — **banded
  multi-table** random-hyperplane LSH (the sign-bit analog of the MinHash
  band scheme in operators.dedup): each vector gets ``n_bands`` packed
  sign-bucket keys from ONE GEMM; candidates are pairs sharing ≥ 1 band
  key (equi-join per band, bounded buckets); survivors are exactly
  verified with a pairwise-GEMM kernel.  ``bits_per_band=None`` sizes the
  band space to the corpus so expected bucket occupancy stays O(1) —
  the scale path for all-pairs similarity.
* ``som_ivf_topk`` — IVF-style ANN using a trained SparkSom as the coarse
  quantizer: corpus bucketed by BMU cell in one narrow pass, queries
  explode their ``nprobe`` nearest cells and **equi-join**
  ``cell == cluster_id`` (BroadcastHashJoin — never a nested-loop join),
  candidate cosines via the same pairwise GEMM.  With ``nprobe = x·y``
  the result is exactly the brute-force top-k (full probe ⇒ every cell
  scanned), which is the oracle-checkable configuration.
"""

from __future__ import annotations

import math

import numpy as np
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def dot_expr(a: str, b: str) -> str:
    """float64 dot product of two array<float> columns — identical
    arithmetic to the DuckDB oracle twin (left-to-right accumulation).
    Expression form: interpreted per element — fine for a few rows,
    never for a per-pair hot path (use the GEMM kernels below)."""
    return (f"aggregate(zip_with({a}, {b}, "
            "(x, y) -> CAST(x AS DOUBLE) * CAST(y AS DOUBLE)), "
            "0D, (acc, v) -> acc + v)")


def norm_expr(a: str) -> str:
    return f"sqrt({dot_expr(a, a)})"


def cosine_expr(a: str, b: str) -> str:
    return f"({dot_expr(a, b)} / ({norm_expr(a)} * {norm_expr(b)}))"


def _stack(col) -> np.ndarray:
    return np.stack([np.asarray(v, np.float64) for v in col])


def pairwise_cosine(pairs: DataFrame, va: str = "va", vb: str = "vb",
                    out: str = "sim") -> DataFrame:
    """Append an exact float64 cosine column to a DataFrame of vector
    pairs in one narrow Arrow pass (row-wise batched dot products — one
    einsum per batch, no interpreted per-pair lambdas).  Drops the vector
    columns; keeps everything else."""
    import pandas as pd

    from ..plans.exchange import ship_package

    ship_package(pairs.sparkSession)
    keep = [f for f in pairs.schema.fields if f.name not in (va, vb)]
    out_ddl = ", ".join(f"{f.name} {f.dataType.simpleString()}" for f in keep)
    out_ddl = (out_ddl + ", " if out_ddl else "") + f"{out} double"
    keep_names = [f.name for f in keep]

    def fn(batches):
        for b in batches:
            if not len(b):
                continue
            A = _stack(b[va])
            B = _stack(b[vb])
            num = np.einsum("ij,ij->i", A, B)
            sims = num / (np.linalg.norm(A, axis=1)
                          * np.linalg.norm(B, axis=1))
            res = b[keep_names].copy()
            res[out] = sims
            yield res

    return pairs.mapInPandas(fn, out_ddl)


#: broadcast bound for the cosine_topk query matrix — ~50 MB at d=64
COSINE_TOPK_MAX_QUERIES = 100_000


def cosine_topk(corpus: DataFrame, queries: DataFrame, k: int = 5,
                id_col: str = "vec_id", vec_col: str = "embedding",
                exclude_self: bool = True,
                max_queries: int = COSINE_TOPK_MAX_QUERIES) -> DataFrame:
    """Exact top-k cosine neighbors per query:
    (query_id, neighbor_id, rank, sim).

    Physical plan (the UDF-kernel shape, not a crossJoin): the query
    matrix is broadcast; one narrow Arrow pass over the corpus computes
    per-batch similarities with a float64 GEMM and keeps each batch's
    top-(k+1) per query, so only ``batches · (k+1) · |Q|`` candidate
    rows reach the final exact top-k window — the corpus is never
    shuffled and never leaves the executors.  ~100× the throughput of
    the equivalent broadcast-NLJ with a per-pair SQL ``aggregate()``
    lambda (interpreted, one invocation per element per pair).

    The plan is bounded by the query matrix fitting in executor memory
    (the per-batch GEMM is O(batch · |Q|)), so the bound is enforced:
    more than ``max_queries`` query rows raises with a pointer at the
    scalable alternatives instead of OOMing mid-broadcast.
    """
    import pandas as pd

    from ..plans.exchange import ship_package

    spark = corpus.sparkSession
    ship_package(spark)
    n_q = queries.count()
    if n_q > max_queries:
        raise ValueError(
            f"cosine_topk: {n_q} query rows > max_queries={max_queries}; "
            "the query matrix is broadcast and each Arrow batch computes "
            "a (batch x |Q|) GEMM, so huge query sets belong in "
            "som_ivf_topk (bucketed ANN) or a chunked loop over query "
            "slices. Raise max_queries only if executors have the "
            "memory.")
    qpdf = queries.select(id_col, vec_col).toPandas()
    if not len(qpdf):
        return spark.createDataFrame(
            [], "query_id bigint, rank int, neighbor_id bigint, sim double")
    qids = qpdf[id_col].to_numpy(np.int64)
    Q = np.stack([np.asarray(v, np.float64) for v in qpdf[vec_col]])
    qn = np.linalg.norm(Q, axis=1)
    bc = spark.sparkContext.broadcast((qids, Q, qn))

    def fn(batches):
        qids_, Q_, qn_ = bc.value
        nq = len(qids_)
        for pdf in batches:
            if not len(pdf):
                continue
            C = np.stack([np.asarray(v, np.float64) for v in pdf["vec"]])
            cn = np.linalg.norm(C, axis=1)
            sims = (C @ Q_.T) / (cn[:, None] * qn_[None, :])
            nb = pdf["neighbor_id"].to_numpy(np.int64)
            kk = min(k + 1 if exclude_self else k, len(C))
            top = np.argpartition(-sims, kk - 1, axis=0)[:kk]  # (kk, nq)
            rows = top.T.ravel()                               # query-major
            yield pd.DataFrame({
                "query_id": np.repeat(qids_, kk),
                "neighbor_id": nb[rows],
                "sim": sims[rows, np.repeat(np.arange(nq), kk)],
            })

    slim = corpus.select(F.col(id_col).alias("neighbor_id"),
                         F.col(vec_col).alias("vec"))
    cand = slim.mapInPandas(
        fn, "query_id bigint, neighbor_id bigint, sim double")
    if exclude_self:
        cand = cand.where(F.col("query_id") != F.col("neighbor_id"))
    w = Window.partitionBy("query_id").orderBy(F.col("sim").desc(),
                                               F.col("neighbor_id"))
    return (cand.withColumn("rank", F.row_number().over(w))
            .where(F.col("rank") <= k)
            .select("query_id", "rank", "neighbor_id", "sim"))


KNN_GRAPH_MAX_CELL_ROWS = 200_000


def knn_graph(df: DataFrame, centroids: np.ndarray, k: int = 5,
              id_col: str = "vec_id", vec_col: str = "embedding",
              nprobe: int = 1,
              max_cell_rows: int = KNN_GRAPH_MAX_CELL_ROWS,
              decimals: int = 6) -> DataFrame:
    """Cell-pruned exact kNN graph over the WHOLE corpus:
    (vec_id, rank, neighbor_id, sim) — each vector's neighbors are the
    top-``k`` cosine matches among the vectors OWNED by its ``nprobe``
    nearest coarse cells (squared-L2 ranking over ``centroids``, ties
    → lowest index; a vector is owned by exactly its rank-1 cell).

    This is the graph-construction primitive behind SemDeDup-style
    semantic dedup and kNN-graph clustering: an all-pairs exact kNN is
    O(n²) and unshippable, while the probed-cell contract makes the
    candidate set explicit and deterministic — recall is governed by
    codebook granularity AND ``nprobe``, exactly the two knobs IVF
    serving exposes; true neighbors sitting in a never-probed cell are
    the documented miss mode, and raising ``nprobe`` buys them back at
    ``nprobe×`` candidate cost (measured curve in BASELINE.md).

    Scale shape: one narrow probe-assignment pass (broadcast codebook,
    each row fans out to its ``nprobe`` probe rows — Arrow, no
    shuffle) → ONE shuffle keyed by cell id (each row moves ``nprobe``
    times, never keyed by payload) → per-cell exact GEMM of probe rows
    × owner rows inside Arrow, row-blocked so memory is
    O(block · owners) → final exact rank window over n·nprobe·k
    candidate rows with the engine-wide (sim DESC, neighbor_id ASC)
    tie-break.  A cell over ``max_cell_rows`` raises with the remedy
    (more centroids) instead of OOMing an executor.
    """
    import pandas as pd

    from ..plans.exchange import ship_package

    spark = df.sparkSession
    ship_package(spark)
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    C = np.asarray(centroids, np.float64)
    if not 1 <= nprobe <= len(C):
        raise ValueError(
            f"nprobe must be in [1, n_cells={len(C)}], got {nprobe}")
    nprobe = int(nprobe)
    bc = spark.sparkContext.broadcast(C)

    vec_t = df.schema[vec_col].dataType.simpleString()

    def probe_fn(batches):
        Cc = bc.value
        c_sq = (Cc * Cc).sum(axis=1)
        for pdf in batches:
            if not len(pdf):
                continue
            X = np.stack([np.asarray(v, np.float64)
                          for v in pdf[vec_col]])
            scores = -2.0 * (X @ Cc.T) + c_sq[None, :]
            order = np.argsort(scores, axis=1, kind="stable")[:, :nprobe]
            n = len(X)
            yield pd.DataFrame({
                id_col: np.repeat(pdf[id_col].to_numpy(np.int64),
                                  nprobe),
                "cell": order.ravel().astype(np.int32),
                "is_owner": np.tile(
                    np.arange(nprobe) == 0, n),
                vec_col: [v for v in pdf[vec_col] for _ in range(nprobe)],
            })

    probes = df.select(id_col, vec_col).mapInPandas(
        probe_fn,
        f"{id_col} bigint, cell int, is_owner boolean, {vec_col} {vec_t}")

    def kernel(pdf: pd.DataFrame) -> pd.DataFrame:
        n = len(pdf)
        if n > max_cell_rows * nprobe:
            raise ValueError(
                f"knn_graph: cell {int(pdf['cell'].iloc[0])} holds "
                f"{n} probe rows > max_cell_rows={max_cell_rows} x "
                f"nprobe={nprobe}; train a finer codebook (more "
                "centroids) so cells stay GEMM-sized")
        ids = pdf[id_col].to_numpy(np.int64)
        own = pdf["is_owner"].to_numpy(bool)
        X = np.stack([np.asarray(v, np.float64) for v in pdf[vec_col]])
        norms = np.linalg.norm(X, axis=1)
        norms[norms == 0.0] = 1.0
        Xn = X / norms[:, None]
        On, oids = Xn[own], ids[own]           # the cell's owners
        if len(oids) == 0:
            return pd.DataFrame({"query_id": np.empty(0, np.int64),
                                 "neighbor_id": np.empty(0, np.int64),
                                 "sim": np.empty(0, np.float64)})
        out_q, out_n, out_s = [], [], []
        for lo in range(0, n, 1024):
            hi = min(lo + 1024, n)
            sims = Xn[lo:hi] @ On.T            # (block, owners)
            sims[ids[lo:hi, None] == oids[None, :]] = -np.inf
            kk = min(k, sims.shape[1])
            top = np.argpartition(-sims, kk - 1, axis=1)[:, :kk]
            rows = np.repeat(np.arange(hi - lo), kk)
            cols = top.ravel()
            sel = sims[rows, cols]
            keep = np.isfinite(sel)             # drop self-only rows
            out_q.append(np.repeat(ids[lo:hi], kk)[keep])
            out_n.append(oids[cols][keep])
            out_s.append(sel[keep])
        return pd.DataFrame({"query_id": np.concatenate(out_q),
                             "neighbor_id": np.concatenate(out_n),
                             "sim": np.concatenate(out_s)})

    cand = probes.groupBy("cell").applyInPandas(
        kernel, "query_id bigint, neighbor_id bigint, sim double")
    w = Window.partitionBy("query_id").orderBy(
        F.col("sim").desc(), F.col("neighbor_id"))
    return (cand.withColumn("rank", F.row_number().over(w))
            .where(F.col("rank") <= k)
            .select(F.col("query_id").alias(id_col), "rank",
                    "neighbor_id", F.round("sim", decimals).alias("sim")))


#: fine hash buckets per chunk for the exact-packing stage — expected
#: bucket size is chunk/64, so packing never builds an over-bound chunk
#: short of a 64x md5 skew (then it raises, it does not spill)
_TOPK_FINE_BUCKETS_PER_CHUNK = 64


class TopKResult:
    """Lazy top-k plan + the cache handle backing it (VERDICT r03 #5).

    ``df`` is the result DataFrame; ``cached_corpus`` is the persisted
    corpus projection it reads (``None`` when nothing was persisted).
    The handle survives any further transformation of ``df`` — unlike
    the monkey-patched attribute it replaces, which silently vanished
    on the first ``.where()``/``.select()``.

    Use as a context manager so the cache is released exactly when
    consumers finish::

        with cosine_topk_many(corpus, queries, k=5) as df:
            df.write.parquet(...)

    or manage manually via ``result.df`` / ``result.unpersist()``.
    """

    def __init__(self, df: DataFrame, cached_corpus: DataFrame | None):
        self.df = df
        self.cached_corpus = cached_corpus

    def unpersist(self) -> None:
        if self.cached_corpus is not None:
            self.cached_corpus.unpersist()
            self.cached_corpus = None

    def __enter__(self) -> DataFrame:
        return self.df

    def __exit__(self, *exc) -> None:
        self.unpersist()


def cosine_topk_many(corpus: DataFrame, queries: DataFrame, k: int = 5,
                     id_col: str = "vec_id", vec_col: str = "embedding",
                     exclude_self: bool = True,
                     chunk_queries: int = COSINE_TOPK_MAX_QUERIES,
                     persist_corpus: bool = True) -> TopKResult:
    """Exact top-k for query sets past the broadcast bound: the query
    table is split into deterministic hash chunks of ≤ ``chunk_queries``
    rows and each chunk runs the standard broadcast-GEMM plan; results
    union (each query lives in exactly one chunk, so per-query top-k is
    unaffected).

    Chunk membership is EXACT, not expected: queries hash into
    64·C fine buckets, the per-bucket counts (C·64 scalars — the only
    driver traffic) are first-fit packed into chunks capped at
    ``chunk_queries``, and each chunk filters on its bucket set.  A
    skewed id distribution therefore cannot push a chunk past the
    broadcast bound and fail mid-run after earlier chunks already
    burned their scans.

    Cost model: C chunks ⇒ C corpus scans — ``persist_corpus`` (default)
    caches the slim (id, vec) projection once so chunks 2..C read
    executor memory/disk instead of the source.  The cache must outlive
    the (lazy) plan, so this returns a :class:`TopKResult` carrying
    both the DataFrame and the cache handle; use it as a context
    manager (or call ``.unpersist()``) once consumers finish.  For |Q|
    approaching corpus size, prefer the IVF index (reads scale with
    nprobe).
    """
    filters = _exact_hash_chunk_filters(queries, id_col, chunk_queries,
                                        "cosine_topk_many")
    if filters is None:
        out = cosine_topk(corpus, queries, k, id_col, vec_col,
                          exclude_self, max_queries=chunk_queries)
        return TopKResult(out, None)
    slim = corpus.select(id_col, vec_col)
    if persist_corpus:
        slim = slim.persist()
    out = None
    for flt in filters:
        part = cosine_topk(slim, queries.where(flt), k, id_col, vec_col,
                           exclude_self, max_queries=chunk_queries)
        out = part if out is None else out.unionByName(part)
    return TopKResult(out, slim if persist_corpus else None)


def _exact_hash_chunk_filters(queries: DataFrame, id_col: str,
                              chunk_queries: int, op_name: str):
    """Filter Columns, each selecting ≤ ``chunk_queries`` query rows and
    together partitioning the query set — or ``None`` when the whole
    set already fits one chunk.

    Membership is exact, not expected: ids hash into 64·C fine buckets
    (deterministic md5 uniform, layout-independent), the per-bucket
    counts come back as C·64 scalars (the only driver traffic), and
    first-fit-decreasing packs buckets into chunks capped at
    ``chunk_queries``."""
    from .sampling import _unit_hash

    n_q = queries.count()
    if n_q <= chunk_queries:
        return None
    n_chunks = -(-n_q // chunk_queries)
    n_fine = _TOPK_FINE_BUCKETS_PER_CHUNK * n_chunks
    bucket = F.floor(_unit_hash(id_col, seed=0) * n_fine).cast("int")
    counts = {r["b"]: r["n"] for r in
              (queries.groupBy(bucket.alias("b"))
               .agg(F.count(F.lit(1)).alias("n")).collect())}
    over = [b for b, n in counts.items() if n > chunk_queries]
    if over:
        raise ValueError(
            f"{op_name}: hash bucket(s) {over[:3]} alone exceed "
            f"chunk_queries={chunk_queries} — the id column's md5 hash "
            "is degenerate (constant ids?); raise chunk_queries or fix "
            "the id column.")
    # first-fit-decreasing pack: buckets → chunks of ≤ chunk_queries
    chunks: list[tuple[int, list[int]]] = []   # (filled, bucket ids)
    for b in sorted(counts, key=counts.get, reverse=True):
        for i, (filled, members) in enumerate(chunks):
            if filled + counts[b] <= chunk_queries:
                chunks[i] = (filled + counts[b], members + [b])
                break
        else:
            chunks.append((counts[b], [b]))
    return [bucket.isin(members) for _, members in chunks]


#: default broadcast bound for near_dup_pairs — ~1 GB at d=64 float64
NEAR_DUP_MAX_ROWS = 2_000_000


def near_dup_pairs(df: DataFrame, threshold: float = 0.95,
                   id_col: str = "vec_id", vec_col: str = "embedding",
                   max_rows: int = NEAR_DUP_MAX_ROWS) -> DataFrame:
    """Exact all-pairs near-duplicates: (id_a, id_b, sim ≥ threshold).

    O(n²) similarity work, executed as a distributed GEMM: the (id, vec)
    projection is broadcast once (O(n·d) bytes) and each corpus partition
    computes its rows' similarities against the broadcast matrix in
    float64 BLAS — the n² term parallelizes across the cluster and
    nothing but the surviving pairs is materialized.

    The plan is bounded by the broadcast fitting in executor memory, so
    the bound is **enforced**: more than ``max_rows`` rows raises
    immediately (one cheap columnar count) instead of OOMing the driver
    mid-collect.  Beyond the bound use ``lsh_near_dup_pairs`` — same
    output contract, banded-LSH candidate generation, no broadcast of
    the corpus.
    """
    import pandas as pd

    from ..plans.exchange import ship_package

    spark = df.sparkSession
    ship_package(spark)
    slim_src = df.select(id_col, vec_col)
    n_rows = slim_src.count()
    if n_rows > max_rows:
        raise ValueError(
            f"near_dup_pairs: table has {n_rows} rows > max_rows="
            f"{max_rows}; the exact all-pairs plan broadcasts the whole "
            "(id, vec) projection to every executor and would OOM. Use "
            "lsh_near_dup_pairs (banded hyperplane LSH, same output "
            "contract) for large corpora, or raise max_rows if your "
            "executors really hold it.")
    pdf = slim_src.toPandas()
    if not len(pdf):
        return spark.createDataFrame([], "id_a bigint, id_b bigint, sim double")
    ids = pdf[id_col].to_numpy(np.int64)
    V = np.stack([np.asarray(v, np.float64) for v in pdf[vec_col]])
    vn = np.linalg.norm(V, axis=1)
    bc = spark.sparkContext.broadcast((ids, V, vn))

    def fn(batches):
        ids_, V_, vn_ = bc.value
        # block the GEMM so the (block × n) sims temporary stays
        # ~128 MB however big the broadcast side is: one unblocked
        # Arrow batch against a 20k-vector corpus allocates
        # rows×n×8 B PER WORKER (gigabytes × 32 workers = memory
        # thrash — measured 70× at 16× work in the sf1 sweep before
        # this; values are bit-identical, blocking is pure memory
        # discipline)
        block = max(1, 16_777_216 // max(len(ids_), 1))
        for b in batches:
            if not len(b):
                continue
            C = np.stack([np.asarray(v, np.float64) for v in b["vec"]])
            cn = np.linalg.norm(C, axis=1)
            nb = b["id"].to_numpy(np.int64)
            for s in range(0, len(nb), block):
                e = s + block
                sims = (C[s:e] @ V_.T) / (cn[s:e, None] * vn_[None, :])
                r, c = np.nonzero((sims >= threshold)
                                  & (nb[s:e, None] < ids_[None, :]))
                yield pd.DataFrame({"id_a": nb[s:e][r],
                                    "id_b": ids_[c],
                                    "sim": sims[r, c]})

    slim = df.select(F.col(id_col).alias("id"), F.col(vec_col).alias("vec"))
    return slim.mapInPandas(fn, "id_a bigint, id_b bigint, sim double")


def hyperplane_lsh_signatures(df: DataFrame, dim: int, n_bands: int = 4,
                              bits_per_band: int = 16, seed: int = 42,
                              id_col: str = "vec_id",
                              vec_col: str = "embedding") -> DataFrame:
    """Banded random-hyperplane signatures: (id, vec, bands array<bigint>)
    where ``bands[i]`` packs the sign bits of band ``i``'s hyperplanes.

    Cosine-close vectors agree on most sign bits, so they collide in at
    least one band with high probability — the sign-bit analog of the
    MinHash band scheme (operators.dedup.minhash_band_pairs).  One GEMM
    per Arrow batch computes all ``n_bands·bits_per_band`` bits (narrow,
    no shuffle); the expression form would run that many interpreted
    ``aggregate()`` lambdas of ``dim`` steps per row.
    """
    import pandas as pd

    from ..plans.exchange import ship_package

    spark = df.sparkSession
    ship_package(spark)
    total_bits = n_bands * bits_per_band
    rng = np.random.RandomState(seed)
    planes = rng.standard_normal((total_bits, dim))
    bc = spark.sparkContext.broadcast(planes)
    weights = (1 << np.arange(bits_per_band)).astype(np.int64)

    def fn(batches):
        P = bc.value
        for b in batches:
            if not len(b):
                continue
            X = np.stack([np.asarray(v, np.float64) for v in b["__vec"]])
            bits = ((X @ P.T) >= 0).reshape(len(X), n_bands, bits_per_band)
            packed = bits @ weights  # (n, n_bands) int64
            out = pd.DataFrame({"__id": b["__id"], "__vec": b["__vec"]})
            out["bands"] = list(packed)
            yield out

    slim = df.select(F.col(id_col).alias("__id"),
                     F.col(vec_col).alias("__vec"))
    vec_t = df.schema[vec_col].dataType.simpleString()
    id_t = df.schema[id_col].dataType.simpleString()
    out = slim.mapInPandas(
        fn, f"__id {id_t}, __vec {vec_t}, bands array<bigint>")
    return out.select(F.col("__id").alias(id_col),
                      F.col("__vec").alias(vec_col), "bands")


def hyperplane_lsh_buckets(df: DataFrame, dim: int, n_bits: int = 16,
                           seed: int = 42, id_col: str = "vec_id",
                           vec_col: str = "embedding") -> DataFrame:
    """Single-table convenience form: one n_bits sign bucket per vector
    (narrow, no shuffle).  For all-pairs search prefer the banded
    ``lsh_near_dup_pairs`` — a single table trades recall against bucket
    size with no second knob."""
    sig = hyperplane_lsh_signatures(df, dim, n_bands=1,
                                    bits_per_band=n_bits, seed=seed,
                                    id_col=id_col, vec_col=vec_col)
    return sig.select(id_col, vec_col,
                      F.element_at("bands", 1).alias("bucket"))


def auto_bits_per_band(n_rows: int, target_bucket_rows: int = 64,
                       lo: int = 8, hi: int = 24) -> int:
    """Size the per-band bucket space to the corpus: 2^bits ≈
    n / target_bucket_rows, clamped to [lo, hi].  Keeps expected bucket
    occupancy O(target) so the per-bucket self-join stays bounded as the
    corpus grows (a fixed 2⁸ space degrades O((n/256)²))."""
    if n_rows < 2:
        return lo
    bits = math.ceil(math.log2(max(n_rows / max(target_bucket_rows, 1), 2)))
    return max(lo, min(hi, bits))


def lsh_band_recall(threshold: float, n_bands: int,
                    bits_per_band: int) -> float:
    """P(a pair at exactly ``threshold`` cosine collides in ≥ 1 band)
    under sign-hyperplane LSH.

    A random hyperplane splits a vector pair with probability θ/π
    (θ = arccos(sim)), so a single sign bit agrees with
    p = 1 − θ/π; a whole band of b independent bits agrees with p^b;
    and 1 − (1 − p^b)^L bands collide — the standard banded S-curve.
    Pairs *above* the threshold collide with higher probability, so
    this is a recall LOWER bound for the output contract
    (``sim ≥ threshold``).  Exact/positively-scaled duplicates have
    identical sign patterns and always collide (recall 1 regardless)."""
    p = 1.0 - math.acos(min(1.0, max(-1.0, threshold))) / math.pi
    return 1.0 - (1.0 - p ** bits_per_band) ** n_bands


def auto_lsh_config(n_rows: int, threshold: float,
                    target_recall: float = 0.9,
                    target_bucket_rows: int = 64,
                    lo: int = 8, hi: int = 24) -> tuple[int, int]:
    """(n_bands, bits_per_band) sized TOGETHER: bucket space grows with
    the corpus (occupancy stays O(target_bucket_rows)), and the band
    count grows with the bucket space so recall at the threshold holds
    ≥ ``target_recall`` — wider bands alone silently lose genuinely
    near (non-identical) pairs as the corpus grows, the classic
    banded-MinHash sizing mistake.

    Cost scales linearly with n_bands (one extra signature column and
    one extra band join per band), so holding recall while the bucket
    space grows is a measured trade, not a free lunch."""
    bits = auto_bits_per_band(n_rows, target_bucket_rows, lo, hi)
    p = 1.0 - math.acos(min(1.0, max(-1.0, threshold))) / math.pi
    miss = 1.0 - p ** bits
    if miss <= 0.0:
        return 1, bits
    if miss >= 1.0:
        raise ValueError(
            f"auto_lsh_config: threshold={threshold} gives zero per-band "
            f"collision probability at bits_per_band={bits}; lower the "
            "bucket-space hi bound or the threshold.")
    n_bands = max(1, math.ceil(math.log(1.0 - target_recall)
                               / math.log(miss)))
    return n_bands, bits


def lsh_near_dup_pairs(df: DataFrame, dim: int, threshold: float = 0.95,
                       n_bands: int | None = None,
                       bits_per_band: int | None = None,
                       seed: int = 42, id_col: str = "vec_id",
                       vec_col: str = "embedding",
                       max_bucket: int | None = None,
                       target_recall: float = 0.9) -> DataFrame:
    """Banded-LSH near-duplicate search: (id_a, id_b, sim ≥ threshold).

    Shape (the MinHash-band pattern of operators.dedup, §"beyond the
    reference"):

    1. signatures — ONE GEMM pass gives every vector ``n_bands`` packed
       sign-bucket keys (localCheckpointed: feeds the band join and both
       sides of the verify join without recomputing).
    2. candidates — posexplode the band keys and equi-join on
       ``(band, bucket)``: pairs collide iff they share a whole band.
       With ``bits_per_band=None`` the bucket space is sized to the
       corpus (one cheap count) so expected occupancy stays O(1) and the
       per-bucket fanout never goes quadratic — the fix for the
       fixed-2⁸-bucket blowup.
    3. verify — exact float64 cosine on the candidates via the pairwise
       GEMM kernel (one einsum per Arrow batch, no interpreted per-pair
       lambdas), then the threshold filter.

    Positively-scaled duplicates (identical sign patterns) collide in
    every band, so recall on exact/scaled dups is 1 by construction.
    Genuinely near (non-identical) pairs at the threshold collide with
    ``lsh_band_recall(threshold, n_bands, bits_per_band)`` — and that
    probability FALLS as bits_per_band grows, so corpus-driven bucket
    sizing must not widen bands alone.  The DEFAULT ``n_bands=None``
    sizes both knobs together (``auto_lsh_config``) to hold recall ≥
    ``target_recall`` at the threshold — the estimate-vs-target check
    is the default path, so the silent-under-recall trap (fixed bands
    at a low threshold; VERDICT r10 #2) cannot fire out of the box.
    An explicit ``n_bands`` whose estimated recall lands below
    ``target_recall`` warns with the estimate and the config that
    would fix it.

    ``bits_per_band=None`` sizing keeps *random* bucket occupancy O(1),
    but true duplicate clusters share whole signatures and pile into one
    bucket at any band width — ``max_bucket`` bounds that quadratic
    fanout with star pairs per hot bucket (the shared skew-hardened band
    join, operators.dedup.band_self_join_pairs); ``None`` keeps exact
    all-pairs candidate semantics (the oracle configuration).
    """
    import warnings

    from .dedup import band_self_join_pairs

    if n_bands is None:
        n_bands, auto_bits = auto_lsh_config(
            df.count(), threshold, target_recall)
        if bits_per_band is None:
            bits_per_band = auto_bits
    elif bits_per_band is None:
        bits_per_band = auto_bits_per_band(df.count())
        est = lsh_band_recall(threshold, n_bands, bits_per_band)
        if est < target_recall:
            warnings.warn(
                f"lsh_near_dup_pairs: estimated recall at threshold="
                f"{threshold} is {est:.2f} with n_bands={n_bands}, "
                f"bits_per_band={bits_per_band} (corpus-sized) — below "
                f"target_recall={target_recall}. Pass n_bands=None to "
                "size both knobs together, or raise n_bands.",
                stacklevel=2)
    sigs = hyperplane_lsh_signatures(
        df, dim, n_bands, bits_per_band, seed, id_col, vec_col
    ).localCheckpoint(eager=True)

    banded = sigs.select(F.col(id_col).alias("id"),
                         F.posexplode("bands").alias("band", "bucket"))
    cands = band_self_join_pairs(banded, key_cols=("band", "bucket"),
                                 max_bucket=max_bucket)
    va = sigs.select(F.col(id_col).alias("id_a"),
                     F.col(vec_col).alias("va"))
    vb = sigs.select(F.col(id_col).alias("id_b"),
                     F.col(vec_col).alias("vb"))
    pairs = cands.join(va, "id_a").join(vb, "id_b")
    return (pairwise_cosine(pairs)
            .where(F.col("sim") >= threshold)
            .select("id_a", "id_b", "sim"))


def _centroids_df(spark, som):
    """Small (x·y, dim) codebook table for broadcast joins on cell id."""
    w = som._weights.reshape(-1, som._input_len).astype(np.float64)
    return spark.createDataFrame(
        [(int(c), w[c].tolist()) for c in range(w.shape[0])],
        "cluster_id int, __centroid array<double>")


def build_som_ivf_index(som, corpus: DataFrame, path: str,
                        id_col: str = "vec_id",
                        vec_col: str = "embedding",
                        mode: str = "overwrite",
                        quantize: bool | str = False) -> None:
    """Materialize the IVF index: the corpus scored once and written
    partitioned by ``cluster_id``.

    The scoring pass is paid at BUILD time; every subsequent query
    prunes to its probed cells at PLAN time (directory-level partition
    pruning — with nprobe = p of x·y cells, only p/(x·y) of the index
    bytes are even opened).  This is the ANN shape that amortizes at
    100 TB: one narrow write, then reads that scale with nprobe, not
    corpus size.

    ``mode="append"`` ingests a NEW vector batch into an existing
    index without rebuilding: the batch is scored against the same
    codebook and its files land in the matching ``cluster_id=``
    partitions (keep ``quantize`` consistent across batches — the
    reader takes the schema from the files).  The codebook itself is
    frozen; re-train + rebuild when drift degrades cell balance.

    ``quantize=True`` / ``"int8"`` stores the vectors int8-quantized
    (``scale`` + ``qvec tinyint`` instead of the float array — the
    FAISS-SQ8 trade): ~4× smaller index files, so probed-cell reads
    move 4× fewer bytes; query-side dequantization is a codegen'd
    ``transform`` in the scan projection.  Candidate similarities then
    carry the reconstruction error (≤ scale/2 per component — sub-1 %
    for unit-scale data), so ranks can differ near ties; leave False
    when the index must reproduce exact full-probe top-k.

    ``quantize="residual"`` quantizes the RESIDUAL x − centroid(cell)
    instead of x (the IVF-PQ/IVFADC idea with the codebook as the
    coarse quantizer): residual dynamic range shrinks with cluster
    tightness, so the same int8 budget buys a proportionally smaller
    reconstruction error — same 4× storage, strictly better recall
    whenever cells are tighter than the global spread.  The centroid
    attach is one broadcast join against the (x·y)-row codebook on
    both build and read; reconstruction stays codegen'd array math.
    """
    from ..sources.writers import write_partitioned

    if quantize not in (False, True, "int8", "residual"):
        raise ValueError(f"quantize must be False, True/'int8', or "
                         f"'residual', got {quantize!r}")
    scored = som.transform(corpus, ("cluster_id",), features_col=vec_col) \
        .select(id_col, vec_col, "cluster_id")
    if quantize == "residual":
        from .embeddings import quantize_int8

        cent = _centroids_df(corpus.sparkSession, som)
        res = (scored.join(F.broadcast(cent), "cluster_id")
               .withColumn("__res", F.zip_with(
                   F.col(vec_col), F.col("__centroid"),
                   lambda a, b: a.cast("double") - b)))
        scored = (quantize_int8(res, vec_col="__res", out_col="rqvec")
                  .select(id_col, "scale", "rqvec", "cluster_id"))
    elif quantize:
        from .embeddings import quantize_int8

        scored = quantize_int8(scored, vec_col=vec_col) \
            .select(id_col, "scale", "qvec", "cluster_id")
    write_partitioned(scored, path, "cluster_id", mode=mode)


def som_ivf_topk_from_index(spark, path: str, som,
                            queries_np: np.ndarray, query_ids,
                            k: int = 5, nprobe: int = 4,
                            id_col: str = "vec_id",
                            vec_col: str = "embedding") -> DataFrame:
    """ANN top-k against a ``build_som_ivf_index`` table.

    The probed-cell filter is applied to the partitioned scan BEFORE
    the probe join, so it becomes a plan-time ``PartitionFilters``
    entry — unprobed cells' directories are never opened.  Candidate
    scoring is the same broadcast equi-join + GEMM as ``som_ivf_topk``.
    An int8-quantized index (``build_som_ivf_index(quantize=True)``) is
    detected from its schema and dequantized in the scan projection.
    """
    idx = spark.read.parquet(path)
    if "rqvec" in idx.columns and vec_col not in idx.columns:
        # residual-quantized index: x̂ = centroid(cell) + q·scale — the
        # centroid attach is a broadcast join against the tiny codebook
        from .embeddings import dequantize_int8

        idx = (dequantize_int8(idx, qvec_col="rqvec", out_col="__res")
               .join(F.broadcast(_centroids_df(spark, som)), "cluster_id")
               .withColumn(vec_col, F.zip_with(
                   F.col("__res"), F.col("__centroid"),
                   lambda r, c: r + c))
               .drop("rqvec", "scale", "__res", "__centroid"))
    elif "qvec" in idx.columns and vec_col not in idx.columns:
        from .embeddings import dequantize_int8

        idx = (dequantize_int8(idx, out_col=vec_col)
               .drop("qvec", "scale"))
    w_flat = som._weights.reshape(-1, som._input_len)
    from ..functions.distances import euclidean

    Q = np.asarray(queries_np, dtype=np.float64)
    dist = euclidean(Q, w_flat)
    probes = np.argsort(dist, axis=1)[:, :nprobe]
    probed_cells = sorted({int(c) for row in probes for c in row})
    pruned = idx.where(F.col("cluster_id").isin(probed_cells))
    return _ivf_candidates_topk(pruned, probes, Q, query_ids, k,
                                id_col, vec_col)


def som_ivf_topk_from_index_df(spark, path: str, som,
                               queries: DataFrame, k: int = 5,
                               nprobe: int = 4,
                               id_col: str = "vec_id",
                               vec_col: str = "embedding",
                               chunk_queries: int =
                               COSINE_TOPK_MAX_QUERIES) -> DataFrame:
    """ANN against a persisted IVF index with a **DataFrame** query
    side — the path for query sets too large to hand over as one
    driver ndarray.

    The query table is split into exact ≤ ``chunk_queries`` hash chunks
    (the ``cosine_topk_many`` packing — per-bucket counts are the only
    driver traffic); each chunk collects ONE bounded (id, vec) slice,
    computes its probe cells against the tiny codebook on the driver,
    and runs the standard pruned-scan candidate plan — the partitioned
    index still prunes to the chunk's probed cells at plan time, so
    index bytes read scale with nprobe per chunk, never corpus size.
    Peak driver memory is one chunk's query matrix; chunks run
    sequentially and union lazily.

    Same output contract as ``som_ivf_topk``:
    (query_id, rank, neighbor_id, sim).
    """
    slimq = queries.select(id_col, vec_col)
    filters = _exact_hash_chunk_filters(slimq, id_col, chunk_queries,
                                        "som_ivf_topk_from_index_df")
    out = None
    for flt in ([None] if filters is None else filters):
        qpdf = (slimq if flt is None else slimq.where(flt)).toPandas()
        if not len(qpdf):
            continue
        Q = np.stack([np.asarray(v, np.float64) for v in qpdf[vec_col]])
        part = som_ivf_topk_from_index(
            spark, path, som, Q, qpdf[id_col].tolist(), k=k,
            nprobe=nprobe, id_col=id_col, vec_col=vec_col)
        out = part if out is None else out.unionByName(part)
    if out is None:
        return spark.createDataFrame(
            [], "query_id bigint, rank int, neighbor_id bigint, sim double")
    return out


def som_ivf_topk(som, corpus: DataFrame, queries_np: np.ndarray,
                 query_ids, k: int = 5, nprobe: int = 4,
                 id_col: str = "vec_id",
                 vec_col: str = "embedding") -> DataFrame:
    """IVF ANN with the trained SOM as coarse quantizer.

    Physical plan, built for the 1000-executor case:

    * corpus rows get their BMU ``cluster_id`` in one narrow Arrow pass
      (no shuffle; cache the scored corpus across query batches);
    * the query→probe-cell assignment is computed on the driver against
      the tiny codebook, **exploded to (query_id, cluster_id) rows**, and
      broadcast — the join is then an equi-join ``cell == cluster_id``
      that Spark plans as a BroadcastHashJoin.  (An ``array_contains``
      predicate instead degenerates to a BroadcastNestedLoopJoin that
      tests every corpus row against every query.)
    * candidate cosines are one float64 GEMM per Arrow batch against the
      broadcast query matrix — not a per-candidate interpreted lambda.

    Each corpus row has exactly one cluster_id and probe cells per query
    are distinct, so a (query, neighbor) candidate appears at most once —
    no dedup stage needed.  With ``nprobe = x·y`` every cell is probed
    and the output equals the exact brute-force top-k (the
    oracle-checkable full-probe configuration).

    Returns (query_id, rank, neighbor_id, sim).
    """
    from ..functions.distances import euclidean

    bucketed = som.transform(corpus, ("cluster_id",), features_col=vec_col)
    w_flat = som._weights.reshape(-1, som._input_len)
    Q = np.asarray(queries_np, dtype=np.float64)
    dist = euclidean(Q, w_flat)
    probes = np.argsort(dist, axis=1)[:, :nprobe]
    return _ivf_candidates_topk(bucketed, probes, Q, query_ids, k,
                                id_col, vec_col)


def som_ivf_topk_sweep(som, corpus: DataFrame, queries_np: np.ndarray,
                       query_ids, k: int = 5,
                       nprobes: tuple = (1, 4, 16),
                       id_col: str = "vec_id",
                       vec_col: str = "embedding") -> DataFrame:
    """Multi-``nprobe`` IVF sweep sharing ONE candidate pass: the
    recall-curve audit (:func:`som_ivf_topk` once per leg) recomputes
    the probe join + candidate GEMM per leg, but every leg's candidate
    set is a PREFIX of the max-nprobe leg's (the probe list is one
    argsort of the same query-to-codebook distances), so the sweep
    computes candidates once at ``max(nprobes)`` with the probe rank
    attached, persists the ≤ n_q·corpus-candidate sim relation, and
    derives each leg as ``probe_rank < p`` + the exact top-k window
    (VERDICT r8 #8).  Per-leg output is bit-identical to
    :func:`som_ivf_topk` at that nprobe.

    Returns (nprobe, query_id, rank, neighbor_id, sim); the persisted
    intermediate is unpersisted before returning (each leg has been
    materialized into the union by then — lazily, the union itself
    re-reads the cache while it lives, so the legs are collected
    eagerly here; the sweep is an audit op over a bounded query set).
    """
    import pandas as pd

    from ..functions.distances import euclidean
    from ..plans.exchange import ship_package

    spark = corpus.sparkSession
    ship_package(spark)
    if not nprobes:
        raise ValueError("nprobes must be non-empty")
    bucketed = som.transform(corpus, ("cluster_id",),
                             features_col=vec_col)
    w_flat = som._weights.reshape(-1, som._input_len)
    Q = np.asarray(queries_np, dtype=np.float64)
    dist = euclidean(Q, w_flat)
    pmax = int(max(nprobes))
    probes = np.argsort(dist, axis=1)[:, :pmax]

    qids = np.asarray([int(q) for q in query_ids], dtype=np.int64)
    qn = np.linalg.norm(Q, axis=1)
    order = np.argsort(qids)
    bc = spark.sparkContext.broadcast(
        (qids[order], Q[order], qn[order]))
    probe_rows = [(int(qid), int(c), r)
                  for qid, cells in zip(qids, probes)
                  for r, c in enumerate(cells)]
    q = spark.createDataFrame(
        probe_rows, "query_id bigint, cluster_id bigint, probe_rank int")
    joined = bucketed.join(F.broadcast(q), "cluster_id").select(
        "query_id", "probe_rank", F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).alias("vec"))

    def fn(batches):
        qids_, Q_, qn_ = bc.value
        for b in batches:
            if not len(b):
                continue
            C = np.stack([np.asarray(v, np.float64) for v in b["vec"]])
            cn = np.linalg.norm(C, axis=1)
            pos = np.searchsorted(qids_,
                                  b["query_id"].to_numpy(np.int64))
            sims = (np.einsum("ij,ij->i", C, Q_[pos])
                    / (cn * qn_[pos]))
            yield pd.DataFrame({"query_id": b["query_id"],
                                "probe_rank": b["probe_rank"],
                                "neighbor_id": b["neighbor_id"],
                                "sim": sims})

    cand = (joined.mapInPandas(
        fn, "query_id bigint, probe_rank int, neighbor_id bigint, "
            "sim double")
        .where(F.col("query_id") != F.col("neighbor_id"))
        .persist())
    w = Window.partitionBy("query_id").orderBy(
        F.col("sim").desc(), F.col("neighbor_id"))
    out = None
    for p in sorted(set(int(p) for p in nprobes)):
        leg = (cand.where(F.col("probe_rank") < p)
               .withColumn("rank", F.row_number().over(w))
               .where(F.col("rank") <= k)
               .select(F.lit(p).cast("bigint").alias("nprobe"),
                       "query_id", "rank", "neighbor_id", "sim"))
        out = leg if out is None else out.unionByName(leg)
    # materialize while the cache lives, then release it
    out = out.localCheckpoint(eager=True)
    cand.unpersist()
    return out


def kmeans_ivf_topk(centroids: np.ndarray, corpus: DataFrame,
                    queries_np: np.ndarray, query_ids, k: int = 5,
                    nprobe: int = 4, id_col: str = "vec_id",
                    vec_col: str = "embedding") -> DataFrame:
    """IVF ANN with a KMeans codebook as coarse quantizer — the same
    candidate plan as :func:`som_ivf_topk` (bucket-by-nearest-centroid
    Arrow pass, exploded-probe broadcast equi-join, GEMM candidate
    cosine, exact top-k window) with the codebook supplied as a plain
    (n_cells, dim) matrix from :func:`~.clustering.kmeans_fit` instead
    of a trained SOM.  With ``nprobe = n_cells`` the output equals the
    exact brute-force top-k (the oracle-checkable full-probe
    configuration).  Returns (query_id, rank, neighbor_id, sim).
    """
    from ..functions.distances import euclidean
    from .clustering import kmeans_assign

    C = np.asarray(centroids, np.float64)
    bucketed = kmeans_assign(corpus, C, vec_col=vec_col, id_col=id_col,
                             keep=[vec_col]) \
        .withColumn("cluster_id", F.col("cluster_id").cast("bigint"))
    Q = np.asarray(queries_np, dtype=np.float64)
    dist = euclidean(Q, C)
    probes = np.argsort(dist, axis=1)[:, :nprobe]
    return _ivf_candidates_topk(bucketed, probes, Q, query_ids, k,
                                id_col, vec_col)


def build_kmeans_ivf_index(centroids: np.ndarray, corpus: DataFrame,
                           path: str, id_col: str = "vec_id",
                           vec_col: str = "embedding",
                           mode: str = "overwrite",
                           quantize: bool | str = False) -> None:
    """Materialize a KMeans-codebook IVF index: the corpus assigned
    once (broadcast-GEMM argmin, no shuffle) and written partitioned by
    ``cluster_id`` — :func:`build_som_ivf_index` with the codebook as a
    plain matrix.  Same storage modes: ``quantize=True``/``"int8"``
    stores int8 vectors (4× smaller probed reads), ``"residual"``
    quantizes x − centroid(cell) (IVF-PQ-style, tighter error for the
    same budget).  Reads prune to probed cells at PLAN time via the
    partition layout.
    """
    from ..sources.writers import write_partitioned
    from .clustering import kmeans_assign

    if quantize not in (False, True, "int8", "residual"):
        raise ValueError(f"quantize must be False, True/'int8', or "
                         f"'residual', got {quantize!r}")
    C = np.asarray(centroids, np.float64)
    scored = kmeans_assign(corpus, C, vec_col=vec_col, id_col=id_col,
                           keep=[vec_col]) \
        .select(id_col, vec_col, "cluster_id")
    if quantize == "residual":
        from .embeddings import quantize_int8

        cent = _kmeans_centroids_df(corpus.sparkSession, C)
        res = (scored.join(F.broadcast(cent), "cluster_id")
               .withColumn("__res", F.zip_with(
                   F.col(vec_col), F.col("__centroid"),
                   lambda a, b: a.cast("double") - b)))
        scored = (quantize_int8(res, vec_col="__res", out_col="rqvec")
                  .select(id_col, "scale", "rqvec", "cluster_id"))
    elif quantize:
        from .embeddings import quantize_int8

        scored = quantize_int8(scored, vec_col=vec_col) \
            .select(id_col, "scale", "qvec", "cluster_id")
    write_partitioned(scored, path, "cluster_id", mode=mode)


def _kmeans_centroids_df(spark, C: np.ndarray):
    return spark.createDataFrame(
        [(int(c), C[c].tolist()) for c in range(len(C))],
        "cluster_id int, __centroid array<double>")


def ivf_occupancy(spark, path: str) -> DataFrame:
    """Per-cell row counts of a persisted IVF index —
    ``(cluster_id, n)``.  The input to the index-maintenance decision:
    ``build_*_ivf_index`` freezes the codebook and ``mode="append"``
    ingests new batches without retraining, so SOMETHING must say when
    the frozen codebook has drifted off the data — this relation (and
    :func:`ivf_ingest_drift` on top of it) is that something.
    Metadata-cheap: ``cluster_id`` is the partition column (directory
    names) and the per-partition count is a parquet-footer aggregate —
    no vector payload is read."""
    idx = spark.read.parquet(path)
    return (idx.groupBy(F.col("cluster_id").cast("int")
                        .alias("cluster_id"))
            .agg(F.count(F.lit(1)).cast("bigint").alias("n")))


def ivf_ingest_drift(occupancy: DataFrame, batch_cells: DataFrame,
                     n_cells: int) -> DataFrame:
    """Append-or-retrain decision surface: smoothed PSI between the
    persisted index's cell-occupancy histogram and a NEW batch's
    assignments under the SAME frozen codebook — ``(bin, ca, cb, n_a,
    n_b, term_e6)``, one row per cell, ``Σ term_e6 / 1e6`` = the PSI.
    The standard thresholds apply (<0.1 stable → append; >0.25
    shifted → retrain + rebuild).

    ``occupancy``: :func:`ivf_occupancy` of the index.
    ``batch_cells``: any relation with a ``cluster_id`` column — the
    new batch scored by the index's own codebook (``som.transform`` or
    :func:`~.clustering.kmeans_assign`), codebook-agnostic by design.

    Cost is one count aggregate over the batch plus constant-time
    arithmetic on ≤ ``n_cells`` rows (the shared
    :func:`~.profile.psi_terms_from_cells` tail, engine-exact) — the
    audit is free next to the append itself, so run it ON EVERY
    ingest."""
    from .profile import psi_terms_from_cells

    if n_cells < 2:
        raise ValueError(f"n_cells must be >= 2, got {n_cells}")
    spark = occupancy.sparkSession
    spine = spark.range(n_cells).select(
        F.col("id").cast("int").alias("bin"))
    new_occ = (batch_cells.groupBy(F.col("cluster_id").cast("int")
                                   .alias("bin"))
               .agg(F.count(F.lit(1)).cast("bigint").alias("cb")))
    m = (spine
         .join(occupancy.select(F.col("cluster_id").alias("bin"),
                                F.col("n").alias("ca")), "bin", "left")
         .join(new_occ, "bin", "left")
         .select("bin", F.coalesce("ca", F.lit(0)).cast("bigint")
                 .alias("ca"),
                 F.coalesce("cb", F.lit(0)).cast("bigint").alias("cb")))
    return psi_terms_from_cells(m, n_cells)


def kmeans_ivf_topk_from_index(spark, path: str, centroids: np.ndarray,
                               queries_np: np.ndarray, query_ids,
                               k: int = 5, nprobe: int = 4,
                               id_col: str = "vec_id",
                               vec_col: str = "embedding") -> DataFrame:
    """ANN against a :func:`build_kmeans_ivf_index` table: probed-cell
    filter applied BEFORE the probe join (plan-time PartitionFilters —
    unprobed cells' directories never open), quantized schemas detected
    and dequantized in the scan projection; candidate plan shared with
    the SOM-IVF reader."""
    from ..functions.distances import euclidean

    C = np.asarray(centroids, np.float64)
    idx = spark.read.parquet(path)
    if "rqvec" in idx.columns and vec_col not in idx.columns:
        from .embeddings import dequantize_int8

        idx = (dequantize_int8(idx, qvec_col="rqvec", out_col="__res")
               .join(F.broadcast(_kmeans_centroids_df(spark, C)),
                     "cluster_id")
               .withColumn(vec_col, F.zip_with(
                   F.col("__res"), F.col("__centroid"),
                   lambda r, c: r + c))
               .drop("rqvec", "scale", "__res", "__centroid"))
    elif "qvec" in idx.columns and vec_col not in idx.columns:
        from .embeddings import dequantize_int8

        idx = (dequantize_int8(idx, out_col=vec_col)
               .drop("qvec", "scale"))
    Q = np.asarray(queries_np, dtype=np.float64)
    dist = euclidean(Q, C)
    probes = np.argsort(dist, axis=1)[:, :nprobe]
    probed_cells = sorted({int(c) for row in probes for c in row})
    pruned = idx.where(F.col("cluster_id").isin(probed_cells))
    return _ivf_candidates_topk(pruned, probes, Q, query_ids, k,
                                id_col, vec_col)


def _ivf_candidates_topk(bucketed: DataFrame, probes: np.ndarray,
                         Q: np.ndarray, query_ids, k: int,
                         id_col: str, vec_col: str) -> DataFrame:
    """Shared IVF candidate stage: exploded (query, probe-cell) rows
    broadcast-equi-joined on ``cluster_id``, per-batch GEMM cosine,
    exact top-k window.  ``bucketed`` must carry ``cluster_id``."""
    import pandas as pd

    from ..plans.exchange import ship_package

    spark = bucketed.sparkSession
    ship_package(spark)
    qids = np.asarray([int(q) for q in query_ids], dtype=np.int64)
    qn = np.linalg.norm(Q, axis=1)
    order = np.argsort(qids)
    qids_sorted, Q_sorted, qn_sorted = qids[order], Q[order], qn[order]
    bc = spark.sparkContext.broadcast((qids_sorted, Q_sorted, qn_sorted))

    probe_rows = [(int(qid), int(c))
                  for qid, cells in zip(qids, probes) for c in cells]
    q = spark.createDataFrame(probe_rows, "query_id bigint, cluster_id bigint")
    joined = bucketed.join(F.broadcast(q), "cluster_id").select(
        "query_id", F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).alias("vec"))

    def fn(batches):
        qids_, Q_, qn_ = bc.value
        for b in batches:
            if not len(b):
                continue
            C = np.stack([np.asarray(v, np.float64) for v in b["vec"]])
            cn = np.linalg.norm(C, axis=1)
            pos = np.searchsorted(qids_, b["query_id"].to_numpy(np.int64))
            sims = (np.einsum("ij,ij->i", C, Q_[pos])
                    / (cn * qn_[pos]))
            yield pd.DataFrame({"query_id": b["query_id"],
                                "neighbor_id": b["neighbor_id"],
                                "sim": sims})

    sims = joined.mapInPandas(
        fn, "query_id bigint, neighbor_id bigint, sim double")
    sims = sims.where(F.col("query_id") != F.col("neighbor_id"))
    w = Window.partitionBy("query_id").orderBy(F.col("sim").desc(),
                                               F.col("neighbor_id"))
    return (sims.withColumn("rank", F.row_number().over(w))
            .where(F.col("rank") <= k)
            .select("query_id", "rank", "neighbor_id", "sim"))


def semantic_dedup(som, df: DataFrame, id_col: str = "vec_id",
                   vec_col: str = "embedding",
                   threshold: float = 0.95,
                   max_cell: int | None = 8192,
                   block_rows: int = 1024) -> DataFrame:
    """SemDeDup-style semantic deduplication (Abbas et al. 2023):
    cluster the corpus with the SOM codebook, then WITHIN each cell
    drop every row that has an earlier-id cell-mate with cosine ≥
    ``threshold`` — the two-stage shape that makes embedding dedup
    tractable at corpus scale, because candidate pairs never cross
    cluster boundaries.  Returns the SURVIVORS: ``id_col,
    cluster_id``.

    Keep rule: row *r* is dropped iff ∃ r' in the same cell with
    id' < id and cos(r, r') ≥ threshold (greedy keep-first by id —
    deterministic, engine-portable, and expressible as one SQL
    NOT EXISTS for the oracle; note r' need not itself survive).

    Plan: one narrow Arrow scoring pass attaches the cell (the
    ``transform`` kernel), ONE shuffle on cluster_id, then a per-cell
    Arrow task: sort by id, L2-normalize once, and sweep the cosine
    matrix in ``block_rows`` row blocks against the id-prefix
    (peak memory block_rows × |cell| doubles, never |cell|²).  Cells
    above ``max_cell`` raise with guidance (one count aggregate
    verifies first — an extra narrow scan; ``max_cell=None`` skips it
    once codebook sizing is validated) — the quadratic is bounded per
    cell by construction, which is the entire point of clustering
    first; at 100 TB you size the codebook so cells stay ~10⁴.
    """
    from ..plans.exchange import ship_package

    ship_package(df.sparkSession)
    if not 0.0 < threshold <= 1.0:
        raise ValueError(f"threshold must be in (0, 1], got {threshold}")
    cells = som.transform(df, ("cluster_id",), keep=[id_col, vec_col],
                          features_col=vec_col)
    # the guard aggregate re-runs the narrow scoring pass (one extra
    # scan); at corpus scale recomputing a narrow stage is cheaper than
    # caching the scored corpus — callers who have already validated
    # their codebook sizing pass max_cell=None to skip the extra pass
    if max_cell is not None:
        max_cell = int(max_cell)
        hot = (cells.groupBy("cluster_id").count()
               .where(F.col("count") > max_cell).limit(5).collect())
        if hot:
            worst = ", ".join(f"cell {r[0]}: {r[1]} rows" for r in hot)
            raise ValueError(
                f"semantic_dedup: cell(s) exceed max_cell={max_cell} "
                f"({worst}); train a larger SOM codebook so cells "
                f"shrink, or raise max_cell if block-swept memory "
                f"(block_rows × cell × 8B) allows")

    blk = int(block_rows)

    def fn(key, pdf):
        import pandas as pd

        ids = pdf[id_col].to_numpy()
        order = np.argsort(ids)
        ids = ids[order]
        X = np.stack([np.asarray(v, np.float64)
                      for v in pdf[vec_col].to_numpy()])[order]
        n = len(ids)
        nrm = np.sqrt((X * X).sum(axis=1))
        nrm[nrm == 0.0] = 1.0
        Xn = X / nrm[:, None]
        dropped = np.zeros(n, dtype=bool)
        for lo in range(0, n, blk):
            hi = min(lo + blk, n)
            if lo == 0 and hi == 1:
                continue
            S = Xn[lo:hi] @ Xn[:hi].T
            for i in range(lo, hi):
                if i and (S[i - lo, :i] >= threshold).any():
                    dropped[i] = True
        out = pd.DataFrame({id_col: ids[~dropped]})
        out["cluster_id"] = key[0]
        return out

    return (cells.groupBy("cluster_id")
            .applyInPandas(fn, f"{id_col} bigint, cluster_id bigint")
            .select(id_col, "cluster_id"))


def hard_negatives(corpus: DataFrame, queries: DataFrame, k: int = 5,
                   id_col: str = "vec_id", vec_col: str = "embedding",
                   label_col: str = "label",
                   max_queries: int = COSINE_TOPK_MAX_QUERIES) -> DataFrame:
    """Hard-negative mining for contrastive training: per query, the
    exact top-k most-similar corpus vectors with a DIFFERENT label —
    ``(query_id, rank, neighbor_id, sim)``.

    Same physical plan as :func:`cosine_topk` (broadcast query matrix,
    one narrow Arrow pass, per-batch float64 GEMM, no corpus shuffle),
    but the same-label mask applies INSIDE the batch kernel before the
    per-batch top-k — filtering after a plain top-k would be wrong
    (a batch's k best could all share the query's label, silently
    dropping valid negatives that ranked k+1th).
    """
    import pandas as pd

    from ..plans.exchange import ship_package

    spark = corpus.sparkSession
    ship_package(spark)
    n_q = queries.count()
    if n_q > max_queries:
        raise ValueError(
            f"hard_negatives: {n_q} query rows > max_queries="
            f"{max_queries}; the query matrix is broadcast and each "
            "Arrow batch computes a (batch x |Q|) GEMM — chunk the "
            "query set or use the bucketed ANN paths for huge Q.")
    qpdf = queries.select(id_col, vec_col, label_col).toPandas()
    if not len(qpdf):
        return spark.createDataFrame(
            [], "query_id bigint, rank int, neighbor_id bigint, sim double")
    qids = qpdf[id_col].to_numpy(np.int64)
    qlab = qpdf[label_col].to_numpy(np.int64)
    Q = np.stack([np.asarray(v, np.float64) for v in qpdf[vec_col]])
    qn = np.linalg.norm(Q, axis=1)
    bc = spark.sparkContext.broadcast((qids, qlab, Q, qn))

    def fn(batches):
        qids_, qlab_, Q_, qn_ = bc.value
        nq = len(qids_)
        for pdf in batches:
            if not len(pdf):
                continue
            C = np.stack([np.asarray(v, np.float64) for v in pdf["vec"]])
            cn = np.linalg.norm(C, axis=1)
            sims = (C @ Q_.T) / (cn[:, None] * qn_[None, :])
            # the mask IS the operator: same-label pairs can never
            # enter any batch's candidate set
            lab = pdf["lab"].to_numpy(np.int64)
            sims = np.where(lab[:, None] == qlab_[None, :],
                            -np.inf, sims)
            nb = pdf["neighbor_id"].to_numpy(np.int64)
            kk = min(k, len(C))
            # per-batch prune must use the SAME (sim DESC, neighbor_id
            # ASC) ordering as the final window: a plain argpartition
            # on sim keeps/drops equal-sim candidates at the batch
            # k-boundary by partition layout (duplicate vectors are
            # common), making the output partitioning-dependent — the
            # hamming_topk lexsort rule
            top = np.empty((kk, nq), dtype=np.int64)
            for qi in range(nq):
                top[:, qi] = np.lexsort((nb, -sims[:, qi]))[:kk]
            rows = top.T.ravel()
            cols = np.repeat(np.arange(nq), kk)
            keep = np.isfinite(sims[rows, cols])
            yield pd.DataFrame({
                "query_id": np.repeat(qids_, kk)[keep],
                "neighbor_id": nb[rows][keep],
                "sim": sims[rows, cols][keep],
            })

    slim = corpus.select(F.col(id_col).alias("neighbor_id"),
                         F.col(vec_col).alias("vec"),
                         F.col(label_col).alias("lab"))
    cand = slim.mapInPandas(
        fn, "query_id bigint, neighbor_id bigint, sim double")
    w = Window.partitionBy("query_id").orderBy(F.col("sim").desc(),
                                               F.col("neighbor_id"))
    return (cand.withColumn("rank", F.row_number().over(w))
            .where(F.col("rank") <= k)
            .select("query_id", "rank", "neighbor_id", "sim"))


def label_purity(knn_edges: DataFrame, labels: DataFrame,
                 id_col: str = "vec_id",
                 label_col: str = "label") -> DataFrame:
    """Embedding-quality audit from a kNN graph: per vector, how many
    of its k neighbors share its label — ``(vec_id, label, n_neighbors,
    n_same, purity_e6)`` with ``purity_e6 = (1e6·n_same) div
    n_neighbors`` (integer division, engine-exact).

    High mean purity = the embedding separates the label structure
    (the k-NN-classifier consistency estimate); per-LABEL purity
    breakdowns localize which classes blur.  This is the standard
    cheap embedding-benchmark next to recall@k: recall audits the ANN
    index against brute force, purity audits the EMBEDDING against
    the labels.

    Plan: two hash joins of the (bounded, k·V-row) edge relation onto
    the label relation — keyed on vertex id, broadcast only if the
    label side is a dimension.  One combinable groupBy.
    """
    lab = labels.select(F.col(id_col).alias("__v"),
                        F.col(label_col).alias("__lab"))
    e = (knn_edges
         .join(lab.withColumnRenamed("__v", id_col), id_col)
         .withColumnRenamed("__lab", "__lab_self")
         .join(lab.withColumnRenamed("__v", "neighbor_id"),
               "neighbor_id")
         .withColumnRenamed("__lab", "__lab_nbr"))
    return (e.groupBy(id_col, "__lab_self")
            .agg(F.count(F.lit(1)).cast("int").alias("n_neighbors"),
                 F.sum((F.col("__lab_self") == F.col("__lab_nbr"))
                       .cast("int")).cast("int").alias("n_same"))
            .select(F.col(id_col),
                    F.col("__lab_self").alias(label_col),
                    "n_neighbors", "n_same",
                    F.expr("(1000000 * n_same) div n_neighbors")
                    .cast("bigint").alias("purity_e6")))
