"""Similarity search over embedding columns (array<float>).

Two paths:

* ``cosine_topk`` — brute-force exact top-k: the (small, capped) query
  set is materialized once and shipped in the task closure, the corpus
  is scored partition-locally by a vectorized numpy batch kernel whose
  accumulation is dimension-sequential — the same rounded IEEE ops in
  the same order as a ``zip_with``+``aggregate`` fold, so a DuckDB
  list-fold oracle reproduces the doubles bit-for-bit (point-wise
  ``dot_expr``/``cosine_sim_expr`` remain for single-pair columns).
  One corpus scan, no corpus shuffle — at 100 TB this is the right
  exact baseline (queries are broadcast; the big side never moves).
* ``hyperplane_buckets`` / ``ann_topk`` — LSH-bucketed approximate path:
  sign-of-projection onto deterministic pseudo-random hyperplanes built
  from xxhash64 (no RNG state, reproducible across runs/executors), then
  top-k within matching buckets only. Recall is tunable via n_planes /
  multi-probe; the candidate join is an equi-join on bucket id, so shuffle
  volume is O(n), not O(n·q).
"""

from __future__ import annotations

import pandas as pd  # module-scope: pandas_udf type hints resolve against
# module globals under postponed annotations

from pyspark.sql import Column, DataFrame, Window, functions as F


def _as_double(col: str) -> str:
    return f"transform({col}, x -> cast(x as double))"


def _dot_sql(a: str, b: str) -> str:
    return (
        f"aggregate(zip_with({_as_double(a)}, {_as_double(b)}, (x, y) -> x * y), "
        f"cast(0.0 as double), (acc, v) -> acc + v)"
    )


def _norm_sql(a: str) -> str:
    return (
        f"sqrt(aggregate(transform({_as_double(a)}, x -> x * x), "
        f"cast(0.0 as double), (acc, v) -> acc + v))"
    )


def _cosine_sql(a: str, b: str) -> str:
    """Sequential-fold cosine as a raw SQL fragment — usable inside
    higher-order-function lambdas where a Column can't reach."""
    return f"({_dot_sql(a, b)} / ({_norm_sql(a)} * {_norm_sql(b)}))"


def dot_expr(a: str, b: str) -> Column:
    """Sequential-fold dot product: sum_i a[i]*b[i] in list order, double
    accumulation from 0.0 — byte-identical to DuckDB list_reduce oracle."""
    return F.expr(_dot_sql(a, b))


def norm_expr(a: str) -> Column:
    return F.expr(_norm_sql(a))


def cosine_sim_expr(a: str, b: str) -> Column:
    return dot_expr(a, b) / (norm_expr(a) * norm_expr(b))


def cosine_sim_pandas(a: str, b: str) -> Column:
    """Vectorized cosine for the approximate paths (ann/ivf): one numpy
    batch op instead of an interpreted fold per row (~50x). NOT used where
    a DuckDB oracle must reproduce the doubles — numpy's pairwise summation
    order differs from the sequential fold.

    PROJECTION-ONLY: the returned Column is ``asNondeterministic()`` (a
    pure function — the flag only stops the optimizer's §4.4 double
    evaluation under threshold filters). Spark rejects non-deterministic
    expressions in join conditions and sort orders; bind with
    ``withColumn`` and filter/order on the materialized attribute. Same
    constraint for :func:`cosine_sim_seq_pandas` and
    :func:`int_cosine_pairs_pandas`."""
    import numpy as np
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("double")
    def cos(va: pd.Series, vb: pd.Series) -> pd.Series:
        A = np.asarray([np.asarray(x, dtype=np.float64) for x in va])
        B = np.asarray([np.asarray(x, dtype=np.float64) for x in vb])
        if A.ndim != 2 or not len(A):
            return pd.Series([0.0] * len(va))
        num = (A * B).sum(axis=1)
        den = np.linalg.norm(A, axis=1) * np.linalg.norm(B, axis=1)
        return pd.Series(num / np.maximum(den, 1e-300))

    # non-deterministic: stops the optimizer cloning the kernel below a
    # threshold filter on the cosine column (guide-class duplicated
    # BatchEvalPython/ArrowEvalPython — each pair would pay twice)
    cos_nd = cos.asNondeterministic()
    return cos_nd(F.col(a) if "." not in a else F.expr(a), F.col(b) if "." not in b else F.expr(b))


def _pair_groups(va: "pd.Series", vb: "pd.Series"):
    """Row indices of a pair batch bucketed by common vector dimension.
    Rows where either side is NULL or the two lengths differ are left
    out (they score NULL, the semantics of the ``zip_with`` fold all
    pairwise kernels replace)."""
    groups: dict = {}
    for i in range(len(va)):
        x, y = va.iat[i], vb.iat[i]
        if x is None or y is None:
            continue
        d = len(x)
        if d != len(y):
            continue
        groups.setdefault(d, []).append(i)
    return groups


def _stack_pairs(va, vb, idx, d, dtype):
    import numpy as np

    A = np.empty((len(idx), d), dtype=dtype)
    B = np.empty((len(idx), d), dtype=dtype)
    for r, i in enumerate(idx):
        A[r] = va.iat[i]
        B[r] = vb.iat[i]
    return A, B


def cosine_sim_seq_pandas(a: str, b: str) -> Column:
    """Pairwise sequential-fold cosine as an Arrow batch kernel — the
    drop-in replacement for :func:`cosine_sim_expr` on CANDIDATE-PAIR
    hot paths (semantic_dedup's intra-cluster join, quantized_topk's
    rerank): per element the multiply-then-add sequence is the same
    rounded IEEE ops in the same ascending-dimension order as the
    ``aggregate(zip_with(...))`` fold and the DuckDB list-fold oracles,
    so the doubles are bit-identical — but evaluated by numpy over a
    whole Arrow batch instead of an interpreted HigherOrderFunction per
    row (the expression class measured degrading ~40% under JIT profile
    pollution in long sessions; see ``cosine_topk``'s docstring).

    Edge semantics: NULL vector or mismatched dimensions → NULL (the
    fold's NULL-padding outcome); zero-norm pairs → NULL (the SQL form
    raises DIVIDE_BY_ZERO under ANSI — the kernel's 0/0 NaN crosses
    Arrow as NULL, which downstream ``>= tau`` filters drop; strictly
    more robust, never looser)."""
    import numpy as np
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("double")
    def cos(va: pd.Series, vb: pd.Series) -> pd.Series:
        out = np.full(len(va), np.nan)
        for d, idx in _pair_groups(va, vb).items():
            A, B = _stack_pairs(va, vb, idx, d, np.float64)
            acc = np.zeros(len(idx), dtype=np.float64)
            for i in range(d):
                acc += A[:, i] * B[:, i]
            with np.errstate(divide="ignore", invalid="ignore"):
                out[idx] = acc / (
                    _sequential_sq_norm(A) * _sequential_sq_norm(B)
                )
        return pd.Series(out)

    # single evaluation under threshold filters (see cosine_sim_pandas)
    return cos.asNondeterministic()(F.col(a), F.col(b))


def int_cosine_pairs_pandas(a: str, b: str) -> Column:
    """Pairwise int-code cosine as an Arrow batch kernel — the batch
    replacement for ``_int_cosine_sql`` in quantized_topk's stage-1
    scan. Dot and squared norms are EXACT int64 sums (associativity-
    free, so no fold order to preserve); only the final sqrt/multiply/
    divide are IEEE doubles, identical in numpy and the JVM/DuckDB.
    Zero-norm codes score 0.0 (the SQL CASE); NULL or mismatched-
    dimension pairs score NULL."""
    import numpy as np
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("double")
    def icos(va: pd.Series, vb: pd.Series) -> pd.Series:
        out = np.full(len(va), np.nan)
        for d, idx in _pair_groups(va, vb).items():
            A, B = _stack_pairs(va, vb, idx, d, np.int64)
            dot = (A * B).sum(axis=1)
            na = (A * A).sum(axis=1)
            nb = (B * B).sum(axis=1)
            res = np.zeros(len(idx), dtype=np.float64)
            nz = (na != 0) & (nb != 0)
            res[nz] = dot[nz].astype(np.float64) / (
                np.sqrt(na[nz].astype(np.float64))
                * np.sqrt(nb[nz].astype(np.float64))
            )
            out[idx] = res
        return pd.Series(out)

    # single evaluation under threshold filters (see cosine_sim_pandas)
    return icos.asNondeterministic()(F.col(a), F.col(b))


def _sequential_dot(C: "object", Q: "object") -> "object":
    """``acc += C[:, d] * Q[:, d]`` in ascending-dimension order — each
    element's multiply-then-add sequence is the SAME rounded IEEE ops,
    in the SAME order, as the ``aggregate(zip_with(...), 0.0, acc + v)``
    fold (and DuckDB's list_reduce oracle): numpy ufuncs round the
    product and the sum separately (no FMA), so the doubles come out
    bit-identical. Returns the (n_corpus, n_queries) dot matrix."""
    import numpy as np

    n, d = C.shape
    acc = np.zeros((n, Q.shape[0]), dtype=np.float64)
    for i in range(d):
        acc += C[:, i : i + 1] * Q[:, i][None, :]
    return acc


def _sequential_sq_norm(M: "object") -> "object":
    """Row-wise ``sqrt(sum x*x)`` with the fold's ascending-dimension
    accumulation order (IEEE sqrt is correctly rounded everywhere, so
    only the sum order matters)."""
    import numpy as np

    acc = np.zeros(M.shape[0], dtype=np.float64)
    for i in range(M.shape[1]):
        acc += M[:, i] * M[:, i]
    return np.sqrt(acc)


def _topk_select(col: "object", ids: "object", vidx: "object", k: int):
    """Batch-local exact top-k with Spark's (value DESC, id ASC) window
    order: indices into the batch of the k best rows among ``vidx`` —
    strictly greater values first, the boundary-tied group filled in
    (+0.0 before -0.0, then smallest id) order. A plain argpartition
    would pick an arbitrary tied subset; the signed-zero step matters
    because the final Window ranks with java.lang.Double.compare, where
    0.0 > -0.0, while numpy's ``==`` conflates them.

    NaN values (zero-norm vectors: 0/0 cosine) are dropped from the
    candidates — the behavior the old pandas prune effectively had
    (pandas sorts NaN last, so NaN rows never survived head(k)); left
    in, a NaN kth boundary silently empties the selection."""
    import numpy as np

    vidx = vidx[~np.isnan(col[vidx])]
    vcol = col[vidx]
    if len(vidx) > k:
        kth = np.partition(vcol, len(vcol) - k)[len(vcol) - k]
        top = vidx[vcol > kth]
        tied = vidx[vcol == kth]
        need = k - len(top)
        if need > 0:
            tcol = col[tied]
            tied = tied[np.lexsort((ids[tied], np.signbit(tcol)))][:need]
            sel = np.concatenate([top, tied])
        else:  # unreachable with finite vcol (#(>kth) <= k-1); defensive
            sel = top[:k]
    else:
        sel = vidx
    order = np.lexsort((ids[sel], -col[sel]))
    return sel[order]


def cosine_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str | None = None,
    max_queries: int = 100_000,
) -> DataFrame:
    """Exact top-k neighbors for each query vector.

    AUDIT TIER — O(N·Q) brute force: every query scores every corpus
    vector. Right for correctness audits, recall measurement, and small
    query sets; for serving or corpus-scale query sets use the bounded-
    candidate paths — :func:`ann_topk` (LSH multi-probe),
    :func:`ivf_topk`, :func:`pq_topk`, or :func:`ivfpq_topk` — and rerank
    their shortlists (:func:`quantized_rerank`).

    Scale shape: the query set is materialized once on the driver
    (``max_queries``-capped — the same "small side" bound the previous
    broadcast-hash form imposed, now explicit) and shipped to executors
    in the task closure as one numpy matrix; the corpus is scored
    partition-locally with a vectorized batch kernel and NEVER shuffled
    — each batch emits at most queries×k candidate rows, and the global
    rank sees nparts×k rows per query instead of the corpus.

    The kernel replaces the earlier interpreted ``zip_with``/
    ``aggregate`` fold (same doubles, bit-for-bit: the accumulation is
    dimension-sequential — see :func:`_sequential_dot` — so the DuckDB
    list-fold oracles keep hash-matching) because interpreted
    higher-order-function eval degrades ~40% as a long-lived session
    accumulates expression diversity (megamorphic eval() call sites
    defeat JIT inlining — measured: 11.7s isolated vs 16-19s late in a
    303-query bench suite, unrecoverable by GC), while the numpy batch
    kernel is both ~10x cheaper and immune to JVM profile pollution.

    Output: (query_id, neighbor_id, cosine, rank), ties broken by
    neighbor_id so results are total-ordered and oracle-comparable.

    Semantics notes (all matching the SQL the kernel replaced): the
    query side is evaluated EAGERLY at call time (the collect — later
    mutations of the queries table don't flow into the result);
    NULL-vector / NULL-id rows are dropped on both sides (a NULL vector
    folded to a NULL cosine that never ranked; a NULL id never passed
    the ``!=`` self-filter); zero-norm vectors (0/0 = NaN cosine) never
    rank; corpus vectors whose dimension differs from the query
    dimension are dropped (``zip_with`` padded with NULL → NULL cosine),
    while a mixed-dimension QUERY set raises ``ValueError``.
    """
    return _exact_cosine_topk(
        corpus, queries, k, id_col, vec_col, query_id_col, max_queries,
        op_name="cosine_topk",
    )


def _exact_cosine_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int,
    id_col: str,
    vec_col: str,
    query_id_col: "str | None",
    max_queries: int,
    op_name: str,
    label_col: "str | None" = None,
    query_label_col: "str | None" = None,
) -> DataFrame:
    """Shared engine of :func:`cosine_topk` and :func:`hard_negatives`
    (one copy of the collect/cap, NULL filtering, batch kernel, and
    rank tail — the only behavioral delta is the optional label-
    mismatch mask)."""
    import numpy as np

    query_id_col = query_id_col or id_col
    q_cols = [
        F.col(query_id_col).alias("query_id"),
        F.col(vec_col).alias("__qv"),
    ]
    if label_col is not None:
        q_cols.append(F.col(query_label_col).alias("__ql"))
    q_rows = queries.select(*q_cols).collect()
    if len(q_rows) > max_queries:
        raise ValueError(
            f"{op_name}: {len(q_rows)} query vectors exceed "
            f"max_queries={max_queries} — the exact brute-force path "
            "ships the whole query set to every task; use the ANN "
            "paths (ann_topk/ivf_topk/ivfpq_topk) for corpus-scale query "
            "sets, or raise max_queries explicitly"
        )
    # NULL handling mirrors the SQL this kernel replaced: a NULL vector
    # folded to a NULL cosine (never ranked), a NULL id never passed the
    # `!=` self-filter, a NULL label never passed `__cl != __ql`
    q_rows = [
        r
        for r in q_rows
        if r["query_id"] is not None
        and r["__qv"] is not None
        and (label_col is None or r["__ql"] is not None)
    ]
    c_cond = F.col(id_col).isNotNull() & F.col(vec_col).isNotNull()
    c_cols = [
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).alias("__cv"),
    ]
    if label_col is not None:
        c_cond = c_cond & F.col(label_col).isNotNull()
        c_cols.append(F.col(label_col).alias("__cl"))
    c = corpus.filter(c_cond).select(*c_cols)
    id_type = c.schema["neighbor_id"].dataType.simpleString()
    qid_type = queries.schema[query_id_col].dataType.simpleString()
    out_schema = (
        f"query_id {qid_type}, neighbor_id {id_type}, cosine double"
    )
    if not q_rows or k <= 0:
        return (
            c.sparkSession.createDataFrame([], out_schema)
            .withColumn("rank", F.lit(1))
            .filter(F.lit(False))
        )
    qids = np.asarray([r["query_id"] for r in q_rows])
    qlabs = (
        np.asarray([r["__ql"] for r in q_rows])
        if label_col is not None
        else None
    )
    q_dims = {len(r["__qv"]) for r in q_rows}
    if len(q_dims) > 1:
        # A ragged QUERY set is caller error, not data noise: the old
        # zip_with fold would have NULL-scored every mismatched pair and
        # silently returned nothing for those queries — fail loudly
        # instead of shipping a kernel that can't represent the set as
        # one matrix.
        raise ValueError(
            f"{op_name}: query vectors have mixed dimensions "
            f"{sorted(q_dims)} — all query embeddings must share one "
            "dimension"
        )
    Q = np.asarray(
        [np.asarray(r["__qv"], dtype=np.float64) for r in q_rows]
    )
    qnorm = _sequential_sq_norm(Q)
    dim = Q.shape[1]
    # One torrent-distributed copy per EXECUTOR instead of a task-closure
    # copy per TASK: at the max_queries=100k cap × 64 dims the query
    # matrix is ~51 MB, which the closure would re-serialize into every
    # task of every stage retry.
    bc = c.sparkSession.sparkContext.broadcast((qids, qlabs, Q, qnorm))

    def score_batches(batches):
        qids, qlabs, Q, qnorm = bc.value
        for pdf in batches:
            if not len(pdf):
                continue
            # Corpus rows whose vector length differs from the query
            # dimension are DROPPED — the semantics of the zip_with/
            # aggregate fold this kernel replaced: zip_with pads the
            # shorter side with NULL, the fold turns any NULL into a
            # NULL cosine, and a NULL cosine never ranked. (Without
            # this, a short row silently truncates the dot product and
            # a long or ragged batch crashes the executor task.)
            lens = np.fromiter(
                (len(v) for v in pdf["__cv"]), dtype=np.int64, count=len(pdf)
            )
            if not (lens == dim).all():
                pdf = pdf[lens == dim]
                if not len(pdf):
                    continue
            ids = pdf["neighbor_id"].to_numpy()
            clabs = (
                pdf["__cl"].to_numpy() if label_col is not None else None
            )
            C = np.asarray(
                [np.asarray(v, dtype=np.float64) for v in pdf["__cv"]]
            )
            cos = _sequential_dot(C, Q) / (
                _sequential_sq_norm(C)[:, None] * qnorm[None, :]
            )
            out_q, out_n, out_c = [], [], []
            for j in range(len(qids)):
                # the self-pair is excluded, as the crossJoin filter did;
                # hard_negatives additionally keeps only label mismatches
                mask = ids != qids[j]
                if clabs is not None:
                    mask &= clabs != qlabs[j]
                vidx = np.flatnonzero(mask)
                if not len(vidx):
                    continue
                col = cos[:, j]
                sel = _topk_select(col, ids, vidx, k)
                if not len(sel):
                    continue
                out_q.append(np.repeat(qids[j], len(sel)))
                out_n.append(ids[sel])
                out_c.append(col[sel])
            if out_q:
                yield pd.DataFrame(
                    {
                        "query_id": np.concatenate(out_q),
                        "neighbor_id": np.concatenate(out_n),
                        "cosine": np.concatenate(out_c),
                    }
                )

    pruned = c.mapInPandas(score_batches, out_schema)
    w = Window.partitionBy("query_id").orderBy(
        F.desc("cosine"), F.asc("neighbor_id")
    )
    return (
        pruned.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "cosine", "rank")
    )


def _topk_per_query(scored: DataFrame, k: int) -> DataFrame:
    """Rank an already-scored (query_id, neighbor_id, cosine) frame to
    its per-query top-k: partition-local pandas top-k BEFORE the
    shuffle (selection only — the cosine doubles are untouched, so the
    result stays bit-identical to a full sort), then the global rank
    sees nparts*k rows per query instead of the whole scored relation.
    cosine_topk/hard_negatives fold this pruning into their scoring
    kernel; this standalone form is for callers that scored pairs some
    other way (e.g. a custom candidate join)."""
    import pandas as pd  # noqa: F401

    def partial_topk(batches):
        for pdf in batches:
            if len(pdf):
                yield (
                    pdf.sort_values(
                        ["query_id", "cosine", "neighbor_id"],
                        ascending=[True, False, True],
                    )
                    .groupby("query_id", sort=False)
                    .head(k)
                )

    pruned = scored.mapInPandas(
        partial_topk,
        ", ".join(f"{f.name} {f.dataType.simpleString()}" for f in scored.schema.fields),
    )
    w = Window.partitionBy("query_id").orderBy(
        F.desc("cosine"), F.asc("neighbor_id")
    )
    return (
        pruned.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "cosine", "rank")
    )


def hard_negatives(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    label_col: str = "label",
    query_id_col: str | None = None,
    query_label_col: str | None = None,
    max_queries: int = 100_000,
) -> DataFrame:
    """Hard-negative mining for contrastive / embedding-model training
    (the public DPR recipe, Karpukhin et al. 2020: the most similar
    items with a DIFFERENT label are the hardest, most informative
    negatives): for each query vector, the exact top-k most cosine-
    similar corpus vectors whose label differs from the query's.

    Same scale shape and batch kernel as :func:`cosine_topk` (driver-
    materialized ``max_queries``-capped query set, dimension-sequential
    bit-exact cosine, corpus never shuffled, same eager-queries and
    NULL/NaN semantics), with the label-mismatch filter applied BEFORE
    selection (filtering after a plain top-k would under-fill k),
    partition-local top-k then a rank over nparts*k survivors. Output:
    ``(query_id, neighbor_id, cosine, rank)``, ties broken by
    neighbor_id — total-ordered and oracle-comparable."""
    return _exact_cosine_topk(
        corpus, queries, k, id_col, vec_col, query_id_col, max_queries,
        op_name="hard_negatives",
        label_col=label_col,
        query_label_col=query_label_col or label_col,
    )


def hyperplane_buckets(
    df: DataFrame, vec_col: str = "embedding", n_planes: int = 8, impl: str = "pandas"
) -> DataFrame:
    """Assign each vector an LSH bucket: bit j = sign(<v, h_j>) with ±1
    hyperplane components derived deterministically (no stored model, no
    RNG state — reproducible across runs/executors).

    ``impl='pandas'`` (default): ONE numpy matmul per Arrow batch against
    the md5-derived ±1 plane matrix (same constants as
    :func:`det_planes`). ``impl='sql'`` keeps the pure-Catalyst
    xxhash64-derived expression (no Python workers), at the cost of
    n_planes interpreted higher-order folds per row — use it where a
    Python-free plan matters more than per-row cost."""
    if impl == "sql":
        dim_component = (
            "(case when (xxhash64(concat('pl', cast({j} as string), ':', cast(i as string))) & 1) = 1 "
            "then 1.0 else -1.0 end)"
        )
        bit_terms = " + ".join(
            f"(case when aggregate(zip_with({_as_double(vec_col)}, "
            f"transform(sequence(0, size({vec_col}) - 1), i -> {dim_component.format(j=j)}), "
            f"(x, h) -> x * h), cast(0.0 as double), (acc, v) -> acc + v) >= 0.0 "
            f"then shiftleft(1L, {j}) else 0L end)"
            for j in range(n_planes)
        )
        return df.withColumn("bucket", F.expr(f"({bit_terms})"))
    import numpy as np
    from pyspark.sql.functions import pandas_udf

    plane_cache: dict = {}

    @pandas_udf("long")
    def bucket(vs: pd.Series) -> pd.Series:
        X = np.asarray([np.asarray(v, dtype=np.float64) for v in vs])
        if X.ndim != 2 or not len(X):
            return pd.Series([0] * len(vs))
        dim = X.shape[1]
        P = plane_cache.get(dim)
        if P is None:
            P = plane_cache[dim] = np.asarray(det_planes(n_planes, dim))
        bits = (X @ P.T) >= 0.0
        weights = 1 << np.arange(n_planes, dtype=np.uint64)
        return pd.Series((bits.astype(np.uint64) @ weights).view(np.int64))

    return df.withColumn("bucket", bucket(F.col(vec_col)))


def probe_buckets(bucket_col: str, n_planes: int, multi_probe: bool) -> Column:
    """The buckets a query visits: its own, plus (multi-probe) every
    1-bit-flip neighbor — a vector near a hyperplane lands one bit away
    from its true neighbors, and flip-1 probing recovers them. Query-side
    explode of ≤ n_planes+1 keys; the corpus side is untouched, so shuffle
    volume stays O(n)."""
    if not multi_probe:
        return F.array(F.col(bucket_col))
    flips = ", ".join([bucket_col] + [f"({bucket_col} ^ {1 << j})" for j in range(n_planes)])
    return F.expr(f"array({flips})")


def ann_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_planes: int = 8,
    multi_probe: bool = True,
) -> DataFrame:
    """Approximate top-k: candidates restricted to the query's LSH bucket
    plus (default) its 1-bit-flip probe buckets.

    At 1000-executor scale the corpus is hash-partitioned by bucket once
    (one shuffle), queries broadcast, and each executor scans only its
    bucket's slice — the IVF-style scale path. Multi-probe multiplies the
    broadcast query rows by ≤ n_planes+1, not the corpus shuffle."""
    c = hyperplane_buckets(
        corpus.select(F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("__cv")),
        "__cv",
        n_planes,
    )
    q = F.broadcast(
        hyperplane_buckets(
            queries.select(F.col(id_col).alias("query_id"), F.col(vec_col).alias("__qv")),
            "__qv",
            n_planes,
        )
        .withColumnRenamed("bucket", "qbucket")
        .select(
            "query_id",
            "__qv",
            F.explode(probe_buckets("qbucket", n_planes, multi_probe)).alias("qbucket"),
        )
    )
    scored = (
        c.join(q, F.col("bucket") == F.col("qbucket"))
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .withColumn("cosine", cosine_sim_pandas("__cv", "__qv"))
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "cosine", "rank")
    )


def det_planes(n_planes: int = 8, dim: int = 64) -> list[list[float]]:
    """±1 hyperplane matrix derived from md5 of 'pl{j}:{i}' — plain Python
    constants (hashlib.md5 == SQL md5), baked as literals into BOTH the
    Spark expression and the DuckDB oracle so the bucketing is
    cross-engine-exact. Data-independent, so safe to embed in a static
    oracle SQL string."""
    import hashlib

    return [
        [
            1.0 if hashlib.md5(f"pl{j}:{i}".encode()).digest()[0] & 1 else -1.0
            for i in range(dim)
        ]
        for j in range(n_planes)
    ]


def _plane_array_sql(plane: list[float]) -> str:
    return "array(" + ", ".join(f"cast({v} as double)" for v in plane) + ")"


def hyperplane_buckets_det(
    df: DataFrame,
    vec_col: str = "embedding",
    n_planes: int = 8,
    dim: int = 64,
    impl: str = "sql",
) -> DataFrame:
    """Deterministic-constant variant of :func:`hyperplane_buckets`: plane
    components are ±1 literals from :func:`det_planes`, the projection is a
    sequential fold (zip_with + aggregate), so a DuckDB oracle reproduces
    the bucket ids bit-for-bit. Multiplying by ±1.0 is exact; only the
    fold order of the sum matters, and both engines fold left-to-right.

    ``impl='pandas'`` evaluates the SAME fold as a vectorized Arrow
    batch kernel: per plane, products are exact (±1.0 multiply) and the
    accumulation runs in ascending-dimension order — each element's
    multiply-then-add is the same rounded IEEE op sequence as the
    interpreted ``aggregate(zip_with(...))``, so the projections (and
    hence every bucket bit) are bit-identical. ``impl='sql'`` (default)
    keeps the pure-Catalyst expression: the r12 settled interleaved A/B
    at sf0.1 measured the kernel ~15% SLOWER end-to-end on ann_topk
    (0.74 s vs 0.63 s — at this corpus size the extra Python stage's
    latency exceeds the 512 interpreted lambda evals/row it removes), so
    per guide §4's built-in-first rule the fold stays the default; the
    kernel is the measured escape hatch for corpora large enough that
    per-row interpreter cost dominates stage latency. Edge semantics
    (both impls, test-pinned): NULL vector, any NULL element, or a
    length ≠ ``dim`` folds to a NULL comparison on every plane →
    bucket 0; a NaN element makes every plane's fold NaN, and Spark's
    ``NaN >= 0.0`` is TRUE (NaN sorts above all doubles) → every bit
    set. The kernel reproduces both: a JVM-computed ``exists(isnull)``
    flag distinguishes true NULL elements (Arrow would conflate them
    with NaN), and bits are ``NOT (acc < 0)`` so NaN sets the bit.
    """
    planes = det_planes(n_planes, dim)
    if impl == "sql":
        bit_terms = " + ".join(
            f"(case when aggregate(zip_with({_as_double(vec_col)}, "
            f"{_plane_array_sql(p)}, (x, h) -> x * h), cast(0.0 as double), "
            f"(acc, v) -> acc + v) >= 0.0 then shiftleft(1L, {j}) else 0L end)"
            for j, p in enumerate(planes)
        )
        return df.withColumn("bucket", F.expr(f"({bit_terms})"))
    import numpy as np
    from pyspark.sql.functions import pandas_udf

    P = np.asarray(planes, dtype=np.float64)  # (n_planes, dim), ±1.0
    npl, d = int(n_planes), int(dim)

    @pandas_udf("long")
    def bucket(vs: pd.Series, has_null: pd.Series) -> pd.Series:
        out = np.zeros(len(vs), dtype=np.int64)
        idx = []
        for i in range(len(vs)):
            v = vs.iat[i]
            # SQL fold: a NULL vector, any NULL element (the JVM-computed
            # has_null flag — Arrow would deliver NULL elements as NaN,
            # which the SQL fold treats differently), or zip_with NULL
            # padding (length mismatch) makes every plane's acc NULL ->
            # CASE not taken -> bit 0
            if v is None or len(v) != d or bool(has_null.iat[i]):
                continue
            idx.append(i)
        if idx:
            X = np.empty((len(idx), d), dtype=np.float64)
            for r, i in enumerate(idx):
                X[r] = np.asarray(vs.iat[i], dtype=np.float64)
            acc = np.zeros((len(idx), npl), dtype=np.float64)
            for j in range(d):
                # ascending-dimension multiply-then-add: same rounded
                # IEEE ops in the same order as the interpreted fold
                acc += X[:, j : j + 1] * P[:, j][None, :]
            # Spark's NaN >= 0.0 is TRUE (NaN sorts above all doubles):
            # NOT (acc < 0) reproduces that; for finite acc it equals
            # acc >= 0
            bits = ~(acc < 0.0)
            weights = (np.int64(1) << np.arange(npl, dtype=np.int64))
            out[idx] = bits.astype(np.int64) @ weights
        return pd.Series(out)

    return df.withColumn(
        "bucket",
        bucket(
            F.col(vec_col),
            F.coalesce(
                F.expr(f"exists({vec_col}, x -> isnull(x))"), F.lit(False)
            ),
        ),
    )


def ann_topk_exact(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_planes: int = 8,
    dim: int = 64,
    multi_probe: bool = True,
) -> DataFrame:
    """Oracle-checkable ANN: identical plan shape to :func:`ann_topk`
    (bucket equi-join + flip-1 multi-probe, never O(n·q)) but with
    deterministic ±1 planes and the sequential-fold cosine, so every
    output double is reproducible in DuckDB. The xxhash64/numpy path
    stays the throughput variant."""
    c = hyperplane_buckets_det(
        corpus.select(F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("__cv")),
        "__cv",
        n_planes,
        dim,
    )
    q = F.broadcast(
        hyperplane_buckets_det(
            queries.select(F.col(id_col).alias("query_id"), F.col(vec_col).alias("__qv")),
            "__qv",
            n_planes,
            dim,
        )
        .withColumnRenamed("bucket", "qbucket")
        .select(
            "query_id",
            "__qv",
            F.explode(probe_buckets("qbucket", n_planes, multi_probe)).alias("qbucket"),
        )
    )
    scored = (
        c.join(q, F.col("bucket") == F.col("qbucket"))
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .withColumn("cosine", cosine_sim_seq_pandas("__cv", "__qv"))
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "cosine", "rank")
    )


def quantize_embeddings(
    df: DataFrame, vec_col: str = "embedding", out_col: str = "q", scale_col: str = "scale"
) -> DataFrame:
    """Per-vector symmetric int8 quantization: ``scale = max(|v|)/127``,
    ``q[i] = floor(v[i]/scale + 0.5)`` (explicit half-up — floor is
    deterministic in both engines, unlike round()'s tie-breaking). 4x
    memory/bandwidth cut for storing and shipping embeddings at corpus
    scale; ANN candidate scoring can run on (q, scale) and re-rank the
    top slice on the float vectors. Pure Catalyst, oracle-exact; zero
    vectors quantize to all-zero with scale 0."""
    scale = F.expr(
        f"aggregate({_as_double(vec_col)}, cast(0.0 as double), "
        f"(m, x) -> greatest(m, abs(x))) / cast(127.0 as double)"
    )
    out = df.withColumn(scale_col, scale)
    q = F.expr(
        f"transform({_as_double(vec_col)}, x -> cast(if({scale_col} = 0.0, 0.0, "
        f"floor(x / {scale_col} + cast(0.5 as double))) as int))"
    )
    return out.withColumn(out_col, q)


def _int_cosine_sql(a: str, b: str) -> str:
    """Cosine of two int-code arrays with EXACT integer dot products
    (BIGINT folds — no float association order to drift between engines);
    only the final sqrt/multiply/divide are IEEE ops, identical in Spark
    and DuckDB. Zero-norm codes score 0."""
    dot = (
        f"aggregate(zip_with({a}, {b}, (x, y) -> cast(x as bigint) * cast(y as bigint)), "
        f"cast(0 as bigint), (acc, v) -> acc + v)"
    )
    sq = "aggregate(transform({c}, x -> cast(x as bigint) * cast(x as bigint)), cast(0 as bigint), (acc, v) -> acc + v)"
    na, nb = sq.format(c=a), sq.format(c=b)
    return (
        f"(case when {na} = 0 or {nb} = 0 then cast(0.0 as double) else "
        f"cast({dot} as double) / (sqrt(cast({na} as double)) * sqrt(cast({nb} as double))) end)"
    )


def quantized_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    rerank_factor: int = 3,
) -> DataFrame:
    """Two-stage ANN on int8-quantized embeddings: score ALL candidates
    with the cosine of their int8 codes (exact integer dot products —
    4x less data scanned per comparison at corpus scale, and scale
    factors cancel inside the cosine), keep the top ``rerank_factor * k``
    per query, then re-rank only that slice with the exact fold-order
    float cosine. Every double is DuckDB-reproducible, so the whole
    two-stage pipeline is oracle-checkable.

    100 TB shape: the corpus ships/stores codes (int8) instead of floats
    for stage 1; stage 2 touches rerank_factor*k rows per query. Queries
    broadcast; the corpus is scanned once and never shuffled (stage-1
    selection is partition-local before the tiny rank exchange, as in
    cosine_topk)."""
    m = rerank_factor * k
    cq = quantize_embeddings(
        corpus.select(F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("__cv")),
        "__cv",
        out_col="__cq",
        scale_col="__cs",
    ).select("neighbor_id", "__cv", "__cq")
    qq = F.broadcast(
        quantize_embeddings(
            queries.select(F.col(id_col).alias("query_id"), F.col(vec_col).alias("__qv")),
            "__qv",
            out_col="__qq",
            scale_col="__qs",
        ).select("query_id", "__qv", "__qq")
    )
    scored = (
        cq.crossJoin(qq)
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .withColumn("qcos", int_cosine_pairs_pandas("__cq", "__qq"))
        .select("query_id", "neighbor_id", "qcos", "__cv", "__qv")
    )

    def partial_topm(batches):
        for pdf in batches:
            if len(pdf):
                yield (
                    pdf.sort_values(
                        ["query_id", "qcos", "neighbor_id"],
                        ascending=[True, False, True],
                    )
                    .groupby("query_id", sort=False)
                    .head(m)
                )

    pruned = scored.mapInPandas(
        partial_topm,
        ", ".join(f"{f.name} {f.dataType.simpleString()}" for f in scored.schema.fields),
    )
    wq = Window.partitionBy("query_id").orderBy(F.desc("qcos"), F.asc("neighbor_id"))
    shortlist = (
        pruned.withColumn("__qr", F.row_number().over(wq))
        .filter(F.col("__qr") <= m)
        # rerank runs on <= rerank_factor*k rows PER QUERY — output
        # scale, not candidate scale — so the exact fold-order SQL
        # cosine (which cosine_sim_seq_pandas reproduces bit-for-bit)
        # costs nothing here and spares a whole extra Python stage; the
        # batch kernel stays on the candidate-scale paths only.
        # Zero-norm guard: unguarded, a degenerate shortlist vector
        # scores 0/0 = NaN, and NaN orders ABOVE every double under
        # desc — it would rank top-1. NULL instead (sorts last, the
        # kernel's documented never-looser edge semantics).
        .withColumn(
            "cosine",
            F.when(
                (norm_expr("__cv") * norm_expr("__qv")) > 0,
                cosine_sim_expr("__cv", "__qv"),
            ),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("neighbor_id"))
    return (
        shortlist.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "cosine", "rank")
    )


# ---------------------------------------------------------------------------
# IVF (inverted-file) ANN — the trained-centroid scale path
# ---------------------------------------------------------------------------


def train_ivf_centroids(
    corpus,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    n_lists: int = 16,
    sample_per_list: int = 40,
    max_iter: int = 8,
):
    """Train IVF coarse centroids: deterministic PSEUDO-RANDOM sample to the
    driver (TakeOrdered by xxhash64(id) — a seeded shuffle, so the sample is
    unbiased even when ids correlate with content, and reproducible across
    runs/partitionings), then spherical k-means in numpy. Returns an
    (n_lists, dim) float64 array of unit-norm centroids. The sample is tiny
    (n_lists*sample_per_list rows); the corpus itself never moves."""
    import numpy as np

    rows = (
        corpus.select(id_col, vec_col)
        .orderBy(F.xxhash64(F.col(id_col)), F.col(id_col))
        .limit(n_lists * sample_per_list)
        .collect()
    )
    X = np.asarray([r[1] for r in rows], dtype=np.float64)
    X /= np.maximum(np.linalg.norm(X, axis=1, keepdims=True), 1e-12)
    rng = np.random.default_rng(0x1FF)
    cent = X[rng.choice(len(X), size=min(n_lists, len(X)), replace=False)].copy()
    for _ in range(max_iter):
        assign = np.argmax(X @ cent.T, axis=1)
        for j in range(len(cent)):
            members = X[assign == j]
            if len(members):
                c = members.sum(axis=0)
                cent[j] = c / max(np.linalg.norm(c), 1e-12)
    return cent


def ivf_assign(df, centroids, vec_col: str = "embedding", out_col: str = "list_id", n_probe: int = 1):
    """Assign each vector its ``n_probe`` nearest coarse lists (cosine) via
    one vectorized pandas UDF over the broadcast centroid matrix."""
    import numpy as np
    from pyspark.sql.functions import pandas_udf

    C = centroids  # captured (small) -> shipped in the serialized UDF

    @pandas_udf("array<int>")
    def lists(vs: pd.Series) -> pd.Series:
        X = np.asarray([np.asarray(v, dtype=np.float64) for v in vs])
        if X.ndim != 2 or not len(X):
            return pd.Series([[0]] * len(vs))
        X /= np.maximum(np.linalg.norm(X, axis=1, keepdims=True), 1e-12)
        sims = X @ C.T
        top = np.argsort(-sims, axis=1)[:, :n_probe].astype(np.int32)
        return pd.Series(list(top))

    return df.withColumn(out_col, lists(F.col(vec_col)))


def ivf_topk(
    corpus,
    queries,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_lists: int = 16,
    n_probe: int = 4,
):
    """IVF approximate top-k: corpus rows live in their single nearest list
    (the inverted file, ONE shuffle to co-locate by list at build time);
    each query probes its ``n_probe`` nearest lists. Exact fold-order cosine
    inside probed lists, partition-local pre-selection, then global rank —
    identical output contract to ``cosine_topk``.

    100 TB shape: centroids train on a driver-side sample, assignment is a
    map-only pass, and the probe join is an equi-join on list_id whose
    fan-out is bounded by n_probe — candidate volume ~= corpus * n_probe /
    n_lists."""
    cent = train_ivf_centroids(corpus, vec_col, id_col, n_lists)
    c = ivf_assign(
        corpus.select(F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("__cv")),
        cent,
        "__cv",
        n_probe=1,
    ).select("neighbor_id", "__cv", F.col("list_id")[0].alias("list_id"))
    q = F.broadcast(
        ivf_assign(
            queries.select(F.col(id_col).alias("query_id"), F.col(vec_col).alias("__qv")),
            cent,
            "__qv",
            n_probe=n_probe,
        ).select("query_id", "__qv", F.explode("list_id").alias("list_id"))
    )
    scored = (
        c.join(q, on="list_id")
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .withColumn("cosine", cosine_sim_pandas("__cv", "__qv"))
        .select("query_id", "neighbor_id", "cosine")
    )

    def partial_topk(batches):
        for pdf in batches:
            if len(pdf):
                yield (
                    pdf.sort_values(
                        ["query_id", "cosine", "neighbor_id"],
                        ascending=[True, False, True],
                    )
                    .groupby("query_id", sort=False)
                    .head(k)
                )

    pruned = scored.mapInPandas(
        partial_topk,
        ", ".join(f"{f.name} {f.dataType.simpleString()}" for f in scored.schema.fields),
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("neighbor_id"))
    return (
        pruned.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "cosine", "rank")
    )


def ivf_centroids_relational(
    corpus: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_lists: int = 16,
) -> DataFrame:
    """One-shot IVF coarse centroids, fully relational and deterministic:
    seed lists by ``id % n_lists`` (no RNG, no floats), centroid element =
    id-ordered sequential-fold mean of the member vectors' elements. Every
    double is reproducible in DuckDB (``list(val ORDER BY id)`` +
    ``list_reduce``), unlike the k-means path whose iteration order isn't
    SQL-expressible. Returns (list_id, cv: array<double>).

    Scale shape: one explode + one (list_id, d) agg over n_lists*dim cells
    — map-side partial folds don't apply (order-sensitive), but the cell
    count is tiny and the corpus is scanned once."""
    e = corpus.select(
        (F.col(id_col) % n_lists).alias("list_id"),
        F.col(id_col).alias("__id"),
        F.posexplode(F.expr(f"transform({vec_col}, x -> cast(x as double))")).alias(
            "d", "val"
        ),
    )
    percell = (
        e.groupBy("list_id", "d")
        .agg(
            F.expr(
                "aggregate(array_sort(collect_list(struct(__id, val))), "
                "cast(0.0 as double), (acc, s) -> acc + s.val)"
            ).alias("s"),
            F.count(F.lit(1)).alias("cnt"),
        )
        .withColumn("cval", F.col("s") / F.col("cnt"))
    )
    return percell.groupBy("list_id").agg(
        F.expr(
            "transform(array_sort(collect_list(struct(d, cval))), s -> s.cval)"
        ).alias("cv")
    )


def ivf_topk_exact(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_lists: int = 16,
    n_probe: int = 4,
) -> DataFrame:
    """Oracle-checkable IVF top-k: same inverted-file structure as
    :func:`ivf_topk` (corpus rows in their single nearest list, queries
    probe n_probe lists, candidate volume ~= corpus*n_probe/n_lists) with
    the deterministic relational centroids and sequential-fold cosine so a
    DuckDB oracle reproduces every double. The k-means/numpy path remains
    the throughput variant."""
    # all centroids folded into ONE broadcast row; per-vector assignment is
    # then a single array expression (all n_lists fold-order cosines +
    # inline (sim DESC, list_id ASC) selection) — a map-only pass with no
    # Exchange/Window, instead of shuffling corpus×n_lists rows through a
    # window sort. Same doubles: the per-centroid cosine is the identical
    # sequential fold, and reverse(array_sort(struct(sim, -list_id)))
    # reproduces the oracle's ORDER BY csim DESC, list_id ASC exactly.
    cent1 = F.broadcast(
        ivf_centroids_relational(corpus, id_col, vec_col, n_lists).agg(
            F.array_sort(F.collect_list(F.struct("list_id", "cv"))).alias("__cents")
        )
    )

    def assign(df: DataFrame, out_id: str, vec_alias: str, keep: int) -> DataFrame:
        ranked = (
            f"reverse(array_sort(transform(__cents, s -> "
            f"struct({_cosine_sql(vec_alias, 's.cv')} as sim, -s.list_id as nlid))))"
        )
        return (
            df.select(F.col(id_col).alias(out_id), F.col(vec_col).alias(vec_alias))
            .join(cent1)
            .select(
                out_id,
                vec_alias,
                F.explode(F.expr(f"slice({ranked}, 1, {keep})")).alias("__t"),
            )
            .select(out_id, vec_alias, (-F.col("__t.nlid")).alias("list_id"))
        )

    c = assign(corpus, "neighbor_id", "__cv", 1)
    q = F.broadcast(assign(queries, "query_id", "__qv", n_probe))
    scored = (
        c.join(q, on="list_id")
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .withColumn("cosine", cosine_sim_expr("__cv", "__qv"))
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "cosine", "rank")
    )


def centroids_fixedpoint(
    assigned: DataFrame,
    cluster_col: str = "list_id",
    vec_col: str = "embedding",
    scale: int = 1_000_000_000,
) -> DataFrame:
    """Cluster centroids via exact fixed-point sufficient statistics:
    element sums accumulate ``floor(x * scale)`` integers in
    DECIMAL(38,0) (no overflow, no float fold order), centroid element =
    one IEEE division of exact integers — bit-reproducible across
    engines AND shuffle orders, unlike ``ivf_centroids_relational``'s
    id-ordered fold (which pays an order-sensitive collect_list).

    This is the scale-preferred centroid update: the (cluster, dim)
    aggregate gets map-side partial combine (integer sums are
    associative), so shuffle volume is n_clusters*dim cells regardless
    of corpus size. Returns (cluster_col, cv: array<double>).
    """
    e = assigned.select(
        F.col(cluster_col),
        F.posexplode(
            F.expr(f"transform({vec_col}, x -> cast(x as double))")
        ).alias("d", "val"),
    )
    percell = e.groupBy(cluster_col, "d").agg(
        F.sum(
            F.expr(f"cast(floor(val * {scale}.0) as decimal(38,0))")
        ).alias("s"),
        F.count(F.lit(1)).alias("cnt"),
    )
    cell = percell.select(
        cluster_col,
        "d",
        (
            F.col("s").cast("double")
            / (F.col("cnt") * F.lit(scale)).cast("double")
        ).alias("cval"),
    )
    return cell.groupBy(cluster_col).agg(
        F.expr(
            "transform(array_sort(collect_list(struct(d, cval))), s -> s.cval)"
        ).alias("cv")
    )


def assign_to_centroids(
    df: DataFrame,
    centroids: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    cluster_col: str = "cluster",
) -> DataFrame:
    """Map-only assignment of every vector to its max-cosine centroid:
    all centroids fold into ONE broadcast row, the argmax is a single
    array expression ((sim DESC, cluster ASC) tie-break) — zero
    Exchange, zero Window, the ``ivf_topk_exact`` pattern. ``centroids``
    is (cluster_col, cv: array<double>) — typically
    :func:`centroids_fixedpoint` output or :func:`load_centroids`.
    Returns (id_col, cluster, sim)."""
    cent1 = F.broadcast(
        centroids.agg(
            F.array_sort(
                F.collect_list(F.struct(F.col(cluster_col), F.col("cv")))
            ).alias("__cents")
        )
    )
    ranked = (
        f"reverse(array_sort(transform(__cents, s -> "
        f"struct({_cosine_sql('__v', 's.cv')} as sim, -s.{cluster_col} as nc))))"
    )
    return (
        df.select(
            F.col(id_col).alias("__id"),
            F.expr(f"transform({vec_col}, x -> cast(x as double))").alias("__v"),
        )
        .join(cent1)
        .select("__id", "__v", F.expr(f"{ranked}[0]").alias("__t"))
        .select(
            F.col("__id").alias(id_col),
            (-F.col("__t.nc")).cast("int").alias("cluster"),
            F.col("__t.sim").alias("sim"),
        )
    )


def _kmeans_loop(work: DataFrame, n_clusters: int, n_iters: int):
    """Shared Lloyd's loop over ``work`` = (__id, __v): returns
    (final_assignment, final_centroids) where the assignment was made
    against exactly those centroids — so
    ``assign_to_centroids(corpus, cents) == assignment`` by
    construction. The vector rides through the assignment select (no
    id join-back per iteration)."""
    assigned = work.withColumn(
        "cluster", (F.col("__id") % n_clusters).cast("int")
    )
    out = None
    cents = None
    for _ in range(n_iters):
        cents = centroids_fixedpoint(assigned, "cluster", "__v")
        cent1 = F.broadcast(
            cents.agg(
                F.array_sort(F.collect_list(F.struct("cluster", "cv"))).alias(
                    "__cents"
                )
            )
        )
        ranked = (
            f"reverse(array_sort(transform(__cents, s -> "
            f"struct({_cosine_sql('__v', 's.cv')} as sim, -s.cluster as nc))))"
        )
        out = (
            work.join(cent1)
            .select("__id", "__v", F.expr(f"{ranked}[0]").alias("__t"))
            .select(
                "__id",
                "__v",
                (-F.col("__t.nc")).cast("int").alias("cluster"),
                F.col("__t.sim").alias("sim"),
            )
        )
        assigned = out
    return out, cents


def kmeans_centroids_exact(
    corpus: DataFrame,
    n_clusters: int = 8,
    n_iters: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Lloyd's centroid table after ``n_iters`` rounds — the model the
    "train once, assign many" workflow persists (:func:`save_centroids`):
    the final assignment of :func:`kmeans_assign_exact` is exactly
    ``assign_to_centroids(corpus, these_centroids)``. Returns
    (cluster, cv: array<double>)."""
    if n_iters < 1:
        raise ValueError("n_iters must be >= 1")
    work = corpus.select(
        F.col(id_col).alias("__id"),
        F.expr(f"transform({vec_col}, x -> cast(x as double))").alias("__v"),
    )
    _, cents = _kmeans_loop(work, n_clusters, n_iters)
    return cents


def save_centroids(centroids: DataFrame, path: str) -> None:
    """Persist a (cluster, cv) centroid table as parquet — the k-means /
    IVF model artifact a production pipeline trains once and reuses for
    every subsequent assignment pass (retraining per batch would pay the
    corpus-scan statistics aggregate every time)."""
    centroids.write.mode("overwrite").parquet(path)


def load_centroids(spark, path: str) -> DataFrame:
    return spark.read.parquet(path)


def kmeans_assign_exact(
    corpus: DataFrame,
    n_clusters: int = 8,
    n_iters: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Distributed Lloyd's k-means (the clustering stage behind SemDeDup
    and IVF index training), fully deterministic and oracle-checkable:

    - seed assignment = ``id % n_clusters`` (no RNG),
    - each iteration recomputes centroids from EXACT fixed-point
      sufficient statistics (:func:`centroids_fixedpoint` — map-side
      combinable integer sums, one (cluster, dim)-cell shuffle) and
      reassigns every vector to its max-cosine centroid via the
      zero-Exchange broadcast-array argmax of ``ivf_topk_exact``
      (sequential-fold cosine, (sim DESC, cluster ASC) tie-break).

    Returns (id_col, cluster, sim) after ``n_iters`` rounds. Clusters
    that lose all members simply disappear from the next round's
    centroid table (standard Lloyd's behavior; seeding by id-hash makes
    initial clusters balanced, so this only occurs at tiny k*dim).

    Scale: per iteration ONE corpus-scan aggregate + ONE map-only
    assignment pass; nothing is quadratic and no stage is
    single-partition. The iteration count is fixed and small (Lloyd's at
    corpus scale is always capped; public practice is 5-25 rounds on a
    sample, then one full assignment pass).
    """
    if n_iters < 1:
        raise ValueError("n_iters must be >= 1")
    work = corpus.select(
        F.col(id_col).alias("__id"),
        F.expr(f"transform({vec_col}, x -> cast(x as double))").alias("__v"),
    )
    out, _ = _kmeans_loop(work, n_clusters, n_iters)
    return out.select(F.col("__id").alias(id_col), "cluster", "sim")


def semantic_dedup(
    corpus: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_lists: int = 16,
    tau: float = 0.95,
    exact: bool = True,
    max_cluster_size: int | None = None,
) -> DataFrame:
    """SemDeDup-style semantic deduplication (public technique: Abbas et
    al. 2023 — cluster the embedding space, then drop near-identical
    members within each cluster; cross-cluster pairs are never compared,
    which is what makes the quadratic step tractable).

    Keep rule (deterministic, relational): a row is kept iff it has no
    cosine>=tau neighbor with a SMALLER id inside its cluster — the same
    min-id-representative convention as ``minhash_dedup``. Returns
    ``(vec_id, list_id, keep, n_dups, max_dup_sim)`` for every corpus row.

    Scale shape: centroids are one broadcast row; assignment is a map-only
    array expression (no Exchange — same plan as ``ivf_topk_exact``); the
    intra-cluster pair join is an equi-join on list_id, so shuffle volume
    is O(n) and compute is sum over clusters of c^2 — bounded by choosing
    n_lists ~ n/target_cluster_size, exactly how SemDeDup runs at corpus
    scale. ``exact=True`` uses the sequential-fold cosine a DuckDB oracle
    replays; ``exact=False`` swaps in the Arrow-batched numpy cosine for
    throughput (same pairs, float-rounding may differ at the tau margin).

    ``max_cluster_size`` is the hot-cluster guard (the LSH hot-bucket
    analog): a degenerate cluster — e.g. a spike of near-identical or
    zero embeddings — would expand c² inside one task. Clusters over the
    cap skip the pair join (all their members are KEPT, conservatively)
    and a WARNING names the skipped clusters; fix by raising n_lists or
    pre-filtering the spike. ``None`` (default) disables the guard.
    """
    cent1 = F.broadcast(
        ivf_centroids_relational(corpus, id_col, vec_col, n_lists).agg(
            F.array_sort(F.collect_list(F.struct("list_id", "cv"))).alias("__cents")
        )
    )
    ranked = (
        f"reverse(array_sort(transform(__cents, s -> "
        f"struct({_cosine_sql('__v', 's.cv')} as sim, -s.list_id as nlid))))"
    )
    assigned = (
        corpus.select(F.col(id_col).alias("__id"), F.col(vec_col).alias("__v"))
        .join(cent1)
        .select(
            "__id",
            "__v",
            (-F.expr(f"element_at({ranked}, 1).nlid")).cast("long").alias("list_id"),
        )
    )
    paired_src = assigned
    if max_cluster_size is not None:
        sizes = assigned.groupBy("list_id").agg(F.count(F.lit(1)).alias("__csz"))
        hot = sizes.filter(F.col("__csz") > max_cluster_size)
        hot_rows = hot.collect()  # bounded: at most n_lists rows
        if hot_rows:
            import logging

            logging.getLogger(__name__).warning(
                "semantic_dedup: skipping %d cluster(s) over max_cluster_size=%d "
                "(members kept, NOT deduped): %s — raise n_lists or pre-filter "
                "the embedding spike",
                len(hot_rows),
                max_cluster_size,
                [(r["list_id"], r["__csz"]) for r in hot_rows],
            )
        paired_src = assigned.join(
            F.broadcast(hot.select("list_id")), on="list_id", how="left_anti"
        )
    a = paired_src.select(
        F.col("__id").alias("ida"), F.col("__v").alias("va"), "list_id"
    )
    b = paired_src.select(
        F.col("__id").alias("idb"), F.col("__v").alias("vb"), "list_id"
    )
    # exact=True: the batch pairwise kernel — bit-identical doubles to
    # the interpreted fold it replaced (and the DuckDB oracle), but
    # evaluated per Arrow batch AFTER the equi-join instead of as an
    # interpreted HOF inside the SortMergeJoin condition (r10 verdict
    # next #1: that expression class degrades ~40% in long sessions)
    pair_cos = (
        cosine_sim_seq_pandas("va", "vb")
        if exact
        else cosine_sim_pandas("va", "vb")
    )
    pairs = (
        a.join(b, "list_id")
        .filter(F.col("ida") < F.col("idb"))
        .withColumn("__cos", pair_cos)
        .filter(F.col("__cos") >= tau)
    )
    dups = pairs.groupBy("idb").agg(
        F.count(F.lit(1)).alias("n_dups"), F.max("__cos").alias("max_dup_sim")
    )
    return (
        assigned.join(dups, assigned["__id"] == dups["idb"], "left")
        .select(
            F.col("__id").alias(id_col),
            F.col("list_id"),
            F.col("idb").isNull().alias("keep"),
            F.coalesce(F.col("n_dups"), F.lit(0)).cast("long").alias("n_dups"),
            F.col("max_dup_sim"),
        )
    )


# ---------------------------------------------------------------------------
# Johnson-Lindenstrauss random projection (dimensionality reduction)
# ---------------------------------------------------------------------------


def _jl_sign_case(i_expr: str, j_expr: str, term: str) -> str:
    """Catalyst CASE expression: +term or -term by the deterministic
    Rademacher sign for (dimension ``i_expr``, output axis ``j_expr``).

    The sign is a multiplicative-hash LCG over exact BIGINT arithmetic —
    ``((i*1000003 + j*7919 + 12345) * 2654435761) mod 2^32 < 2^31`` —
    chosen because every engine computes it bit-identically (no float,
    no engine-specific hash function), so a DuckDB oracle can replay the
    projection exactly. seed < 1e8, so the product stays < 2^63."""
    lcg = (
        f"((cast({i_expr} as bigint) * 1000003 + cast({j_expr} as bigint) * 7919 "
        f"+ 12345) * 2654435761) % 4294967296"
    )
    return f"(CASE WHEN {lcg} < 2147483648 THEN {term} ELSE -{term} END)"


def jl_project(
    df: DataFrame,
    k: int = 16,
    emb_col: str = "embedding",
    id_col: str = "vec_id",
    impl: str = "pandas",
) -> DataFrame:
    """Project ``emb_col`` (array<float>, dim d) onto ``k`` random ±1
    Rademacher axes (Achlioptas'01 database-friendly JL transform) —
    the standard pre-ANN dimensionality reduction: pairwise distances are
    preserved within (1±eps) w.h.p. for k = O(log n / eps^2), and the
    reduced vectors make every downstream cosine/LSH pass d/k times
    cheaper.

    Spark shape: one map-only pass — ``explode(sequence(0, k-1))`` fans
    each row into its k output coordinates and a single fold over the
    input dimensions accumulates ±emb[i] (the sign matrix is never
    materialized — it's a closed-form integer expression, so the operator
    ships zero state and repartitions nothing). Scale: at 100 TB this
    stays embarrassingly parallel; output size is k/d of the input.

    Determinism: each term is an exact float→double cast, negation is
    exact, the fold runs in ascending-i order in both engines, and the
    final 1/sqrt(k) is one correctly-rounded IEEE op — bit-identical to
    the DuckDB oracle.

    Returns ``(id_col, axis, v)`` — one row per output coordinate.

    ``impl='pandas'`` (default; settled A/B 2.2× — 0.32 s vs 0.70 s at
    sf0.1) computes all ``k`` folds of a row in ONE vectorized Arrow
    batch kernel — per axis the accumulation runs in ascending-i order
    with exact ±1 sign application (negation is exact), so every double
    is bit-identical to the interpreted ``aggregate(...)`` fold and the
    DuckDB oracle; the k-vector is then ``posexplode``d. The SQL form
    pays k interpreted folds per row (k·dim interpreted lambda evals —
    1024/row at the 16×64 default), and the explode-then-fold shape
    re-reads the embedding k times. ``impl='sql'`` keeps the
    pure-Catalyst expression. Edge semantics (test-pinned): NULL vector
    or any NULL element → k NULL coordinates (the kernel takes a
    JVM-computed ``exists(isnull)`` flag, since Arrow conflates NULL
    elements with NaN); a NaN element folds to NaN in the SQL form but
    crosses Arrow as NULL from the kernel (the same documented
    never-looser edge as the cosine kernels); an EMPTY vector returns
    0.0 from the kernel where the SQL form's ``element_at`` raises
    under ANSI. All three edges are unreachable for the engine's
    embedding fixtures (oracle hash-green at both SFs).
    """
    kk = int(k)
    if impl == "sql":
        fold = (
            f"aggregate(sequence(0, size({emb_col}) - 1), cast(0.0 as double), "
            f"(acc, i) -> acc + "
            + _jl_sign_case("i", "axis", f"cast(element_at({emb_col}, i + 1) as double)")
            + ")"
        )
        return (
            df.select(
                F.col(id_col),
                F.col(emb_col),
                F.explode(F.expr(f"sequence(0, {kk - 1})")).alias("axis"),
            )
            .select(
                id_col,
                "axis",
                F.expr(f"{fold} / sqrt(cast({kk} as double))").alias("v"),
            )
        )
    import numpy as np
    from pyspark.sql.functions import pandas_udf

    def _signs(d: int) -> "np.ndarray":
        # the SQL LCG over exact BIGINT arithmetic, vectorized: int64 is
        # safe for d <= ~3400 (same 2^63 product bound the SQL form
        # documents); ±1.0 as float64 so the multiply stays exact
        i = np.arange(d, dtype=np.int64)[:, None]
        j = np.arange(kk, dtype=np.int64)[None, :]
        h = ((i * 1000003 + j * 7919 + 12345) * 2654435761) % 4294967296
        return np.where(h < 2147483648, 1.0, -1.0)

    @pandas_udf("array<double>")
    def jlvec(vs: pd.Series, has_null: pd.Series) -> pd.Series:
        out = [None] * len(vs)
        groups: dict = {}
        for i in range(len(vs)):
            v = vs.iat[i]
            if v is None or bool(has_null.iat[i]):
                # SQL: size(NULL) -> NULL sequence -> NULL fold, and a
                # NULL ELEMENT -> NULL acc (the JVM-computed has_null
                # flag — Arrow delivers NULL elements as NaN, but the
                # SQL fold yields NULL, not NaN, for them) -> k NULLs
                out[i] = [None] * kk
                continue
            groups.setdefault(len(v), []).append(i)
        for d, idx in groups.items():
            S = _signs(d)  # (d, k)
            X = np.empty((len(idx), d), dtype=np.float64)
            for r, i in enumerate(idx):
                X[r] = np.asarray(vs.iat[i], dtype=np.float64)
            acc = np.zeros((len(idx), kk), dtype=np.float64)
            for t in range(d):
                # ascending-i sign-then-add: the same rounded IEEE ops in
                # the same order as the interpreted fold
                acc += X[:, t : t + 1] * S[t, :][None, :]
            vout = acc / np.sqrt(np.float64(kk))
            for r, i in enumerate(idx):
                # a NaN ELEMENT folds to NaN, which crosses Arrow as
                # NULL (same documented edge as the cosine kernels:
                # never looser — downstream filters drop NULL like they
                # drop nothing-compares-true NaN); made explicit here
                out[i] = [None if x != x else float(x) for x in vout[r]]
        return pd.Series(out)

    return df.select(
        F.col(id_col),
        F.posexplode(
            jlvec(
                F.col(emb_col),
                F.coalesce(
                    F.expr(f"exists({emb_col}, x -> isnull(x))"), F.lit(False)
                ),
            )
        ),
    ).select(id_col, F.col("pos").alias("axis"), F.col("col").alias("v"))


# ---------------------------------------------------------------------------
# Product quantization (PQ) — the memory-scale path for billion-vector ANN
# ---------------------------------------------------------------------------


def _l2fx_sql(a: str, b: str, scale: int = 1_000_000_000) -> str:
    """Squared-L2 distance between two double arrays as an exact
    fixed-point BIGINT (``floor(scale * sum_i (a_i-b_i)^2)``) — the fold
    is sequential (list order, 0.0 seed), so the double it floors is
    bit-identical across engines, and everything summed *across* rows
    afterwards is integer arithmetic (shuffle-order-free)."""
    return (
        f"cast(floor({scale}.0 * aggregate(zip_with({_as_double(a)}, {_as_double(b)}, "
        f"(x, y) -> (x - y) * (x - y)), cast(0.0 as double), (acc, v) -> acc + v)) "
        f"as bigint)"
    )


def _pq_subvectors(
    df: DataFrame, id_col: str, vec_col: str, m: int, dsub: int
) -> DataFrame:
    """(id, m, sv) rows: the vector cut into ``m`` contiguous ``dsub``-dim
    subvectors — one generate-and-explode, no shuffle."""
    return df.select(
        F.col(id_col).alias("__id"),
        F.posexplode(
            F.expr(
                f"transform(sequence(0, {m - 1}), "
                f"j -> slice({_as_double(vec_col)}, j * {dsub} + 1, {dsub}))"
            )
        ).alias("__m", "__sv"),
    )


def pq_train_codebook(
    corpus: DataFrame,
    m: int = 4,
    k: int = 16,
    dim: int = 64,
    n_iters: int = 1,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    scale: int = 1_000_000_000,
) -> DataFrame:
    """Train a product-quantization codebook (Jegou et al., PAMI'11): the
    vector space is split into ``m`` contiguous subspaces of ``dim/m``
    dims and each gets its own ``k``-centroid codebook via the
    deterministic Lloyd's of :func:`kmeans_centroids_exact` (seed
    assignment ``id % k``, exact fixed-point centroid statistics).

    All ``m`` subspace trainings run as ONE relational DAG keyed by
    ``(m, cluster)`` — per iteration one map-side-combinable integer
    aggregate over ``(m, cluster, d)`` cells plus one broadcast-argmin
    reassignment; nothing is per-subspace sequential.

    Returns ``(m, cluster, cv: array<double>)`` — m*k rows, the model a
    production pipeline trains once on a sample and broadcasts for every
    encode pass.
    """
    if dim % m:
        raise ValueError(f"dim={dim} not divisible by m={m}")
    dsub = dim // m
    sub = _pq_subvectors(corpus, id_col, vec_col, m, dsub)
    assigned = sub.withColumn("__c", (F.col("__id") % k).cast("int"))
    cents = None
    for it in range(n_iters):
        e = assigned.select(
            "__m",
            "__c",
            F.posexplode("__sv").alias("d", "val"),
        )
        percell = e.groupBy("__m", "__c", "d").agg(
            F.sum(
                F.expr(f"cast(floor(val * {scale}.0) as decimal(38,0))")
            ).alias("s"),
            F.count(F.lit(1)).alias("cnt"),
        )
        cents = (
            percell.select(
                "__m",
                "__c",
                "d",
                (
                    F.col("s").cast("double")
                    / (F.col("cnt") * F.lit(scale)).cast("double")
                ).alias("cval"),
            )
            .groupBy("__m", "__c")
            .agg(
                F.expr(
                    "transform(array_sort(collect_list(struct(d, cval))), s -> s.cval)"
                ).alias("cv")
            )
        )
        if it + 1 < n_iters:
            assigned = _pq_assign(sub, cents).join(
                sub, on=["__id", "__m"]
            ).select("__id", "__m", "__sv", "__c")
    return cents.select(
        F.col("__m").alias("m"), F.col("__c").alias("cluster"), "cv"
    )


def _pq_assign(sub: DataFrame, cents: DataFrame) -> DataFrame:
    """Argmin-L2 code per (id, subspace): ALL m*k centroids fold into one
    broadcast row; the per-row argmin is a filter + array_sort expression
    ((dist ASC, cluster ASC) tie-break) — zero Exchange on the corpus."""
    cent1 = F.broadcast(
        cents.agg(
            F.array_sort(
                F.collect_list(F.struct("__m", "__c", "cv"))
            ).alias("__cents")
        )
    )
    pick = (
        "array_sort(transform(filter(__cents, s -> s.__m = __m), "
        f"s -> struct({_l2fx_sql('__sv', 's.cv')} as dfx, s.__c as c)))[0].c"
    )
    return (
        sub.join(cent1)
        .select("__id", "__m", F.expr(pick).cast("int").alias("__c"))
    )


def pq_encode(
    corpus: DataFrame,
    codebook: DataFrame,
    m: int = 4,
    dim: int = 64,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    keep_cols: "tuple[str, ...]" = (),
) -> DataFrame:
    """Encode every vector as ``m`` one-byte-ish codes (its nearest
    centroid per subspace): strictly map-only against the broadcast
    codebook — all m argmins evaluate in ONE row expression (no
    explode, no per-id re-group, ZERO corpus Exchange; plan-asserted),
    the 256x compression step that lets a 100 TB embedding corpus fit a
    serving tier. Returns ``(id_col, codes: array<int>)`` in subspace
    order."""
    dsub = dim // m
    cent1 = F.broadcast(
        codebook.agg(
            F.array_sort(
                F.collect_list(F.struct("m", "cluster", "cv"))
            ).alias("__cents")
        )
    )
    sub = f"slice({_as_double(vec_col)}, j * {dsub} + 1, {dsub})"
    codes = (
        f"transform(sequence(0, {m - 1}), j -> "
        "array_sort(transform(filter(__cents, s -> s.m = j), "
        f"s -> struct({_l2fx_sql(sub, 's.cv')} as dfx, s.cluster as c)))[0].c)"
    )
    return corpus.join(cent1).select(
        F.col(id_col),
        *[F.col(c) for c in keep_cols],
        F.expr(codes).cast("array<int>").alias("codes"),
    )


def _adc_lut_sql(qvec: str, m: int, n_codes: int, dsub: int) -> str:
    """Per-query ADC lookup table: a flat ``m * n_codes`` BIGINT array
    where entry ``j * n_codes + c`` is the floored nano squared-L2
    between the query's ``j``-th subvector and centroid ``(j, c)`` —
    the exact :func:`_l2fx_sql` fold the per-candidate ADC evaluated,
    hoisted to query scale. Entries for (j, c) combos absent from the
    codebook (empty clusters) come out NULL and are never looked up,
    because codes only ever reference existing centroids."""
    return (
        f"transform(sequence(0, {m * n_codes - 1}), i -> "
        + _l2fx_sql(
            f"slice({qvec}, (i div {n_codes}) * {dsub} + 1, {dsub})",
            f"filter(__cents, s -> s.m = i div {n_codes} "
            f"AND s.cluster = i % {n_codes})[0].cv",
        )
        + ")"
    )


def _adc_lookup_sql(m: int, n_codes: int) -> str:
    """Candidate ADC from the per-query LUT: an UNROLLED sum of ``m``
    integer array lookups — pure codegen, no interpreted fold and no
    centroid scan at candidate-pair scale. Integer addition in the same
    ascending-subspace order as the fold it replaces (associative, so
    bit-identical)."""
    return " + ".join(
        f"element_at(__lut, {j * n_codes} + element_at(codes, {j + 1}) + 1)"
        for j in range(m)
    )


def _assert_query_cap(
    queries: DataFrame, id_col: str, max_queries: int, op: str
) -> None:
    """Bounded-probe guard for operators that put the query table on the
    BROADCAST side of the candidate scan: count at most ``max_queries + 1``
    query rows (a ``limit``-bounded job over one projected column — cost
    scales with the cap, not the table) and raise rather than silently
    build an unbounded broadcast. The exact-kernel paths get the same
    guard for free from their driver collect (``_exact_cosine_topk``)."""
    n_q = queries.select(id_col).limit(int(max_queries) + 1).count()
    if n_q > max_queries:
        raise ValueError(
            f"{op}: query side has > {max_queries} rows; it rides a "
            "broadcast, so an unbounded query table is an executor OOM "
            "at scale — raise max_queries deliberately or shard the "
            "query set and union the results"
        )


def pq_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    m: int = 4,
    n_codes: int = 16,
    dim: int = 64,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    codebook: DataFrame | None = None,
    max_queries: int = 100_000,
) -> DataFrame:
    """Approximate top-k by asymmetric distance computation (ADC) over PQ
    codes: score(q, x) = sum_m ||q_m - codebook[m][code_m(x)]||^2 — the
    query stays exact, the corpus is its codes.

    Scale shape: codebook AND queries broadcast; the per-subspace
    distance folds are precomputed into a per-query lookup table
    (``m * n_codes`` BIGINTs, query scale), so the corpus-side scan is
    map-only with an unrolled codegen integer sum of ``m`` lookups per
    candidate, followed by partition-local top-k and a rank shuffle of
    nparts*k rows per query — the same never-move-the-big-side plan as
    :func:`cosine_topk`, but reading m ints per vector instead of
    ``dim`` floats.

    Determinism: each per-subspace distance is floored to BIGINT
    nano-units (:func:`_l2fx_sql`); the sum over subspaces is integer —
    shuffle-order-free and DuckDB-reproducible. Returns
    ``(query_id, neighbor_id, adc_nano, rank)``.

    .. warning::
       The query table rides the BROADCAST side of the candidate scan
       (a BroadcastNestedLoopJoin by construction — every corpus code
       row meets every query LUT). That is the correct shape only while
       the query side is bounded: ``max_queries`` (default 100,000 —
       ~100 MB of LUTs at m=4/n_codes=16) raises instead of silently
       building an executor-OOM-scale broadcast at 100 TB. Raise it
       deliberately, or shard the query set and union the results.

    When no ``codebook`` is passed, the internally-trained one is
    ``persist()``-ed for the lifetime of the returned plan (it feeds both
    the encode pass and the query LUTs — unpersisted, training ran
    twice). It is released by ``spark.catalog.clearCache()`` or session
    end; long-lived sessions that call pq_topk repeatedly should clear
    the cache between calls, or train once and pass ``codebook``.
    """
    _assert_query_cap(queries, id_col, max_queries, "pq_topk")
    dsub = dim // m
    if codebook is None:
        # the codebook feeds BOTH the encode broadcast and the query LUT
        # broadcast — unpersisted, the whole training DAG ran twice
        # (two full ObjectHashAggregate subtrees in the r10 plan)
        codebook = pq_train_codebook(
            corpus, m=m, k=n_codes, dim=dim, n_iters=1,
            id_col=id_col, vec_col=vec_col,
        ).persist()
    codes = pq_encode(corpus, codebook, m=m, dim=dim, id_col=id_col, vec_col=vec_col)
    cent1 = F.broadcast(
        codebook.agg(
            F.array_sort(
                F.collect_list(F.struct("m", "cluster", "cv"))
            ).alias("__cents")
        )
    )
    # the per-subspace distance folds are hoisted into a per-query LUT
    # (|queries| * m * n_codes interpreted folds — query scale); the
    # per-candidate ADC below is then an unrolled codegen integer sum of
    # m lookups, so nothing interpreted runs at pair scale and the
    # centroid array never rides the candidate join
    q = F.broadcast(
        queries.select(
            F.col(id_col).alias("query_id"),
            F.expr(_as_double(vec_col)).alias("__qv"),
        )
        .join(cent1)
        .select(
            "query_id",
            F.expr(_adc_lut_sql("__qv", m, n_codes, dsub)).alias("__lut"),
        )
    )
    scored = (
        codes.join(q)
        .filter(F.col(id_col) != F.col("query_id"))
        .select(
            "query_id",
            F.col(id_col).alias("neighbor_id"),
            F.expr(_adc_lookup_sql(m, n_codes)).alias("adc_nano"),
        )
    )

    def partial_topk(batches):
        for pdf in batches:
            if len(pdf):
                yield (
                    pdf.sort_values(
                        ["query_id", "adc_nano", "neighbor_id"],
                        ascending=[True, True, True],
                    )
                    .groupby("query_id", sort=False)
                    .head(k)
                )

    pruned = scored.mapInPandas(
        partial_topk,
        ", ".join(
            f"{f.name} {f.dataType.simpleString()}" for f in scored.schema.fields
        ),
    )
    w = Window.partitionBy("query_id").orderBy(
        F.asc("adc_nano"), F.asc("neighbor_id")
    )
    return (
        pruned.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "adc_nano", "rank")
    )


def ivfpq_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    n_lists: int = 16,
    n_probe: int = 4,
    m: int = 4,
    n_codes: int = 16,
    dim: int = 64,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    max_queries: int = 100_000,
) -> DataFrame:
    """IVF-PQ with residual encoding — the FAISS-style index actually
    deployed at billion-vector scale: a coarse inverted file prunes the
    search to ``n_probe`` of ``n_lists`` cells, and within a cell each
    vector is only its ``m`` PQ codes over the RESIDUAL (v - coarse
    centroid), so the fine codebook spends its bits on the within-cell
    distribution instead of re-describing cell positions.

    Deterministic end to end: coarse centroids are the id-ordered
    relational folds of :func:`ivf_centroids_relational`; coarse
    assignment is the zero-Exchange broadcast-argmax; residuals are
    exact per-element subtractions; the fine codebook is the
    fixed-point Lloyd's of :func:`pq_train_codebook`; ADC distances are
    floored per-subspace BIGINTs summed as integers.

    Scale shape: every corpus pass is map-only against broadcast
    centroid/codebook rows (plan-asserted: no corpus Exchange before
    the rank stage); candidate scoring is an equi-join on ``list_id``
    against the broadcast probed-query table — candidate volume is
    ~corpus * n_probe / n_lists and each candidate is m ints, not dim
    floats. Returns (query_id, neighbor_id, adc_nano, rank).

    Recall is bounded by the coarse prune (measured on the synthetic
    sf0.01 embeddings: candidate ceiling 0.34@n_probe=4, 0.74@n_probe=8
    — identical under cosine or L2 coarse assignment) and further cut
    by the m*log2(n_codes)-bit code budget. Production composes this
    with an exact rerank of the ADC shortlist (request k' = 4-10x k,
    join the survivors back to their full vectors — the
    ``quantized_topk`` -> rerank pattern), which restores recall to the
    coarse ceiling while still scanning only codes.

    .. warning::
       The probed-query LUT table is broadcast (``n_probe`` LUT rows per
       query meet the corpus codes on a ``list_id`` equi-join); that is
       only safe while the query side is bounded — ``max_queries``
       (default 100,000) raises instead of building an unbounded
       broadcast. Raise deliberately or shard the query set.
    """
    _assert_query_cap(queries, id_col, max_queries, "ivfpq_topk")
    from pyspark import StorageLevel

    dsub = dim // m
    # model artifacts are tiny and reused across the corpus/query branches
    # — persist so coarse training runs ONCE, not once per consumer (a
    # production deployment writes them to parquet: save_centroids)
    cc = ivf_centroids_relational(corpus, id_col, vec_col, n_lists).persist()
    cc1 = F.broadcast(
        cc.agg(
            F.array_sort(F.collect_list(F.struct("list_id", "cv"))).alias("__cc")
        )
    )
    ranked = (
        "reverse(array_sort(transform(__cc, s -> "
        f"struct({_cosine_sql('__v', 's.cv')} as sim, -s.list_id as nlid))))"
    )
    lid_cv = "filter(__cc, s -> s.list_id = __lid)[0].cv"
    resid = (
        corpus.select(
            F.col(id_col).alias("__id"),
            F.expr(_as_double(vec_col)).alias("__v"),
        )
        .join(cc1)
        .select(
            "__id",
            "__v",
            "__cc",
            F.expr(f"(-{ranked}[0].nlid)").cast("int").alias("__lid"),
        )
        .select(
            "__id",
            "__lid",
            F.expr(f"zip_with(__v, {lid_cv}, (x, y) -> x - y)").alias("__r"),
        )
        # residuals feed BOTH codebook training and encoding — compute the
        # corpus-scale pass once (spills to disk past memory)
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    codebook = pq_train_codebook(
        resid, m=m, k=n_codes, dim=dim, n_iters=1, id_col="__id", vec_col="__r"
    ).persist()
    codes = pq_encode(
        resid, codebook, m=m, dim=dim, id_col="__id", vec_col="__r",
        keep_cols=("__lid",),
    )
    # queries: probe n_probe coarse lists, residual PER PROBED LIST,
    # then the per-(query, list) ADC lookup table — the fine-codebook
    # folds run |queries| * n_probe * m * n_codes times here (query
    # scale) so candidate scoring below is pure-codegen integer lookups
    # and neither the residual vector nor the centroid array rides the
    # candidate join (64 BIGINTs per probed query replace 64 doubles)
    cb1 = F.broadcast(
        codebook.agg(
            F.array_sort(
                F.collect_list(F.struct("m", "cluster", "cv"))
            ).alias("__cents")
        )
    )
    qprobe = F.broadcast(
        queries.select(
            F.col(id_col).alias("query_id"),
            F.expr(_as_double(vec_col)).alias("__v"),
        )
        .join(cc1)
        .select(
            "query_id",
            "__v",
            "__cc",
            F.explode(F.expr(f"slice({ranked}, 1, {n_probe})")).alias("__t"),
        )
        .select(
            "query_id",
            "__v",
            "__cc",
            (-F.col("__t.nlid")).cast("int").alias("__lid"),
        )
        .select(
            "query_id",
            "__lid",
            F.expr(f"zip_with(__v, {lid_cv}, (x, y) -> x - y)").alias("__qr"),
        )
        .join(cb1)
        .select(
            "query_id",
            "__lid",
            F.expr(_adc_lut_sql("__qr", m, n_codes, dsub)).alias("__lut"),
        )
    )
    scored = (
        codes.join(qprobe, on="__lid")
        .filter(F.col("__id") != F.col("query_id"))
        .select(
            "query_id",
            F.col("__id").alias("neighbor_id"),
            F.expr(_adc_lookup_sql(m, n_codes)).alias("adc_nano"),
        )
    )

    def partial_topk(batches):
        for pdf in batches:
            if len(pdf):
                yield (
                    pdf.sort_values(
                        ["query_id", "adc_nano", "neighbor_id"],
                        ascending=[True, True, True],
                    )
                    .groupby("query_id", sort=False)
                    .head(k)
                )

    pruned = scored.mapInPandas(
        partial_topk,
        ", ".join(
            f"{f.name} {f.dataType.simpleString()}" for f in scored.schema.fields
        ),
    )
    w = Window.partitionBy("query_id").orderBy(
        F.asc("adc_nano"), F.asc("neighbor_id")
    )
    return (
        pruned.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "adc_nano", "rank")
    )


def bitext_margin(
    df_a: DataFrame,
    df_b: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 4,
    top: int = 20,
) -> DataFrame:
    """Margin-based parallel-pair mining (the bitext-mining scorer of
    Artetxe & Schwenk 2019: a pair is strong when its similarity beats
    the average of each side's k nearest neighbors, penalizing hub
    vectors every candidate matches). Returns the global ``top``
    (a, b, cos_shift_nano, margin_ppm) pairs.

        margin = sim(x, y) / mean(kNN(x) ∪ kNN(y))

    computed here on SHIFTED fixed-point cosines (cos + 1, in nano
    units, so every quantity is a nonnegative BIGINT and the one
    division is integer ``div`` — floor == truncate on nonnegatives,
    bit-identical in any engine; the float variant would be
    shuffle-order-dependent).

    Plan shape: side A is broadcast against B (A is the smaller "query"
    side — the cosine_topk convention); the scored pair table is
    persisted once and re-read for both kNN denominators; per-side kNN
    windows are PARTITIONED by that side's id (parallel); the final
    top-k is TakeOrderedAndProject. At 100 TB the pair table comes from
    an ANN shortlist (ann_topk / ivfpq_topk candidates) instead of the
    dense product — the margin scoring below is unchanged.
    """
    from pyspark import StorageLevel
    from pyspark.sql import Window

    a = df_a.select(
        F.col(id_col).alias("a"), F.col(vec_col).alias("__va")
    )
    b = df_b.select(
        F.col(id_col).alias("b"), F.col(vec_col).alias("__vb")
    )
    pairs = (
        b.join(F.broadcast(a))
        .withColumn("__cos", cosine_sim_seq_pandas("__va", "__vb"))
        .select(
            "a",
            "b",
            F.expr(
                "cast(floor((__cos + 1.0) * 1000000000.0) as bigint)"
            ).alias("cos_shift_nano"),
        )
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    wa = Window.partitionBy("a").orderBy(
        F.desc("cos_shift_nano"), F.asc("b")
    )
    knn_a = (
        pairs.withColumn("__rn", F.row_number().over(wa))
        .filter(F.col("__rn") <= k)
        .groupBy("a")
        .agg(F.sum("cos_shift_nano").alias("__ka"))
    )
    wb = Window.partitionBy("b").orderBy(
        F.desc("cos_shift_nano"), F.asc("a")
    )
    knn_b = (
        pairs.withColumn("__rn", F.row_number().over(wb))
        .filter(F.col("__rn") <= k)
        .groupBy("b")
        .agg(F.sum("cos_shift_nano").alias("__kb"))
    )
    scored = (
        pairs.join(knn_a, on="a")
        .join(knn_b, on="b")
        .select(
            "a",
            "b",
            "cos_shift_nano",
            F.expr(
                f"(cos_shift_nano * {2 * k} * 1000000) div (__ka + __kb)"
            ).alias("margin_ppm"),
        )
    )
    return scored.orderBy(
        F.desc("margin_ppm"), F.asc("a"), F.asc("b")
    ).limit(top)


def knn_label_noise(
    emb: DataFrame,
    queries: DataFrame | None = None,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    label_col: str = "label",
    max_queries: int = 100_000,
) -> DataFrame:
    """Label-noise detection by k-NN label disagreement (the Deep-kNN /
    confident-learning-style audit): for each query vector, take its
    exact top-k cosine neighbors, majority-vote their labels (ties →
    smallest label), and flag vectors whose own label disagrees — the
    candidates a labeling team reviews first.

    AUDIT TIER — inherits :func:`cosine_topk`'s O(N·Q) brute force; run
    it on review samples, not the full corpus as queries. At 100× scale
    substitute an ANN shortlist (:func:`ivfpq_topk` + rerank) for the
    neighbor stage — the voting stage is unchanged.

    .. warning::
       The default ``queries=None`` self-audit mode uses the WHOLE
       ``emb`` table as the query set, and the exact kernel collects the
       query set to the driver — it raises ``ValueError`` above
       ``max_queries`` (default 100,000) rather than silently launching
       an O(N²) job. For larger tables pass an explicit review sample as
       ``queries``, raise ``max_queries`` deliberately, or build the
       neighbor stage from an ANN path and reuse the voting stage here.
       (Before r10 this path lazily broadcast the full table instead of
       raising — the cap is new and intentional.)

    Composes :func:`cosine_topk` (broadcast queries, partition-local
    top-k — the corpus is never shuffled), then joins the tiny
    queries×k neighbor table to labels and votes with one rank window
    over ≤k rows per query. Exact integer votes, deterministic ties.
    """
    q = queries if queries is not None else emb
    topk = cosine_topk(
        emb, q, k=k, id_col=id_col, vec_col=vec_col,
        max_queries=max_queries,
    )
    nb_labels = emb.select(
        F.col(id_col).alias("neighbor_id"), F.col(label_col).alias("n_label")
    )
    own = q.select(F.col(id_col).alias("query_id"), F.col(label_col).alias("label"))
    votes = (
        topk.join(nb_labels, on="neighbor_id")
        .groupBy("query_id", "n_label")
        .agg(F.count(F.lit(1)).alias("votes"))
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("votes"), F.asc("n_label"))
    maj = (
        votes.withColumn("__r", F.row_number().over(w))
        .filter(F.col("__r") == 1)
        .select(
            "query_id",
            F.col("n_label").alias("majority_label"),
            F.col("votes").alias("majority_votes"),
        )
    )
    return own.join(maj, on="query_id").select(
        F.col("query_id").alias(id_col),
        "label",
        "majority_label",
        "majority_votes",
        (F.col("label") != F.col("majority_label")).alias("flagged"),
    )


def matryoshka_eval(
    emb: DataFrame,
    queries: DataFrame,
    prefix_dims: "list[int]" = (16, 32),
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    max_queries: int = 100_000,
) -> DataFrame:
    """Matryoshka-truncation retrieval evaluation (Kusupati et al. 2022:
    MRL embeddings keep most retrieval quality in a prefix of the
    dimensions): for each candidate prefix length, recall@k of
    prefix-dim cosine top-k against the full-dim top-k ground truth —
    the measurement that decides how many dims the production index
    actually stores (a 4× dim cut at 0.95 recall is a 4× index-cost
    cut).

    One full-dim exact top-k (ground truth) + one prefix-dim top-k per
    candidate length — each the broadcast-queries/partition-local-top-k
    shape, corpus never shuffled; overlap joins on the tiny queries×k
    tables. Exact integer overlap counts, floored ppm recall.
    """
    truth = cosine_topk(
        emb, queries, k=k, id_col=id_col, vec_col=vec_col,
        max_queries=max_queries,
    ).select("query_id", "neighbor_id")
    n_q = queries.select(id_col).distinct().count()
    out = None
    for d in prefix_dims:
        dd = int(d)
        pe = emb.select(
            F.col(id_col), F.slice(F.col(vec_col), 1, dd).alias(vec_col)
        )
        pq = queries.select(
            F.col(id_col), F.slice(F.col(vec_col), 1, dd).alias(vec_col)
        )
        pk = cosine_topk(
            pe, pq, k=k, id_col=id_col, vec_col=vec_col,
            max_queries=max_queries,
        ).select("query_id", "neighbor_id")
        hits = (
            truth.join(pk, on=["query_id", "neighbor_id"])
            .agg(F.count(F.lit(1)).alias("overlap"))
            .select(
                F.lit(dd).alias("prefix_dim"),
                F.lit(int(n_q)).cast("long").alias("n_queries"),
                F.col("overlap").cast("long"),
                F.expr(f"(overlap * 1000000) div ({int(n_q)} * {int(k)})").alias(
                    "recall_ppm"
                ),
            )
        )
        out = hits if out is None else out.unionByName(hits)
    return out


def mmr_select(
    emb: DataFrame,
    query_id: int,
    k: int = 5,
    lam: float = 0.5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Maximal Marginal Relevance selection (Carbonell & Goldstein '98):
    greedily pick ``k`` vectors maximizing
    ``score = sim(cand, query) − λ·max_sel sim(cand, selected)`` — the
    diversity-aware retrieval that stops a result list collapsing onto
    near-duplicates. λ=0.5 (a binary fraction, so the one float product
    is IEEE-exact on identical cosine operands).

    Bounded ``k`` driver rounds (the greedy-coverage contract): each
    round scores candidates with ONE fold-order cosine against the
    broadcast query + a max over the ≤k-row selected table (broadcast
    join + combinable max), then TakeOrdered(1). The corpus is never
    shuffled; cosines are sequential folds, so an oracle replays them
    bit-for-bit.

    Returns one row per round: (round, id, sim_to_query, penalty,
    score) — penalty 0.0 for the first pick.
    """
    q = F.broadcast(
        emb.filter(F.col(id_col) == query_id).select(
            F.col(vec_col).alias("__qv")
        )
    )
    cands = (
        emb.filter(F.col(id_col) != query_id)
        .crossJoin(q)
        .select(
            F.col(id_col).alias("cid"),
            F.col(vec_col).alias("cv"),
            cosine_sim_seq_pandas(vec_col, "__qv").alias("sq"),
        )
        .localCheckpoint(eager=True)
    )
    spark = emb.sparkSession
    chosen_rows = []
    sel_ids: list = []
    for rnd in range(1, int(k) + 1):
        pool = cands
        if sel_ids:
            sel_df = F.broadcast(
                cands.filter(F.col("cid").isin(sel_ids)).select(
                    F.col("cid").alias("sid"), F.col("cv").alias("sv")
                )
            )
            pen = (
                cands.filter(~F.col("cid").isin(sel_ids))
                .crossJoin(sel_df)
                .withColumn("__ps", cosine_sim_seq_pandas("cv", "sv"))
                .groupBy("cid")
                .agg(F.max("__ps").alias("penalty"))
            )
            pool = (
                cands.filter(~F.col("cid").isin(sel_ids))
                .join(pen, on="cid")
                .withColumn(
                    "score", F.col("sq") - F.lit(float(lam)) * F.col("penalty")
                )
            )
        else:
            pool = cands.withColumn("penalty", F.lit(0.0)).withColumn(
                "score", F.col("sq")
            )
        top = (
            pool.orderBy(F.desc("score"), F.asc("cid")).limit(1).collect()[0]
        )
        sel_ids.append(top["cid"])
        chosen_rows.append(
            (rnd, top["cid"], top["sq"], top["penalty"], top["score"])
        )
    return spark.createDataFrame(
        chosen_rows,
        f"round int, {id_col} long, sim_to_query double, penalty double, "
        "score double",
    )


def ndcg_discounts_micro(k: int) -> "tuple[list[int], list[int]]":
    """Rank-discount constants for NDCG@k in integer micro-billionths:
    disc[i] = floor(1e9 / log2(i+2)) for rank i+1, plus prefix sums for
    the ideal DCG. Computed ONCE in Python and baked as literals into
    both the Spark plan and the DuckDB oracle — the log2 never runs in
    either engine, so libm-vs-JVM ulp drift can't leak into compared
    values (the round-2 fixed-point lesson)."""
    import math

    disc = [int(1_000_000_000 // math.log2(i + 2)) for i in range(k)]
    cum, acc = [], 0
    for d in disc:
        acc += d
        cum.append(acc)
    return disc, cum


def retrieval_eval(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    label_col: str = "label",
    max_queries: int = 100_000,
) -> DataFrame:
    """Label-relevance retrieval quality per query: exact cosine top-k
    (cosine_topk — queries broadcast, corpus never shuffled) scored as
    NDCG@k / MRR / precision / recall against same-label ground truth.

    AUDIT TIER — O(N·Q) by construction (the metric definitions need the
    TRUE top-k). Evaluate on a bounded query sample; to score an ANN
    index instead, pass its shortlist through the same scoring joins.

    Output per query: (query_id, n_rel_total, n_rel_topk,
    first_rel_rank, rr_ppm, dcg_micro, idcg_micro, ndcg,
    precision_at_k, recall_at_k).

    Exactness: gains are 0/1 label matches; discounts are the baked
    integer constants from ndcg_discounts_micro, so DCG/IDCG are exact
    BIGINT sums; MRR is integer ppm (1e6 div rank); ndcg / precision /
    recall are each ONE IEEE division of exact integers. The ideal DCG
    uses the label-histogram broadcast (n_rel_total = same-label corpus
    count minus self), not a second ranking pass.

    Scale: the ranked table is |queries| x k rows; the only corpus-sized
    work is the one broadcast-join scoring pass inside cosine_topk and
    the label histogram aggregate.
    """
    disc, cum = ndcg_discounts_micro(k)
    ranked = cosine_topk(
        corpus, queries, k=k, id_col=id_col, vec_col=vec_col,
        max_queries=max_queries,
    )
    nlab = corpus.select(
        F.col(id_col).alias("__nid"), F.col(label_col).alias("__nlab")
    )
    qlab = queries.select(
        F.col(id_col).alias("query_id"), F.col(label_col).alias("__qlab")
    )
    hist = corpus.groupBy(F.col(label_col).alias("__qlab")).agg(
        F.count(F.lit(1)).alias("__lab_total")
    )
    disc_arr = F.array(*[F.lit(d) for d in disc])
    cum_arr = F.array(*[F.lit(c) for c in cum])
    per_rank = (
        nlab.join(F.broadcast(ranked), nlab.__nid == ranked.neighbor_id)
        .join(F.broadcast(qlab), "query_id")
        .withColumn("__rel", (F.col("__nlab") == F.col("__qlab")).cast("int"))
    )
    per_q = per_rank.groupBy("query_id", "__qlab").agg(
        F.sum("__rel").cast("long").alias("n_rel_topk"),
        F.sum(F.col("__rel") * F.element_at(disc_arr, F.col("rank")))
        .cast("long")
        .alias("dcg_micro"),
        F.min(F.when(F.col("__rel") == 1, F.col("rank")))
        .cast("int")
        .alias("first_rel_rank"),
    )
    out = (
        per_q.join(F.broadcast(hist), "__qlab")
        .withColumn("n_rel_total", (F.col("__lab_total") - 1).cast("long"))
        .withColumn(
            "__m", F.least(F.lit(k), F.col("n_rel_total")).cast("int")
        )
        .withColumn(
            "idcg_micro",
            F.when(F.col("__m") > 0, F.element_at(cum_arr, F.col("__m")))
            .otherwise(F.lit(0))
            .cast("long"),
        )
        .withColumn(
            "rr_ppm",
            F.coalesce(
                F.expr("1000000 div first_rel_rank"), F.lit(0)
            ).cast("long"),
        )
        .withColumn(
            "ndcg",
            F.when(
                F.col("idcg_micro") > 0,
                F.col("dcg_micro").cast("double")
                / F.col("idcg_micro").cast("double"),
            ),
        )
        .withColumn(
            "precision_at_k",
            F.col("n_rel_topk").cast("double") / F.lit(float(k)),
        )
        .withColumn(
            "recall_at_k",
            F.when(
                F.col("n_rel_total") > 0,
                F.col("n_rel_topk").cast("double")
                / F.col("n_rel_total").cast("double"),
            ),
        )
    )
    return out.select(
        "query_id",
        "n_rel_total",
        "n_rel_topk",
        "first_rel_rank",
        "rr_ppm",
        "dcg_micro",
        "idcg_micro",
        "ndcg",
        "precision_at_k",
        "recall_at_k",
    )


# ---------------------------------------------------------------------------
# persisted IVF index lifecycle (build / probe / append)
# ---------------------------------------------------------------------------
#
# The production shape of ivf_topk: CREATE INDEX once, serve many probes.
# Centroids persist as a tiny parquet; postings persist PARTITIONED BY
# list_id, so a probe with n_probe lists reads exactly those partitions
# (PartitionFilters in the scan — plan-pinned in tests) and at 100 TB a
# query touches ~n_probe/n_lists of the corpus bytes. Appends assign only
# the NEW vectors against the saved centroids (map-only) and land as new
# files inside their list partitions — no index rebuild, the same
# append-only discipline as the log DataSource.


def build_ivf_index(
    corpus,
    path: str,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_lists: int = 16,
):
    """Train coarse centroids (driver-side deterministic sample — see
    train_ivf_centroids), persist ``{path}/centroids`` and the
    list-partitioned postings ``{path}/postings``. One map-only
    assignment pass + one partitioned write over the corpus."""
    spark = corpus.sparkSession
    cent = train_ivf_centroids(corpus, vec_col, id_col, n_lists)
    spark.createDataFrame(
        [(i, [float(x) for x in cent[i]]) for i in range(len(cent))],
        "list_id int, centroid array<double>",
    ).coalesce(1).write.mode("overwrite").parquet(f"{path}/centroids")
    assigned = ivf_assign(
        corpus.select(
            F.col(id_col).alias("vec_id"), F.col(vec_col).alias("embedding")
        ),
        cent,
        "embedding",
        n_probe=1,
    ).select("vec_id", "embedding", F.col("list_id")[0].alias("list_id"))
    assigned.write.partitionBy("list_id").mode("overwrite").parquet(
        f"{path}/postings"
    )


def load_ivf_centroids(spark, path: str):
    """The (n_lists, dim) centroid matrix back from ``{path}/centroids``."""
    import numpy as np

    rows = spark.read.parquet(f"{path}/centroids").orderBy("list_id").collect()
    return np.asarray([r["centroid"] for r in rows], dtype=np.float64)


def ivf_index_append(
    spark,
    path: str,
    new_vectors,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
):
    """Incremental index maintenance: assign ONLY the new vectors against
    the saved centroids (map-only) and append into their list partitions
    — no rebuild, no read of existing postings."""
    cent = load_ivf_centroids(spark, path)
    assigned = ivf_assign(
        new_vectors.select(
            F.col(id_col).alias("vec_id"), F.col(vec_col).alias("embedding")
        ),
        cent,
        "embedding",
        n_probe=1,
    ).select("vec_id", "embedding", F.col("list_id")[0].alias("list_id"))
    assigned.write.partitionBy("list_id").mode("append").parquet(
        f"{path}/postings"
    )


def ivf_index_probe(
    spark,
    path: str,
    queries,
    k: int = 10,
    n_probe: int = 4,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
):
    """Serve top-k from the persisted index. Query lists come from the
    broadcast centroid matrix; the postings scan filters on the probed
    list ids (set size ≤ n_lists — collected bounded), which Spark turns
    into partition pruning: only the probed directories are read. Same
    output contract and scoring fold as ivf_topk."""
    cent = load_ivf_centroids(spark, path)
    q = ivf_assign(
        queries.select(
            F.col(id_col).alias("query_id"), F.col(vec_col).alias("__qv")
        ),
        cent,
        "__qv",
        n_probe=n_probe,
    ).select("query_id", "__qv", F.explode("list_id").alias("list_id"))
    probe_lists = sorted(
        {r["list_id"] for r in q.select("list_id").distinct().collect()}
    )
    postings = (
        spark.read.parquet(f"{path}/postings")
        .filter(F.col("list_id").isin(probe_lists))
        .select(F.col("vec_id").alias("neighbor_id"), "embedding", "list_id")
    )
    scored = (
        postings.join(F.broadcast(q), on="list_id")
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .withColumn("cosine", cosine_sim_pandas("embedding", "__qv"))
        .select("query_id", "neighbor_id", "cosine")
    )

    def partial_topk(batches):
        for pdf in batches:
            if len(pdf):
                yield (
                    pdf.sort_values(
                        ["query_id", "cosine", "neighbor_id"],
                        ascending=[True, False, True],
                    )
                    .groupby("query_id", sort=False)
                    .head(k)
                )

    pruned = scored.mapInPandas(
        partial_topk,
        ", ".join(
            f"{f.name} {f.dataType.simpleString()}" for f in scored.schema.fields
        ),
    )
    w = Window.partitionBy("query_id").orderBy(
        F.desc("cosine"), F.asc("neighbor_id")
    )
    return (
        pruned.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "cosine", "rank")
    )
