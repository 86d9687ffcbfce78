"""Streaming weighted sampling without replacement in BOUNDED state.

The batch operator (``pipeline.sampling.weighted_sample_exact_k``,
sequential Poisson / priority sampling) is one-pass by construction:
a row's priority ``u/weight`` is a pure function of the row, and the
sample is the k smallest priorities seen so far. That makes the
streaming form a bounded-state top-k — the classic weighted reservoir
(Efraimidis-Spirakis A-ES family, here with the deterministic
hash-uniform of the batch operator so stream == batch EXACTLY on the
same data).

Scale shape: rows are salted into ``n_groups`` state groups
(one ``applyInPandasWithState`` group each, k rows of state apiece —
state is ``n_groups * k`` rows total, never proportional to the
stream); each trigger every group that saw data emits its refreshed
candidate top-k as an ACCUMULATING pane. The FINAL sample is the k
smallest priorities across groups' latest panes — ``merged_sample``
does that selection on the sink table; it is exactly the batch
operator's answer because min-k distributes over any partition of the
input (min-k of per-group min-ks == global min-k).

Reference anchor: the reference's stateful-processor pattern
(KeyValueStore + per-message process(); samza-api/.../storage/kv/
KeyValueStore.java:40) is the runtime this operator would occupy there;
Spark-first it is one stateful grouped map with explicit bounded state.
"""

from __future__ import annotations

import json
from typing import Iterable, Iterator

import pandas as pd
from pyspark.sql import DataFrame, functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

OUT_DDL = (
    "grp int, pane_seq int, pos int, id string, weight double, priority double"
)


def streaming_weighted_sample(
    df: DataFrame,
    k: int,
    weight_col: str,
    id_col: str = "doc_id",
    salt: str = "wsample0",
    n_groups: int = 8,
) -> DataFrame:
    """Continuous exactly-``k`` weighted sample over an unbounded
    stream. Emits per-group candidate panes (``grp, pane_seq, pos, id,
    weight, priority``); reduce the sink with :func:`merged_sample` for
    the current global sample. Rows with non-positive weight are
    excluded (as in the batch form). State: ``n_groups * k`` rows,
    no timeout (the sample covers the whole stream's lifetime).
    """
    u = F.expr(
        f"cast(conv(substr(md5(concat('{salt}', '|', "
        f"cast({id_col} as string))), 1, 13), 16, 10) as bigint) + 1"
    )
    pri = (u.cast("double") / F.col(weight_col).cast("double")).alias("__pri")
    grp = F.pmod(F.xxhash64(F.col(id_col).cast("string")), F.lit(int(n_groups))).cast(
        "int"
    )
    scored = (
        df.filter(F.col(weight_col).cast("double") > 0)
        .select(
            grp.alias("__grp"),
            F.col(id_col).cast("string").alias("__id"),
            F.col(weight_col).cast("double").alias("__w"),
            pri,
        )
    )

    def fn(
        key, pdf_iter: Iterable[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        g = int(key[0])
        if state.exists:
            st = json.loads(state.get[0])
        else:
            st = {"top": [], "seq": 0}
        top = st["top"]  # list of [priority, id, weight], k smallest
        got = False
        for pdf in pdf_iter:
            if pdf.empty:
                continue
            got = True
            # map-side combine inside the Arrow chunk: only the chunk's
            # own k smallest can enter the state
            cand = pdf.nsmallest(k, "__pri")
            top.extend(
                [float(p), str(i), float(w)]
                for p, i, w in zip(cand["__pri"], cand["__id"], cand["__w"])
            )
            # (priority, id) total order mirrors the batch tie-break
            top.sort(key=lambda t: (t[0], t[1]))
            del top[k:]
        out = []
        if got:
            out = [
                {
                    "grp": g,
                    "pane_seq": st["seq"],
                    "pos": i,
                    "id": t[1],
                    "weight": t[2],
                    "priority": t[0],
                }
                for i, t in enumerate(top)
            ]
            st["seq"] += 1
            st["top"] = top
            state.update((json.dumps(st),))
        yield pd.DataFrame(
            out, columns=["grp", "pane_seq", "pos", "id", "weight", "priority"]
        )

    return scored.groupBy("__grp").applyInPandasWithState(
        fn,
        OUT_DDL,
        "payload string",
        "append",
        GroupStateTimeout.NoTimeout,
    )


def merged_sample(sink_df: DataFrame, k: int) -> DataFrame:
    """Current global sample from the pane sink: latest pane per group,
    then the ``k`` smallest priorities across groups (identical to the
    batch operator's answer on the same rows — min-k distributes over
    the group partition). Batch DataFrame in, batch DataFrame out."""
    latest = (
        sink_df.groupBy("grp")
        .agg(F.max("pane_seq").alias("pane_seq"))
        .select(F.col("grp").alias("__lg"), F.col("pane_seq").alias("__lp"))
    )
    return (
        sink_df.join(
            latest,
            (F.col("grp") == F.col("__lg")) & (F.col("pane_seq") == F.col("__lp")),
        )
        .orderBy(F.col("priority").asc(), F.col("id").asc())
        .limit(int(k))
        .select("id", "weight", "priority")
    )
