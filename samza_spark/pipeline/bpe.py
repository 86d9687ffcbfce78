"""Distributed BPE vocabulary learning and tokenization.

The public algorithm (Sennrich et al. 2016, "Neural Machine Translation
of Rare Words with Subword Units"; the GPT-2 tokenizer trains the same
way): collapse the corpus to a word-frequency table, then repeatedly
(1) count adjacent symbol pairs weighted by word frequency, (2) merge
the most frequent pair everywhere. Only step 0 touches the corpus; the
loop runs over the aggregated word table, which is vocabulary-sized
(~millions of rows at 100 TB) — exactly why BPE training scales: the
100 TB corpus is read ONCE for the word count, and each merge iteration
is a small map + aggregate over the word table.

Spark-first re-expression:

- the word table is one groupBy shuffle over the tokenized corpus;
- each iteration's pair count is one map-side explode + one small
  aggregate; the argmax is a ``LIMIT 1`` collected to the driver (one
  row per iteration — the only driver traffic, and inherently so: the
  chosen merge is global sequential state);
- applying a merge is a map-only string ``replace`` over the word
  table: words are stored as DOUBLE-separator-joined symbol strings
  (``⟂⟂a⟂⟂b⟂⟂``), and replacing ``⟂l⟂⟂r⟂`` with ``⟂lr⟂`` implements
  the exact greedy left-to-right non-overlapping BPE merge — each match
  consumes one separator from each boundary and leaves the other, so
  consecutive merge sites ("a a a a" with merge (a,a)) all fire in one
  pass, while partial-symbol matches ("a bc" with merge (a,b)) cannot.
  This keeps both learning and tokenization in pure string built-ins —
  no UDF, no regex (and therefore no RE2-vs-Java lookahead divergence),
  and a DuckDB oracle replays every merge decision by unrolling the
  loop into chained CTEs;
- lineage is truncated with ``localCheckpoint`` every few iterations so
  n_merges chained ``replace`` expressions never build an unbounded
  plan.

Tokenizing a corpus with a learned merge list is a single map-only
projection: the n_merges ``replace`` calls compose into one expression
per document — the 100 TB shape (no shuffle, no state, no Python).

Tie-breaking is fully deterministic: (pair count DESC, left ASC, right
ASC) with binary string ordering.

Reference anchor: the word-count + iterate-on-aggregated-state shape is
the reference's partitionBy + aggregate + bootstrap-table pattern
(samza-api/.../operators/MessageStream.java:50; bootstrap streams in
samza-core); BPE training is the training-pipeline capability built on
it.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from samza_spark.pipeline.text import normalized

SEP = "\x1f"  # ASCII unit separator — never appears in whitespace-split words


def _word_table(df: DataFrame, text_col: str, eow: "str | None" = None) -> DataFrame:
    """(word, freq, rep) — the corpus collapsed to word frequencies, with
    each word exploded into its double-separator symbol string (initial
    symbols = characters, plus the optional end-of-word marker symbol —
    the Sennrich '</w>' convention, which lets merges distinguish
    word-final from word-internal contexts)."""
    toks = F.filter(
        F.split(normalized(F.coalesce(F.col(text_col), F.lit(""))), " "),
        lambda x: x != "",
    )
    # '⟂⟂' + every char followed by '⟂⟂' == '⟂⟂c1⟂⟂c2⟂⟂…'
    rep = F.concat(
        F.lit(SEP + SEP), F.regexp_replace(F.col("word"), "(.)", "$1" + SEP + SEP)
    )
    if eow:
        rep = F.concat(rep, F.lit(eow + SEP + SEP))
    return (
        df.select(F.explode(toks).alias("word"))
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("freq"))
        .withColumn("rep", rep)
    )


def _pair_counts(words: DataFrame) -> DataFrame:
    """(left, right, cnt) adjacent-symbol pair counts weighted by word
    frequency. Overlapping occurrences all count ('aaa' contributes
    (a,a) twice), matching the reference algorithm."""
    syms = F.filter(F.split(F.col("rep"), SEP + SEP), lambda x: x != "")
    pairs = F.expr(
        "transform(if(size(__syms) >= 2, sequence(1, size(__syms) - 1), array()), "
        "i -> struct(__syms[i - 1] AS l, __syms[i] AS r))"
    )
    return (
        words.select("freq", syms.alias("__syms"))
        .select("freq", F.explode(pairs).alias("p"))
        .groupBy("p.l", "p.r")
        .agg(F.sum("freq").alias("cnt"))
    )


def _apply_merge(words: DataFrame, left: str, right: str) -> DataFrame:
    """Map-only greedy merge of (left, right) in every word's rep."""
    return words.withColumn(
        "rep",
        F.replace(
            F.col("rep"),
            F.lit(SEP + left + SEP + SEP + right + SEP),
            F.lit(SEP + left + right + SEP),
        ),
    )


def learn_bpe(
    df: DataFrame,
    text_col: str = "text",
    n_merges: int = 8,
    min_count: int = 2,
    checkpoint_every: int = 4,
    eow: "str | None" = None,
    target_vocab: int | None = None,
) -> "list[tuple[int, str, str, str, int]]":
    """Learn ``n_merges`` BPE merges from the corpus. Returns the merge
    table ``[(step, left, right, merged, pair_count), ...]`` in learned
    order; stops early when the best remaining pair occurs fewer than
    ``min_count`` times.

    Driver traffic is exactly one row per iteration (the argmax pair) —
    the sequential decision that defines the algorithm. Everything else
    is distributed: corpus-scale work happens once (the word count);
    each iteration touches only the vocabulary-sized word table.

    ``eow`` appends an end-of-word marker symbol to every word (pass a
    character that cannot appear in the text, e.g. ``"\x17"``) so the
    model learns word-final merges separately — the Sennrich ``</w>``
    convention. Tokenization must use the same marker.

    ``target_vocab`` bounds the final vocabulary: each merge adds one
    symbol to the initial alphabet (distinct characters + the marker),
    so learning stops once ``alphabet + merges`` reaches the target —
    the standard way tokenizer training is sized (e.g. "32k vocab").
    """
    words = _word_table(df, text_col, eow=eow).localCheckpoint()
    budget = n_merges
    if target_vocab is not None:
        alphabet = (
            words.select(
                F.explode(F.filter(F.split("rep", SEP + SEP), lambda x: x != "")).alias("s")
            )
            .distinct()
            .count()
        )
        budget = min(n_merges, max(0, target_vocab - alphabet))
    merges: list[tuple[int, str, str, str, int]] = []
    for step in range(1, budget + 1):
        best = (
            _pair_counts(words)
            .orderBy(F.desc("cnt"), F.asc("l"), F.asc("r"))
            .limit(1)
            .collect()
        )
        if not best or best[0]["cnt"] < min_count:
            break
        l, r, cnt = best[0]["l"], best[0]["r"], int(best[0]["cnt"])
        merges.append((step, l, r, l + r, cnt))
        words = _apply_merge(words, l, r)
        if step % checkpoint_every == 0:
            words = words.localCheckpoint()
    return merges


def bpe_merge_table(
    spark: SparkSession, merges: "list[tuple[int, str, str, str, int]]"
) -> DataFrame:
    return spark.createDataFrame(
        merges, "step int, left string, right string, merged string, pair_count bigint"
    )


def bpe_tokenize(
    df: DataFrame,
    merges: "list[tuple[int, str, str, str, int]]",
    text_col: str = "text",
    id_col: str = "doc_id",
    eow: "str | None" = None,
) -> DataFrame:
    """Tokenize every document with a learned merge list. Returns
    ``(id, n_words, n_bpe_tokens, bpe_text)`` where ``bpe_text`` joins
    the subword tokens with spaces.

    One map-only projection: per word, the n_merges ``replace`` calls
    compose into a single expression — no shuffle, no state, the plan a
    100 TB tokenization pass needs. (Word-level dedup before applying
    merges — tokenize distinct words, then re-join — is a further
    optimization when the type/token ratio is low; at the typical
    web-corpus ratio the plain map wins by skipping the shuffle.)
    """
    toks = F.filter(
        F.split(normalized(F.coalesce(F.col(text_col), F.lit(""))), " "),
        lambda x: x != "",
    )

    def word_rep(w):
        rep = F.concat(F.lit(SEP + SEP), F.regexp_replace(w, "(.)", "$1" + SEP + SEP))
        if eow:
            rep = F.concat(rep, F.lit(eow + SEP + SEP))
        for _, l, r, _, _ in merges:
            rep = F.replace(
                rep,
                F.lit(SEP + l + SEP + SEP + r + SEP),
                F.lit(SEP + l + r + SEP),
            )
        return rep

    # per word: '⟂⟂s1⟂⟂s2⟂⟂' -> 's1 s2'; documents join words with spaces
    reps = F.transform(toks, lambda w: word_rep(w))
    sym_lists = F.transform(
        reps, lambda rp: F.filter(F.split(rp, SEP + SEP), lambda x: x != "")
    )
    return df.select(
        F.col(id_col).alias(id_col),
        F.size(toks).cast("long").alias("n_words"),
        F.aggregate(
            sym_lists, F.lit(0), lambda acc, s: acc + F.size(s), lambda acc: acc
        )
        .cast("long")
        .alias("n_bpe_tokens"),
        F.array_join(F.transform(sym_lists, lambda s: F.array_join(s, " ")), " ").alias(
            "bpe_text"
        ),
    )


def save_merges(
    spark: SparkSession, merges: "list[tuple[int, str, str, str, int]]", path: str
) -> None:
    """Persist a learned merge table as parquet — train once, tokenize
    everywhere (the artifact a 100 TB tokenization job broadcasts)."""
    bpe_merge_table(spark, merges).write.mode("overwrite").parquet(path)


def load_merges(
    spark: SparkSession, path: str
) -> "list[tuple[int, str, str, str, int]]":
    """Load a persisted merge table in learned (step) order."""
    rows = spark.read.parquet(path).orderBy("step").collect()
    return [
        (r["step"], r["left"], r["right"], r["merged"], r["pair_count"]) for r in rows
    ]
