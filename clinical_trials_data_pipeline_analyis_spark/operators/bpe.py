"""Distributed BPE (byte-pair-encoding) tokenizer training primitives.

The tokenizer-training surface of an LLM data pipeline: count adjacent
symbol pairs over the corpus word-frequency dictionary, pick the most
frequent pair, merge it everywhere, repeat (Sennrich et al., "Neural
Machine Translation of Rare Words with Subword Units", ACL 2016 — the
algorithm HuggingFace `tokenizers` BPE trainer implements).

100 TB shape
------------
The classic trick IS the scale design: training never iterates over the
corpus. One corpus pass builds the word-frequency dictionary (a shuffle
whose key cardinality is |distinct words|, millions — not |tokens|,
trillions); every merge iteration then runs over the DICTIONARY:

- pair counting is a row-local explode of each word's symbol array
  followed by a map-side-combinable sum keyed on (left, right) — the
  shuffle carries distinct pairs only;
- the argmax pair is a 1-row aggregate (bounded driver action, same
  pattern as the k-means loop in operators/similarity.py);
- applying the merge is a row-local array fold — no shuffle at all.

Lineage is truncated with localCheckpoint every few iterations (the
symbol column otherwise accumulates one nested fold per merge and plan
compilation becomes the bottleneck — same discipline as the CC loop in
operators/dedup.py).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F
from ..checkpoint import cut_lineage

from ..functions.text import normalized_text, whitespace_tokens


def word_frequency_dict(
    docs: DataFrame, text_col: str = "text"
) -> DataFrame:
    """(word, freq) — the corpus word-frequency dictionary BPE trains on.

    The ONLY corpus-scale pass in BPE training; everything downstream
    touches distinct words.
    """
    return (
        docs.select(
            F.explode(
                whitespace_tokens(normalized_text(F.col(text_col)))
            ).alias("word")
        )
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("freq"))
    )


def adjacent_pair_counts(
    symbols: DataFrame, sym_col: str = "symbols", freq_col: str = "freq"
) -> DataFrame:
    """Weighted adjacent-pair counts over a (symbol-array, freq) dict.

    Row-local pair extraction (transform over an index sequence — no
    posexplode self-join), then one map-side-combinable sum keyed on the
    pair. Returns (left_sym, right_sym, pair_count).
    """
    pairs = symbols.filter(F.size(sym_col) >= 2).select(
        F.explode(
            F.expr(
                f"transform(sequence(1, size({sym_col}) - 1),"
                f" i -> struct(element_at({sym_col}, i) as left_sym,"
                f"             element_at({sym_col}, i + 1) as right_sym))"
            )
        ).alias("p"),
        F.col(freq_col),
    )
    return (
        pairs.select("p.left_sym", "p.right_sym", freq_col)
        .groupBy("left_sym", "right_sym")
        .agg(F.sum(freq_col).cast("long").alias("pair_count"))
    )


def merge_pair_expr(sym_col: str, left: str, right: str) -> Column:
    """Row-local greedy left-to-right merge of (left, right) in a symbol
    array: ["a","a","a"] under merge (a,a) -> ["aa","a"], exactly the
    non-overlapping replacement classic BPE performs.

    Implemented as an array fold (F.aggregate): append each symbol,
    except when the accumulator ends with ``left`` and the incoming
    symbol is ``right`` — then replace the tail with the merged symbol.
    A just-merged tail never re-matches ``left`` unless the merged
    string equals it, which is impossible (merged is strictly longer).
    """
    l, r = F.lit(left), F.lit(right)
    return F.aggregate(
        F.col(sym_col),
        F.array().cast("array<string>"),
        lambda acc, s: F.when(
            (F.size(acc) >= 1)
            & (F.element_at(acc, -1) == l)
            & (s == r),
            F.concat(
                F.slice(acc, 1, F.size(acc) - 1),
                F.array(F.concat(l, r)),
            ),
        ).otherwise(F.concat(acc, F.array(s))),
    )


def bpe_train(
    docs: DataFrame,
    n_merges: int,
    text_col: str = "text",
    checkpoint_every: int = 4,
) -> tuple[list[tuple[str, str, int]], DataFrame]:
    """Train ``n_merges`` BPE merges over the corpus.

    Returns (merges, final_dict): ``merges`` is the learned list of
    (left, right, pair_count) in merge order; ``final_dict`` is the
    word-frequency dictionary with its post-merge symbol arrays
    (word, freq, symbols).

    Ties break on (left, right) lexicographically so training is
    deterministic and engine-reproducible. Stops early when no pair
    occurs at least twice (merging singletons is vocabulary noise).

    Driver actions per iteration: one 1-row collect (the argmax pair) —
    the same bounded pattern as the k-means training loop.
    """
    wf = word_frequency_dict(docs, text_col=text_col)
    current = wf.select(
        "word",
        "freq",
        F.expr(
            "transform(sequence(1, length(word)), i -> substr(word, i, 1))"
        ).alias("symbols"),
    ).transform(cut_lineage())

    merges: list[tuple[str, str, int]] = []
    for it in range(n_merges):
        best = (
            adjacent_pair_counts(current)
            .orderBy(F.desc("pair_count"), "left_sym", "right_sym")
            .limit(1)
            .collect()
        )
        if not best or best[0]["pair_count"] < 2:
            break
        left, right, cnt = (
            best[0]["left_sym"],
            best[0]["right_sym"],
            int(best[0]["pair_count"]),
        )
        merges.append((left, right, cnt))
        current = current.select(
            "word", "freq", merge_pair_expr("symbols", left, right).alias("symbols")
        )
        if (it + 1) % checkpoint_every == 0:
            current = current.transform(cut_lineage())
    return merges, current


def encode_with_merges(
    docs: DataFrame,
    merges: list[tuple[str, str, int]],
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Apply a trained merge list to a corpus: (id_col, tokens) where
    each word is segmented by replaying the merges in order — entirely
    row-local (the inference half of BPE; no shuffle, no state)."""
    out = docs.select(
        F.col(id_col),
        F.explode(
            whitespace_tokens(normalized_text(F.col(text_col)))
        ).alias("word"),
    ).select(
        id_col,
        "word",
        F.expr(
            "transform(sequence(1, length(word)), i -> substr(word, i, 1))"
        ).alias("symbols"),
    )
    for left, right, _ in merges:
        out = out.select(
            id_col, "word", merge_pair_expr("symbols", left, right).alias("symbols")
        )
    return out.select(id_col, "word", F.col("symbols").alias("tokens"))


def top_pair_candidates(
    docs: DataFrame, k: int = 20, text_col: str = "text"
) -> DataFrame:
    """The first BPE training step as a ranked table: top-k adjacent
    character pairs by corpus-weighted count (the merge candidates).

    Global ROW_NUMBER is over the tiny aggregated pair table (|alphabet|²
    rows at most), not the corpus — the single-partition window is
    bounded by construction.
    """
    wf = word_frequency_dict(docs, text_col=text_col)
    syms = wf.select(
        "word",
        "freq",
        F.expr(
            "transform(sequence(1, length(word)), i -> substr(word, i, 1))"
        ).alias("symbols"),
    )
    counts = adjacent_pair_counts(syms)
    w = Window.orderBy(F.desc("pair_count"), "left_sym", "right_sym")
    return (
        counts.withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= k)
        .select("left_sym", "right_sym", "pair_count", "rank")
    )
