"""Byte-pair-encoding tokenizer: train + distributed apply.

The original subword BPE (Sennrich et al. 2016, public): learn merge
rules from word frequencies, then greedily apply them by rank. Training
follows the repo's bounded-deterministic-sample pattern (pq_train /
quality_clf): word frequencies come from ONE distributed aggregation
(explode + groupBy — the corpus is never collected), then the merge loop
runs driver-side over the capped vocabulary, which is what bounds BPE
training cost in every practical implementation.

Encoding is a pandas UDF with the merge table broadcast as a plain dict
and a per-worker word->tokens memo — real corpora repeat words heavily,
so the amortized cost per token approaches a dict lookup.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

EOW = "</w>"


def _word_freqs(df: DataFrame, text_col: str, max_words: int) -> list:
    """(word, count) for the `max_words` most frequent words —
    deterministic (count desc, word asc) so training is reproducible on
    any cluster size. One explode + one groupBy."""
    toks = F.explode(F.filter(
        F.split(F.lower(F.trim(F.col(text_col))), r"\s+"),
        lambda t: t != "")).alias("w")
    rows = (df.select(toks).groupBy("w")
            .agg(F.count(F.lit(1)).alias("c"))
            .orderBy(F.col("c").desc(), F.col("w"))
            .limit(max_words).collect())
    return [(r["w"], r["c"]) for r in rows]


def bpe_train(df: DataFrame, text_col: str = "text",
              num_merges: int = 200, max_words: int = 10_000) -> list:
    """Learn `num_merges` merge rules [(left, right), ...] ordered by
    rank. Ties in pair frequency break lexicographically — determinism
    over argmax-by-arrival."""
    vocab = {tuple(w) + (EOW,): c for w, c in _word_freqs(df, text_col,
                                                          max_words)}
    merges: list = []
    for _ in range(num_merges):
        pairs: dict = {}
        for sym, c in vocab.items():
            for i in range(len(sym) - 1):
                p = (sym[i], sym[i + 1])
                pairs[p] = pairs.get(p, 0) + c
        if not pairs:
            break
        # deterministic tie-break: highest count, then lexicographically
        # smallest pair
        best_pair = min(pairs.items(), key=lambda kv: (-kv[1], kv[0]))[0]
        if pairs[best_pair] < 2:
            break
        merges.append(best_pair)
        merged = "".join(best_pair)
        new_vocab: dict = {}
        for sym, c in vocab.items():
            out = []
            i = 0
            while i < len(sym):
                if (i < len(sym) - 1
                        and (sym[i], sym[i + 1]) == best_pair):
                    out.append(merged)
                    i += 2
                else:
                    out.append(sym[i])
                    i += 1
            new_vocab[tuple(out)] = new_vocab.get(tuple(out), 0) + c
        vocab = new_vocab
    return merges


def encode_word(word: str, ranks: dict) -> list:
    """Greedy rank-ordered merge of one word (the canonical BPE apply)."""
    sym = list(word) + [EOW]
    while len(sym) > 1:
        best_i, best_r = -1, None
        for i in range(len(sym) - 1):
            r = ranks.get((sym[i], sym[i + 1]))
            if r is not None and (best_r is None or r < best_r):
                best_i, best_r = i, r
        if best_i < 0:
            break
        sym[best_i:best_i + 2] = [sym[best_i] + sym[best_i + 1]]
    return sym


def bpe_encode(text: Column, merges: list) -> Column:
    """array<string> of BPE tokens. The merge table rides to executors in
    the UDF closure as a rank dict; a per-worker word memo makes repeated
    words one lookup."""
    ranks = {tuple(p): i for i, p in enumerate(merges)}

    @F.pandas_udf(T.ArrayType(T.StringType()))
    def fn(s):
        import pandas as pd
        memo: dict = {}

        def enc(text):
            if text is None:
                return None
            out = []
            for w in text.lower().strip().split():
                toks = memo.get(w)
                if toks is None:
                    toks = memo[w] = encode_word(w, ranks)
                out.extend(toks)
            return out
        return s.map(enc)
    return fn(text)


def bpe_token_count(text: Column, merges: list) -> Column:
    """Token count under the trained tokenizer — the real version of the
    whitespace/regex token estimators in operators/text.py."""
    return F.size(bpe_encode(text, merges))
