"""Real byte-pair-encoding tokenization (Sennrich et al. 2016) — the
learned upgrade to ``text.token_stats``'s whitespace + BPE-ish-regex
counts (token budgets computed with a real subword vocab track the
training tokenizer far more closely).

Scale shape:

- **Training** is the classic word-frequency formulation: the corpus
  collapses to a ``(word, count)`` table in ONE map-side-combinable
  aggregate, the top ``max_vocab_words`` rows (a bounded driver collect,
  like ``pq_train``'s sample) feed the standard greedy merge loop
  driver-side. The corpus is never re-scanned per merge — merges operate
  on the word-frequency dict exactly as reference BPE trainers do.
- **Encoding** applies the ordered merge list per word with a word-level
  memo (Zipf: a few thousand distinct words cover almost all tokens) in
  an Arrow-batched ``mapInPandas`` — the multimodal-decoder category of
  justified Python; a Column formulation would need data-dependent
  iteration Spark expressions cannot express.

Determinism: word counts are exact, ties in the merge loop break
lexicographically, so every run (and every executor) derives the same
vocabulary — merges are plain JSON-serializable lists the caller
persists/ships.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from .text import tokens

__all__ = ["train_bpe", "bpe_segment_word", "bpe_encode", "bpe_token_stats"]

_EOW = "</w>"


def train_bpe(
    df: DataFrame,
    text_col: str = "text",
    num_merges: int = 200,
    max_vocab_words: int = 50_000,
) -> list:
    """Learn ``num_merges`` BPE merges from the corpus; returns an ordered
    list of ``[left, right]`` string pairs (JSON-serializable).

    Words are the engine's normalized ``tokens()`` (lowercased
    alphanumeric), each terminated with ``</w>`` so merges cannot cross
    word boundaries. Pair counts are weighted by word frequency; the most
    frequent pair merges each round, ties to the lexicographically
    smallest pair.
    """
    if num_merges < 1:
        raise ValueError("num_merges must be >= 1")
    counts = (
        df.select(F.explode(tokens(F.col(text_col))).alias("w"))
        .groupBy("w")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy(F.desc("n"), F.asc("w"))
        .limit(max_vocab_words)
        .collect()
    )
    if not counts:
        raise ValueError("corpus has no tokens to train on")
    # word -> (symbol tuple, frequency)
    vocab: dict[tuple, int] = {}
    for r in counts:
        vocab[tuple(r["w"]) + (_EOW,)] = r["n"]

    merges: list[list[str]] = []
    for _ in range(num_merges):
        pairs: dict[tuple, int] = {}
        for syms, n in vocab.items():
            for a, b in zip(syms, syms[1:]):
                pairs[(a, b)] = pairs.get((a, b), 0) + n
        if not pairs:
            break
        best = min(pairs.items(), key=lambda kv: (-kv[1], kv[0]))[0]
        if pairs[best] < 2:
            break  # nothing repeats: further merges are noise
        merges.append([best[0], best[1]])
        merged = best[0] + best[1]
        new_vocab: dict[tuple, int] = {}
        for syms, n in vocab.items():
            out = []
            i = 0
            while i < len(syms):
                if (i + 1 < len(syms)
                        and syms[i] == best[0] and syms[i + 1] == best[1]):
                    out.append(merged)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            key = tuple(out)
            new_vocab[key] = new_vocab.get(key, 0) + n
        vocab = new_vocab
    return merges


def bpe_segment_word(word: str, ranks: dict) -> list[str]:
    """Segment one word with a ``{(left, right): rank}`` merge table —
    repeatedly apply the lowest-rank applicable merge (the standard
    greedy BPE encoder)."""
    syms = list(word) + [_EOW]
    while len(syms) > 1:
        best_rank, best_i = None, None
        for i, pair in enumerate(zip(syms, syms[1:])):
            r = ranks.get(pair)
            if r is not None and (best_rank is None or r < best_rank):
                best_rank, best_i = r, i
        if best_i is None:
            break
        syms[best_i:best_i + 2] = [syms[best_i] + syms[best_i + 1]]
    return syms


def bpe_encode(
    df: DataFrame,
    merges: list,
    text_col: str = "text",
    out_col: str = "bpe_tokens",
) -> DataFrame:
    """Append ``out_col``: the document's BPE token array under
    ``merges``. Arrow-batched ``mapInPandas`` with a word-level memo —
    narrow, no shuffle; the merge table ships in the task closure
    (``num_merges`` short string pairs)."""
    ranks = {(a, b): i for i, (a, b) in enumerate(merges)}
    out_schema = T.StructType(
        list(df.schema.fields)
        + [T.StructField(out_col, T.ArrayType(T.StringType()))]
    )
    tok_df = df.withColumn("__bpe_words", tokens(F.col(text_col)))

    def encode(batches):
        memo: dict[str, list[str]] = {}

        def seg(word: str) -> list[str]:
            got = memo.get(word)
            if got is None:
                got = memo[word] = bpe_segment_word(word, ranks)
            return got

        for pdf in batches:
            vals = [
                None if ws is None else
                [t for w in ws for t in seg(w)]
                for ws in pdf["__bpe_words"]
            ]
            pdf = pdf.drop(columns=["__bpe_words"])
            pdf[out_col] = vals
            yield pdf

    return (
        tok_df.mapInPandas(encode, out_schema)
        .drop("__bpe_words")
    )


def bpe_token_stats(
    df: DataFrame,
    merges: list,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Per-document REAL BPE token count ``(id_col, n_bpe_real)`` — the
    learned-vocabulary replacement for ``text.token_stats``'s regex
    approximation when token budgets must track an actual tokenizer."""
    return bpe_encode(df, merges, text_col, "__bt").select(
        F.col(id_col),
        # explicit null branch: size(NULL) is -1 under legacy sizeOfNull
        F.when(F.col("__bt").isNull(), F.lit(0))
        .otherwise(F.size("__bt")).cast("int").alias("n_bpe_real"),
    )
