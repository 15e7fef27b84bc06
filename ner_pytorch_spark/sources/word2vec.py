"""In-engine pretrained word embeddings (the S2/J1/J2 seam without a
GloVe file).

The reference initializes its embedding matrix from GloVe 100d
(/root/reference/train.py:122-134) and augments the vocab with dev/test
words that have pretrained vectors (/root/reference/loader.py:199-208).
No GloVe ships in this sandbox, so this module produces the SAME
(token, vector) table shape from the corpus itself with Spark MLlib's
distributed Word2Vec (skip-gram, public `pyspark.ml.feature.Word2Vec`)
— the output plugs into the existing J2 join path
(`operators.weights_io.embedding_matrix_from_tables`) and the J1
augmentation unchanged, and a cluster with real GloVe swaps
`sources.glove.load_glove` back in at the same socket.

Scale: Word2Vec trains distributed over the corpus partitions and only
the (|vocab| × dim) vector table ever leaves the executors — at 100 TB
the corpus never moves, and the vector table stays dimension-table
sized (vocab-bounded, broadcastable).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..operators.vocab import PAD, UNK


def train_word2vec(
    df: DataFrame,
    tokens_col: str = "tokens",
    dim: int = 100,
    window: int = 5,
    min_count: int = 2,
    iters: int = 10,
    num_partitions: int = 4,
    seed: int = 42,
) -> DataFrame:
    """Skip-gram vectors over the corpus → (token, vector:array<float>).

    Tokens are normalized the same way the word vocab is built
    (loader.py:135-137 lowercase + utils.py:70-74 digit-fold) so the
    vector table joins against `build_vocab` output on exact token
    equality; GloVe's lowercase-fallback join keeps working too.

    ``num_partitions`` is deliberately small: MLlib Word2Vec averages
    per-partition models each iteration, and quality degrades as the
    partition count grows — the knob trades speed for fidelity exactly
    like the published implementation documents.
    """
    from pyspark.ml.feature import Word2Vec
    from pyspark.ml.functions import vector_to_array

    sents = df.select(
        F.transform(
            tokens_col,
            lambda t: F.regexp_replace(F.lower(t), "[0-9]", "0"),
        ).alias("_toks"))
    model = Word2Vec(
        vectorSize=dim,
        windowSize=window,
        minCount=min_count,
        maxIter=iters,
        numPartitions=num_partitions,
        seed=seed,
        inputCol="_toks",
        outputCol="_vec",
    ).fit(sents)
    return (model.getVectors()
            .select(F.col("word").alias("token"),
                    vector_to_array("vector").cast("array<float>")
                    .alias("vector")))


def extend_vocab_ids(vocab: DataFrame, extra_tokens: DataFrame) -> DataFrame:
    """J1 with ids: append pretrained-covered tokens to a ranked vocab.

    ``vocab``: (token, id, freq) from `build_vocab`. ``extra_tokens``:
    (token) — e.g. dev/test tokens that have a pretrained vector
    (loader.py:199-208 appends them to the dico with freq 0; under the
    reference's (-freq, token) ranking they all land AFTER every
    min-count-filtered train token, sorted by token — reproduced here
    by ranking extras by token after max(id), so existing ids are
    STABLE and checkpoints keyed to the base vocab stay valid).
    """
    base_ids = vocab.select("token", "id", "freq")
    extras = (extra_tokens.select("token").distinct()
              .filter(~F.col("token").isin(PAD, UNK))
              .join(base_ids.select("token"), on="token", how="left_anti"))
    # `or 0` would also catch a legitimate max id of 0 AND an empty
    # vocab's None identically, starting extras at 1 and leaving id 0
    # unused on an empty base — distinguish the two explicitly
    m = vocab.agg(F.max("id")).first()[0]
    start = (m + 1) if m is not None else 0
    w = Window.orderBy(F.asc("token"))
    ranked = extras.select(
        "token",
        (F.row_number().over(w) - 1 + F.lit(start)).alias("id"),
        F.lit(0).cast("long").alias("freq"))
    return base_ids.unionByName(ranked)
