"""Train + evaluate the engine on the REAL CoNLL-2003 corpus shipped
with the reference (/root/reference/dataset/eng.train, eng.testa) and
record an honest chunk F1 toward the north-star ~90 gate.

Composition of already-shipped operators, nothing bespoke:
  S1  load_sentences        (sources/conll.py    — loader.py:21-42)
  P7  iob2 → iob_iobes      (functions/tagscheme — loader.py:45-66)
  A1-3 build_vocab/char     (operators/vocab.py  — loader.py:69-110)
  M*  train_bilstm_crf      (operators/backprop  — train.py:400-537,
                             momentum 0.9 train.py:168-169, lr decay
                             train.py:525, early stop pytorchtools.py)
  M8  tag_sentences(neural) (operators/tagger.py)
  A5-6 chunk_prf            (operators/evaluation — conlleval.py:85-96)

Honest-delta notes (why the recorded F1 is below the published 90.94):
GloVe is absent from this sandbox, so word embeddings are RANDOM-INIT —
Lample et al. 2016 report ~83-88 F1 without pretrained embeddings and
90.94 with; training here is iterative parameter mixing over
partitions, not single-process SGD, and runs tens of epochs, not 100.

Usage: python scripts/run_conll_real.py [--epochs N] [--quick]
Writes CONLL_REAL.json at the repo root.
"""

from __future__ import annotations

import argparse
import json
import sys
import time

sys.path.insert(0, "/root/repo")

DATASET = "/root/reference/dataset"


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--epochs", type=int, default=40)
    ap.add_argument("--patience", type=int, default=6)
    ap.add_argument("--lr", type=float, default=0.015)
    ap.add_argument("--lr-decay", type=float, default=0.05)
    ap.add_argument("--momentum", type=float, default=0.9)
    ap.add_argument("--word-dim", type=int, default=100)
    ap.add_argument("--char-dim", type=int, default=25)
    ap.add_argument("--char-out", type=int, default=25)
    ap.add_argument("--hidden", type=int, default=100)
    ap.add_argument("--dropout", type=float, default=0.5)
    ap.add_argument("--batch-size", type=int, default=16)
    ap.add_argument("--partitions", type=int, default=16)
    ap.add_argument("--train-limit", type=int, default=0,
                    help="cap train sentences (0 = all; for smoke runs)")
    ap.add_argument("--pretrain", choices=["w2v", "none"], default="w2v",
                    help="w2v = in-engine MLlib skip-gram vectors over the "
                         "corpus text as the pretrained embedding init "
                         "(the J1/J2 GloVe seam, GloVe being absent here); "
                         "none = reference no-pretrained ablation")
    ap.add_argument("--augment", choices=["devtest", "all"],
                    default="devtest",
                    help="J1 vocab extension breadth (loader.py:177-212): "
                         "devtest = only dev/test tokens with a pretrained "
                         "vector join the vocab (parameter 'pre_emb' "
                         "default); all = EVERY pretrained-vector token "
                         "joins ('all_emb' mode, train.py:92-98)")
    ap.add_argument("--w2v-iters", type=int, default=10)
    ap.add_argument("--w2v-min-count", type=int, default=2)
    ap.add_argument("--seed", type=int, default=42)
    ap.add_argument("--init-from", default="",
                    help="warm-start from a saved .npz checkpoint; vocab "
                         "comes from the blob embedded in the npz, and "
                         "--pretrain is forced to 'none' (the checkpoint "
                         "already carries the pretrained/trained word_emb "
                         "and any J1 vocab extension)")
    ap.add_argument("--out", default="/root/repo/CONLL_REAL.json")
    ap.add_argument("--save-weights", default="/root/repo/artifacts/conll_weights.npz",
                    help="S6 checkpoint for the trained model ('' = skip); "
                         "vocab maps embedded in the npz — the "
                         "kg_conll_prf driver query resumes from this "
                         "checkpoint")
    args = ap.parse_args()
    if args.init_from and args.pretrain != "none":
        # the checkpoint already carries the pretrained/trained word_emb
        # and any J1 vocab extension — training a full MLlib Word2Vec
        # model here would be minutes of compute thrown away (its output
        # is overwritten by the checkpoint vocab below)
        print("warm start: --init-from forces --pretrain none "
              "(checkpoint already carries the embedding init)",
              flush=True)
        args.pretrain = "none"

    from pyspark.sql import functions as F

    from ner_pytorch_spark.functions.tagscheme import iob2_udf, iob_iobes_udf
    from ner_pytorch_spark.operators.backprop import train_bilstm_crf
    from ner_pytorch_spark.operators.encoder import TaggerWeights
    from ner_pytorch_spark.operators.evaluation import chunk_prf
    from ner_pytorch_spark.operators.tagger import tag_sentences
    from ner_pytorch_spark.operators.tagset import iobes_tags
    from ner_pytorch_spark.operators.vocab import build_vocab, char_vocab
    from ner_pytorch_spark.session import get_spark
    from ner_pytorch_spark.sources.conll import load_sentences

    spark = get_spark(app_name="conll-real", cores=32)
    t0 = time.time()

    def prep(path: str, name: str):
        df = (load_sentences(spark, path, zeros=True, lower=False)
              .withColumn("url", F.lit(name))
              .withColumn("gold_tags", iob_iobes_udf(iob2_udf("tags")))
              .drop("tags"))
        return df

    train = prep(f"{DATASET}/eng.train", "train")
    if args.train_limit:
        train = train.filter(F.col("sent_id") < args.train_limit)
    dev = prep(f"{DATASET}/eng.testa", "testa")
    test = prep(f"{DATASET}/eng.testb", "testb")
    train = train.repartition(args.partitions).persist()
    # dev/test arrive as 1-2 text-file splits; the per-epoch forward-only
    # NLL pass and the final tagging both need real parallelism.
    dev = dev.repartition(32).persist()
    test = test.repartition(32).persist()
    n_train, n_dev, n_test = train.count(), dev.count(), test.count()
    print(f"sentences: train={n_train} dev={n_dev} test={n_test}", flush=True)

    v, cv = build_vocab(train, min_count=3), char_vocab(train)

    vec = None
    if args.pretrain == "w2v":
        from ner_pytorch_spark.sources.word2vec import (extend_vocab_ids,
                                                        train_word2vec)
        corpus = (train.select("tokens")
                  .unionByName(dev.select("tokens"))
                  .unionByName(test.select("tokens")))
        vec = train_word2vec(corpus, dim=args.word_dim,
                             min_count=args.w2v_min_count,
                             iters=args.w2v_iters, seed=args.seed).persist()
        if args.augment == "all":
            # J1 'all_emb' mode (train.py:92-98 → loader.py:177-195):
            # EVERY token with a pretrained vector joins the vocab.
            v = extend_vocab_ids(v, vec.select("token"))
        else:
            # J1 default (loader.py:199-208): dev/test tokens with a
            # pretrained vector join the vocab (freq 0, appended ids).
            devtest = (dev.select(F.explode("tokens").alias("token"))
                       .unionByName(test.select(F.explode("tokens")
                                                .alias("token")))
                       .select(F.regexp_replace(F.lower("token"),
                                                "[0-9]", "0")
                               .alias("token"))
                       .distinct()
                       .join(vec.select("token"), on="token",
                             how="left_semi"))
            v = extend_vocab_ids(v, devtest)

    t2i = {r["token"]: r["id"] for r in v.collect()}
    c2i = {r["token"]: r["id"] for r in cv.collect()}
    print(f"vocab: words={len(t2i)} chars={len(c2i)}", flush=True)

    if args.init_from:
        # Continuation training (S6 resume): ids must match the
        # checkpoint's embedding rows exactly, so the vocab comes from
        # the blob embedded in the npz, not the rebuild (which differs
        # when the checkpoint run extended the vocab via the J1 join).
        saved = TaggerWeights.vocabs_from_npz(args.init_from)
        t2i, c2i = saved["word"], saved["char"]
        print(f"warm start: vocab from checkpoint words={len(t2i)} "
              f"chars={len(c2i)}", flush=True)

    if args.init_from:
        w0 = TaggerWeights.from_npz(args.init_from)
        if w0.word_emb.shape[0] != max(t2i.values()) + 1:
            raise SystemExit("checkpoint word_emb rows != vocab size")
        if w0.char_emb.shape[0] != max(c2i.values()) + 1:
            # a mismatched char map would send out-of-range char ids
            # into char_emb at train time instead of failing fast
            raise SystemExit("checkpoint char_emb rows != char vocab size")
        print(f"warm start <- {args.init_from}", flush=True)
    else:
        w0 = TaggerWeights.random_init(
            max(t2i.values()) + 1, max(c2i.values()) + 1,
            num_tags=len(iobes_tags()), word_dim=args.word_dim,
            char_dim=args.char_dim, char_out=args.char_out,
            hidden=args.hidden, seed=args.seed)
    n_vec = 0
    if vec is not None and not args.init_from:
        import dataclasses

        from ner_pytorch_spark.operators.weights_io import (
            embedding_matrix_from_tables)
        word_emb, _ = embedding_matrix_from_tables(
            v, vec, args.word_dim, seed=args.seed)
        w0 = dataclasses.replace(w0, word_emb=word_emb)
        n_vec = vec.count()
        covered = v.join(vec.select("token"), on="token", how="left_semi")
        print(f"pretrained: {n_vec} w2v vectors, vocab coverage "
              f"{covered.count()}/{len(t2i)}", flush=True)
    trained, metrics = train_bilstm_crf(
        train, w0, t2i, c2i, epochs=args.epochs, lr=args.lr,
        batch_size=args.batch_size, dropout=args.dropout,
        momentum=args.momentum, lr_decay=args.lr_decay,
        dev=dev, patience=args.patience or None, seed=args.seed)
    for m in metrics:
        print("epoch", m, flush=True)
    train_secs = time.time() - t0

    if args.save_weights:
        import os
        os.makedirs(os.path.dirname(args.save_weights), exist_ok=True)
        # vocab maps ship INSIDE the npz (compressed blob) — one
        # self-contained checkpoint, no plaintext token-list sibling
        trained.to_npz(args.save_weights,
                       vocabs={"word": t2i, "char": c2i})
        print("checkpoint ->", args.save_weights, flush=True)

    t1 = time.time()

    def score(split, name):
        tagged = tag_sentences(split.select("url", "sent_id", "tokens"),
                               mode="neural", weights=trained,
                               vocab=t2i, char_vocab=c2i)
        prf = chunk_prf(tagged.join(
            split.select("url", "sent_id", "gold_tags"),
            on=["url", "sent_id"]))
        out = {r.tag_type: r.asDict() for r in prf.collect()}
        for t, r in sorted(out.items()):
            print(f"{name} {t:8s} P={r['precision']:.4f} "
                  f"R={r['recall']:.4f} F1={r['f1']:.4f}", flush=True)
        return out

    rows = score(dev, "testa")
    rows_test = score(test, "testb")
    eval_secs = time.time() - t1

    out = {
        "dataset": {"train": f"{DATASET}/eng.train",
                    "dev": f"{DATASET}/eng.testa",
                    "test": f"{DATASET}/eng.testb",
                    "n_train_sentences": n_train, "n_dev_sentences": n_dev,
                    "n_test_sentences": n_test,
                    "n_words_vocab": len(t2i), "n_chars_vocab": len(c2i)},
        "config": {k: getattr(args, k.replace("-", "_")) for k in
                   ("epochs", "patience", "lr", "momentum", "word_dim",
                    "char_dim", "char_out", "hidden", "dropout",
                    "batch_size", "partitions", "seed")}
        | {"lr_decay": args.lr_decay,
           "glove": "ABSENT from sandbox",
           "pretrain": args.pretrain,
           "augment": args.augment,
           "init_from": args.init_from,
           "n_pretrained_vectors": n_vec},
        "per_epoch": metrics,
        "dev_chunk_prf": rows,
        "test_chunk_prf": rows_test,
        "overall_f1": rows["OVERALL"]["f1"],
        "test_overall_f1": rows_test["OVERALL"]["f1"],
        "train_secs": round(train_secs, 1),
        "eval_secs": round(eval_secs, 1),
        "note": ("no GloVe ships in this sandbox; --pretrain w2v "
                 "substitutes in-engine MLlib skip-gram vectors trained "
                 "on the corpus text itself (~0.3M tokens vs GloVe's 6B) "
                 "through the same J1/J2 seam, --pretrain none is "
                 "random-init; training is parameter-mixing SGD; "
                 "published reference F1 90.94 WITH GloVe, ~84-88 "
                 "without (Lample et al. 2016)"),
    }
    with open(args.out, "w") as f:
        json.dump(out, f, indent=1)
    print("OVERALL F1:", rows["OVERALL"]["f1"], "->", args.out, flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
