"""ner_pytorch_spark — a PySpark-native knowledge-graph construction engine.

Brand-new engine with the data-processing capabilities of the reference
repo ``msps9341012/NER-pytorch`` (a CoNLL-2003 BiLSTM-CRF tagger plus an
adversarial-example generation pipeline), re-expressed Spark-first:

* DataFrame/SQL logical plans, Catalyst/Tungsten physical execution;
* Arrow-batched pandas UDFs for the per-sentence tensor operators
  (char-CNN + BiLSTM encoder, CRF Viterbi decode);
* broadcast dimension tables for vocabularies, alias dictionaries and
  embedding matrices;
* distributed KG tail: candidate generation, cosine entity linking,
  connected-components canonicalization, triple extraction;
* web-scale hygiene: exact/MinHash-LSH/SimHash dedup, ANN similarity
  search, language-ID / quality scoring / fingerprinting.

Package layout::

    session.py        SparkSession factory (Arrow + AQE on)
    datagen.py        deterministic synthetic Common-Crawl-style corpus
    functions/        scalar functions (text normalization, extraction,
                      tag-scheme rewrites)
    operators/        dataflow operators (vocab, tagger, spans, linking,
                      cc, triples, dedup, similarity, textstats, eval)
    sources/          scans for CoNLL / GloVe / PPDB file formats
    plans/            end-to-end pipeline assembly + checkpointed tables
    streaming/        Structured Streaming variants
"""

__version__ = "0.1.0"
