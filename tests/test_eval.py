"""conlleval-parity aggregations (A5-A7, A10) on hand-computed goldens."""

import pytest
from pyspark.sql import functions as F


@pytest.fixture(scope="module")
def tagged(spark):
    rows = [
        # sent 1: gold PER(0,2), LOC(3,4); pred PER correct, LOC missed
        (["B-PER", "E-PER", "O", "S-LOC"], ["B-PER", "E-PER", "O", "O"]),
        # sent 2: gold ORG(0,1); pred ORG(0,1) + spurious PER(2,3)
        (["S-ORG", "O", "O"], ["S-ORG", "O", "S-PER"]),
        # sent 3: all O, pred all O
        (["O", "O"], ["O", "O"]),
    ]
    return spark.createDataFrame(rows, "gold_tags array<string>, pred_tags array<string>")


def test_chunk_prf(tagged):
    from ner_pytorch_spark.operators.evaluation import chunk_prf

    got = {r.tag_type: r for r in chunk_prf(tagged).collect()}
    # PER: 1 correct, 1 true, 2 pred → P=0.5 R=1
    assert got["PER"].precision == 0.5 and got["PER"].recall == 1.0
    # LOC: 0/1 true, 0 pred
    assert got["LOC"].recall == 0.0 and got["LOC"].precision == 0.0
    assert got["ORG"].f1 == 1.0
    # overall: correct=2, true=3, pred=3
    o = got["OVERALL"]
    assert round(o.precision, 6) == round(2 / 3, 6)
    assert round(o.recall, 6) == round(2 / 3, 6)


def test_confusion_matrix(tagged):
    from ner_pytorch_spark.operators.evaluation import confusion_matrix

    got = {(r.gold_tag, r.pred_tag): r.n for r in confusion_matrix(tagged).collect()}
    assert got[("S-LOC", "O")] == 1
    assert got[("O", "S-PER")] == 1
    assert got[("B-PER", "B-PER")] == 1
    assert got[("O", "O")] == 4  # sent1:1, sent2:1, sent3:2


def test_adv_eval_metrics(tagged):
    from ner_pytorch_spark.operators.evaluation import adv_eval_metrics

    m = adv_eval_metrics(tagged).first()
    # sent1 non-O: 3 gold (B-PER,E-PER,S-LOC), correct 2 → flip
    # sent2 non-O: 1 gold (S-ORG), correct 1 → no flip
    # sent3 excluded (no non-O gold)
    assert m.n_sentences == 2
    assert m.micro_acc == round(3 / 4, 6)
    assert m.macro_acc == round((2 / 3 + 1) / 2, 6)
    assert m.hit_rate == 0.5
