"""C1 BIOES span extraction vs conlleval semantics (conlleval.py:33-82),
including the contradictory-transition cases at conlleval.py:51-53."""

from ner_pytorch_spark.operators.spans import extract_spans


def spans(tags):
    return [(s["start"], s["end"], s["tag_type"]) for s in extract_spans(tags)]


def test_simple_bioes():
    assert spans(["B-PER", "E-PER", "O", "S-LOC"]) == [(0, 2, "PER"), (3, 4, "LOC")]


def test_iob_sequences():
    assert spans(["B-PER", "I-PER", "O"]) == [(0, 2, "PER")]
    assert spans(["I-PER", "I-PER"]) == [(0, 2, "PER")]  # IOB1-style start


def test_contradictory_transition_starts_new_chunk():
    # B-PER followed by I-LOC: PER chunk ends, LOC chunk starts
    assert spans(["B-PER", "I-LOC"]) == [(0, 1, "PER"), (1, 2, "LOC")]


def test_chunk_open_at_sequence_end_closes():
    # the sentinel-append case (word_rep.py:131-134) — no sentinel needed
    assert spans(["O", "B-ORG", "I-ORG"]) == [(1, 3, "ORG")]


def test_adjacent_chunks():
    assert spans(["B-PER", "B-PER"]) == [(0, 1, "PER"), (1, 2, "PER")]
    assert spans(["S-LOC", "S-LOC"]) == [(0, 1, "LOC"), (1, 2, "LOC")]
    assert spans(["E-PER", "S-PER"]) == [(0, 1, "PER"), (1, 2, "PER")]


def test_surface_join():
    out = extract_spans(["B-PER", "E-PER", "O"], ["Alice", "Johnson", "runs"])
    assert out[0]["surface"] == "Alice Johnson"


def test_all_o():
    assert spans(["O", "O", "O"]) == []


def test_udf_explode(spark):
    from ner_pytorch_spark.operators.spans import mentions_table

    df = spark.createDataFrame(
        [("u1", 0, ["Alice", "Johnson", "visited", "Paris"],
          ["B-PER", "E-PER", "O", "S-LOC"])],
        "url string, sent_id int, tokens array<string>, pred_tags array<string>")
    rows = mentions_table(df).orderBy("mention_id").collect()
    assert [(r.start, r.end, r.tag_type, r.surface) for r in rows] == [
        (0, 2, "PER", "Alice Johnson"), (3, 4, "LOC", "Paris")]
