"""Connected components: chains, isolated pairs, convergence."""


def test_two_components(spark):
    edges = spark.createDataFrame(
        [("a", "b"), ("b", "c"), ("x", "y")], "src string, dst string")
    from ner_pytorch_spark.operators.cc import connected_components

    got = {r.node: r.component for r in connected_components(edges).collect()}
    assert got == {"a": "a", "b": "a", "c": "a", "x": "x", "y": "x"}


def test_long_chain(spark):
    n = 30
    edges = spark.createDataFrame(
        [(f"n{i:02d}", f"n{i+1:02d}") for i in range(n)], "src string, dst string")
    from ner_pytorch_spark.operators.cc import connected_components

    got = {r.node: r.component for r in connected_components(edges).collect()}
    assert set(got.values()) == {"n00"}
    assert len(got) == n + 1


def test_long_int_ids(spark):
    edges = spark.createDataFrame([(5, 3), (3, 9), (20, 21)], "src long, dst long")
    from ner_pytorch_spark.operators.cc import connected_components

    got = {r.node: r.component for r in connected_components(edges).collect()}
    assert got == {3: 3, 5: 3, 9: 3, 20: 20, 21: 20}
