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


def test_star_cc_matches_label_propagation(spark, tmp_path):
    """The web-scale alternating large/small-star variant produces the
    SAME (node, component) mapping as label propagation on chains (the
    high-diameter case it exists for), cycles, and random graphs —
    including with reliable-storage checkpoints."""
    import numpy as np

    from ner_pytorch_spark.operators.cc import (connected_components,
                                                connected_components_star)

    # 60-node chain: diameter 60, star rounds must still converge fast
    chain = spark.createDataFrame(
        [(f"n{i:02d}", f"n{i+1:02d}") for i in range(60)],
        "src string, dst string")
    a = {r.node: r.component for r in connected_components(chain, max_iter=80).collect()}
    b = {r.node: r.component for r in connected_components_star(chain).collect()}
    assert a == b and set(b.values()) == {"n00"}

    # cycle + random graphs, int ids, plus checkpoint-to-storage mode
    rng = np.random.default_rng(23)
    cyc = [(i, (i + 1) % 25) for i in range(25)]
    cases = [cyc]
    for _ in range(2):
        n_nodes = int(rng.integers(20, 60))
        es = [(int(rng.integers(0, n_nodes)), int(rng.integers(0, n_nodes)))
              for _ in range(int(rng.integers(10, 80)))]
        cases.append([(x, y) for x, y in es if x != y])
    for i, es in enumerate(cases):
        if not es:
            continue
        df = spark.createDataFrame(es, "src long, dst long")
        want = {r.node: r.component for r in connected_components(df).collect()}
        got = {r.node: r.component for r in connected_components_star(
            df, checkpoint_dir=str(tmp_path / f"ck{i}") if i == 0 else None
        ).collect()}
        assert got == want, f"case {i}"


def test_random_graphs_vs_union_find(spark):
    """Differential: Spark cc == pure union-find on random graphs."""
    import numpy as np

    def union_find_components(edges, nodes):
        parent = {n: n for n in nodes}

        def find(x):
            while parent[x] != x:
                parent[x] = parent[parent[x]]
                x = parent[x]
            return x

        for a, b in edges:
            ra, rb = find(a), find(b)
            if ra != rb:
                parent[max(ra, rb)] = min(ra, rb)
        # canonical component id = min node in component
        comp = {}
        for n in nodes:
            comp.setdefault(find(n), []).append(n)
        out = {}
        for root, members in comp.items():
            m = min(members)
            for n in members:
                out[n] = m
        return out

    from ner_pytorch_spark.operators.cc import connected_components

    rng = np.random.default_rng(17)
    for trial in range(3):
        n_nodes = int(rng.integers(20, 60))
        n_edges = int(rng.integers(10, 80))
        edges = [(int(rng.integers(0, n_nodes)), int(rng.integers(0, n_nodes)))
                 for _ in range(n_edges)]
        edges = [(a, b) for a, b in edges if a != b]
        nodes = sorted({x for e in edges for x in e})
        if not edges:
            continue
        df = spark.createDataFrame(edges, "src long, dst long")
        got = {r.node: r.component
               for r in connected_components(df).collect()}
        want = union_find_components(edges, nodes)
        assert got == want, f"trial {trial}"
