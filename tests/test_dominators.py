"""Dominator-tree retained size vs an independent pure-Python
computation — over the purpose-built graph fixture dump (diamond,
multi-root confluence, chain, cycle, shared payload, garbage) and over
randomized graphs (the Spark fixpoint checked against textbook
iterative dataflow computed in plain sets).
"""

from __future__ import annotations

import os
import random

import pytest
from pyspark.sql import functions as F

from heapdumpstardiver_spark.analytics.dominators import (
    SUPER_ROOT,
    dominator_pairs_from,
    dominator_tree,
    retained_by_class,
    retained_sizes,
)
from heapdumpstardiver_spark.catalog import Warehouse
from heapdumpstardiver_spark.ingest import ingest_hprof
from heapdumpstardiver_spark.ingest.hprof_writer import build_graph_dump


def py_dominators(edges: list[tuple[int, int]], roots: list[int]) -> dict[int, set[int]]:
    """Textbook iterative dataflow from the top (dom = all reachable
    nodes) — O(V^2) but an entirely independent construction from the
    Spark BFS-seeded version."""
    adj: dict[int, set[int]] = {}
    preds: dict[int, set[int]] = {}
    for s, d in edges:
        if s == d:
            continue
        adj.setdefault(s, set()).add(d)
        preds.setdefault(d, set()).add(s)
    for r in set(roots):
        adj.setdefault(SUPER_ROOT, set()).add(r)
        preds.setdefault(r, set()).add(SUPER_ROOT)
    # reachable set
    seen = {SUPER_ROOT}
    stack = [SUPER_ROOT]
    while stack:
        n = stack.pop()
        for m in adj.get(n, ()):
            if m not in seen:
                seen.add(m)
                stack.append(m)
    dom = {n: set(seen) for n in seen}
    dom[SUPER_ROOT] = {SUPER_ROOT}
    changed = True
    while changed:
        changed = False
        for n in seen:
            if n == SUPER_ROOT:
                continue
            ps = [p for p in preds.get(n, ()) if p in seen]
            new = set.intersection(*(dom[p] for p in ps)) | {n} if ps else {n}
            if new != dom[n]:
                dom[n] = new
                changed = True
    return dom


@pytest.fixture(scope="module")
def graph_wh(spark, tmp_path_factory):
    d = tmp_path_factory.mktemp("graphdump")
    path = os.path.join(d, "g.hprof")
    truth = build_graph_dump(path)
    wh_dir = os.path.join(d, "wh")
    ingest_hprof(spark, path, wh_dir, overwrite=True)
    return Warehouse(spark, wh_dir), truth


def test_retained_matches_python(graph_wh):
    wh, truth = graph_wh
    dom = py_dominators(truth["edges"], truth["roots"])
    shallow = {o: sz for o, _t, sz in truth["objects"]}
    want_retained: dict[int, int] = {}
    want_ndom: dict[int, int] = {}
    for n, ds in dom.items():
        for d in ds:
            if d == SUPER_ROOT:
                continue
            want_retained[d] = want_retained.get(d, 0) + shallow[n]
            want_ndom[d] = want_ndom.get(d, 0) + 1

    rows = retained_sizes(wh).collect()
    got = {r["obj_id"]: (r["n_dominated"], r["retained_bytes"]) for r in rows}
    assert got == {
        d: (want_ndom[d], want_retained[d]) for d in want_retained
    }


def test_idoms_on_fixture_shapes(graph_wh):
    """Spot-check the designed shapes: diamond head dominates the
    shared payload's siblings but the two-root confluence pushes C, D
    and PB up to the super-root; the chain and cycle idoms follow the
    list order."""
    wh, truth = graph_wh
    ids = truth["ids"]
    idom = {r["obj_id"]: r["idom"] for r in dominator_tree(wh).collect()}
    assert idom[ids["A"]] == ids["R"]
    assert idom[ids["B"]] == ids["A"]
    assert idom[ids["C"]] == SUPER_ROOT  # reachable via R->A->C and R2->C
    assert idom[ids["D"]] == SUPER_ROOT  # via B and via C
    assert idom[ids["PB"]] == SUPER_ROOT  # shared payload of B and C
    assert idom[ids["E1"]] == ids["D"]
    assert idom[ids["E2"]] == ids["E1"]
    assert idom[ids["F1"]] == ids["E4"]
    assert idom[ids["F2"]] == ids["F1"]  # cycle collapses onto entry
    assert idom[ids["PD"]] == ids["D"]
    # garbage never appears
    assert ids["G1"] not in idom and ids["G2"] not in idom


def test_retained_by_class(graph_wh):
    wh, truth = graph_wh
    rows = retained_by_class(wh).collect()
    by_type = {r["type_name"]: r for r in rows}
    # every reachable byte[] retains exactly itself (leaves)
    payloads = {16 + n for n in (400, 200, 64, 32)}
    assert by_type["byte[]"]["total_retained"] == sum(payloads)
    assert by_type["byte[]"]["max_retained"] == 416
    # Node instances: 12 reachable (all but G1, G2)
    assert by_type["com.graph.Node"]["n_objects"] == 12


@pytest.mark.parametrize("force_distributed", [False, True])
def test_random_graphs_match_python(spark, force_distributed):
    """Randomized adversarial check: arbitrary digraphs (cycles,
    multi-edges, unreachable islands) — BOTH engine paths (the
    driver-side CHK fast path these small graphs route to, and the
    distributed greatest-fixpoint dataflow when forced) must equal the
    textbook top-down iteration exactly."""
    rng = random.Random(0xD0B)
    trials = 6 if not force_distributed else 3  # distributed rounds are slow
    for trial in range(trials):
        n = rng.randint(4, 14)
        nodes = list(range(1, n + 1))
        edges = [
            (rng.choice(nodes), rng.choice(nodes))
            for _ in range(rng.randint(n, 3 * n))
        ]
        roots = rng.sample(nodes, rng.randint(1, 2))
        want = py_dominators(edges, roots)

        e = [(s, d) for s, d in edges if s != d] + [
            (SUPER_ROOT, r) for r in set(roots)
        ]
        edf = spark.createDataFrame(
            sorted(set(e)), "src long, dst long"
        )
        pairs = dominator_pairs_from(
            spark, edf, force_distributed=force_distributed
        ).collect()
        got: dict[int, set[int]] = {}
        for r in pairs:
            got.setdefault(r["obj_id"], set()).add(r["dom"])
        assert got == want, f"trial {trial}: {got} != {want}"
