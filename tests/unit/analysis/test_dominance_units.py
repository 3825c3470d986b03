"""Fast-suite unit coverage of the dominance graph algebra.

The full dominance stage runs in the slow pipeline tests; these pin the
pure graph functions (edge construction from decision classes, Tarjan
SCC, shortest representative cycle, condensation fronts) directly —
round-4 verdict: analysis/dominance.py had 64.6% fast coverage.
"""

from __future__ import annotations

import pandas as pd

from farkle_ii_tpu.analysis.dominance import (
    build_edges,
    condensation_fronts,
    shortest_cycle,
    tarjan_scc,
)


def _inference(rows):
    return pd.DataFrame(
        [
            {
                "pair_id": i,
                "strategy_a": a,
                "strategy_b": b,
                "decision_class": cls,
            }
            for i, (a, b, cls) in enumerate(rows)
        ]
    )


def test_build_edges_directions_and_relations():
    edges = build_edges(
        _inference(
            [
                (1, 2, "practical_dominance_a"),   # 1 -> 2, both relations
                (3, 4, "practical_dominance_b"),   # 4 -> 3, both relations
                (5, 6, "statistical_only_advantage_a"),  # 5 -> 6 stat only
                (7, 8, "statistical_only_advantage_b"),  # 8 -> 7 stat only
                (9, 10, "unresolved"),             # no edge
            ]
        )
    )
    stat = {(r.src, r.dst) for r in edges.itertuples() if r.relation == "statistical"}
    prac = {(r.src, r.dst) for r in edges.itertuples() if r.relation == "practical"}
    assert stat == {(1, 2), (4, 3), (5, 6), (8, 7)}
    assert prac == {(1, 2), (4, 3)}
    assert (9, 10) not in stat and (10, 9) not in stat


def test_tarjan_finds_cycles_and_singletons():
    # 1 -> 2 -> 3 -> 1 cycle; 4 downstream; 5 isolated
    adj = {1: [2], 2: [3], 3: [1, 4], 4: [], 5: []}
    sccs = tarjan_scc([1, 2, 3, 4, 5], adj)
    assert [1, 2, 3] in sccs
    assert [4] in sccs and [5] in sccs
    assert len(sccs) == 3


def test_tarjan_on_dag_is_all_singletons():
    adj = {1: [2, 3], 2: [3], 3: []}
    sccs = tarjan_scc([1, 2, 3], adj)
    assert sorted(sccs) == [[1], [2], [3]]


def test_shortest_cycle_prefers_minimal_and_deterministic():
    # two cycles share node 1: (1,2) and (1,3,4); the 2-cycle wins
    adj = {1: [2, 3], 2: [1], 3: [4], 4: [1]}
    cyc = shortest_cycle([1, 2, 3, 4], adj)
    assert cyc in ([1, 2], [2, 1])
    assert len(cyc) == 2


def test_condensation_fronts_layering():
    # SCC {1,2} -> 3 -> 4; 5 isolated at the top layer
    adj = {1: [2], 2: [1, 3], 3: [4], 4: [], 5: []}
    sccs = tarjan_scc([1, 2, 3, 4, 5], adj)
    fronts = condensation_fronts(sccs, adj)
    comp_of = {n: i for i, scc in enumerate(sccs) for n in scc}
    # the {1,2} component and {5} have zero indegree -> front 0
    assert comp_of[1] in fronts[0] and comp_of[5] in fronts[0]
    assert comp_of[3] in fronts[1]
    assert comp_of[4] in fronts[2]
