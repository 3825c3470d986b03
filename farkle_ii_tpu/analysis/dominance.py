"""Dominance structure from H2H inference results.

Reference parity (``/root/reference/src/farkle/analysis/dominance.py``):
builds practical and statistical directed dominance graphs over the frozen
family, finds strongly-connected components (cycle groups), layers the
condensation into zero-indegree fronts, reports a deterministic shortest
representative cycle per nontrivial SCC, and identifies a unique-best
strategy (direct practical dominance over every other finalist).
"""

from __future__ import annotations

import logging
from collections import defaultdict
from pathlib import Path

import pandas as pd
import pyarrow as pa

from farkle_ii_tpu.config import AppConfig, compute_stage_config_sha
from farkle_ii_tpu.utils.artifacts import (
    read_parquet_artifact,
    write_parquet_artifact_atomic,
)
from farkle_ii_tpu.utils.stage_completion import (
    StageState,
    resolve_stage_state,
    write_stage_done,
)
from farkle_ii_tpu.utils.writer import write_json_atomic

logger = logging.getLogger(__name__)


def edges_path(cfg: AppConfig) -> Path:
    return cfg.h2h_dir() / "dominance_edges.parquet"


def structure_path(cfg: AppConfig) -> Path:
    return cfg.h2h_dir() / "dominance_structure.json"


def build_edges(inference: pd.DataFrame) -> pd.DataFrame:
    """Directed edges winner -> loser for practical and statistical relations."""
    rows = []
    for row in inference.to_dict(orient="records"):
        a, b = int(row["strategy_a"]), int(row["strategy_b"])
        cls = str(row["decision_class"])
        if cls == "practical_dominance_a":
            rows.append({"src": a, "dst": b, "relation": "practical", "pair_id": row["pair_id"]})
            rows.append({"src": a, "dst": b, "relation": "statistical", "pair_id": row["pair_id"]})
        elif cls == "practical_dominance_b":
            rows.append({"src": b, "dst": a, "relation": "practical", "pair_id": row["pair_id"]})
            rows.append({"src": b, "dst": a, "relation": "statistical", "pair_id": row["pair_id"]})
        elif cls == "statistical_only_advantage_a":
            rows.append({"src": a, "dst": b, "relation": "statistical", "pair_id": row["pair_id"]})
        elif cls == "statistical_only_advantage_b":
            rows.append({"src": b, "dst": a, "relation": "statistical", "pair_id": row["pair_id"]})
    return pd.DataFrame(rows, columns=["src", "dst", "relation", "pair_id"])


def tarjan_scc(nodes: list[int], adjacency: dict[int, list[int]]) -> list[list[int]]:
    """Iterative Tarjan SCC (deterministic order)."""
    index: dict[int, int] = {}
    lowlink: dict[int, int] = {}
    on_stack: set[int] = set()
    stack: list[int] = []
    sccs: list[list[int]] = []
    counter = [0]

    for root in sorted(nodes):
        if root in index:
            continue
        work = [(root, iter(sorted(adjacency.get(root, []))))]
        index[root] = lowlink[root] = counter[0]
        counter[0] += 1
        stack.append(root)
        on_stack.add(root)
        while work:
            node, it = work[-1]
            advanced = False
            for nxt in it:
                if nxt not in index:
                    index[nxt] = lowlink[nxt] = counter[0]
                    counter[0] += 1
                    stack.append(nxt)
                    on_stack.add(nxt)
                    work.append((nxt, iter(sorted(adjacency.get(nxt, [])))))
                    advanced = True
                    break
                if nxt in on_stack:
                    lowlink[node] = min(lowlink[node], index[nxt])
            if advanced:
                continue
            work.pop()
            if work:
                parent = work[-1][0]
                lowlink[parent] = min(lowlink[parent], lowlink[node])
            if lowlink[node] == index[node]:
                scc = []
                while True:
                    w = stack.pop()
                    on_stack.discard(w)
                    scc.append(w)
                    if w == node:
                        break
                sccs.append(sorted(scc))
    return sccs


def shortest_cycle(members: list[int], adjacency: dict[int, list[int]]) -> list[int]:
    """Deterministic shortest cycle within one nontrivial SCC (BFS per node)."""
    member_set = set(members)
    best: list[int] | None = None
    for start in sorted(members):
        # BFS back to start
        parents: dict[int, int] = {}
        queue = [start]
        found = None
        visited = {start}
        while queue and found is None:
            nxt_queue = []
            for node in queue:
                for nxt in sorted(adjacency.get(node, [])):
                    if nxt not in member_set:
                        continue
                    if nxt == start:
                        found = node
                        break
                    if nxt not in visited:
                        visited.add(nxt)
                        parents[nxt] = node
                        nxt_queue.append(nxt)
                if found is not None:
                    break
            queue = nxt_queue
        if found is None:
            continue
        cycle = [found]
        while cycle[-1] != start:
            cycle.append(parents[cycle[-1]])
        cycle.reverse()
        if best is None or len(cycle) < len(best) or (
            len(cycle) == len(best) and cycle < best
        ):
            best = cycle
    return best or []


def condensation_fronts(
    sccs: list[list[int]], adjacency: dict[int, list[int]]
) -> list[list[int]]:
    """Layer SCCs by repeatedly removing zero-indegree components."""
    comp_of = {n: i for i, scc in enumerate(sccs) for n in scc}
    indegree = defaultdict(int)
    comp_edges = defaultdict(set)
    for src, dsts in adjacency.items():
        for dst in dsts:
            cs, cd = comp_of[src], comp_of[dst]
            if cs != cd and cd not in comp_edges[cs]:
                comp_edges[cs].add(cd)
                indegree[cd] += 1
    remaining = set(range(len(sccs)))
    fronts: list[list[int]] = []
    while remaining:
        front = sorted(c for c in remaining if indegree[c] == 0)
        if not front:  # should not happen on a DAG
            front = sorted(remaining)
        fronts.append(front)
        for c in front:
            remaining.discard(c)
            for d in comp_edges[c]:
                indegree[d] -= 1
    return fronts


def build_dominance_outputs(cfg: AppConfig, *, force: bool = False) -> dict:
    from farkle_ii_tpu.analysis.h2h_inference import inference_path

    stage_sha = compute_stage_config_sha(cfg, "dominance")
    out_dir = cfg.h2h_dir()
    state = resolve_stage_state(
        out_dir, "dominance", config_sha=stage_sha, freshness_key=cfg.freshness_key()
    )
    if state == StageState.COMPLETE_VALID and not force:
        import json

        return json.loads(structure_path(cfg).read_text())

    inference = read_parquet_artifact(
        inference_path(cfg), expected_producer="h2h_inference"
    ).to_pandas()
    finalists = sorted(
        set(inference["strategy_a"].astype(int)) | set(inference["strategy_b"].astype(int))
    )
    edges = build_edges(inference)
    write_parquet_artifact_atomic(
        pa.Table.from_pandas(edges, preserve_index=False), edges_path(cfg),
        producer="dominance", scope="h2h_2p",
        metadata={"operation": "dominance_edges"},
    )

    structure: dict = {"finalists": finalists}
    for relation in ("practical", "statistical"):
        sub = edges[edges["relation"] == relation]
        adjacency: dict[int, list[int]] = defaultdict(list)
        for src, dst in zip(sub["src"].astype(int), sub["dst"].astype(int)):
            adjacency[src].append(dst)
        sccs = tarjan_scc(finalists, adjacency)
        nontrivial = [s for s in sccs if len(s) > 1]
        fronts = condensation_fronts(sccs, adjacency)
        front_strategies = [
            sorted(n for c in front for n in sccs[c]) for front in fronts
        ]
        structure[relation] = {
            "edge_count": int(len(sub)),
            "cycle_groups": nontrivial,
            "representative_cycles": [
                shortest_cycle(s, adjacency) for s in nontrivial
            ],
            "fronts": front_strategies,
        }
    # unique best: direct practical dominance over all other finalists
    practical = edges[edges["relation"] == "practical"]
    out_counts = practical.groupby("src")["dst"].nunique()
    unique_best = None
    for s, n in out_counts.items():
        if n == len(finalists) - 1:
            unique_best = int(s)
            break
    structure["unique_best"] = unique_best
    write_json_atomic(structure_path(cfg), structure)
    write_stage_done(
        out_dir, "dominance",
        inputs=[inference_path(cfg)],
        outputs=[edges_path(cfg), structure_path(cfg)],
        config_sha=stage_sha, freshness_key=cfg.freshness_key(),
    )
    return structure


def run(cfg: AppConfig, *, force: bool = False) -> None:
    build_dominance_outputs(cfg, force=force)
