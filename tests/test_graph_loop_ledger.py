"""Iterative-graph loop ledger (VERDICT r10 item 4).

The round-10 ring test established two hard facts about per-round
label self-joins ("pointer jumping"):

1. DIRECTED min-reachability gets NO doubling from label-of-label
   compression (on a monotone-id directed ring the jump is a no-op),
   so an O(log d) claim is only valid for the UNDIRECTED hash-to-min
   argument (labels strictly decrease along symmetric adjacency).
2. Jump-style self-join loops degrade EXPONENTIALLY in per-round JVM
   job cost past ~16 rounds (measured ~2.5x/round from round ~18,
   identical under eager localCheckpoint and disk checkpoint), while
   plain propagation stays flat through 30+ rounds.

That lesson was pinned for scc_convergence_audit only. This ledger
generalizes it, the same pattern as tests/test_global_window_ledger:
every loop-bearing function in operators/graph.py must be classified
here as either

- "plain": per-round state joins the (cached) edge layout only —
  O(diameter) or a bounded-rounds contract; no doubling claim made.
- "jump": performs the label self-join. Requires (a) a documented
  VALID doubling argument (undirected min-label) in the docstring,
  and (b) a default round count <= JUMP_ROUNDS_MAX.

A new loop in graph.py fails the enumeration until classified; a
jump entry with an oversized default fails the threshold check.
Pure static analysis (ast) — no SparkSession.
"""

from __future__ import annotations

import ast
import os

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
GRAPH_PY = os.path.join(REPO, "hi_csa_db_spark", "operators", "graph.py")

# Past ~16 rounds the jump's per-round materialization cost turns
# exponential (NOTES.md round 10); every jump entry's default round
# count must sit below this.
JUMP_ROUNDS_MAX = 16

# function -> ("plain" | "jump", round-count parameter name)
LEDGER = {
    "pagerank": ("plain", "iterations"),
    "connected_components_fixpoint": ("jump", "rounds"),
    "personalized_pagerank_micro": ("plain", "iterations"),
    "connected_components": ("plain", "iterations"),
    "convergence_audit": ("plain", "rounds"),
    # two loops: the plain O(diameter) exact tier (exact_rounds) and
    # the audited bounded rounds — both plain by the r10 rewrite.
    "scc_convergence_audit": ("plain", "rounds"),
    "k_core": ("plain", "iterations"),
    "bfs": ("plain", "max_depth"),
    "label_propagation": ("plain", "iterations"),
    "hits": ("plain", "iterations"),
    "sssp": ("plain", "iterations"),
    "landmark_closeness": ("plain", "iterations"),
    "mst_boruvka": ("plain", "rounds"),
}


def _tree():
    with open(GRAPH_PY, encoding="utf-8") as fh:
        return ast.parse(fh.read())


def _loop_functions(tree):
    """Top-level function names whose body (including nested defs)
    contains a for/while loop."""
    out = {}
    for node in tree.body:
        if isinstance(node, (ast.FunctionDef, ast.AsyncFunctionDef)):
            loops = [
                n
                for n in ast.walk(node)
                if isinstance(n, (ast.For, ast.While))
            ]
            if loops:
                out[node.name] = node
    return out


def test_every_graph_loop_is_classified():
    fns = _loop_functions(_tree())
    assert set(fns) == set(LEDGER), (
        "operators/graph.py loop set drifted from the ledger — "
        f"unclassified: {sorted(set(fns) - set(LEDGER))}, "
        f"stale entries: {sorted(set(LEDGER) - set(fns))}. Classify "
        "new loops as plain propagation or a documented-doubling "
        "jump (NOTES.md round-10 lesson) and update SCALE.md."
    )


def test_rounds_params_exist_with_bounded_defaults():
    fns = _loop_functions(_tree())
    for name, (kind, param) in LEDGER.items():
        node = fns[name]
        args = node.args.args + node.args.kwonlyargs
        names = [a.arg for a in args]
        assert param in names, f"{name}: expected a `{param}` param"
        # map defaults to trailing positional args
        pos = node.args.args
        defaults = dict(
            zip([a.arg for a in pos[len(pos) - len(node.args.defaults):]],
                node.args.defaults)
        )
        for a, d in zip(node.args.kwonlyargs, node.args.kw_defaults):
            if d is not None:
                defaults[a.arg] = d
        d = defaults.get(param)
        # A default-less param (bfs.max_depth) is fine for plain
        # entries: the bound is caller-supplied. A present default
        # must be an integer literal either way.
        if d is not None:
            assert isinstance(d, ast.Constant) and isinstance(
                d.value, int
            ), f"{name}: `{param}` default must be an integer literal"
        if kind == "jump":
            assert d is not None, (
                f"{name}: jump-classified `{param}` needs an explicit "
                "integer default so the threshold below is checkable"
            )
            assert d.value <= JUMP_ROUNDS_MAX, (
                f"{name}: jump-classified with default {param}="
                f"{d.value} > {JUMP_ROUNDS_MAX} — past ~16 rounds the "
                "label self-join's per-round JVM cost is exponential "
                "(NOTES.md round 10); use plain propagation"
            )


def test_jump_entries_document_their_doubling_argument():
    fns = _loop_functions(_tree())
    for name, (kind, _param) in LEDGER.items():
        doc = ast.get_docstring(fns[name]) or ""
        if kind == "jump":
            assert "doubl" in doc.lower() and (
                "undirected" in doc.lower() or "hash-to-min" in doc.lower()
            ), (
                f"{name}: jump-classified but its docstring does not "
                "state the (undirected) doubling argument that makes "
                "the jump valid"
            )


def test_jump_classification_matches_the_code():
    """The label self-join is recognizable statically: inside the
    loop, a join whose condition compares the LABEL column against a
    renamed copy of the label frame. Proxy: jump functions mention
    'pointer jump' in a comment/docstring AND are the only ones that
    do."""
    with open(GRAPH_PY, encoding="utf-8") as fh:
        src = fh.read()
    # Per-function source slices via ast segment offsets.
    tree = _tree()
    fns = _loop_functions(tree)
    lines = src.splitlines()
    for name, node in fns.items():
        body_src = "\n".join(
            lines[node.lineno - 1 : node.end_lineno]
        ).lower()
        kind = LEDGER[name][0]
        performs_jump = "# pointer jump" in body_src
        if kind == "jump":
            assert performs_jump, (
                f"{name}: ledger says jump but the marker comment "
                "'# pointer jump' is absent at the self-join site"
            )
        else:
            assert not performs_jump, (
                f"{name}: ledger says plain but the body carries a "
                "'# pointer jump' site — reclassify or remove it"
            )
