"""Graph simplification: tip removal (L5).

Reference: /root/reference/src/clean_graph.rs.  A node is a tip when one
side has no extensions, the other at most one, and a user predicate holds
(typically ``len < 2K``); tips are censored and the graph re-compressed
(clean_graph.rs:30-51 + compression.rs:291).
"""

from __future__ import annotations

from typing import Callable, List, Optional, Sequence

import numpy as np

from tpu_debruijn import exts as E
from tpu_debruijn.graph import DebruijnGraph, Node, compress_graph


class CleanGraph:
    """clean_graph.rs:9-51 equivalent."""

    def __init__(self, tip_predicate: Callable[[Node], bool]):
        self.tip_predicate = tip_predicate

    def test_tip(self, graph: DebruijnGraph, node_id: int) -> Optional[int]:
        exts = int(graph.exts[node_id])
        nl = int(E.num_ext_dir(exts, E.LEFT))
        nr = int(E.num_ext_dir(exts, E.RIGHT))
        if nl > 0 and nr > 0:
            return None
        if ((nl == 0 and nr <= 1) or (nr == 0 and nl <= 1)) and self.tip_predicate(
            graph.get_node(node_id)
        ):
            return node_id
        return None

    def find_bad_nodes(self, graph: DebruijnGraph) -> List[int]:
        return [
            i for i in range(len(graph)) if self.test_tip(graph, i) is not None
        ]


def clean_tips(
    graph: DebruijnGraph,
    tip_predicate: Callable[[Node], bool],
    *,
    data_reduce: str = "sum_sat_u16",
) -> DebruijnGraph:
    """Convenience: find tips, censor them, re-compress."""
    bad = CleanGraph(tip_predicate).find_bad_nodes(graph)
    return compress_graph(graph, censor_nodes=bad, data_reduce=data_reduce)
