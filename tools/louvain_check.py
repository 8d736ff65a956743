#!/usr/bin/env python3
"""Standalone Louvain harness: read an edge list, print communities, self-check.

Mirrors the reference's embedded module test (louvain.rs:358-426): file lines are
`<ignored> <node1> <node2> <weight>`; community weights are verified against the
raw graph.
"""
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from nextpolish2_tpu.models.louvain import (Louvain, insert_data, new_data,  # noqa: E402
                                            phase_communities)


def init_graph(path):
    data = new_data()
    with open(path) as f:
        for line in f:
            parts = line.split()
            if len(parts) < 4:
                continue
            insert_data(data, int(parts[1]), int(parts[2]), float(parts[3]))
    return data


def check(path, data, communities):
    raw = init_graph(path)
    for node in communities:
        w = 0.0
        for n1 in node.nodes:
            for n2 in node.nodes:
                w += raw.get(n1, {}).get(n2, 0.0)
        assert abs(w - node.weight * 2.0) < 1e-6, "faield check nodes weight"


def main() -> int:
    path = sys.argv[1]
    lv = Louvain(init_graph(path))
    data, communities = lv.execute()
    check(path, data, communities)
    for p, c in enumerate(communities):
        print(p, c.weight, len(c.nodes), sorted(c.nodes))
    invalid = phase_communities(init_graph(path), {})
    print(sorted(invalid))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
