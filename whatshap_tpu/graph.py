"""
Connected components (union-find with minimum-value representative) and a
toposortable directed graph.  Parity with whatshap/graph.py — phase blocks
are identified by the position of their left-most variant, hence the
min-representative requirement.
"""

from collections import OrderedDict
from typing import Generic, Iterable, Optional, TypeVar

C = TypeVar("C")


class Node(Generic[C]):
    __slots__ = ("value", "parent")

    def __init__(self, value: C, parent: Optional["Node"]):
        self.value = value
        self.parent = parent

    def __repr__(self):
        return f"Node(value={self.value}, parent={self.parent})"


class ComponentFinder(Generic[C]):
    """Union-find where find(x) returns the minimum value of x's set."""

    def __init__(self, values: Iterable[C]):
        self.nodes = {value: Node(value, None) for value in values}

    def merge(self, x: C, y: C) -> None:
        assert x != y
        x_root = self._find_node(x)
        y_root = self._find_node(y)
        if x_root is y_root:
            return
        # the node with the smaller value becomes the new parent
        if x_root.value < y_root.value:
            y_root.parent = x_root
        else:
            x_root.parent = y_root

    def _find_node(self, value: C) -> Node:
        node = root = self.nodes[value]
        while root.parent is not None:
            root = root.parent
        # path compression
        while node.parent is not None:
            node.parent, node = root, node.parent
        return root

    def find(self, value: C) -> C:
        return self._find_node(value).value

    def print(self):
        for x in sorted(self.nodes):
            print(x, ":", self.nodes[x], "is represented by", self._find_node(x))


class CyclicGraphError(Exception):
    pass


class Graph:
    """Directed graph with topological sort (DFS, raises on cycles)."""

    def __init__(self):
        self._neighbors = OrderedDict()

    def add_edge(self, node1, node2):
        """The edge is directed from node1 to node2"""
        if node1 not in self._neighbors:
            self._neighbors[node1] = []
        self._neighbors[node1].append(node2)
        if node2 not in self._neighbors:
            self._neighbors[node2] = []

    def toposorted(self):
        """Nodes sorted such that for each edge u -> v, v appears before u."""
        order = []
        colors = {node: "white" for node in self._neighbors}

        def visit(node):
            assert colors[node] == "white"
            colors[node] = "gray"
            for neighbor in self._neighbors[node]:
                if colors[neighbor] == "white":
                    visit(neighbor)
                elif colors[neighbor] == "gray":
                    raise CyclicGraphError(
                        f"Cycle involving {node!r} and {neighbor!r} detected"
                    )
            order.append(node)
            colors[node] = "black"

        for node in self._neighbors:
            if colors[node] == "white":
                visit(node)
        return order
