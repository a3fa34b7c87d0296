"""Distributed graph primitives (ops/graph.py): connected components via
star contraction, bucketed side-table joins, streamed anti-join filter."""

import numpy as np
import pyarrow as pa
import pytest


def _uf_reference(edges):
    parent = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    return {n: find(n) for n in parent}


def _pairs_ds(edges):
    import ray.data

    return ray.data.from_arrow(
        pa.table(
            {
                "id_a": pa.array([a for a, _ in edges], type=pa.int64()),
                "id_b": pa.array([b for _, b in edges], type=pa.int64()),
            }
        )
    ).repartition(3)


class TestConnectedComponents:
    @pytest.mark.parametrize(
        "edges",
        [
            [(1, 2)],
            [(1, 2), (2, 3), (3, 4)],                  # path
            [(1, 2), (2, 3), (1, 3)],                  # triangle
            [(10, 11), (20, 21), (21, 22), (5, 40)],   # forest
            [(i, i + 1) for i in range(30)],           # long path (diameter)
            [(0, i) for i in range(1, 50)],            # star
        ],
    )
    def test_matches_union_find(self, ray_session, edges):
        from searchengine_ray.ops.graph import connected_components

        labels = {
            r["node"]: r["root"]
            for r in connected_components(_pairs_ds(edges)).take_all()
        }
        assert labels == _uf_reference(edges)

    def test_random_graph(self, ray_session):
        from searchengine_ray.ops.graph import connected_components

        rng = np.random.default_rng(11)
        edges = [
            (int(a), int(b))
            for a, b in rng.integers(0, 400, size=(300, 2))
            if a != b
        ]
        labels = {
            r["node"]: r["root"]
            for r in connected_components(_pairs_ds(edges)).take_all()
        }
        assert labels == _uf_reference(edges)

    def test_distributed_path_parity(self, ray_session, monkeypatch):
        """Force the distributed rounds on a small graph: identical
        labels to the single-task fast path / union-find."""
        import searchengine_ray.ops.graph as g
        from searchengine_ray.ops.graph import connected_components

        monkeypatch.setattr(g, "CC_SMALL_GRAPH_EDGES", 0)
        edges = [(1, 2), (2, 3), (10, 11), (11, 12), (12, 10), (40, 5)]
        labels = {
            r["node"]: r["root"]
            for r in connected_components(_pairs_ds(edges)).take_all()
        }
        assert labels == _uf_reference(edges)

    def test_duplicate_edges(self, ray_session):
        from searchengine_ray.ops.graph import connected_components

        edges = [(1, 2), (2, 1), (1, 2), (2, 3), (2, 3)]
        labels = {
            r["node"]: r["root"]
            for r in connected_components(_pairs_ds(edges)).take_all()
        }
        assert labels == {1: 1, 2: 1, 3: 1}

    def test_empty(self, ray_session):
        from searchengine_ray.ops.graph import connected_components

        assert connected_components(_pairs_ds([])).take_all() == []

    def test_million_edge_graph(self, ray_session):
        """1M+ edges through the bucketed segment-math contraction
        (VERDICT r2 #4 'done' criterion): 25k clusters of 40 nodes each,
        random-attachment trees plus extra random intra-cluster edges;
        every node must label to its cluster's minimum."""
        import ray.data

        rng = np.random.default_rng(7)
        size, n_clusters = 40, 25_000
        n = size * n_clusters
        node = np.arange(n, dtype=np.int64)
        base = (node // size) * size
        # tree edge: each non-root attaches to a random earlier member
        nonroot = node[node % size != 0]
        attach = base[nonroot] + rng.integers(0, nonroot % size)
        # extra random intra-cluster edges to pass 1M total
        extra_a = base + rng.integers(0, size, size=n)
        extra_b = base + rng.integers(0, size, size=n)
        id_a = np.concatenate([nonroot, extra_a])
        id_b = np.concatenate([attach, extra_b])
        assert id_a.size > 1_000_000
        ds = ray.data.from_arrow(
            pa.table({"id_a": pa.array(id_a), "id_b": pa.array(id_b)})
        ).repartition(16)
        from searchengine_ray.ops.graph import connected_components

        out = connected_components(ds).take_all()
        got_node = np.asarray([r["node"] for r in out], dtype=np.int64)
        got_root = np.asarray([r["root"] for r in out], dtype=np.int64)
        assert np.array_equal(got_root, (got_node // size) * size)
        # every non-root node appears (self-paired extras may drop roots)
        assert np.unique(got_node).size >= n - n_clusters


class TestAntiJoin:
    def test_filters_only_listed_ids(self, ray_session, tmp_path):
        import ray.data

        from searchengine_ray.ops.graph import anti_join_ids, write_drop_ids

        n = 5_000
        ds = ray.data.from_arrow(
            pa.table({"doc_id": pa.array(range(n), type=pa.int64())})
        ).repartition(8)
        drop = list(range(0, n, 7))
        drop_dir = str(tmp_path / "drops")
        cnt = write_drop_ids(
            ray.data.from_arrow(
                pa.table({"drop_id": pa.array(drop, type=pa.int64())})
            ),
            drop_dir,
        )
        assert cnt == len(drop)
        kept = sorted(
            r["doc_id"] for r in anti_join_ids(ds, drop_dir, "doc_id").take_all()
        )
        assert kept == sorted(set(range(n)) - set(drop))


class TestBucketedJoin:
    def test_attach_values(self, ray_session, tmp_path):
        import ray.data

        from searchengine_ray.ops.graph import attach_bucketed, write_bucketed

        n = 1_000
        side = ray.data.from_arrow(
            pa.table(
                {
                    "doc_id": pa.array(range(n), type=pa.int64()),
                    "val": pa.array([i * 10 for i in range(n)],
                                    type=pa.int64()),
                }
            )
        ).repartition(4)
        side_dir = str(tmp_path / "side")
        write_bucketed(side, "doc_id", side_dir, 8)

        pairs = ray.data.from_arrow(
            pa.table(
                {
                    "id_a": pa.array([1, 5, 900], type=pa.int64()),
                    "id_b": pa.array([2, 17, 901], type=pa.int64()),
                }
            )
        )

        def attach(group: pa.Table, lookup) -> pa.Table:
            a = group.column("id_a").to_numpy(zero_copy_only=False)
            b = group.column("id_b").to_numpy(zero_copy_only=False)
            t = lookup(np.concatenate([a, b]))
            ids = t.column("doc_id").to_numpy(zero_copy_only=False)
            order = np.argsort(ids)
            ids, vals = ids[order], t.column("val").to_numpy(
                zero_copy_only=False)[order]
            return pa.table(
                {
                    "id_a": pa.array(a, type=pa.int64()),
                    "id_b": pa.array(b, type=pa.int64()),
                    "sum_val": pa.array(
                        vals[np.searchsorted(ids, a)]
                        + vals[np.searchsorted(ids, b)],
                        type=pa.int64(),
                    ),
                }
            )

        out = {
            (r["id_a"], r["id_b"]): r["sum_val"]
            for r in attach_bucketed(
                pairs, side_dir, 8, "doc_id", ["val"], attach
            ).take_all()
        }
        assert out == {(1, 2): 30, (5, 17): 220, (900, 901): 18010}


class TestScratchRoot:
    """SE_RAY_SCRATCH_ROOT redirects every dedup/graph side table (the
    multi-node deployment hook: point it at shared storage)."""

    def test_env_root_redirects_side_tables(
        self, ray_session, tmp_path, monkeypatch
    ):
        import ray.data

        from searchengine_ray.ops import graph
        from searchengine_ray.ops.dedup import exact_dedup

        root = tmp_path / "shared_store"
        root.mkdir()
        monkeypatch.setenv(graph.SCRATCH_ROOT_ENV, str(root))
        assert graph.scratch_root() == str(root)
        d = graph.scratch_dir("unit")
        assert d.startswith(str(root))

        # An end-to-end op whose drop list lives under the custom root.
        ds = ray.data.from_arrow(
            pa.table(
                {
                    "doc_id": pa.array(range(6), type=pa.int64()),
                    "text": ["a", "b", "a", "c", "b", "a"],
                }
            )
        ).repartition(3)
        kept = sorted(r["doc_id"] for r in exact_dedup(ds).take_all())
        assert kept == [0, 1, 3]
        made = [p.name for p in (root / "searchengine_ray_ops").iterdir()]
        assert any(n.startswith("exact_drop_") for n in made)

    def test_default_root_is_local_tmp(self, monkeypatch):
        import tempfile

        from searchengine_ray.ops import graph

        monkeypatch.delenv(graph.SCRATCH_ROOT_ENV, raising=False)
        assert graph.scratch_root() == tempfile.gettempdir()
