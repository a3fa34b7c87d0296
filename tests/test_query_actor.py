"""Actor-pool query serving: QueryActor as a map_batches stage."""

import numpy as np


def test_query_actor_batch(ray_session, built_index, engine):
    import ray.data

    from searchengine_ray.query.engine import QueryActor

    index_dir, _ = built_index
    queries = {
        "query": ["search engine", "def return", "search -engine"],
        "mode": ["bm25", "default", "bool"],
    }
    ds = ray.data.from_items(
        [
            {"query": q, "mode": m}
            for q, m in zip(queries["query"], queries["mode"])
        ]
    )
    out = ds.map_batches(
        QueryActor,
        fn_constructor_args=(index_dir,),
        batch_size=2,
        concurrency=1,
    ).take_all()
    by_q = {(r["query"], r["mode"]): r for r in out}

    want_bm25 = engine.ranked_query("search engine", use_okapi=True, top_k=10)
    got = by_q[("search engine", "bm25")]
    assert list(got["doc_ids"]) == [d for d, _ in want_bm25]
    assert np.allclose(got["scores"], [s for _, s in want_bm25])

    want_bool = engine.boolean_query("search -engine")
    got_b = by_q[("search -engine", "bool")]
    assert list(got_b["doc_ids"]) == list(want_bool)


class TestShardedPool:
    """DiskIndexReader(buckets=...) actually exercised: a pool of shard
    actors each serving a bucket subset must be rank-identical to the
    single-process engine (VERDICT r1 'Next round' #9)."""

    def test_ranked_matches_single_engine(self, ray_session, built_index,
                                          engine):
        from searchengine_ray.query.sharded import ShardedQueryPool

        index_dir, _ = built_index
        pool = ShardedQueryPool(index_dir, num_shards=3)
        for q in ("search engine", "def return value", "whale ahab sea"):
            for okapi in (True, False):
                want = engine.ranked_query(q, use_okapi=okapi, top_k=10,
                                           use_wand=False)
                got = pool.ranked_query(q, use_okapi=okapi, top_k=10)
                assert [d for d, _ in got] == [d for d, _ in want], q
                assert np.allclose([s for _, s in got],
                                   [s for _, s in want]), q

    def test_boolean_matches_single_engine(self, ray_session, built_index,
                                           engine):
        from searchengine_ray.query.sharded import ShardedQueryPool

        index_dir, _ = built_index
        pool = ShardedQueryPool(index_dir, num_shards=3)
        for q in ('search engine', 'search + engine', 'search -engine',
                  '"search engine"'):
            want = engine.boolean_query(q)
            got = pool.boolean_query(q)
            assert list(got) == list(want), q

    def test_ranked_many_throughput_path(self, ray_session, built_index,
                                         engine):
        from searchengine_ray.query.sharded import ShardedQueryPool

        index_dir, _ = built_index
        pool = ShardedQueryPool(index_dir, num_shards=2)
        queries = ["search engine", "def return", "whale sea"]
        outs = pool.ranked_many(queries, top_k=5)
        for q, got in zip(queries, outs):
            want = engine.ranked_query(q, use_okapi=True, top_k=5,
                                       use_wand=False)
            assert [d for d, _ in got] == [d for d, _ in want]
