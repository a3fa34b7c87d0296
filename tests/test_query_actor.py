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
