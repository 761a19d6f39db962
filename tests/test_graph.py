"""Unit coverage for the graph-analytics helpers behind graph_triangles
(the end-to-end query itself is oracle-checked in test_queries_oracle.py)."""

import itertools

import numpy as np

from movex_cdc_ray.pipelines.queries import _pair_explode


def _brute_pairs(keys, vals):
    out = set()
    groups = {}
    for k, v in zip(keys, vals):
        groups.setdefault(k, []).append(v)
    for vs in groups.values():
        for a, b in itertools.combinations(sorted(vs), 2):
            out.add((a, b))
    return out


def test_pair_explode_matches_itertools():
    rng = np.random.default_rng(7)
    for trial in range(20):
        n_groups = int(rng.integers(1, 30))
        keys, vals = [], []
        for g in range(n_groups):
            size = int(rng.integers(1, 9))
            members = rng.choice(1000, size=size, replace=False)
            keys.extend([g] * size)
            vals.extend(members.tolist())
        order = np.lexsort((vals, keys))
        k = np.asarray(keys, dtype=np.int64)[order]
        v = np.asarray(vals, dtype=np.int64)[order]
        u_out, v_out = _pair_explode(k, v)
        got = set(zip(u_out.tolist(), v_out.tolist()))
        assert got == _brute_pairs(keys, vals)
        assert (u_out < v_out).all()


def test_pair_explode_empty_and_singletons():
    k = np.array([1, 2, 3], dtype=np.int64)
    v = np.array([10, 20, 30], dtype=np.int64)
    u_out, v_out = _pair_explode(k, v)
    assert len(u_out) == 0 and len(v_out) == 0
    e = np.array([], dtype=np.int64)
    u_out, v_out = _pair_explode(e, e)
    assert len(u_out) == 0 and len(v_out) == 0


def test_kcenter_matches_bruteforce(ray_session):
    import pandas as pd
    import ray.data as rd

    from movex_cdc_ray.functions.similarity import _kc_quantize, kcenter_select

    rng = np.random.default_rng(11)
    n, d, k = 40, 6, 5
    vecs = rng.normal(scale=0.3, size=(n, d)).astype(np.float32)
    ids = np.arange(100, 100 + n, dtype=np.int64)
    df = pd.DataFrame({"vec_id": ids, "embedding": [v.tolist() for v in vecs]})

    got = kcenter_select(rd.from_pandas(df), k=k)

    # brute force: same quantization, same greedy argmax with min-id ties
    q = _kc_quantize(vecs.astype(np.float64))
    chosen = [int(np.argmin(ids))]
    exp = [(0, int(ids[chosen[0]]), 0)]
    mind = ((q - q[chosen[0]]) ** 2).sum(axis=1)
    for step in range(1, k):
        best = np.lexsort((ids, -mind))[0]
        exp.append((step, int(ids[best]), int(mind[best])))
        mind = np.minimum(mind, ((q - q[best]) ** 2).sum(axis=1))
    assert list(map(tuple, got[["step", "vec_id", "d2"]].to_numpy())) == exp
