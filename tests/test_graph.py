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
