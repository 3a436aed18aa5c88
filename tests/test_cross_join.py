"""cross_join op: product correctness, chunk bounding, collision
suffix, loud size guard."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pytest
import ray.data as rd

from rayflow.ops import build_op


def test_cross_join_product_and_suffix():
    left = rd.from_arrow(pa.table({"k": [1, 2, 3], "v": ["a", "b", "c"]}))
    right = pa.table({"k": [10, 20], "w": [1.5, 2.5]})
    out = build_op({"op": "cross_join", "small": right})(left).take_all()
    assert len(out) == 6
    # right's colliding column got the suffix
    assert set(out[0].keys()) == {"k", "v", "k_r", "w"}
    pairs = {(r["k"], r["k_r"]) for r in out}
    assert pairs == {(a, b) for a in (1, 2, 3) for b in (10, 20)}


def test_cross_join_chunk_bounding_matches_unchunked():
    left = rd.from_arrow(pa.table({"a": np.arange(100, dtype=np.int64)}))
    right = pa.table({"b": np.arange(7, dtype=np.int64)})
    big = build_op({"op": "cross_join", "small": right})(left).take_all()
    tiny = build_op({"op": "cross_join", "small": right,
                     "out_chunk_rows": 3})(left).take_all()
    key = lambda r: (r["a"], r["b"])
    assert sorted(map(key, big)) == sorted(map(key, tiny))
    assert len(big) == 700


def test_cross_join_size_guard_fails_loud():
    right = pa.table({"x": np.zeros(1 << 20, dtype=np.int64)})
    with pytest.raises(ValueError, match="cross_join"):
        build_op({"op": "cross_join", "small": right,
                  "broadcast_bytes_limit": 1024})


def test_cross_join_empty_left_keeps_schema():
    left = rd.from_arrow(pa.table({"a": pa.array([], pa.int64())}))
    right = pa.table({"b": [1, 2]})
    out = build_op({"op": "cross_join", "small": right})(left)
    assert out.take_all() == []  # empty product, no schema-union crash
