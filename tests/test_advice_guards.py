"""Guards added for edge cases flagged in review: composite-key
injectivity, zero-weight sampling, k-means argument/overflow bounds."""

import numpy as np
import pyarrow as pa
import pytest


def test_composite_key_rejects_separator_in_repo():
    from etl_ray.pipelines.replay import DIFF_SEP, composite_key

    good = composite_key(pa.array(["a", "b"]), pa.array([f"x{DIFF_SEP}y", "z"]))
    # path may contain the separator — max_splits=1 decoding recovers it
    assert good.to_pylist() == [f"a{DIFF_SEP}x{DIFF_SEP}y", f"b{DIFF_SEP}z"]
    with pytest.raises(ValueError, match="separator"):
        composite_key(pa.array([f"a{DIFF_SEP}b"]), pa.array(["c"]))


def test_kmeans_rejects_zero_iters(ray_session):
    import ray.data as rd

    from etl_ray.functions.similarity import kmeans_lloyd

    t = pa.table({
        "vec_id": pa.array([0, 1], pa.int64()),
        "embedding": pa.array([[0.0, 1.0], [1.0, 0.0]],
                              pa.list_(pa.float32())),
    })
    with pytest.raises(ValueError, match="iters"):
        kmeans_lloyd(rd.from_arrow(t), k=2, iters=0)


def test_kmeans_overflow_guard(ray_session):
    import ray.data as rd

    from etl_ray.functions.similarity import kmeans_lloyd

    # |x| = 4e6 → milli 4e9, micro-scaled 4e12; d=2 → (2·4e12)² · 2 ≫ 2^63
    t = pa.table({
        "vec_id": pa.array([0, 1, 2], pa.int64()),
        "embedding": pa.array([[4e6, -4e6], [1.0, 2.0], [3.0, 4.0]],
                              pa.list_(pa.float32())),
    })
    # Ray wraps worker exceptions in RayTaskError — match on the message
    with pytest.raises(Exception, match="int64"):
        kmeans_lloyd(rd.from_arrow(t), k=2, iters=2)
