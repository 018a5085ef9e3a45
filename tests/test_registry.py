"""Stage registry (user-extension surface, SURVEY §2.11)."""

from __future__ import annotations

import pyarrow as pa
import pytest
import ray.data as rd

from etl_ray.stages import registry as R


def test_builtin_stages_listed():
    assert {"sha256", "token_count", "quality_metrics", "lang_id"} <= set(R.list_stages())


def test_duplicate_registration_rejected():
    with pytest.raises(ValueError):
        R.register_stage("sha256")(lambda b: b)


def test_unknown_stage():
    with pytest.raises(KeyError):
        R.get_stage("nope")


def test_apply_function_stage(ray_session):
    ds = rd.from_arrow(pa.table({"doc_id": [1, 2], "text": ["a b", "c"]}))
    out = R.apply_stage(ds, "token_count").to_pandas()
    assert list(out["n_tokens"]) == [2, 1]


def test_apply_actor_stage(ray_session):
    ds = rd.from_arrow(pa.table({"doc_id": [1], "text": ["the cat and the dog is here"]}))
    out = R.apply_stage(ds, "lang_id", concurrency=1).to_pandas()
    assert out["pred_lang"].iloc[0] == "en"


def test_custom_registration_and_apply(ray_session):
    @R.register_stage("double_test_stage")
    def double(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc
        return batch.set_column(0, "x", pc.multiply(batch.column("x"), 2))

    ds = rd.from_arrow(pa.table({"x": [1, 2, 3]}))
    assert R.apply_stage(ds, "double_test_stage").to_pandas()["x"].tolist() == [2, 4, 6]
