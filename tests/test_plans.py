"""Plan-shape regression guards: the performance properties claimed in
BASELINE.md/README must be visible in the physical plans — broadcast hash
joins on dimensions, filters pushed into scans, no cartesian products where
an equi component exists."""

import contextlib
import io

import pytest

from zarr_datafusion_search_spark.plans.registry import load_all

REG = load_all()


def plan_of(spark, name, sf_dir) -> str:
    df = REG[name].spark(spark, sf_dir)
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


@pytest.mark.parametrize(
    "name", ["q3_shipping_priority", "q5_local_supplier_volume", "broadcast_dim_join"]
)
def test_dimension_joins_broadcast(spark, sf_dir, name):
    plan = plan_of(spark, name, sf_dir)
    assert "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan


def test_filters_reach_parquet_scan(spark, sf_dir):
    plan = plan_of(spark, "q6_forecast_revenue", sf_dir)
    pushed = [l for l in plan.splitlines() if "PushedFilters" in l]
    assert any("l_shipdate" in l for l in pushed), pushed


def test_theta_join_keeps_equi_component(spark, sf_dir):
    """The inequality must ride on a hash join (equi on nationkey), not
    force a cartesian/BNL plan."""
    plan = plan_of(spark, "theta_join", sf_dir)
    assert "CartesianProduct" not in plan
    assert "HashJoin" in plan  # broadcast or shuffled, either is fine


def test_semi_anti_planned_as_joins(spark, sf_dir):
    for name, kind in [("semi_join", "LeftSemi"), ("anti_join", "LeftAnti")]:
        plan = plan_of(spark, name, sf_dir)
        assert kind in plan, f"{name} missing {kind}\n{plan[:500]}"


def test_zarr_scan_shows_pushed_filters(spark, parity_store):
    from zarr_datafusion_search_spark import ZarrTable

    df = ZarrTable(parity_store, "/meta").to_df(spark)
    filtered = df.filter("collection = 'collection_a'")
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        filtered.explain("formatted")
    plan = buf.getvalue()
    assert "PushedFilters: [EqualTo(collection,collection_a)]" in plan


def test_topk_uses_take_ordered(spark, sf_dir):
    plan = plan_of(spark, "full_scan_limit", sf_dir)
    assert "TakeOrderedAndProject" in plan
