"""Size-based broadcast-dim strategy switch (relational.BROADCAST_DIM_ROW_LIMIT).

The TPC-H shapes attach dimension tables as dense ray.put numpy arrays —
megabytes at the graded SFs, but the arrays grow with scale factor. Above
the row limit each query must route the dim through stages/joins.hash_join /
semi_join instead. These tests force the join path (broadcast_limit=0) and
pin output equality against the dense-broadcast default.
"""

from __future__ import annotations

import pandas as pd

from ehr_relation_extraction_ray.pipelines import relational as r

SF = "/root/testdata/sf0.001"


def test_segment_priority_revenue_switch(ray_session):
    dense = r.segment_priority_revenue(SF)
    joined = r.segment_priority_revenue(SF, broadcast_limit=0)
    pd.testing.assert_frame_equal(dense, joined)


def test_local_supplier_volume_switch(ray_session):
    dense = r.local_supplier_volume(SF)
    joined = r.local_supplier_volume(SF, broadcast_limit=0)
    pd.testing.assert_frame_equal(dense, joined)


def test_rich_inactive_customers_switch(ray_session):
    dense = r.rich_inactive_customers(SF)
    joined = r.rich_inactive_customers(SF, broadcast_limit=0)
    pd.testing.assert_frame_equal(dense, joined)
