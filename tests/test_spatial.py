"""Grid-blocked spatial containment join (r14): planted-geometry
semantics, the exactly-once invariant, the fan-out guard, and the
brute-force-oracle equality at both SFs."""

import duckdb
import pytest

from pg_parquet_spark.operators import spatial
from pg_parquet_spark.session import table


def _points(spark, rows):
    return spark.createDataFrame(rows, "point_id long, px long, py long")


def _rects(spark, rows):
    return spark.createDataFrame(
        rows, "rect_id long, xmin long, ymin long, xmax long, ymax long"
    )


def test_containment_inclusive_edges_and_cell_crossing(spark):
    """All four edges are inclusive; a rectangle crossing a cell
    boundary still finds points in BOTH cells; a point outside by one
    unit on any axis is excluded."""
    cell = 100
    # rect spans x cells [0,1] (90..110), y cell 0 only
    rects = _rects(spark, [(1, 90, 10, 110, 20)])
    pts = _points(
        spark,
        [
            (10, 90, 10),   # xmin/ymin corner — inclusive
            (11, 110, 20),  # xmax/ymax corner — inclusive, other cell
            (12, 100, 15),  # interior, exactly on the cell boundary
            (13, 89, 15),   # one left of xmin
            (14, 111, 15),  # one right of xmax
            (15, 100, 21),  # one above ymax
        ],
    )
    got = (
        spatial.grid_containment_join(pts, rects, cell=cell)
        .orderBy("point_id")
        .collect()
    )
    assert [r.point_id for r in got] == [10, 11, 12]
    assert all(r.rect_id == 1 for r in got)


def test_exactly_once_no_dedup_needed(spark):
    """A rect covering 4 cells with a point it contains produces the
    pair ONCE — the point's single cell meets the rect's unique cell
    list (the invariant that lets the plan skip a distinct)."""
    cell = 10
    rects = _rects(spark, [(7, 5, 5, 15, 15)])  # cells (0,0)..(1,1)
    pts = _points(spark, [(1, 10, 10)])
    rows = spatial.grid_containment_join(pts, rects, cell=cell).collect()
    assert len(rows) == 1


def test_null_coordinates_drop(spark):
    rects = _rects(spark, [(1, 0, 0, 50, 50), (2, None, 0, 50, 50)])
    pts = _points(spark, [(1, 5, 5), (2, None, 5), (3, 5, None)])
    rows = spatial.grid_containment_join(pts, rects, cell=100).collect()
    assert [(r.rect_id, r.point_id) for r in rows] == [(1, 1)]


def test_degenerate_rect_emits_nothing(spark):
    """xmax < xmin produces an empty cell sequence, not an error —
    identical to the oracle's BETWEEN never matching."""
    rects = _rects(spark, [(1, 50, 0, 40, 10)])
    pts = _points(spark, [(1, 45, 5)])
    assert spatial.grid_containment_join(pts, rects, cell=100).count() == 0


def test_fanout_guard_raises_loudly(spark):
    """A rectangle spanning more cells than max_cells_per_axis is a
    cell-size misconfiguration — raise_error at execution, never a
    silent 10^6-row explode."""
    rects = _rects(spark, [(1, 0, 0, 1000, 5)])  # 11 cells on x
    pts = _points(spark, [(1, 5, 5)])
    df = spatial.grid_containment_join(
        pts, rects, cell=100, max_cells_per_axis=4
    )
    with pytest.raises(Exception, match="spans more than 4 cells"):
        df.collect()
    # same geometry with a big-enough bound passes
    ok = spatial.grid_containment_join(
        pts, rects, cell=100, max_cells_per_axis=16
    )
    assert ok.count() == 1


def test_missing_column_fails_fast(spark):
    pts = _points(spark, [(1, 5, 5)])
    with pytest.raises(ValueError, match="missing required column"):
        spatial.grid_containment_join(pts, pts.withColumnRenamed(
            "point_id", "rect_id"), cell=100)


def test_bad_params_fail_fast(spark):
    pts = _points(spark, [(1, 5, 5)])
    rects = _rects(spark, [(1, 0, 0, 9, 9)])
    with pytest.raises(ValueError, match="cell must be positive"):
        spatial.grid_containment_join(pts, rects, cell=0)
    with pytest.raises(ValueError, match="max_cells_per_axis"):
        spatial.grid_containment_join(pts, rects, cell=10,
                                      max_cells_per_axis=0)
    with pytest.raises(ValueError, match="extent_bits"):
        spatial.hash_rects(rects, "rect_id", extent_bits=0)


@pytest.mark.parametrize("sf", ["/root/testdata/sf0.001",
                                "/root/testdata/sf0.01"])
def test_matches_brute_force_oracle(spark, sf):
    """The grid join equals the all-pairs DuckDB cross join at both
    SFs — completeness AND exactness of the blocking."""
    pts = spatial.hash_points(table(spark, sf, "customer"), "c_custkey")
    rcs = spatial.hash_rects(table(spark, sf, "supplier"), "s_suppkey")
    got = (
        spatial.grid_containment_join(pts, rcs)
        .orderBy("rect_id", "point_id")
        .toPandas()
    )
    con = duckdb.connect()
    for t in ("customer", "supplier"):
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf}/{t}.parquet')"
        )
    want = con.execute(spatial.spatial_join_oracle_sql()).df()
    assert len(got) == len(want) > 0
    for col in got.columns:
        assert list(got[col]) == list(want[col]), (sf, col)


def test_plan_is_cell_equi_join_not_cartesian(spark):
    """The physical plan must join on the cell keys (hash/broadcast
    equi-join) with containment as a post-condition — CartesianProduct
    or BroadcastNestedLoopJoin means the blocking regressed."""
    sf = "/root/testdata/sf0.001"
    pts = spatial.hash_points(table(spark, sf, "customer"), "c_custkey")
    rcs = spatial.hash_rects(table(spark, sf, "supplier"), "s_suppkey")
    plan = (
        spatial.grid_containment_join(pts, rcs)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert "HashJoin" in plan


def test_nn_join_planted_geometry(spark):
    """NN join (r14): nearest-by-distance wins, ties break on the
    smaller id, out-of-radius points report NULL, NULL coords drop,
    and a b-point in a DIAGONAL neighbor cell is still found (the
    3x3 completeness the cell >= d_max contract buys)."""
    a = _points(spark, [
        (1, 100, 100),
        (2, 500, 500),    # nothing within 50
        (3, 105, 100),    # equidistant from b-ids 10 and 11
        (4, None, 5),
    ])
    b = _points(spark, [
        (10, 110, 100),   # 10 from a1, 5 from a3
        (11, 100, 100),   # 0 from a1, 5 from a3  -> tie at a3
        (12, 149, 149),   # diagonal-cell neighbor of (100,100) at cell=50
    ])
    got = {r.point_id: (r.nn_id, r.dist2) for r in
           spatial.nearest_neighbor_join(a, b, d_max=50, cell=50).collect()}
    assert got[1] == (11, 0)
    assert got[2] == (None, None)
    # tie: both at dist2=25 -> smaller b_id
    assert got[3] == (10, 25)
    assert 4 not in got  # NULL coords drop entirely

    # diagonal completeness: a in cell (2,2) at its far corner, b in
    # the diagonal neighbor cell (3,3) — only the 3x3 probe finds it
    a2 = _points(spark, [(7, 149, 149)])
    b2 = _points(spark, [(20, 151, 151)])  # next diagonal cell (3,3)
    got2 = spatial.nearest_neighbor_join(a2, b2, d_max=50, cell=50).collect()
    assert (got2[0].nn_id, got2[0].dist2) == (20, 8)

    import pytest as _pytest

    with _pytest.raises(ValueError, match="d_max"):
        spatial.nearest_neighbor_join(a, b, d_max=0)
    with _pytest.raises(ValueError, match="cell"):
        spatial.nearest_neighbor_join(a, b, d_max=100, cell=50)


def test_nn_join_matches_brute_force_oracle(spark):
    """Gate replica at sf0.01: equality against the all-pairs oracle
    proves the 3x3 blocking loses no in-radius neighbor and the tie
    rule matches."""
    import duckdb

    sf = "/root/testdata/sf0.01"
    pa = spatial.hash_points(table(spark, sf, "customer"), "c_custkey")
    pb = spatial.hash_points(table(spark, sf, "supplier"), "s_suppkey")
    got = spatial.nearest_neighbor_join(pa, pb, d_max=16384).toPandas()
    con = duckdb.connect()
    for t in ("customer", "supplier"):
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf}/{t}.parquet')"
        )
    want = con.execute(spatial.nn_join_oracle_sql(d_max=16384)).df()
    assert len(got) == len(want) > 0
    for col in got.columns:
        assert list(got[col].fillna(-1)) == list(want[col].fillna(-1)), col
    assert got["nn_id"].notna().sum() > 0
    assert got["nn_id"].isna().sum() > 0  # both outcomes exercised


def test_inverted_rect_emits_nothing_and_cannot_explode(spark):
    """Review (r14): an inverted rectangle (xmax < xmin) must produce
    ZERO rows — and must be filtered BEFORE the explode, because
    F.sequence defaults to step -1 when start > stop, so a wildly
    inverted rect would otherwise generate millions of descending
    cells AND slip past the span guard (negative span < max)."""
    rects = _rects(spark, [
        (1, 10**9, 0, 0, 5),        # x-inverted, 10^7-cell span if exploded
        (2, 0, 10**9, 5, 0),        # y-inverted
        (3, 0, 0, 50, 50),          # sane control
    ])
    pts = _points(spark, [(1, 5, 5)])
    rows = spatial.grid_containment_join(pts, rects, cell=100).collect()
    assert [(r.rect_id, r.point_id) for r in rows] == [(3, 1)]
