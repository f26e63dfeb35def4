"""Ported from S2CellTransformerSpec.scala:11-43 plus structural
invariants of the S2 cell scheme (face bits, parent containment,
scalar/vectorized equivalence, known geography prefixes)."""

from __future__ import annotations

import math

import numpy as np
import pytest

from spark_ext_spark.functions.s2 import (cell_id_from_lat_lng, cell_token,
                                          cell_tokens, parent_id, token)
from spark_ext_spark.operators.s2cell import S2CellTransformer

CITIES = [
    ("New York", 40.7142700, -74.0059700),
    ("London", 51.50722, -0.12750),
    ("Princeton", 40.3487200, -74.6590500),
]


@pytest.fixture(scope="module")
def cities(spark):
    return spark.createDataFrame(CITIES, "city string, lat double, lon double")


def test_level6_ny_princeton_share_cell(cities):
    t = S2CellTransformer(level=6)
    cells = {r["city"]: r["cell"] for r in t.transform(cities).collect()}
    assert cells["New York"] == cells["Princeton"]
    assert cells["London"] != cells["New York"]


def test_level12_all_distinct(cities):
    t = S2CellTransformer(level=12)
    cells = {r["city"]: r["cell"] for r in t.transform(cities).collect()}
    assert len(set(cells.values())) == 3


def test_known_geography_prefixes():
    # NYC leaf cells live under face-4 token prefix 89c2..., central
    # London under 4876... (public S2 region-coverer examples).
    assert cell_token(40.71427, -74.00597, 12).startswith("89c2")
    assert cell_token(51.50722, -0.12750, 12).startswith("4876")


def test_face_cells():
    # (0,0) is the center of face 0 -> level-0 token "1";
    # the north pole is on face 2 -> level-0 token "5".
    assert cell_token(0.0, 0.0, 0) == "1"
    assert cell_token(90.0, 0.0, 0) == "5"
    assert cell_token(-90.0, 0.0, 0) == "b"  # face 5


def test_leaf_ids_are_odd_and_parents_nest():
    leaf = cell_id_from_lat_lng(40.71427, -74.00597)
    assert leaf & 1 == 1
    p12, p6 = parent_id(leaf, 12), parent_id(leaf, 6)
    # parent at coarser level strips finer bits: p6 is an ancestor of p12
    lsb6 = p6 & (~p6 + 1) & 0xFFFFFFFFFFFFFFFF
    assert (p12 & ~(2 * lsb6 - 1)) == (p6 & ~(2 * lsb6 - 1))
    assert token(p12) != token(p6)


def test_vectorized_matches_scalar():
    rng = np.random.default_rng(42)
    lats = rng.uniform(-89.9, 89.9, 500)
    lons = rng.uniform(-180, 180, 500)
    for level in (0, 6, 12, 30):
        vec = cell_tokens(lats, lons, level)
        for la, lo, tok in zip(lats, lons, vec):
            assert tok == cell_token(float(la), float(lo), level)


def test_vectorized_tie_break_matches_scalar_on_cube_corners():
    """Exact |x|==|y|==|z| ties (cube corners) and axis ties must pick
    the same face as the scalar path — np.argmax's first-wins rule
    diverged here (face 0 vs the canonical later-axis preference)."""
    corner = math.degrees(math.atan(1 / math.sqrt(2)))  # 35.2643896...
    pts = [(corner, 45.0), (-corner, -135.0), (corner, 135.0),
           (45.0, 90.0), (0.0, 45.0), (90.0, 0.0), (-90.0, 0.0),
           (0.0, 0.0), (0.0, 180.0), (0.0, -90.0)]
    for level in (4, 10, 30):
        got = cell_tokens(np.array([p[0] for p in pts]),
                          np.array([p[1] for p in pts]), level)
        want = [cell_token(la, lo, level) for la, lo in pts]
        assert got == want


def test_vectorized_nan_coordinates_yield_none():
    """NaN (null upstream) lat/lon must produce None, not a plausible
    face-0 token that silently pollutes downstream cell aggregates."""
    toks = cell_tokens(np.array([float("nan"), 10.0, 20.0]),
                       np.array([0.0, float("nan"), 30.0]), 10)
    assert toks[0] is None and toks[1] is None
    assert toks[2] == cell_token(20.0, 30.0, 10)


def test_default_params_and_validation(cities):
    t = S2CellTransformer()
    out = t.transform(cities)
    assert "cell" in out.columns  # default cellCol
    with pytest.raises(ValueError):
        S2CellTransformer(level=31).transform(cities)
    with pytest.raises(ValueError, match="already exists"):
        S2CellTransformer(cellCol="lat").transform(cities)
    bad = cities.withColumn("lat", cities.lat.cast("string"))
    with pytest.raises(TypeError):
        S2CellTransformer().transform(bad)


def test_grid_points_clear_level4_boundaries():
    """ADVICE r4: the s2_cells oracle's robustness argument says trig
    ULP drift cannot flip a level-4 parent because no synthetic grid
    point sits within ~2^-26 of a cell boundary. Make that claim
    STRUCTURAL: compute the ST coordinates of every distinct
    (lat, lon) the query generates (period lcm(160,360)=1440 in
    c_custkey) and assert each is > 2^-26 away from every level-4
    boundary (multiples of 2^-4 in ST) — so a numpy/DuckDB libm
    upgrade can shift leaf bits but never the driver-checked token."""
    import math

    from spark_ext_spark.functions.s2 import _st_from_uv, _xyz_to_face_uv

    margin = 2.0 ** -26
    worst = 1.0
    for k in range(1440):
        lat = (k % 160) - 80 + 0.5
        lon = ((k * 7) % 360) - 180 + 0.5
        la, lo = math.radians(lat), math.radians(lon)
        x = math.cos(la) * math.cos(lo)
        y = math.cos(la) * math.sin(lo)
        z = math.sin(la)
        _, u, v = _xyz_to_face_uv(x, y, z)
        for st in (_st_from_uv(u), _st_from_uv(v)):
            # distance to the nearest multiple of 1/16 in [0, 1]
            frac = st * 16.0
            dist = abs(frac - round(frac)) / 16.0
            worst = min(worst, dist)
    assert worst > margin, (
        f"grid point within {worst:.3e} of a level-4 boundary "
        f"(margin {margin:.3e})")
