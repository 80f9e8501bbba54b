"""Grid/metric tests: exact volumes and areas for all three geometries."""

import numpy as np
import pytest

from dycoreplanet_tpu.grid import (
    make_annulus,
    make_cuboid,
    make_shell,
    resolution_from_refinement,
)


def test_resolution_mapping():
    # cell-count parity with the reference's refine_global
    assert resolution_from_refinement("cuboid", 4) == (16, 16, 16)
    assert resolution_from_refinement("annulus", 4) == (16, 192)
    nr, nlat, nlon = resolution_from_refinement("shell", 2)
    assert (nr, nlat, nlon) == (4, 8, 16)


def test_cuboid_metrics():
    g = make_cuboid(4, 8, 16, length_ref=1.0)
    assert g.cell_shape == (4, 8, 16)
    assert g.total_volume == pytest.approx(1.0)
    assert g.face_shape(0) == (5, 8, 16)
    assert g.face_shape(2) == (4, 8, 16)  # periodic: n faces


def test_cuboid_rescaled():
    g = make_cuboid(4, 4, 4, length_ref=2.0)
    # reference scales the unit cube by 1/L (boussinesq_model.tpp:42-63)
    assert g.total_volume == pytest.approx(1.0 / 8.0)


def test_annulus_metrics_exact():
    r0, r1 = 10.0, 30.0
    g = make_annulus(16, 192, r0, r1)
    # total area = pi (r1^2 - r0^2)
    assert g.total_volume == pytest.approx(np.pi * (r1**2 - r0**2), rel=1e-12)
    # inner boundary circumference = sum of innermost radial-face areas
    area_r = np.broadcast_to(g.face_area[0], g.face_shape(0))
    assert area_r[0].sum() == pytest.approx(2 * np.pi * r0, rel=1e-12)
    assert area_r[-1].sum() == pytest.approx(2 * np.pi * r1, rel=1e-12)


def test_shell_metrics_exact():
    r0, r1 = 1.0, 3.0
    g = make_shell(8, 16, 32, r0, r1)
    # exact shell volume 4/3 pi (r1^3 - r0^3)
    assert g.total_volume == pytest.approx(4 / 3 * np.pi * (r1**3 - r0**3), rel=1e-12)
    # inner/outer sphere areas
    area_r = np.broadcast_to(g.face_area[0], g.face_shape(0))
    assert area_r[0].sum() == pytest.approx(4 * np.pi * r0**2, rel=1e-12)
    assert area_r[-1].sum() == pytest.approx(4 * np.pi * r1**2, rel=1e-12)
    # pole faces have zero area -> no flux through poles
    area_lat = np.broadcast_to(g.face_area[1], g.face_shape(1))
    assert np.all(area_lat[:, 0, :] == 0)
    assert np.all(area_lat[:, -1, :] == 0)


def test_cell_diameter_positive():
    for g in (make_cuboid(4, 4, 4), make_annulus(8, 24, 1, 3), make_shell(4, 8, 16, 1, 3)):
        d = g.cell_diameter()
        assert d.shape == g.cell_shape
        assert np.all(d > 0)
