"""VTK XML output for structured curvilinear grids.

TPU-native replacement for the reference's DataOut vtu/pvtu pipeline
(reference: boussinesq_model.tpp:1568-1694: joint-FE copy, per-rank
.vtu, rank-0 .pvtu master + .visit record): our grids are logically
structured, so fields export as a single VTK StructuredGrid (.vts) with
explicit cell-center points — no unstructured connectivity, no joint
dof copy. A .pvd collection file records the time series (stands in for
the pvtu/visit masters).

Written from host numpy after a device gather; binary appended encoding
with base64 headers (standard VTK XML inline format).
"""

from __future__ import annotations

import base64
import os
import struct
from typing import Dict, Optional, Sequence

import numpy as np

from dycoreplanet_tpu.grid.geometry import Geometry


def _cell_center_points(geo: Geometry) -> np.ndarray:
    """(n_cells, 3) Cartesian coordinates of cell centers."""
    cs = [a.centers for a in geo.axes]
    if geo.kind == "cuboid":
        z, y, x = np.meshgrid(*cs, indexing="ij")
        pts = np.stack([x, y, z], axis=-1)
    elif geo.kind == "annulus":
        r, phi = np.meshgrid(*cs, indexing="ij")
        pts = np.stack([r * np.cos(phi), r * np.sin(phi), np.zeros_like(r)], axis=-1)
    else:
        r, lat, lon = np.meshgrid(*cs, indexing="ij")
        pts = np.stack(
            [r * np.cos(lat) * np.cos(lon),
             r * np.cos(lat) * np.sin(lon),
             r * np.sin(lat)], axis=-1)
    return pts.reshape(-1, 3)


def _local_to_cartesian_vectors(geo: Geometry, u: np.ndarray) -> np.ndarray:
    """Convert local-frame components (dim, *cells) to Cartesian (n,3)
    for visualization parity with the reference's Cartesian velocity."""
    if geo.kind == "cuboid":
        # components (z, y, x) -> (x, y, z)
        v = np.stack([u[2], u[1], u[0]], axis=-1)
        return v.reshape(-1, 3)
    if geo.kind == "annulus":
        phi = geo.axes[1].centers.reshape(1, -1)
        ur, up = u[0], u[1]
        vx = ur * np.cos(phi) - up * np.sin(phi)
        vy = ur * np.sin(phi) + up * np.cos(phi)
        v = np.stack([vx, vy, np.zeros_like(vx)], axis=-1)
        return v.reshape(-1, 3)
    # shell
    lat = geo.extras["lat_centers"]
    lon = geo.extras["lon_centers"]
    ur, ul, up = u[0], u[1], u[2]
    cl, sl = np.cos(lat), np.sin(lat)
    co, so = np.cos(lon), np.sin(lon)
    vx = ur * cl * co - ul * sl * co - up * so
    vy = ur * cl * so - ul * sl * so + up * co
    vz = ur * sl + ul * cl
    v = np.stack(
        [np.broadcast_to(vx, geo.cell_shape),
         np.broadcast_to(vy, geo.cell_shape),
         np.broadcast_to(vz, geo.cell_shape)], axis=-1)
    return v.reshape(-1, 3)


def _load_native():
    """ctypes binding of the C++ encoder (native/src/vtkenc.cpp); the
    native runtime layer mirrors the reference's C++ host code where it
    actually pays — bulk output serialization. Falls back to Python."""
    import ctypes

    here = os.path.dirname(os.path.abspath(__file__))
    lib_path = os.path.join(here, "..", "..", "native", "lib", "libdycore_native.so")
    if not os.path.exists(lib_path):
        return None
    try:
        lib = ctypes.CDLL(lib_path)
        lib.vtk_b64_bound.restype = ctypes.c_size_t
        lib.vtk_b64_bound.argtypes = [ctypes.c_size_t]
        lib.vtk_encode_block.restype = ctypes.c_size_t
        lib.vtk_encode_block.argtypes = [
            ctypes.c_char_p, ctypes.c_size_t, ctypes.c_char_p]
        return lib
    except OSError:
        return None


_NATIVE = _load_native()


def _b64_block(data: np.ndarray) -> str:
    raw = np.ascontiguousarray(data, dtype=np.float32).tobytes()
    if _NATIVE is not None:
        import ctypes

        out = ctypes.create_string_buffer(_NATIVE.vtk_b64_bound(len(raw)))
        n = _NATIVE.vtk_encode_block(raw, len(raw), out)
        return out.raw[:n].decode("ascii")
    header = struct.pack("<I", len(raw))
    return base64.b64encode(header + raw).decode("ascii")


def write_vts(
    path: str,
    geo: Geometry,
    scalars: Optional[Dict[str, np.ndarray]] = None,
    vectors: Optional[Dict[str, np.ndarray]] = None,
) -> str:
    """Write one .vts file. ``scalars[name]``: (*cells,); ``vectors[name]``:
    (dim, *cells) local-frame components (converted to Cartesian)."""
    scalars = scalars or {}
    vectors = vectors or {}
    shape = geo.cell_shape
    if geo.dim == 2:
        nk, nj, ni = 1, shape[1], shape[0]
        extent = f"0 {shape[0] - 1} 0 {shape[1] - 1} 0 0"
    else:
        extent = f"0 {shape[0] - 1} 0 {shape[1] - 1} 0 {shape[2] - 1}"
    # VTK structured grids index fastest over the FIRST extent axis; our
    # arrays are C-ordered (last axis fastest) so transpose accordingly.
    def vtk_order_scalar(a: np.ndarray) -> np.ndarray:
        return np.ascontiguousarray(np.transpose(a))

    pts = _cell_center_points(geo).reshape(shape + (3,))
    pts_vtk = np.ascontiguousarray(
        np.transpose(pts, tuple(reversed(range(geo.dim))) + (geo.dim,)))

    lines = [
        '<?xml version="1.0"?>',
        '<VTKFile type="StructuredGrid" version="1.0" byte_order="LittleEndian" header_type="UInt32">',
        f'  <StructuredGrid WholeExtent="{extent}">',
        f'    <Piece Extent="{extent}">',
        "      <Points>",
        '        <DataArray type="Float32" NumberOfComponents="3" format="binary">',
        "          " + _b64_block(pts_vtk.reshape(-1, 3)),
        "        </DataArray>",
        "      </Points>",
        "      <PointData>",
    ]
    for name, arr in scalars.items():
        a = vtk_order_scalar(np.asarray(arr))
        lines += [
            f'        <DataArray type="Float32" Name="{name}" format="binary">',
            "          " + _b64_block(a.reshape(-1)),
            "        </DataArray>",
        ]
    for name, arr in vectors.items():
        v = _local_to_cartesian_vectors(geo, np.asarray(arr)).reshape(shape + (3,))
        v_vtk = np.ascontiguousarray(
            np.transpose(v, tuple(reversed(range(geo.dim))) + (geo.dim,)))
        lines += [
            f'        <DataArray type="Float32" Name="{name}" NumberOfComponents="3" format="binary">',
            "          " + _b64_block(v_vtk.reshape(-1, 3)),
            "        </DataArray>",
        ]
    lines += [
        "      </PointData>",
        "    </Piece>",
        "  </StructuredGrid>",
        "</VTKFile>",
    ]
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    with open(path, "w") as f:
        f.write("\n".join(lines))
    return path


def write_pvd(path: str, entries: Sequence[Dict]) -> str:
    """Time-series collection (stands in for the reference's .pvtu +
    .visit masters). ``entries``: [{"time": t, "file": relpath}, ...]."""
    lines = [
        '<?xml version="1.0"?>',
        '<VTKFile type="Collection" version="1.0" byte_order="LittleEndian">',
        "  <Collection>",
    ]
    for e in entries:
        lines.append(
            f'    <DataSet timestep="{e["time"]}" group="" part="0" file="{e["file"]}"/>'
        )
    lines += ["  </Collection>", "</VTKFile>"]
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    with open(path, "w") as f:
        f.write("\n".join(lines))
    return path


def write_mesh_vts(path: str, geo: Geometry,
                   shard_map_shape: Optional[Sequence[int]] = None) -> str:
    """Mesh debug dump — the reference's PlanetGeometry::write_mesh_vtu
    (planet_geometry.tpp:124-167), which writes the partitioned grid
    before any solve. Cell data: volumes, diameters, and the shard
    ("rank") each cell would belong to for a given domain-decomposition
    shape (the p4est-partition analogue)."""
    vol = np.broadcast_to(np.asarray(geo.vol), geo.cell_shape)
    diam = np.broadcast_to(np.asarray(geo.cell_diameter()), geo.cell_shape)
    scalars = {"volume": vol, "diameter": diam}
    if shard_map_shape is not None:
        rank = np.zeros(geo.cell_shape)
        for d, parts in enumerate(shard_map_shape):
            idx = (np.arange(geo.cell_shape[d]) * parts) // geo.cell_shape[d]
            shape1 = [1] * geo.dim
            shape1[d] = -1
            rank = rank * parts + idx.reshape(shape1)
        scalars["shard"] = rank
    return write_vts(path, geo, scalars=scalars)
