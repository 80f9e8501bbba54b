"""IO tests: VTK writer (incl. native encoder parity), checkpointing,
timers."""

import base64
import os
import struct
import time
import xml.etree.ElementTree as ET

import jax.numpy as jnp
import numpy as np
import pytest

from dycoreplanet_tpu.diagnostics.timers import TimerRegistry
from dycoreplanet_tpu.grid import make_annulus, make_shell
from dycoreplanet_tpu.io import load_checkpoint, save_checkpoint, write_pvd, write_vts
from dycoreplanet_tpu.io import vtk as vtkmod


def test_native_encoder_matches_python():
    if vtkmod._NATIVE is None:
        pytest.skip("native library not built")
    rng = np.random.RandomState(0)
    for n in (0, 1, 2, 3, 7, 128, 1001):
        data = rng.rand(n).astype(np.float32)
        raw = data.tobytes()
        expect = base64.b64encode(struct.pack("<I", len(raw)) + raw).decode()
        got = vtkmod._b64_block(data)
        assert got == expect, f"mismatch at n={n}"


def test_write_vts_roundtrip(tmp_path):
    g = make_annulus(4, 8, 1.0, 3.0)
    rng = np.random.RandomState(1)
    T = rng.rand(*g.cell_shape)
    u = rng.randn(2, *g.cell_shape)
    path = write_vts(str(tmp_path / "out.vts"), g,
                     scalars={"temperature": T}, vectors={"velocity": u})
    root = ET.parse(path).getroot()
    assert root.attrib["type"] == "StructuredGrid"
    arrays = root.findall(".//DataArray")
    names = [a.attrib.get("Name") for a in arrays]
    assert "temperature" in names and "velocity" in names
    # decode the temperature block and compare (VTK order: transposed)
    for a in arrays:
        if a.attrib.get("Name") == "temperature":
            raw = base64.b64decode(a.text.strip())
            (nbytes,) = struct.unpack("<I", raw[:4])
            vals = np.frombuffer(raw[4:4 + nbytes], dtype=np.float32)
            expect = np.transpose(T).reshape(-1)
            np.testing.assert_allclose(vals, expect, rtol=1e-6)


def test_write_pvd(tmp_path):
    path = write_pvd(str(tmp_path / "series.pvd"),
                     [{"time": 0.0, "file": "a.vts"}, {"time": 0.1, "file": "b.vts"}])
    root = ET.parse(path).getroot()
    ds = root.findall(".//DataSet")
    assert len(ds) == 2 and ds[1].attrib["timestep"] == "0.1"


def test_checkpoint_roundtrip(tmp_path):
    from dycoreplanet_tpu.models.boussinesq import State

    g = make_shell(2, 4, 8, 1.0, 3.0)
    rng = np.random.RandomState(2)
    state = State(
        u=jnp.asarray(rng.randn(3, *g.cell_shape)),
        u_faces=tuple(jnp.asarray(rng.randn(*g.cell_shape)) for _ in range(3)),
        p=jnp.asarray(rng.randn(*g.cell_shape)),
        T=jnp.asarray(rng.rand(*g.cell_shape)),
        time=jnp.asarray(1.25),
        step_number=jnp.asarray(7, jnp.int32),
    )
    path = save_checkpoint(str(tmp_path / "ck"), state, {"dt": 0.01})
    loaded, meta = load_checkpoint(path)
    assert meta["dt"] == 0.01
    np.testing.assert_array_equal(np.asarray(loaded.u), np.asarray(state.u))
    np.testing.assert_array_equal(np.asarray(loaded.T), np.asarray(state.T))
    for a, b in zip(loaded.u_faces, state.u_faces):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    assert int(loaded.step_number) == 7


def test_timer_registry():
    reg = TimerRegistry()
    with reg.scope("work"):
        time.sleep(0.01)
    with reg.scope("work"):
        pass
    assert reg.sections["work"].calls == 2
    assert reg.sections["work"].total >= 0.01
    out = reg.summary()
    assert "work" in out and "calls" in out
