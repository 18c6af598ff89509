"""Multi-slice (ICI x DCN) device ordering for the mesh.

Real multi-slice hardware is unavailable here, so these tests pin the
ordering CONTRACT of parallel/mesh.py::hybrid_device_array with fake
device objects: minor ('model') axes never straddle a slice boundary and
the data axis is slice-major — the layout under which XLA decomposes the
gradient all-reduce into ICI phases + one DCN exchange (SURVEY §2.3
NCCL→ICI/DCN row; scaling-book hybrid-mesh recipe)."""

import numpy as np
import pytest

from unite_tpu.parallel.mesh import hybrid_device_array, make_mesh


class FakeDev:
    def __init__(self, i, slice_index):
        self.id = i
        self.slice_index = slice_index

    def __repr__(self):  # pragma: no cover
        return f"d{self.id}@s{self.slice_index}"


def _pod(n_slices, per_slice):
    # interleave slices in the input order to prove the grouping reorders
    return [FakeDev(i, i % n_slices) for i in range(n_slices * per_slice)]


def test_data_axis_is_slice_major():
    devs = _pod(2, 8)
    arr = hybrid_device_array(devs, (16, 1))
    slices = [d.slice_index for d in arr[:, 0]]
    assert slices == [0] * 8 + [1] * 8


def test_model_axis_never_straddles_a_slice():
    devs = _pod(4, 8)
    arr = hybrid_device_array(devs, (16, 2))  # (data=16, model=2)
    for row in arr:
        assert len({d.slice_index for d in row}) == 1
    # data-major order: each slice contributes a contiguous block of rows
    row_slice = [row[0].slice_index for row in arr]
    assert row_slice == sorted(row_slice)
    # every device appears exactly once
    assert sorted(d.id for d in arr.ravel()) == list(range(32))


def test_unequal_slices_rejected():
    devs = _pod(2, 4) + [FakeDev(99, 0)]
    with pytest.raises(ValueError, match="unequal"):
        hybrid_device_array(devs, (9, 1))


def test_data_dim_must_divide_by_slices():
    devs = _pod(3, 4)
    with pytest.raises(ValueError, match="divisible"):
        hybrid_device_array(devs, (4, 3))


def test_make_mesh_single_slice_unchanged():
    # CPU fake devices carry no slice_index -> the flat path; 8 devices
    mesh = make_mesh(("data",))
    assert mesh.shape["data"] == 8


def test_make_mesh_routes_multislice(monkeypatch):
    import jax

    devs = _pod(2, 4)
    captured = {}

    import unite_tpu.parallel.mesh as pmesh

    real_mesh = pmesh.Mesh

    def fake_mesh(arr, names):
        captured["arr"], captured["names"] = arr, names
        return real_mesh(np.asarray(jax.devices()[:arr.size]).reshape(
            arr.shape), names)

    monkeypatch.setattr(pmesh, "Mesh", fake_mesh)
    pmesh.make_mesh(("data", "model"), shape=(4, 2), devices=devs)
    arr = captured["arr"]
    assert captured["names"] == ("data", "model")
    for row in arr:
        assert len({d.slice_index for d in row}) == 1
    assert [row[0].slice_index for row in arr] == [0, 0, 1, 1]
