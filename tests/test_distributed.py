"""Tests for the multi-host runtime helpers (SURVEY.md T9) on the
8-virtual-device CPU backend."""

import jax
import numpy as np
import pytest

from flashattn_tpu.parallel.distributed import initialize_distributed, pod_mesh


def test_initialize_is_idempotent_single_host():
    initialize_distributed()
    initialize_distributed()
    assert jax.process_count() == 1


def test_pod_mesh_shapes():
    mesh = pod_mesh(model=2, sp=2)
    assert mesh.axis_names == ("data", "model", "sp")
    assert mesh.shape == {"data": 2, "model": 2, "sp": 2}
    # data must be the OUTERMOST axis (host-major device order -> DCN-safe).
    grid = np.array(mesh.devices)
    assert grid.shape == (2, 2, 2)


def test_pod_mesh_defaults_data():
    mesh = pod_mesh(model=4)
    assert mesh.shape == {"data": 2, "model": 4, "sp": 1}


def test_pod_mesh_rejects_bad_factorization():
    with pytest.raises(AssertionError):
        pod_mesh(data=3, model=3, sp=1)
