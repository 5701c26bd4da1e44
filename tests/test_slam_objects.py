"""Build + run the C++ object-layer unit tests (EIF, box-plot filter, line
merging, cuboid pose/shape from lines + PCA, association, merging,
t-table)."""

import os
import shutil
import subprocess

import pytest

from tests.test_native_shim import BUILD, _build_native


@pytest.mark.skipif(shutil.which("cmake") is None, reason="no cmake")
def test_object_layer_cpp():
    _build_native()
    binary = os.path.join(BUILD, "object_layer_test")
    out = subprocess.run([binary], capture_output=True, text=True, timeout=300)
    assert out.returncode == 0, f"stdout={out.stdout} stderr={out.stderr}"
    assert "ALL OK" in out.stdout


@pytest.mark.skipif(shutil.which("cmake") is None, reason="no cmake")
def test_geometry_cpp():
    _build_native()
    out = subprocess.run([os.path.join(BUILD, "geometry_test")],
                         capture_output=True, text=True, timeout=300)
    assert out.returncode == 0, f"stdout={out.stdout} stderr={out.stderr}"


@pytest.mark.skipif(shutil.which("cmake") is None, reason="no cmake")
def test_tracking_cpp_end_to_end():
    _build_native()
    out = subprocess.run([os.path.join(BUILD, "tracking_test")],
                         capture_output=True, text=True, timeout=600)
    assert out.returncode == 0, f"stdout={out.stdout} stderr={out.stderr}"
    assert "ALL OK" in out.stdout


@pytest.mark.skipif(shutil.which("cmake") is None, reason="no cmake")
def test_loop_closing_cpp():
    """Sim3 algebra + RANSAC + essential graph + end-to-end loop closure on
    a synthetic drifted-loop map (native/slam/tests/loop_test.cc)."""
    _build_native()
    out = subprocess.run([os.path.join(BUILD, "loop_test")],
                         capture_output=True, text=True, timeout=600)
    assert out.returncode == 0, f"stdout={out.stdout} stderr={out.stderr}"
    assert "all ok" in out.stdout


@pytest.mark.skipif(shutil.which("cmake") is None, reason="no cmake")
def test_loop_ring_e2e_cpp():
    """Full ring revolution through the production MappingStep->LoopCloser
    path: the closure must fire exactly once, correct the junction drift,
    and leave a Sim3-aligned-consistent map (tracking_test --loop)."""
    _build_native()
    out = subprocess.run([os.path.join(BUILD, "tracking_test"), "--loop"],
                         capture_output=True, text=True, timeout=600)
    assert out.returncode == 0, f"stdout={out.stdout} stderr={out.stderr}"
    assert "ALL OK" in out.stdout
    assert "loops closed 1\n" in out.stdout  # exactly one ("closed 12" fails)


@pytest.mark.skipif(shutil.which("cmake") is None, reason="no cmake")
def test_tracking_cpp_two_objects():
    """Same-class objects must be associated apart (IoU + shared points +
    t-test) and localized individually, never merged."""
    _build_native()
    out = subprocess.run([os.path.join(BUILD, "tracking_test"), "--two"],
                         capture_output=True, text=True, timeout=600)
    assert out.returncode == 0, f"stdout={out.stdout} stderr={out.stderr}"
    assert "ALL OK" in out.stdout
