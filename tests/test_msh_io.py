"""gmsh .msh 4.1 reader (fem/msh_io.py, VERDICT r4 #5).

A synthetic in-repo msh 4.1 document exercises the parser contract
(blocked nodes with sparse tags, entity→physical mapping, group
dedup precedence); the reference's actual gmsh artifacts are parsed
when present (path-gated — the repo stays standalone without them).
"""

import os
from pathlib import Path

import numpy as np
import pytest

from cfdsim_tpu.fem.msh_io import read_msh

REF = Path("/root/reference/julia/flow_over_cylinder_fischer")

# unit square, 4 nodes + 2 triangles; inlet = left edge, outlet = right,
# walls = top+bottom; node tags deliberately sparse (10,11,20,21)
_TINY = """\
$MeshFormat
4.1 0 8
$EndMeshFormat
$PhysicalNames
4
1 1 "inlet"
1 2 "outlet"
1 3 "walls"
2 4 "domain"
$EndPhysicalNames
$Entities
4 4 1 0
1 0 0 0 0
2 1 0 0 0
3 1 1 0 0
4 0 1 0 0
1 0 0 0 0 1 0 1 3 2 1 -2
2 1 0 0 1 1 0 1 2 2 2 -3
3 0 1 0 1 1 0 1 3 2 3 -4
4 0 0 0 0 1 0 1 1 2 4 -1
1 0 0 0 1 1 0 1 4 4 1 2 3 4
$EndEntities
$Nodes
2 4 10 21
0 1 0 2
10
11
0 0 0
1 0 0
0 2 0 2
20
21
1 1 0
0 1 0
$Nodes_pad_ignored
$EndNodes
$Elements
5 7 1 7
1 1 1 1
1 10 11
1 2 1 1
2 11 20
1 3 1 1
3 20 21
1 4 1 1
4 21 10
2 1 2 2
5 10 11 20
6 10 20 21
$EndElements
"""


def _write_tiny(tmp_path):
    p = tmp_path / "tiny.msh"
    p.write_text(_TINY.replace("$Nodes_pad_ignored\n", ""))
    return p


def test_tiny_square_parses(tmp_path):
    m = read_msh(_write_tiny(tmp_path))
    assert m.n_points == 4 and m.n_tris == 2
    # sparse tags remapped dense: corners of the unit square present
    assert sorted(map(tuple, m.points.tolist())) == [
        (0.0, 0.0), (0.0, 1.0), (1.0, 0.0), (1.0, 1.0)]
    # CCW orientation enforced
    assert (m.areas() > 0).all()
    # precedence: inlet keeps its corners, walls lose them to inlet,
    # outlet loses its corners to walls
    assert len(m.tags["inlet"]) == 2
    assert len(m.tags["walls"]) == 2
    assert len(m.tags["outlet"]) == 0
    assert m.geometry["bbox"] == (0.0, 1.0, 0.0, 1.0)


def test_rejects_legacy_format(tmp_path):
    p = tmp_path / "legacy.msh"
    p.write_text("$MeshFormat\n2.2 0 8\n$EndMeshFormat\n")
    with pytest.raises(ValueError, match="4.x"):
        read_msh(p)


@pytest.mark.skipif(not REF.exists(), reason="reference tree not present")
def test_reference_meshes_parse():
    for name, n_cyl in (("v2/cylinder_efficient.msh", 160),
                        ("v2/cylinder_optimized.msh", 160),
                        ("v1/cylinder.msh", 160)):
        m = read_msh(REF / name)
        assert m.n_tris > 1000
        assert (m.areas() > 0).all()
        assert m.quality().min() > 0.5  # gmsh frontal meshes are good
        for t in ("inlet", "outlet", "walls", "cylinder"):
            assert len(m.tags[t]) > 0, (name, t)
        assert len(m.tags["cylinder"]) == n_cyl
        assert m.geometry["cylinder_radius"] == pytest.approx(0.5, rel=1e-3)
        # every cylinder node sits on the fitted circle
        cc = np.asarray(m.geometry["cylinder_center"])
        d = np.hypot(*(m.points[m.tags["cylinder"]] - cc).T)
        assert np.abs(d - 0.5).max() < 1e-6


@pytest.mark.skipif(not REF.exists(), reason="reference tree not present")
def test_fem_case_builds_on_reference_mesh():
    """cylinder_fem(mesh=imported) — the cross-validation path: spaces,
    Stokes init, and a transient step all run on the reference's own
    gmsh triangulation."""
    import jax
    import jax.numpy as jnp

    from cfdsim_tpu.cases import cylinder_fem

    m = read_msh(REF / "v2/cylinder_efficient.msh")
    case = cylinder_fem(re=100.0, mesh=m, scheme="projection")
    f = jax.jit(lambda s: jax.lax.scan(
        lambda st, _: case.step(st, jnp.float32(1.0)), s, None, length=10))
    s, metrics = f(case.state)
    assert bool(jnp.isfinite(s.u).all())
    # past the impulsive start-up the reaction force is downstream drag
    assert float(metrics.fx[-1]) > 0
