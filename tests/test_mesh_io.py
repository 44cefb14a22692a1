"""Mesh reader fidelity tests.

Covers the three reference reader conventions:
- plain dump (no header) round-trip, Triangulation.hpp:124-135
- VertFaceReader.hpp: count header on the first line of both files
- BioMeshReader.hpp:30,40-43: extra ``.vert`` columns past x y z and
  the ``v1 v3 v2`` face winding (the file's middle column is the
  panel's THIRD vertex)
and the gmsh v2 reader (MshReader.hpp).
"""

import numpy as np

from fmm_bem_tpu.bem.triangulation import (
    load_bio_mesh,
    load_msh,
    load_vert_face,
    save_vert_face,
    unit_sphere,
)


def test_save_load_roundtrip(tmp_path):
    tris = unit_sphere(2)
    vp, fp = tmp_path / "t.vert", tmp_path / "t.face"
    save_vert_face(tris, vp, fp)
    back = load_vert_face(vp, fp)
    np.testing.assert_allclose(back, tris, atol=1e-12)


def test_count_header_skipped(tmp_path):
    # reference VertFaceReader format: first line = count
    vp, fp = tmp_path / "h.vert", tmp_path / "h.face"
    vp.write_text("3\n0 0 0\n1 0 0\n0 1 0\n")
    fp.write_text("1\n1 2 3\n")
    tris = load_vert_face(vp, fp)
    assert tris.shape == (1, 3, 3)
    np.testing.assert_allclose(
        tris[0], [[0, 0, 0], [1, 0, 0], [0, 1, 0]]
    )


def test_bio_mesh_columns_and_winding(tmp_path):
    # 4-column .vert (x y z extra) + v1 v3 v2 winding: reading columns
    # (a, b, c) must produce the panel (v_a, v_c, v_b)
    vp, fp = tmp_path / "b.vert", tmp_path / "b.face"
    vp.write_text(
        "0 0 0 9.9\n1 0 0 9.9\n0 1 0 9.9\n0 0 1 9.9\n"
    )
    fp.write_text("1 2 3\n2 4 3\n")
    tris = load_bio_mesh(vp, fp)
    assert tris.shape == (2, 3, 3)
    # face "1 2 3" means v1=vertex0, v3=vertex1, v2=vertex2
    np.testing.assert_allclose(
        tris[0], [[0, 0, 0], [0, 1, 0], [1, 0, 0]]
    )
    np.testing.assert_allclose(
        tris[1], [[1, 0, 0], [0, 1, 0], [0, 0, 1]]
    )
    # winding flip reverses the normal relative to the plain reader
    plain = load_vert_face(vp, fp)
    n_bio = np.cross(
        tris[0, 1] - tris[0, 0], tris[0, 2] - tris[0, 0]
    )
    n_plain = np.cross(
        plain[0, 1] - plain[0, 0], plain[0, 2] - plain[0, 0]
    )
    np.testing.assert_allclose(n_bio, -n_plain, atol=1e-12)


def test_msh_reader(tmp_path):
    msh = tmp_path / "m.msh"
    msh.write_text(
        "$MeshFormat\n2.2 0 8\n$EndMeshFormat\n"
        "$Nodes\n3\n1 0 0 0\n2 1 0 0\n3 0 1 0\n$EndNodes\n"
        "$Elements\n2\n"
        "1 15 2 0 1 1\n"          # point element: ignored
        "2 2 3 0 1 0 1 2 3\n"     # triangle with 3 tags
        "$EndElements\n"
    )
    tris = load_msh(msh)
    assert tris.shape == (1, 3, 3)
    np.testing.assert_allclose(
        tris[0], [[0, 0, 0], [1, 0, 0], [0, 1, 0]]
    )
