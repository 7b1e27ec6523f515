"""Halfedge mesh + MeshEdit local ops + Loop subdivision tests
(reference component #4, SURVEY.md §2 row 4)."""

import numpy as np
import pytest

from tpu_pt.scene.halfedge import HalfedgeMesh, loop_subdivide
from tpu_pt.scene.meshes import icosphere


def _tet():
    verts = np.array([[0, 0, 0], [1, 0, 0], [0, 1, 0], [0, 0, 1]], np.float32)
    tris = np.array([[0, 2, 1], [0, 1, 3], [0, 3, 2], [1, 2, 3]], np.int64)
    return verts, tris


class TestHalfedge:
    def test_build_closed(self):
        m = HalfedgeMesh(*_tet())
        assert m.n_faces == 4
        assert (m.twin >= 0).all()  # closed surface: every edge has a twin
        # Euler: V - E + F = 2 for a sphere-topology mesh.
        e = len(m.twin) // 2
        assert m.n_verts - e + m.n_faces == 2

    def test_vertex_degree(self):
        m = HalfedgeMesh(*_tet())
        for v in range(4):
            assert m.vertex_degree(v) == 3
            assert sorted(m.vertex_neighbors(v)) == sorted(
                set(range(4)) - {v}
            )

    def test_flip_edge(self):
        m = HalfedgeMesh(*_tet())
        he = 0
        a, b = m.vert[he], m.vert[m.next_[he]]
        assert m.flip_edge(he) or True  # tet flip may be rejected (c==d)
        # On a tet every flip creates a duplicate edge; use a 2-face strip:
        verts = np.array([[0, 0, 0], [1, 0, 0], [1, 1, 0], [0, 1, 0]], np.float32)
        tris = np.array([[0, 1, 2], [0, 2, 3]], np.int64)
        m2 = HalfedgeMesh(verts, tris)
        # find diagonal halfedge (0->2 or 2->0)
        diag = [h for h in range(6)
                if {m2.vert[h], m2.vert[m2.next_[h]]} == {0, 2}][0]
        assert m2.flip_edge(diag)
        _, t = m2.to_arrays()
        edges = {frozenset((a, b)) for tri in t
                 for a, b in zip(tri, np.roll(tri, -1))}
        assert frozenset((1, 3)) in edges   # new diagonal
        assert frozenset((0, 2)) not in edges

    def test_split_edge(self):
        verts = np.array([[0, 0, 0], [1, 0, 0], [1, 1, 0], [0, 1, 0]], np.float32)
        tris = np.array([[0, 1, 2], [0, 2, 3]], np.int64)
        m = HalfedgeMesh(verts, tris)
        diag = [h for h in range(6)
                if {m.vert[h], m.vert[m.next_[h]]} == {0, 2}][0]
        mid = m.split_edge(diag)
        assert m.n_verts == 5
        assert m.n_faces == 4
        np.testing.assert_allclose(m.verts[mid], [0.5, 0.5, 0.0])
        # still a valid halfedge mesh (twins consistent)
        t = m.twin
        ok = t >= 0
        assert (m.twin[t[ok]] == np.arange(len(t))[ok]).all()

    def test_collapse_edge(self):
        # Icosphere: every interior edge is collapsible; F drops by 2 and
        # the survivor sits at the old midpoint.
        verts, tris = icosphere(subdiv=1)
        m = HalfedgeMesh(verts, tris)
        f0, v0 = m.n_faces, m.n_verts
        a = int(m.vert[0])
        b = int(m.vert[m.next_[0]])
        mid = (m.verts[a] + m.verts[b]) * 0.5
        surv = m.collapse_edge(0)
        assert surv == a
        assert m.n_faces == f0 - 2
        np.testing.assert_allclose(m.verts[surv], mid, rtol=1e-6)
        t = m.twin
        ok = t >= 0
        assert (m.twin[t[ok]] == np.arange(len(t))[ok]).all()
        # b is no longer referenced by any face
        assert b not in set(m.vert.tolist())

    def test_collapse_edge_rejects_tetrahedron(self):
        # Collapsing any tet edge would produce two coincident faces —
        # the link/manifold guard must reject it and leave the mesh intact.
        m = HalfedgeMesh(*_tet())
        before = m.vert.copy()
        assert m.collapse_edge(0) == -1
        np.testing.assert_array_equal(m.vert, before)


class TestLoopSubdivide:
    def test_counts(self):
        v, f = icosphere(subdiv=1)  # 80 tris
        v2, f2 = loop_subdivide(v, f, rounds=1)
        assert len(f2) == 4 * len(f)
        e = 3 * len(f) // 2
        assert len(v2) == len(v) + e

    def test_smooths_toward_sphere(self):
        v, f = icosphere(subdiv=1)
        v2, f2 = loop_subdivide(v, f, rounds=2)
        r = np.linalg.norm(v2, axis=1)
        # Loop limit surface of a sphere-ish mesh stays nearly spherical
        # (slightly shrunken) and much smoother than the control cage.
        assert r.std() < 0.01
        assert 0.8 < r.mean() < 1.0

    def test_boundary_rule(self):
        # single triangle: all edges boundary; midpoints stay at midpoints.
        v = np.array([[0, 0, 0], [1, 0, 0], [0, 1, 0]], np.float32)
        f = np.array([[0, 1, 2]])
        v2, f2 = loop_subdivide(v, f, 1)
        assert len(f2) == 4
        mids = {(0.5, 0.0, 0.0), (0.5, 0.5, 0.0), (0.0, 0.5, 0.0)}
        got = {tuple(np.round(p, 6)) for p in v2[3:]}
        assert got == mids
