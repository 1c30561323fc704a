"""Procedural mesh generators for tests/benchmarks.

The reference imports meshes (Suzanne etc.) from user STL/OBJ files
(parser.cpp); it ships none.  These generators provide deterministic
triangle soups with the same {positions, per-vertex normals} layout so mesh
configs are runnable out of the box.
"""
from __future__ import annotations

import numpy as np


def icosphere(subdivisions: int = 2, radius: float = 1.0):
    """Returns (positions (M,3,3), normals (M,3,3)) of a unit icosphere.

    Smooth per-vertex normals (the sphere normal) — exercises barycentric
    smooth shading like a Suzanne import would."""
    t = (1.0 + np.sqrt(5.0)) / 2.0
    verts = np.array([
        [-1, t, 0], [1, t, 0], [-1, -t, 0], [1, -t, 0],
        [0, -1, t], [0, 1, t], [0, -1, -t], [0, 1, -t],
        [t, 0, -1], [t, 0, 1], [-t, 0, -1], [-t, 0, 1],
    ], np.float64)
    verts /= np.linalg.norm(verts, axis=1, keepdims=True)
    faces = [
        (0, 11, 5), (0, 5, 1), (0, 1, 7), (0, 7, 10), (0, 10, 11),
        (1, 5, 9), (5, 11, 4), (11, 10, 2), (10, 7, 6), (7, 1, 8),
        (3, 9, 4), (3, 4, 2), (3, 2, 6), (3, 6, 8), (3, 8, 9),
        (4, 9, 5), (2, 4, 11), (6, 2, 10), (8, 6, 7), (9, 8, 1),
    ]

    for _ in range(subdivisions):
        new_faces = []
        verts = list(verts)
        cache = {}

        def midpoint(a, b):
            key = (min(a, b), max(a, b))
            if key not in cache:
                m = (np.asarray(verts[a]) + np.asarray(verts[b])) / 2.0
                m /= np.linalg.norm(m)
                cache[key] = len(verts)
                verts.append(m)
            return cache[key]

        for a, b, c in faces:
            ab, bc, ca = midpoint(a, b), midpoint(b, c), midpoint(c, a)
            new_faces += [(a, ab, ca), (b, bc, ab), (c, ca, bc), (ab, bc, ca)]
        faces = new_faces
        verts = np.asarray(verts)

    verts = np.asarray(verts, np.float64)
    fi = np.asarray(faces, np.int64)
    pos = (verts[fi] * radius).astype(np.float32)
    nrm = verts[fi].astype(np.float32)  # unit sphere: normal == position
    return pos, nrm


def torus(major: float = 1.0, minor: float = 0.35,
          n_major: int = 24, n_minor: int = 12):
    """Returns (positions, normals) of a torus triangle mesh."""
    u = np.linspace(0, 2 * np.pi, n_major, endpoint=False)
    v = np.linspace(0, 2 * np.pi, n_minor, endpoint=False)
    uu, vv = np.meshgrid(u, v, indexing="ij")
    cx = (major + minor * np.cos(vv)) * np.cos(uu)
    cy = minor * np.sin(vv)
    cz = (major + minor * np.cos(vv)) * np.sin(uu)
    nx = np.cos(vv) * np.cos(uu)
    ny = np.sin(vv)
    nz = np.cos(vv) * np.sin(uu)
    P = np.stack([cx, cy, cz], axis=-1)
    N = np.stack([nx, ny, nz], axis=-1)

    tris_p, tris_n = [], []
    for i in range(n_major):
        for j in range(n_minor):
            i1, j1 = (i + 1) % n_major, (j + 1) % n_minor
            quad_p = (P[i, j], P[i1, j], P[i1, j1], P[i, j1])
            quad_n = (N[i, j], N[i1, j], N[i1, j1], N[i, j1])
            tris_p += [[quad_p[0], quad_p[1], quad_p[2]],
                       [quad_p[0], quad_p[2], quad_p[3]]]
            tris_n += [[quad_n[0], quad_n[1], quad_n[2]],
                       [quad_n[0], quad_n[2], quad_n[3]]]
    return (np.asarray(tris_p, np.float32), np.asarray(tris_n, np.float32))
