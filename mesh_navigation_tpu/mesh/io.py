"""Mesh IO: OBJ/PLY/OFF import + HDF5 working-file bundle caching.

Parity with the reference's map-load pipeline (mesh_map.cpp:149-260): a
source mesh file is imported (there via assimp) and copied into an HDF5
*working file* so the source is never mutated; computed artifacts (normals,
edge distances, per-layer cost channels) are cached as named attribute
channels and reloaded on the next start (mesh_map.cpp:342-425, SURVEY.md §5
checkpoint/resume). Here the working bundle holds the full CSR `MeshArrays`
plus named channels, so a reload is a single columnar read straight to
device.
"""

from __future__ import annotations

import dataclasses
import os
from typing import Optional

import numpy as np

from mesh_navigation_tpu.mesh.arrays import MeshArrays, build_mesh

try:
    import h5py
    HAVE_H5PY = True
except ImportError:  # pragma: no cover
    HAVE_H5PY = False


# --------------------------------------------------------------------------
# plain-text importers (assimp equivalents for the common formats)
# --------------------------------------------------------------------------

def load_obj(path: str) -> tuple[np.ndarray, np.ndarray]:
    """Wavefront OBJ triangles (v / f records; polygons fan-triangulated)."""
    verts: list[list[float]] = []
    faces: list[list[int]] = []
    with open(path) as fh:
        for line in fh:
            if line.startswith("v "):
                parts = line.split()
                verts.append([float(parts[1]), float(parts[2]), float(parts[3])])
            elif line.startswith("f "):
                idx = [int(p.split("/")[0]) - 1 for p in line.split()[1:]]
                for k in range(1, len(idx) - 1):
                    faces.append([idx[0], idx[k], idx[k + 1]])
    return (
        np.asarray(verts, np.float32),
        np.asarray(faces, np.int32) if faces else np.zeros((0, 3), np.int32),
    )


def load_ply(path: str) -> tuple[np.ndarray, np.ndarray]:
    """ASCII or binary-little-endian PLY triangle meshes."""
    with open(path, "rb") as fh:
        header: list[str] = []
        while True:
            line = fh.readline().decode("ascii", "replace").strip()
            header.append(line)
            if line == "end_header":
                break
        fmt = next(l.split()[1] for l in header if l.startswith("format"))
        counts = {}
        props: dict[str, list[tuple[str, str]]] = {}
        cur = None
        for l in header:
            if l.startswith("element"):
                _, name, n = l.split()
                counts[name] = int(n)
                cur = name
                props[name] = []
            elif l.startswith("property") and cur:
                parts = l.split()
                if parts[1] == "list":
                    props[cur].append(("list", parts[2] + ":" + parts[3]))
                else:
                    props[cur].append((parts[1], parts[2]))
        nv, nf = counts.get("vertex", 0), counts.get("face", 0)
        vprops = props.get("vertex", [])
        if fmt == "ascii":
            verts = np.zeros((nv, 3), np.float32)
            names = [p[1] for p in vprops]
            xi, yi, zi = names.index("x"), names.index("y"), names.index("z")
            for i in range(nv):
                vals = fh.readline().split()
                verts[i] = [float(vals[xi]), float(vals[yi]), float(vals[zi])]
            faces = []
            for _ in range(nf):
                vals = fh.readline().split()
                n = int(vals[0])
                idx = [int(x) for x in vals[1 : 1 + n]]
                for k in range(1, n - 1):
                    faces.append([idx[0], idx[k], idx[k + 1]])
            return verts, np.asarray(faces, np.int32) if faces else np.zeros((0, 3), np.int32)
        # binary little endian
        type_map = {
            "float": "<f4", "float32": "<f4", "double": "<f8", "float64": "<f8",
            "uchar": "u1", "uint8": "u1", "char": "i1", "int8": "i1",
            "short": "<i2", "ushort": "<u2", "int": "<i4", "int32": "<i4",
            "uint": "<u4", "uint32": "<u4",
        }
        vdt = np.dtype([(name, type_map[t]) for t, name in vprops])
        vdata = np.frombuffer(fh.read(vdt.itemsize * nv), dtype=vdt, count=nv)
        verts = np.stack(
            [vdata["x"], vdata["y"], vdata["z"]], axis=1
        ).astype(np.float32)
        faces = []
        fprops = props.get("face", [])
        cnt_t, idx_t = fprops[0][1].split(":") if fprops and fprops[0][0] == "list" else ("uchar", "int")
        cnt_dt = np.dtype(type_map[cnt_t])
        idx_dt = np.dtype(type_map[idx_t])
        for _ in range(nf):
            n = int(np.frombuffer(fh.read(cnt_dt.itemsize), dtype=cnt_dt)[0])
            idx = np.frombuffer(fh.read(idx_dt.itemsize * n), dtype=idx_dt)
            for k in range(1, n - 1):
                faces.append([idx[0], idx[k], idx[k + 1]])
        return verts, np.asarray(faces, np.int32) if faces else np.zeros((0, 3), np.int32)


def load_off(path: str) -> tuple[np.ndarray, np.ndarray]:
    with open(path) as fh:
        tokens: list[str] = []
        for line in fh:
            line = line.split("#")[0].strip()
            if line:
                tokens += line.split()
    assert tokens[0] == "OFF"
    nv, nf = int(tokens[1]), int(tokens[2])
    pos = 4
    verts = np.asarray(tokens[pos : pos + nv * 3], np.float32).reshape(nv, 3)
    pos += nv * 3
    faces = []
    for _ in range(nf):
        n = int(tokens[pos])
        idx = [int(t) for t in tokens[pos + 1 : pos + 1 + n]]
        pos += n + 1
        for k in range(1, n - 1):
            faces.append([idx[0], idx[k], idx[k + 1]])
    return verts, np.asarray(faces, np.int32) if faces else np.zeros((0, 3), np.int32)


def import_mesh_file(path: str) -> tuple[np.ndarray, np.ndarray]:
    ext = os.path.splitext(path)[1].lower()
    if ext == ".obj":
        return load_obj(path)
    if ext == ".ply":
        return load_ply(path)
    if ext == ".off":
        return load_off(path)
    if ext in (".h5", ".hdf5"):
        return load_h5_geometry(path)
    raise ValueError(f"unsupported mesh format: {ext}")


# --------------------------------------------------------------------------
# HDF5 working file (the lvr2 MeshIO channel layout, SURVEY.md §2.2)
# --------------------------------------------------------------------------

MESH_GROUP = "mesh"


def load_h5_geometry(path: str, part: str = MESH_GROUP) -> tuple[np.ndarray, np.ndarray]:
    if not HAVE_H5PY:
        raise RuntimeError("h5py not available")
    with h5py.File(path, "r") as f:
        g = f[part]
        verts = np.asarray(g["vertices"], np.float32)
        faces = np.asarray(g["faces"], np.int32)
    return verts, faces


def save_working_file(
    path: str,
    mesh: MeshArrays,
    channels: Optional[dict[str, np.ndarray]] = None,
    part: str = MESH_GROUP,
) -> None:
    """Persist geometry + cached artifacts + named per-layer channels —
    the `writeLayers` / save_map surface (mesh_map.cpp:141-146, 1199-1239)."""
    if not HAVE_H5PY:
        raise RuntimeError("h5py not available")
    with h5py.File(path, "a") as f:
        if part in f:
            del f[part]
        g = f.create_group(part)
        g.create_dataset("vertices", data=np.asarray(mesh.vertices))
        g.create_dataset("faces", data=np.asarray(mesh.faces))
        g.create_dataset("face_normals", data=np.asarray(mesh.face_normals))
        g.create_dataset("vertex_normals", data=np.asarray(mesh.vertex_normals))
        g.create_dataset("edge_distances", data=np.asarray(mesh.edge_dist))
        ch = g.require_group("channels")
        for name, data in (channels or {}).items():
            if name in ch:
                del ch[name]
            ch.create_dataset(name, data=np.asarray(data))


def load_channel(path: str, name: str, part: str = MESH_GROUP) -> Optional[np.ndarray]:
    """readLayer equivalent: fetch a cached per-layer cost channel
    (e.g. height_diff_layer.cpp:49-96) or None."""
    if not HAVE_H5PY or not os.path.exists(path):
        return None
    with h5py.File(path, "r") as f:
        key = f"{part}/channels/{name}"
        if key in f:
            return np.asarray(f[key])
    return None


def read_map(
    mesh_file: str,
    working_file: Optional[str] = None,
    part: str = MESH_GROUP,
) -> MeshArrays:
    """The MeshMap::readMap flow (mesh_map.cpp:149-310): if a working file
    exists, load from it; otherwise import the source mesh, build the CSR
    bundle (incl. non-manifold cleanup), and persist the working file."""
    if working_file and os.path.exists(working_file):
        verts, faces = load_h5_geometry(working_file, part)
        return build_mesh(verts, faces)
    verts, faces = import_mesh_file(mesh_file)
    mesh = build_mesh(verts, faces)
    if working_file:
        save_working_file(working_file, mesh, part=part)
    return mesh
