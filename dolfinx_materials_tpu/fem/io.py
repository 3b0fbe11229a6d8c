"""Legacy-VTK output for fields (visualization/postprocessing).

The reference writes XDMF/VTX via dolfinx.io (tests/uniaxial_tension.py:93-117,
demo writers); here a dependency-free ASCII legacy .vtk writer covering the four
cell types — loadable by ParaView/VisIt/meshio.
"""

from __future__ import annotations

import numpy as np

_VTK_TYPE = {"triangle": 5, "quad": 9, "tetrahedron": 10, "hexahedron": 12}


def write_vtk(path, mesh, point_data=None, cell_data=None):
    """point_data / cell_data: dict name -> (n, k) or (n,) arrays."""
    pts = np.asarray(mesh.points, dtype=float)
    if pts.shape[1] == 2:
        pts = np.hstack([pts, np.zeros((len(pts), 1))])
    cells = np.asarray(mesh.cells)
    nv = cells.shape[1]
    with open(path, "w") as f:
        f.write("# vtk DataFile Version 3.0\ndolfinx_materials_tpu\nASCII\n")
        f.write("DATASET UNSTRUCTURED_GRID\n")
        f.write(f"POINTS {len(pts)} double\n")
        np.savetxt(f, pts, fmt="%.10g")
        f.write(f"CELLS {len(cells)} {len(cells) * (nv + 1)}\n")
        np.savetxt(
            f,
            np.hstack([np.full((len(cells), 1), nv, dtype=np.int64), cells]),
            fmt="%d",
        )
        f.write(f"CELL_TYPES {len(cells)}\n")
        np.savetxt(
            f, np.full(len(cells), _VTK_TYPE[mesh.cell_type], dtype=np.int64), fmt="%d"
        )

        def write_fields(fields, n):
            for name, arr in (fields or {}).items():
                arr = np.asarray(arr, dtype=float).reshape(n, -1)
                k = arr.shape[1]
                if k == 1:
                    f.write(f"SCALARS {name} double 1\nLOOKUP_TABLE default\n")
                    np.savetxt(f, arr, fmt="%.10g")
                else:
                    if k == 2:  # pad 2D vectors
                        arr = np.hstack([arr, np.zeros((n, 1))])
                        k = 3
                    if k == 3:
                        f.write(f"VECTORS {name} double\n")
                    else:
                        f.write(f"FIELD {name}_field 1\n{name} {k} {n} double\n")
                    np.savetxt(f, arr, fmt="%.10g")

        if point_data:
            f.write(f"POINT_DATA {len(pts)}\n")
            write_fields(point_data, len(pts))
        if cell_data:
            f.write(f"CELL_DATA {len(cells)}\n")
            write_fields(cell_data, len(cells))
    return path


class TimeSeriesWriter:
    """Multi-snapshot field output: per-step legacy .vtk files + a ParaView
    .pvd collection index.

    The reference writes XDMF/VTX time series via dolfinx.io
    (reference tests/uniaxial_tension.py:93-117 and the transient heat demos);
    this is the dependency-free equivalent — ``writer.write(t, point_data=...)``
    per step, files named ``<base>_0000.vtk`` ... referenced with their time
    stamps from ``<base>.pvd``, loadable as a time series by ParaView/VisIt.
    """

    def __init__(self, path, mesh):
        import os

        self.base = path[:-4] if path.endswith(".pvd") else path
        self.mesh = mesh
        self.steps = []  # (time, filename)
        self._dir = os.path.dirname(os.path.abspath(self.base))

    def write(self, t, point_data=None, cell_data=None):
        """Append one snapshot at time ``t``; rewrites the .pvd index."""
        import os

        fname = f"{self.base}_{len(self.steps):04d}.vtk"
        write_vtk(fname, self.mesh, point_data=point_data, cell_data=cell_data)
        self.steps.append((float(t), os.path.basename(fname)))
        self._write_pvd()
        return fname

    def _write_pvd(self):
        lines = [
            '<?xml version="1.0"?>',
            '<VTKFile type="Collection" version="0.1">',
            "  <Collection>",
        ]
        for t, fn in self.steps:
            lines.append(
                f'    <DataSet timestep="{t:.12g}" group="" part="0" file="{fn}"/>'
            )
        lines += ["  </Collection>", "</VTKFile>", ""]
        with open(self.base + ".pvd", "w") as f:
            f.write("\n".join(lines))
        return self.base + ".pvd"
