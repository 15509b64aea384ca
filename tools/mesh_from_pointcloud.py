"""Point-cloud -> surface mesh (PLY), offline reconstruction helper.

Replaces tools/matlab/mesh_from_pointcloud.m: read an exported sparse cloud
(COLMAP points3D.txt or the framework's map-points TSV), clip outliers,
denoise, fit a gridded height surface and emit a triangulated PLY.

The matlab original used pcdenoise + gridfit; here: k-NN-free statistical
denoising (median absolute deviation per axis), median-binned height grid
with iterative hole filling (neighbor averaging), regular-grid
triangulation.

Usage:
    python -m tools.mesh_from_pointcloud points3D.txt mesh.ply \
        [--limit 20] [--grid 64] [--up z]
"""

from __future__ import annotations

import argparse

import numpy as np


def load_points(path: str) -> np.ndarray:
    """COLMAP points3D.txt (id x y z ...) or TSV with x/y/z columns."""
    pts = []
    with open(path) as f:
        header = None
        for line in f:
            if line.startswith("#") or not line.strip():
                continue
            parts = line.split()
            if header is None and any(c.isalpha() for c in parts[0]):
                header = parts  # TSV header row
                continue
            if header is not None:
                ix = [header.index(c) for c in ("x", "y", "z")]
                pts.append([float(parts[i]) for i in ix])
            else:
                pts.append([float(parts[1]), float(parts[2]),
                            float(parts[3])])
    return np.asarray(pts, np.float64)


def denoise(pts: np.ndarray, n_sigma: float = 3.5) -> np.ndarray:
    """Robust outlier rejection per axis (pcdenoise stand-in)."""
    med = np.median(pts, axis=0)
    mad = np.median(np.abs(pts - med), axis=0) * 1.4826 + 1e-9
    ok = np.all(np.abs(pts - med) <= n_sigma * mad, axis=-1)
    return pts[ok]


def height_grid(pts: np.ndarray, n: int = 64, up: int = 2):
    """Median-binned height field over the two non-up axes, holes filled by
    iterative neighbor averaging (gridfit stand-in)."""
    ax = [i for i in range(3) if i != up]
    xy = pts[:, ax]
    h = pts[:, up]
    lo = xy.min(0)
    hi = xy.max(0)
    span = np.maximum(hi - lo, 1e-9)
    ij = np.clip(((xy - lo) / span * (n - 1)).astype(int), 0, n - 1)

    grid = np.full((n, n), np.nan)
    for b in range(n * n):
        m = (ij[:, 0] * n + ij[:, 1]) == b
        if m.any():
            grid[b // n, b % n] = np.median(h[m])

    # hole filling
    for _ in range(4 * n):
        nan = np.isnan(grid)
        if not nan.any():
            break
        padded = np.pad(grid, 1, constant_values=np.nan)
        neigh = np.stack([
            padded[:-2, 1:-1], padded[2:, 1:-1],
            padded[1:-1, :-2], padded[1:-1, 2:],
        ])
        import warnings

        with np.errstate(all="ignore"), warnings.catch_warnings():
            warnings.simplefilter("ignore", RuntimeWarning)
            fill = np.nanmean(neigh, axis=0)
        grid = np.where(nan & ~np.isnan(fill), fill, grid)
    grid = np.nan_to_num(grid, nan=float(np.nanmean(grid)))

    gx = lo[0] + np.arange(n) / (n - 1) * span[0]
    gy = lo[1] + np.arange(n) / (n - 1) * span[1]
    return gx, gy, grid, ax


def write_ply(path: str, gx, gy, grid, ax, up: int = 2) -> None:
    n = grid.shape[0]
    verts = np.zeros((n * n, 3))
    X, Y = np.meshgrid(gx, gy, indexing="ij")
    verts[:, ax[0]] = X.reshape(-1)
    verts[:, ax[1]] = Y.reshape(-1)
    verts[:, up] = grid.reshape(-1)
    faces = []
    for i in range(n - 1):
        for j in range(n - 1):
            a = i * n + j
            faces.append((a, a + 1, a + n))
            faces.append((a + 1, a + n + 1, a + n))
    with open(path, "w") as f:
        f.write("ply\nformat ascii 1.0\n")
        f.write(f"element vertex {len(verts)}\n")
        f.write("property float x\nproperty float y\nproperty float z\n")
        f.write(f"element face {len(faces)}\n")
        f.write("property list uchar int vertex_indices\nend_header\n")
        for v in verts:
            f.write(f"{v[0]:.6f} {v[1]:.6f} {v[2]:.6f}\n")
        for a, b, c in faces:
            f.write(f"3 {a} {b} {c}\n")


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("pointcloud")
    ap.add_argument("out_ply")
    ap.add_argument("--limit", type=float, default=20.0,
                    help="max |x|,|y|,|z| kept (mesh_from_pointcloud.m "
                         "limit_xyz)")
    ap.add_argument("--grid", type=int, default=64)
    ap.add_argument("--up", choices="xyz", default="z")
    args = ap.parse_args(argv)

    pts = load_points(args.pointcloud)
    pts = pts[np.all(np.abs(pts) <= args.limit, axis=-1)]
    pts = denoise(pts)
    if len(pts) < 16:
        raise SystemExit("too few points after filtering")
    up = "xyz".index(args.up)
    gx, gy, grid, ax = height_grid(pts, n=args.grid, up=up)
    write_ply(args.out_ply, gx, gy, grid, ax, up=up)
    print(f"{args.pointcloud}: {len(pts)} pts -> {args.out_ply} "
          f"({args.grid}x{args.grid} grid)")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
