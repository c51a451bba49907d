"""Visualization helpers (matplotlib-only rebuild of the reference vis utils).

- ``plot_single_pcd``: single point-cloud PNG (reference
  ``completion/vis_utils.py:35-52``; the reference also ran Open3D normal
  estimation purely for shading — here shading comes from depth).
- ``plot_gmm`` / ``visualize_registration``: GMM ellipsoid wireframes +
  registration before/after panels (reference ``registration/visu_utils.py``).
"""

from __future__ import annotations

import numpy as np


def _mpl():
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    return plt


def plot_single_pcd(points: np.ndarray, save_path: str):
    """Render one (N, 3) cloud to PNG with depth shading."""
    plt = _mpl()
    points = np.asarray(points)
    fig = plt.figure(figsize=(4, 4))
    ax = fig.add_subplot(111, projection="3d")
    depth = points[:, 2]
    ax.scatter(points[:, 0], points[:, 1], points[:, 2],
               c=depth, s=1, cmap="viridis")
    ax.set_axis_off()
    lim = np.abs(points).max()
    ax.set_xlim(-lim, lim)
    ax.set_ylim(-lim, lim)
    ax.set_zlim(-lim, lim)
    fig.savefig(save_path, dpi=150, bbox_inches="tight")
    plt.close(fig)
    return save_path


def _ellipsoid_wire(mu, sigma, n=10):
    """Unit-sphere wireframe mapped through sqrt(sigma) around mu."""
    u = np.linspace(0, 2 * np.pi, n)
    v = np.linspace(0, np.pi, n)
    x = np.outer(np.cos(u), np.sin(v))
    y = np.outer(np.sin(u), np.sin(v))
    z = np.outer(np.ones_like(u), np.cos(v))
    sphere = np.stack([x, y, z], axis=-1)                   # (n, n, 3)
    w, V = np.linalg.eigh(sigma)
    A = V @ np.diag(np.sqrt(np.maximum(w, 0))) @ V.T
    return sphere @ A.T * 2.0 + mu                           # 2-sigma shell


def plot_gmm(ax, pi, mu, sigma, cmap="Set1"):
    """GMM ellipsoids sized by component weight (visu_utils.py:39-66)."""
    import matplotlib.cm as cm

    pi = np.asarray(pi)
    colors = cm.get_cmap(cmap)(np.linspace(0, 1, len(pi)))
    for j in range(len(pi)):
        if pi[j] < 1e-6:
            continue
        shell = _ellipsoid_wire(np.asarray(mu[j]), np.asarray(sigma[j]))
        ax.plot_wireframe(
            shell[..., 0], shell[..., 1], shell[..., 2],
            color=colors[j], alpha=min(1.0, float(pi[j]) * len(pi)),
            linewidth=0.5,
        )


def visualize_registration(src, tgt, src_transformed, save_path: str,
                           gmm1=None, gmm2=None, title: str = ""):
    """Before/after registration panels (visu_utils.py:69-101)."""
    plt = _mpl()
    fig = plt.figure(figsize=(10, 5))
    for i, (a, b, name) in enumerate(
        [(src, tgt, "input"), (src_transformed, tgt, "registered")]
    ):
        ax = fig.add_subplot(1, 2, i + 1, projection="3d")
        a, b = np.asarray(a), np.asarray(b)
        ax.scatter(a[:, 0], a[:, 1], a[:, 2], c="tab:blue", s=1, label="src")
        ax.scatter(b[:, 0], b[:, 1], b[:, 2], c="tab:orange", s=1, label="tgt")
        if i == 0 and gmm1 is not None:
            plot_gmm(ax, *gmm1)
        if i == 0 and gmm2 is not None:
            plot_gmm(ax, *gmm2, cmap="Set2")
        ax.set_title(name)
        ax.set_axis_off()
    if title:
        fig.suptitle(title)
    fig.savefig(save_path, dpi=150, bbox_inches="tight")
    plt.close(fig)
    return save_path
