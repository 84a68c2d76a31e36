"""Generic skeleton-dict forward kinematics (the src/build.py path).

Builds a pure-JAX FK function from a declarative skeleton dictionary
``{links, dofs, positions, markers}`` (schema of
skeletons/*.pickle; builder semantics of AcinoSet src/build.py:28-95).
Where the reference lambdified a SymPy expression per body part, we walk
the same link structure at trace time and emit jnp ops — jit/vmap then
compile it into a single fused program, and jax.jacfwd provides exact
Jacobians.

Semantics notes (kept faithful to src/build.py):
  * every part named in ``markers`` is promoted to 3-DoF (:37-38);
  * local rotation = Rz^(has_z) @ Rx^(has_x) @ Ry^(has_y) (:52-59);
  * links compose child rotation as R_child_local @ R_parent_acc and
    child position as pos_parent + R_parent_acc^T @ (offset) (:68-80),
    processed in list order with last-writer-wins on revisited parts —
    the reference's behavior for loops in the link graph (e.g. the
    human pelvis);
  * pose vector layout [x, y, z, phi_0..L-1, theta_0..L-1, psi_0..L-1]
    with angle index = part's insertion position in the dofs dict.

One deliberate divergence in the default mode (``compat="tpu"``): the
returned FK orders rows by the ``markers`` list (falling back to part
order) so that marker measurements and FK rows correspond by name, and
offsets rotate by the parent's *cumulative inverse* rotation. The
reference instead (a) indexes pos_funcs by pose-dict insertion order
while indexing measurements by the markers list (src/build.py:113-129
vs :232), silently mismatching the two when the orders differ, and
(b) rotates each link offset by a flip-flopped ``rot_dict[part+"_i"]``
entry that holds the part's *local* rotation (or its transpose,
depending on how many times the part appeared as a link child —
src/build.py:61,78-80), not the cumulative inverse.

``compat="reference"`` replicates those semantics exactly: verified to
reproduce the shipped fixture data/results/traj_results.pickle
(positions == FK(x)) to ~1e-15 (tests/test_generic_fte.py). Use it for
regression against reference outputs; use the default for new work.
"""
from __future__ import annotations

from dataclasses import dataclass, field
from typing import Callable, Dict, List, Tuple

import jax.numpy as jnp
import numpy as np

from ..ops.rotations import rot_x, rot_y, rot_z


@dataclass
class SkeletonModel:
    """Compiled skeleton: FK function + pose-vector metadata."""

    fk: Callable  # (n_pose,) -> (n_markers, 3)
    n_pose: int
    parts: List[str]
    markers: List[str]
    dofs: Dict[str, List[int]]
    #: indices into the pose vector that actually influence the FK
    active_idx: np.ndarray = field(default_factory=lambda: np.zeros(0, int))

    @property
    def n_markers(self) -> int:
        return len(self.markers)


def build_skeleton_model(
    skel_dict: Dict,
    promote_markers_to_3dof: bool = True,
    compat: str = "tpu",
) -> SkeletonModel:
    """Compile a skeleton dict into a SkeletonModel.

    compat="tpu" (default): by-name marker/FK association, cumulative
    inverse offset rotation. compat="reference": bit-faithful twin of
    src/build.py:28-95 (see module docstring).
    """
    if compat not in ("tpu", "reference"):
        raise ValueError(f"unknown compat mode {compat!r}")
    links = [list(l) for l in skel_dict["links"]]
    positions = {k: np.asarray(v, dtype=np.float64) for k, v in skel_dict["positions"].items()}
    dofs = {k: list(v) for k, v in skel_dict["dofs"].items()}
    markers = list(skel_dict.get("markers") or [])

    if promote_markers_to_3dof:
        for m in markers:
            dofs[m] = [1, 1, 1]

    parts = list(dofs.keys())
    part_idx = {p: i for i, p in enumerate(parts)}
    L = len(parts)
    n_pose = 3 + 3 * L

    # pose-dict insertion order (the reference's FK row order)
    walk_order: List[str] = []
    for link in links:
        for p in link:
            if p not in walk_order:
                walk_order.append(p)

    # FK row order: by-name in tpu mode, pose-dict order in reference mode
    if compat == "reference" or not markers:
        row_order = walk_order
    else:
        row_order = markers

    def fk(x):
        x = jnp.asarray(x)
        root = x[:3]
        phi = x[3 : 3 + L]
        theta = x[3 + L : 3 + 2 * L]
        psi = x[3 + 2 * L :]

        rot: Dict[str, jnp.ndarray] = {}
        rot_i: Dict[str, jnp.ndarray] = {}
        for p in parts:
            i = part_idx[p]
            R = jnp.eye(3, dtype=x.dtype)
            hx, hy, hz = dofs[p]
            if hy:
                R = rot_y(theta[i]) @ R
            if hx:
                R = rot_x(phi[i]) @ R
            if hz:
                R = rot_z(psi[i]) @ R
            rot[p] = R
            rot_i[p] = R.T

        pose: Dict[str, jnp.ndarray] = {}
        for link in links:
            if len(link) == 1:
                pose[link[0]] = root
                continue
            a, b = link
            if a not in pose:
                pose[a] = root
            offset = jnp.asarray(positions[b] - positions[a], dtype=x.dtype)
            parent_acc = rot[a]
            rot[b] = rot[b] @ parent_acc
            if compat == "reference":
                # src/build.py:78-80: the "_i" entry flip-flops between the
                # part's local rotation and its transpose each time the part
                # appears as a link child; offsets rotate by the parent's
                # "_i" entry as-is (NOT the cumulative inverse).
                rot_i[b] = rot_i[b].T
                pose[b] = pose[a] + rot_i[a] @ offset
            else:
                pose[b] = pose[a] + parent_acc.T @ offset

        rows = []
        for name in row_order:
            rows.append(pose.get(name, root))
        return jnp.stack(rows)

    # active pose indices: angles referenced by some rotation that reaches a marker.
    # conservative: every dof flag set -> active; root always active.
    active = [0, 1, 2]
    for p in parts:
        i = part_idx[p]
        hx, hy, hz = dofs[p]
        if hx:
            active.append(3 + i)
        if hy:
            active.append(3 + L + i)
        if hz:
            active.append(3 + 2 * L + i)

    # measurement labels: the markers list (data-loading order). In
    # reference-compat mode FK rows are in pose-dict order while the
    # measurements stay in markers-list order — positional association
    # between the two reproduces the reference's index mismatch
    # (src/build.py:113-129 vs :232).
    return SkeletonModel(
        fk=fk,
        n_pose=n_pose,
        parts=parts,
        markers=(markers if markers else row_order),
        dofs=dofs,
        active_idx=np.asarray(sorted(active)),
    )


def generic_pose_limits(model: SkeletonModel, limit: float = np.pi / 2) -> Tuple[np.ndarray, np.ndarray]:
    """Blanket +-pi/2 limits on all angle states (src/build.py:263-266);
    root translation unbounded."""
    lo = np.full(model.n_pose, -np.inf)
    hi = np.full(model.n_pose, np.inf)
    lo[3:] = -limit
    hi[3:] = limit
    return lo, hi
