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

import jax
import jax.numpy as jnp
import numpy as np

from ..ops.rotations import mm3, mv3, mvT3, rot_x, rot_y, rot_z


def _local_rot(dofs_p, phi_i, theta_i, psi_i, dtype):
    """Local DCM Rz^(hz) Rx^(hx) Ry^(hy) with identity factors elided and
    3x3 products as multiply-reduce (measured rationale: ops/rotations.mm3)."""
    hx, hy, hz = dofs_p
    R = None
    if hy:
        R = rot_y(theta_i)
    if hx:
        R = rot_x(phi_i) if R is None else mm3(rot_x(phi_i), R)
    if hz:
        R = rot_z(psi_i) if R is None else mm3(rot_z(psi_i), R)
    return jnp.eye(3, dtype=dtype) if R is None else R


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
    #: analytic (pts, J (n_markers, 3, n_pose)) — compat="tpu" only;
    #: equal to jax.jacfwd(fk) at machine precision
    fk_and_jac: Callable = None

    @property
    def n_markers(self) -> int:
        return len(self.markers)


def build_skeleton_model(
    skel_dict: Dict,
    promote_markers_to_3dof: bool = True,
    compat: str = "tpu",
    allow_fk_mismatch: bool = False,
) -> SkeletonModel:
    """Compile a skeleton dict into a SkeletonModel.

    compat="tpu" (default): by-name marker/FK association, cumulative
    inverse offset rotation. compat="reference": bit-faithful twin of
    src/build.py:28-95 (see module docstring).

    Dicts exported from a flagship model for interchange/visualization
    carry ``fk_equivalent=False`` (e.g. models.cheetah.to_skeleton_dict:
    the generic chain semantics would yield a DIFFERENT kinematic model
    than the flagship FK). Compiling one is refused unless
    ``allow_fk_mismatch=True``, so nobody silently solves the wrong
    model.
    """
    if compat not in ("tpu", "reference"):
        raise ValueError(f"unknown compat mode {compat!r}")
    if skel_dict.get("fk_equivalent") is False and not allow_fk_mismatch:
        raise ValueError(
            "this skeleton dict was exported for interchange/"
            f"visualization (model={skel_dict.get('model')!r}); its "
            "generic-FK evaluation does NOT reproduce the flagship "
            "kinematic chain. Solve with the flagship model instead "
            "(for 'cheetah_fte': acinoset_tpu.models.cheetah + "
            "pipeline.fte/sweep), or pass allow_fk_mismatch=True to "
            "compile it anyway for visualization-grade use."
        )
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
            R = _local_rot(dofs[p], phi[i], theta[i], psi[i], x.dtype)
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
            rot[b] = mm3(rot[b], parent_acc)
            if compat == "reference":
                # src/build.py:78-80: the "_i" entry flip-flops between the
                # part's local rotation and its transpose each time the part
                # appears as a link child; offsets rotate by the parent's
                # "_i" entry as-is (NOT the cumulative inverse).
                rot_i[b] = rot_i[b].T
                pose[b] = pose[a] + mv3(rot_i[a], offset)
            else:
                pose[b] = pose[a] + mvT3(parent_acc, offset)

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

    # ---- analytic geometric Jacobian (compat="tpu" only): same identity
    # as models.cheetah.fk25_and_jac — with frame (passive) rotations,
    # each Euler angle alpha at part j rotates everything below it about
    # a world axis that depends only on j:
    #   d(R_a^T off)/d alpha = omega_alpha x (R_a^T off),  for j an
    #   ancestor-or-self of the segment's frame part a, with
    #   omega_theta = R_par(j)^T y,  omega_psi = R_j^T z,
    #   omega_phi = R_par(j)^T Ry(theta_j)^T x.
    # The full Jacobian is then one static-mask einsum over the FK's own
    # segment vectors plus one cross product. (The reference-compat FK's
    # flip-flopped rotation bookkeeping breaks the chain structure this
    # relies on — that mode keeps jacfwd.)
    parent_of: Dict[str, str] = {}
    seg_child: List[str] = []  # one segment per linked child part
    seg_frame: List[str] = []
    seg_off: List[np.ndarray] = []
    is_tree = True
    for link in links:
        if len(link) != 2:
            continue
        a, b = link
        if b in parent_of:
            # a part with two parents (e.g. the shipped human's hip1):
            # the builder then composes BOTH parents' rotations into the
            # part's frame, so an ancestor angle can appear through two
            # paths and the single-axis identity below no longer holds —
            # such skeletons keep jacfwd
            is_tree = False
        parent_of[b] = a
        seg_child.append(b)
        seg_frame.append(a)
        seg_off.append(positions[b] - positions[a])
    seg_id = {c: i for i, c in enumerate(seg_child)}
    S = len(seg_child)

    def part_chain(p):  # segments from part p up to the root
        out = []
        while p in seg_id:
            out.append(seg_id[p])
            p = parent_of[p]
        return out

    angle_specs = []  # (kind, part name, pose column)
    for p in parts:
        i = part_idx[p]
        hx, hy, hz = dofs[p]
        if hx:
            angle_specs.append(("phi", p, 3 + i))
        if hy:
            angle_specs.append(("theta", p, 3 + L + i))
        if hz:
            angle_specs.append(("psi", p, 3 + 2 * L + i))
    Acnt = len(angle_specs)
    Rrows = len(row_order)

    def anc_or_self(part):  # the part and all its link ancestors
        out = {part}
        while part in parent_of:
            part = parent_of[part]
            out.add(part)
        return out

    msa = np.zeros((Rrows, S, Acnt))
    for ri, name in enumerate(row_order):
        for s in part_chain(name):
            frame_anc = anc_or_self(seg_frame[s])
            for ai, (_k, p, _c) in enumerate(angle_specs):
                if p in frame_anc:
                    msa[ri, s, ai] = 1.0
    angle_cols = np.asarray([c for _k, _p, c in angle_specs], int)

    def fk_and_jac(x):
        x = jnp.asarray(x)
        dtype = x.dtype
        root = x[:3]
        phi = x[3 : 3 + L]
        theta = x[3 + L : 3 + 2 * L]
        psi = x[3 + 2 * L :]
        eye3 = jnp.eye(3, dtype=dtype)

        rot: Dict[str, jnp.ndarray] = {}
        for p in parts:
            i = part_idx[p]
            rot[p] = _local_rot(dofs[p], phi[i], theta[i], psi[i], dtype)

        pose: Dict[str, jnp.ndarray] = {}
        Rpar: Dict[str, jnp.ndarray] = {p: eye3 for p in parts}
        segs: List[jnp.ndarray] = [None] * S
        for link in links:
            if len(link) == 1:
                pose[link[0]] = root
                continue
            a, b = link
            if a not in pose:
                pose[a] = root
            off = jnp.asarray(positions[b] - positions[a], dtype=dtype)
            parent_acc = rot[a]
            Rpar[b] = parent_acc
            rot[b] = mm3(rot[b], parent_acc)
            v = mvT3(parent_acc, off)
            segs[seg_id[b]] = v
            pose[b] = pose[a] + v

        pts = jnp.stack([pose.get(name, root) for name in row_order])
        V = jnp.stack(segs) if S else jnp.zeros((0, 3), dtype)

        # rotation axes as static row-selects: R^T @ e_k is row k of R
        omegas = []
        for kind, p, _c in angle_specs:
            i = part_idx[p]
            if kind == "theta":
                omegas.append(Rpar[p][1])  # Rpar^T y_hat
            elif kind == "psi":
                omegas.append(rot[p][2])  # R^T z_hat
            elif dofs[p][1]:  # phi with a theta dof: Ry(th)^T x = row 0
                c, s = jnp.cos(theta[i]), jnp.sin(theta[i])
                omegas.append(c * Rpar[p][0] - s * Rpar[p][2])
            else:  # phi, no theta
                omegas.append(Rpar[p][0])  # Rpar^T x_hat
        W = jnp.stack(omegas) if Acnt else jnp.zeros((0, 3), dtype)

        T = jnp.einsum("rsa,sx->rax", jnp.asarray(msa, dtype), V)
        # omega x v with components stacked on axis 1: (R, 3, A) without
        # a transpose (see cheetah.fk25_and_jac)
        Jang = jnp.stack(
            [
                W[:, 1] * T[..., 2] - W[:, 2] * T[..., 1],
                W[:, 2] * T[..., 0] - W[:, 0] * T[..., 2],
                W[:, 0] * T[..., 1] - W[:, 1] * T[..., 0],
            ],
            axis=1,
        )  # (R, 3, A)
        J = jnp.zeros((Rrows, 3, n_pose), dtype)
        if Acnt:
            J = J.at[:, :, jnp.asarray(angle_cols)].set(Jang)
        J = J.at[:, :, jnp.asarray([0, 1, 2])].set(
            jnp.broadcast_to(eye3, (Rrows, 3, 3))
        )
        return pts, J

    # ---- DAG generalization of the analytic Jacobian (r5): the shipped
    # human's two-parent hip composes BOTH parents' accumulated
    # rotations into the part's frame, so an ancestor angle can reach a
    # segment through two products and the per-part single-axis identity
    # above breaks. The general form: every accumulated rotation is a
    # statically-known ordered product of LOCAL atoms (simulate the link
    # walk symbolically, snapshotting at composition time exactly like
    # fk does), and for an angle occurrence inside that product the
    # world rotation axis is a row of the SUFFIX product of the atoms to
    # its right — per (segment, occurrence), not per part. Angles shared
    # by both parent chains simply contribute one omega x v term per
    # occurrence. Verified == jax.jacfwd(fk) on the shipped human
    # (tests/test_generic_fte.py).
    seqs = {p: (p,) for p in parts}
    pos_chain: Dict[str, tuple] = {p: () for p in parts}
    seg_frames_snap: List[tuple] = []
    seg_offs: List[np.ndarray] = []
    seg_parent: List[str] = []
    for link in links:
        if len(link) != 2:
            continue
        a, b = link
        s_id = len(seg_frames_snap)
        seg_frames_snap.append(seqs[a])
        seg_offs.append(positions[b] - positions[a])
        seg_parent.append(a)
        seqs[b] = seqs[b] + seqs[a]
        pos_chain[b] = pos_chain[a] + (s_id,)
    S2 = len(seg_frames_snap)

    occ = []  # (segment, pose column, kind, part, suffix-tail tuple)
    for s in range(S2):
        A = seg_frames_snap[s]
        for i, q in enumerate(A):
            hx, hy, hz = dofs[q]
            qi = part_idx[q]
            if hz:
                occ.append((s, 3 + 2 * L + qi, "psi", q, A[i:]))
            if hx:
                occ.append((s, 3 + qi, "phi", q, A[i + 1:]))
            if hy:
                occ.append((s, 3 + L + qi, "theta", q, A[i + 1:]))
    O3 = len(occ)
    rows_chain = [set(pos_chain.get(name, ())) for name in row_order]
    Wmask = np.zeros((Rrows, O3))
    col_onehot = np.zeros((O3, n_pose))
    occ_seg = np.asarray([s for (s, *_r) in occ], int)
    for o, (s, col, _k, _q, _t) in enumerate(occ):
        col_onehot[o, col] = 1.0
        for ri in range(Rrows):
            if s in rows_chain[ri]:
                Wmask[ri, o] = 1.0
    tails_sorted = sorted({t for (*_a, t) in occ}, key=len)

    def fk_and_jac_dag(x):
        x = jnp.asarray(x)
        dtype = x.dtype
        root = x[:3]
        phi = x[3 : 3 + L]
        theta = x[3 + L : 3 + 2 * L]
        psi = x[3 + 2 * L :]
        eye3 = jnp.eye(3, dtype=dtype)

        loc = {}
        rot: Dict[str, jnp.ndarray] = {}
        for p in parts:
            i = part_idx[p]
            loc[p] = _local_rot(dofs[p], phi[i], theta[i], psi[i], dtype)
            rot[p] = loc[p]

        pose: Dict[str, jnp.ndarray] = {}
        segs: List[jnp.ndarray] = []
        for link in links:
            if len(link) == 1:
                pose[link[0]] = root
                continue
            a, b = link
            if a not in pose:
                pose[a] = root
            off = jnp.asarray(positions[b] - positions[a], dtype=dtype)
            parent_acc = rot[a]
            rot[b] = mm3(rot[b], parent_acc)
            v = mvT3(parent_acc, off)
            segs.append(v)
            pose[b] = pose[a] + v
        pts = jnp.stack([pose.get(name, root) for name in row_order])
        V = (jnp.stack(segs) if S2 else jnp.zeros((0, 3), dtype))

        # suffix products of local atoms, shared across occurrences
        # (every tail of a deeper tail is itself a needed tail or CSEd)
        memo = {(): eye3}
        for t in tails_sorted:  # shortest first -> inner tails usually hit
            if t in memo:
                continue
            if t[1:] in memo:
                memo[t] = mm3(loc[t[0]], memo[t[1:]])
            else:
                acc = eye3
                for q in reversed(t):
                    acc = mm3(loc[q], acc)
                memo[t] = acc

        omegas = []
        for (s, _col, kind, q, tail) in occ:
            Sfx = memo[tail]
            if kind == "psi":
                omegas.append(Sfx[2])
            elif kind == "theta":
                omegas.append(Sfx[1])
            elif dofs[q][1]:  # phi with a theta dof: Ry(th)^T x
                i = part_idx[q]
                c, s_ = jnp.cos(theta[i]), jnp.sin(theta[i])
                omegas.append(c * Sfx[0] - s_ * Sfx[2])
            else:
                omegas.append(Sfx[0])
        if O3:
            Wo = jnp.stack(omegas)  # (O3, 3)
            Cx = jnp.cross(Wo, V[occ_seg])  # (O3, 3)
            J = jnp.einsum(
                "ro,ox,oa->rxa", jnp.asarray(Wmask, dtype), Cx,
                jnp.asarray(col_onehot, dtype),
            )
        else:
            J = jnp.zeros((Rrows, 3, n_pose), dtype)
        J = J.at[:, :, jnp.asarray([0, 1, 2])].set(
            jnp.broadcast_to(eye3, (Rrows, 3, 3))
        )
        return pts, J

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
        fk_and_jac=(
            fk_and_jac if (compat == "tpu" and is_tree)
            else fk_and_jac_dag if compat == "tpu"
            else None
        ),
    )


def fk_and_jac_any(model: SkeletonModel) -> Callable:
    """The model's FK-with-Jacobian, for EVERY skeleton.

    Returns the analytic ``model.fk_and_jac`` when the link graph
    supports it; otherwise synthesizes one with ``jax.jacfwd`` over the
    FK alone (reference-compat mode and non-tree graphs). Either way the
    tangents never flow through the camera model — the hj_parts
    factories compose this with the fused closed-form projection
    Jacobian (ops.camera.project_points_fisheye_and_jac), so the
    unassembled-contraction measurement path (HBM traffic cut, see
    trajopt.meas_normal_pieces) is available for ALL generic models,
    not only those with an analytic FK Jacobian. jacfwd's extra primal
    evaluation CSEs away inside the surrounding jit.
    """
    if model.fk_and_jac is not None:
        return model.fk_and_jac
    fk = model.fk

    def fkj(pose):
        return fk(pose), jax.jacfwd(fk)(pose)  # (L,3), (L,3,n_pose)

    return fkj


def generic_pose_limits(model: SkeletonModel, limit: float = np.pi / 2) -> Tuple[np.ndarray, np.ndarray]:
    """Blanket +-pi/2 limits on all angle states (src/build.py:263-266);
    root translation unbounded."""
    lo = np.full(model.n_pose, -np.inf)
    hi = np.full(model.n_pose, np.inf)
    lo[3:] = -limit
    hi[3:] = limit
    return lo, hi
