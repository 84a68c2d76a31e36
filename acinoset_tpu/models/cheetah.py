"""The 20-marker cheetah kinematic model as declarative data + pure-JAX FK.

This is the numeric twin of the reference's SymPy model (AcinoSet
src/all_optimizations.py:66-190) and of the missing
``lib.misc.get_3d_marker_coords`` / ``get_pose_params`` /
``get_markers`` (SURVEY.md §2.3). Instead of symbolic codegen we define
the kinematic chain as static tables and evaluate FK with jnp ops;
``jax.jacfwd`` then supplies exact Jacobians wherever the reference
used SymPy lambdify or finite differences.

Pose layout (the reference's 45-vector, src/all_optimizations.py:96-98,288):
    x45 = [x, y, z, phi_0..13, theta_0..13, psi_0..13]
Only 25 entries are *active* (nonzero process variance Q; the other 20
angles never appear in the kinematics). ``ACTIVE_IDX`` maps the dense
25-vector used by EKF/FTE to the 45 layout.

Rotation convention: frame rotations (inertial->joint DCMs), local
composition R_j = Rz(psi)^(has_z) @ Rx(phi)^(has_x) @ Ry(theta)^(has_y) @ R_parent
(matching src/all_optimizations.py:100-128). Marker positions chain as
p = p_base + R_frame^T @ offset (offsets in the joint frame, meters;
values from src/all_optimizations.py:137-165).
"""
from __future__ import annotations

from collections import OrderedDict

import jax.numpy as jnp
import numpy as np

from ..ops.rotations import mm3, mvT3, rot_x, rot_y, rot_z

# --------------------------------------------------------------------------
# Static model tables
# --------------------------------------------------------------------------

N_JOINTS = 14
N_POSE = 3 + 3 * N_JOINTS  # 45

#: joint name -> (parent joint index, has_phi, has_theta, has_psi)
#: (src/all_optimizations.py:100-128)
JOINTS = OrderedDict(
    [
        ("head", (-1, True, True, True)),
        ("neck", (0, True, True, True)),
        ("front_torso", (1, False, True, False)),
        ("back_torso", (2, True, True, True)),
        ("tail_base", (3, False, True, True)),
        ("tail_mid", (4, False, True, True)),
        ("l_shoulder", (2, False, True, False)),
        ("l_front_knee", (6, False, True, False)),
        ("r_shoulder", (2, False, True, False)),
        ("r_front_knee", (8, False, True, False)),
        ("l_hip", (3, False, True, False)),
        ("l_back_knee", (10, False, True, False)),
        ("r_hip", (3, False, True, False)),
        ("r_back_knee", (12, False, True, False)),
    ]
)

#: marker name -> (base marker index or -1 for the head root, frame joint
#: index, offset xyz in that joint's frame) — src/all_optimizations.py:137-165.
#: Order fixed by the reference positions matrix (:170-179, testing.py:30-36).
MARKER_SPECS = [
    ("l_eye", -1, 0, (0.0, 0.03, 0.0)),
    ("r_eye", -1, 0, (0.0, -0.03, 0.0)),
    ("nose", -1, 0, (0.055, 0.0, -0.055)),
    ("neck_base", -1, 1, (-0.28, 0.0, 0.0)),
    ("spine", 3, 2, (-0.37, 0.0, 0.0)),
    ("tail_base", 4, 3, (-0.37, 0.0, 0.0)),
    ("tail1", 5, 4, (-0.28, 0.0, 0.0)),
    ("tail2", 6, 5, (-0.36, 0.0, 0.0)),
    ("l_shoulder", 3, 2, (-0.04, 0.08, -0.10)),
    ("l_front_knee", 8, 6, (0.0, 0.0, -0.24)),
    ("l_front_ankle", 9, 7, (0.0, 0.0, -0.28)),
    ("r_shoulder", 3, 2, (-0.04, -0.08, -0.10)),
    ("r_front_knee", 11, 8, (0.0, 0.0, -0.24)),
    ("r_front_ankle", 12, 9, (0.0, 0.0, -0.28)),
    ("l_hip", 5, 3, (0.12, 0.08, -0.06)),
    ("l_back_knee", 14, 10, (0.0, 0.0, -0.32)),
    ("l_back_ankle", 15, 11, (0.0, 0.0, -0.25)),
    ("r_hip", 5, 3, (0.12, -0.08, -0.06)),
    ("r_back_knee", 17, 12, (0.0, 0.0, -0.32)),
    ("r_back_ankle", 18, 13, (0.0, 0.0, -0.25)),
]

MARKERS = [m[0] for m in MARKER_SPECS]
N_MARKERS = len(MARKERS)  # 20

#: per-45-slot model std-dev (pre-squaring) — src/all_optimizations.py:245-252.
#: Zero marks an unused DoF; Q (variance) = these values squared.
Q_STD = np.array(
    [4, 7, 5]
    + [13, 32, 0, 10, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0]
    + [9, 18, 43, 53, 90, 118, 247, 186, 194, 164, 295, 243, 334, 149]
    + [26, 12, 0, 34, 43, 51, 0, 0, 0, 0, 0, 0, 0, 0],
    dtype=np.float64,
)
Q_VAR = Q_STD**2

ACTIVE_IDX = np.where(Q_STD != 0)[0]  # 25 active slots in the 45 layout
N_ACTIVE = len(ACTIVE_IDX)  # 25


def get_markers():
    """The 20 cheetah marker names in canonical FK order
    (missing lib.misc.get_markers — SURVEY.md §2.3)."""
    return list(MARKERS)


def get_pose_params():
    """Ordered name -> dense-25 index of the active pose parameters
    (missing lib.misc.get_pose_params; layout per the EKF qb_list
    comments, src/all_optimizations.py:734-746)."""
    names = [
        "x_0", "y_0", "z_0",
        "phi_0", "theta_0", "psi_0",
        "phi_1", "theta_1", "psi_1",
        "theta_2",
        "phi_3", "theta_3", "psi_3",
        "theta_4", "psi_4",
        "theta_5", "psi_5",
        "theta_6", "theta_7",
        "theta_8", "theta_9",
        "theta_10", "theta_11",
        "theta_12", "theta_13",
    ]
    return OrderedDict((n, i) for i, n in enumerate(names))


def _active_order_45() -> np.ndarray:
    """45-layout indices of the 25 params, in get_pose_params() order."""
    out = []
    for name in get_pose_params():
        if name in ("x_0", "y_0", "z_0"):
            out.append({"x_0": 0, "y_0": 1, "z_0": 2}[name])
        else:
            kind, j = name.split("_")
            j = int(j)
            base = {"phi": 3, "theta": 3 + N_JOINTS, "psi": 3 + 2 * N_JOINTS}[kind]
            out.append(base + j)
    return np.array(out)


ACTIVE_IDX_ORDERED = _active_order_45()  # dense-25 order -> 45 slots


#: permutation mapping the dense-25 (get_pose_params / EKF qb_list order)
#: to the reference FTE-pickle column order. The reference's convert_m
#: (src/all_optimizations.py:539-546) strips Q==0 entries from the
#: 45-vector, leaving the 25 active params in ascending 45-index order —
#: which differs from the EKF order (the reference itself uses both).
FTE_SAVE_ORDER = np.argsort(ACTIVE_IDX_ORDERED)


def to_fte_order(x25):
    """Dense-25 (pose-param order) -> reference fte.pickle column order."""
    return jnp.asarray(x25)[..., FTE_SAVE_ORDER]


def from_fte_order(x25_fte):
    """Reference fte.pickle column order -> dense-25 pose-param order."""
    inv = np.argsort(FTE_SAVE_ORDER)
    return jnp.asarray(x25_fte)[..., inv]


def expand_pose(x25):
    """Dense active pose (..., 25) -> full 45 layout (unused slots zero)."""
    x25 = jnp.asarray(x25)
    out = jnp.zeros(x25.shape[:-1] + (N_POSE,), dtype=x25.dtype)
    return out.at[..., ACTIVE_IDX_ORDERED].set(x25)


def compress_pose(x45):
    """Full 45 pose (..., 45) -> dense active (..., 25)."""
    return jnp.asarray(x45)[..., ACTIVE_IDX_ORDERED]


# --------------------------------------------------------------------------
# Forward kinematics
# --------------------------------------------------------------------------


_mm3, _mvT3 = mm3, mvT3  # measured rationale in ops/rotations.py


def _local_rotation(has_phi, has_theta, has_psi, phi, theta, psi):
    R = None  # compose only the axes present; identity factors elided
    if has_theta:
        R = rot_y(theta)
    if has_phi:
        R = rot_x(phi) if R is None else _mm3(rot_x(phi), R)
    if has_psi:
        R = rot_z(psi) if R is None else _mm3(rot_z(psi), R)
    return jnp.eye(3, dtype=phi.dtype) if R is None else R


def fk(x45):
    """Forward kinematics: 45-pose -> (20, 3) marker positions.

    Numeric twin of the lambdified SymPy positions matrix
    (src/all_optimizations.py:137-190) and of the missing
    lib.misc.get_3d_marker_coords. Unrolled at trace time (static chain)
    into one fused XLA program; vmap over frames/trajectories for batch.
    """
    x45 = jnp.asarray(x45)
    root = x45[:3]
    phi = x45[3 : 3 + N_JOINTS]
    theta = x45[3 + N_JOINTS : 3 + 2 * N_JOINTS]
    psi = x45[3 + 2 * N_JOINTS :]

    R = []  # inertial->joint DCMs
    for j, (_name, (parent, has_phi, has_theta, has_psi)) in enumerate(JOINTS.items()):
        Rl = _local_rotation(has_phi, has_theta, has_psi, phi[j], theta[j], psi[j])
        R.append(Rl if parent < 0 else _mm3(Rl, R[parent]))

    positions = []
    for _name, base_idx, frame_j, offset in MARKER_SPECS:
        base = root if base_idx < 0 else positions[base_idx]
        off = jnp.asarray(offset, dtype=x45.dtype)
        positions.append(base + _mvT3(R[frame_j], off))
    return jnp.stack(positions)


def fk25(x25):
    """FK from the dense 25-parameter pose (EKF/FTE state)."""
    return fk(expand_pose(x25))


def _jac_static_tables():
    """Static masks for the analytic FK Jacobian.

    Returns (angle_specs, seg_mask (L, L), anc_mask (L, A), col_idx (A,)):
    angle_specs lists the 22 active angle params as (kind, joint);
    seg_mask[m, s] = segment s (one per marker) lies on marker m's chain;
    anc_mask[s, a] = angle a's joint is an ancestor-of-or-equal-to the
    frame joint of segment s; col_idx maps angle a to its dense-25 column.
    """
    pp = get_pose_params()
    angle_specs = []
    col_idx = []
    for name, col in pp.items():
        if name in ("x_0", "y_0", "z_0"):
            continue
        kind, j = name.split("_")
        angle_specs.append((kind, int(j)))
        col_idx.append(col)

    parents = [spec[0] for spec in JOINTS.values()]

    def joint_chain(j):
        out = []
        while j >= 0:
            out.append(j)
            j = parents[j]
        return out

    L = N_MARKERS
    seg_mask = np.zeros((L, L))
    for m in range(L):
        s = m
        while s >= 0:
            seg_mask[m, s] = 1.0
            s = MARKER_SPECS[s][1]  # base marker index (-1 = root)

    A = len(angle_specs)
    anc_mask = np.zeros((L, A))
    for s in range(L):
        anc = set(joint_chain(MARKER_SPECS[s][2]))
        for a, (_kind, j) in enumerate(angle_specs):
            if j in anc:
                anc_mask[s, a] = 1.0
    return angle_specs, seg_mask, anc_mask, np.array(col_idx)


_JAC_ANGLES, _JAC_SEG_MASK, _JAC_ANC_MASK, _JAC_COLS = _jac_static_tables()
# fk25_and_jac assembles J as concat([I3 (root x/y/z), Jang]) — valid
# only while the active root translations are pose params 0-2 and the
# angle columns are the sorted remainder
assert list(_JAC_COLS) == list(range(3, N_ACTIVE)), _JAC_COLS
#: combined (L, L, A) mask: marker m sums segment s under angle a
_JAC_MSA = np.einsum("ms,sa->msa", _JAC_SEG_MASK, _JAC_ANC_MASK)


def fk25_and_jac(x25):
    """FK positions AND the analytic (20, 3, 25) Jacobian in one pass.

    Equal to (fk25(x), jax.jacfwd(fk25)(x)) but ~10x cheaper on TPU: the
    jacfwd pushes 25 tangents through every FK op, while analytically
    each Euler angle alpha at joint a rotates everything below it about
    a fixed world axis omega_alpha, so
        d(R_f^T off)/d alpha = (R_f^T off) x omega_alpha
    (omega depends only on a: theta -> R_par^T y_hat, psi -> R_a^T z_hat,
    phi -> R_par^T Ry(theta)^T x_hat), and the full Jacobian is one
    static-mask einsum over the already-computed segment vectors plus one
    cross product. Verified against jacfwd in tests/test_cheetah_model.py.

    Every 3-wide product is a broadcast-multiply-reduce (_mm3/_mvT3) or
    a static row-select (R^T e_k = R[k]), never a dot_general, and the
    cross product is emitted directly in (L, 3, A) order: measured 3.3x
    on the full measurement pass vs the `@`-composed chain, which paid a
    bf16 relayout copy per 3x3 product plus a (L, 3, A) transpose
    (scripts/probe_meas.py, docs/r04/probe_fk.txt). Side effect: the
    chain now runs entirely in f32 VPU fusions, removing the bf16-MXU
    noise floor the polish tail exists to overcome.
    """
    x25 = jnp.asarray(x25)
    dtype = x25.dtype
    x45 = expand_pose(x25)
    phi = x45[3 : 3 + N_JOINTS]
    theta = x45[3 + N_JOINTS : 3 + 2 * N_JOINTS]
    psi = x45[3 + 2 * N_JOINTS :]

    eye3 = jnp.eye(3, dtype=dtype)
    R = []  # inertial->joint DCMs
    Rpar = []  # parent DCM per joint (identity at roots)
    for j, (_name, (parent, has_phi, has_theta, has_psi)) in enumerate(JOINTS.items()):
        Rl = _local_rotation(has_phi, has_theta, has_psi, phi[j], theta[j], psi[j])
        Rp = eye3 if parent < 0 else R[parent]
        Rpar.append(Rp)
        R.append(Rl if parent < 0 else _mm3(Rl, Rp))

    # segment world vectors v_s = R_f^T off and positions
    positions = []
    segs = []
    root = x45[:3]
    for _name, base_idx, frame_j, offset in MARKER_SPECS:
        off = jnp.asarray(offset, dtype=dtype)
        v = _mvT3(R[frame_j], off)
        segs.append(v)
        base = root if base_idx < 0 else positions[base_idx]
        positions.append(base + v)
    pts = jnp.stack(positions)  # (L, 3)
    V = jnp.stack(segs)  # (L, 3)

    # world rotation axes per active angle: R^T @ e_k is row k of R
    omegas = []
    for kind, j in _JAC_ANGLES:
        if kind == "theta":
            omegas.append(Rpar[j][1])  # Rpar^T y_hat
        elif kind == "psi":
            omegas.append(R[j][2])  # R^T z_hat
        else:  # phi: Rpar^T (Ry(th)^T x_hat), Ry(th)^T x_hat = row 0 of Ry
            c, s = jnp.cos(theta[j]), jnp.sin(theta[j])
            omegas.append(c * Rpar[j][0] - s * Rpar[j][2])
    W = jnp.stack(omegas)  # (A, 3)

    msa = jnp.asarray(_JAC_MSA, dtype)  # (L, L, A) static mask
    T = jnp.einsum("msa,sx->max", msa, V)  # (L, A, 3)
    # frame (passive) rotations: dR/dtheta = -S R, so omega x v, not
    # v x omega — components stacked on axis 1 so Jang lands in
    # (L, 3, A) order without a transpose
    Jang = jnp.stack(
        [
            W[:, 1] * T[..., 2] - W[:, 2] * T[..., 1],
            W[:, 2] * T[..., 0] - W[:, 0] * T[..., 2],
            W[:, 0] * T[..., 1] - W[:, 1] * T[..., 0],
        ],
        axis=1,
    )  # (L, 3, A)

    # column layout is exactly [root x/y/z | _JAC_COLS in pose order]
    # (active root translations are pose params 0-2 and _JAC_COLS is the
    # sorted remainder — asserted at import below), so J assembles as a
    # single concat: the previous two `.at[:, :, cols].set()` writes
    # lowered to full-buffer HLO scatters per measurement pass on TPU
    J = jnp.concatenate(
        [jnp.broadcast_to(eye3, (N_MARKERS, 3, 3)), Jang], axis=-1
    )
    return pts, J


# --------------------------------------------------------------------------
# Joint limits (FTE pose constraints, src/all_optimizations.py:401-483)
# --------------------------------------------------------------------------


def pose_limits_45():
    """(lower, upper) arrays over the 45 layout; +-inf where unbounded."""
    lo = np.full(N_POSE, -np.inf)
    hi = np.full(N_POSE, np.inf)
    t0 = 3 + N_JOINTS  # theta block start
    p0 = 3 + 2 * N_JOINTS  # psi block start

    def sym(i, lim):
        lo[i], hi[i] = -lim, lim

    sym(3, np.pi / 6)  # phi_0   (head)
    sym(t0 + 0, np.pi / 6)  # theta_0
    sym(4, np.pi / 6)  # phi_1   (neck)
    sym(t0 + 1, np.pi / 6)  # theta_1
    sym(p0 + 1, np.pi / 6)  # psi_1
    sym(t0 + 2, np.pi / 6)  # theta_2 (front torso)
    sym(t0 + 3, np.pi / 6)  # theta_3 (back torso)
    sym(6, np.pi / 6)  # phi_3
    sym(p0 + 3, np.pi / 6)  # psi_3
    sym(t0 + 4, np.pi / 1.5)  # theta_4 (tail base)
    sym(p0 + 4, np.pi / 1.5)  # psi_4
    sym(t0 + 5, np.pi / 1.5)  # theta_5 (tail mid)
    sym(p0 + 5, np.pi / 1.5)  # psi_5
    sym(t0 + 6, np.pi / 2)  # theta_6 (l_shoulder)
    lo[t0 + 7], hi[t0 + 7] = -np.pi, 0.0  # theta_7 (l_front_knee): |th+pi/2|<=pi/2
    sym(t0 + 8, np.pi / 2)  # theta_8 (r_shoulder)
    lo[t0 + 9], hi[t0 + 9] = -np.pi, 0.0  # theta_9
    sym(t0 + 10, np.pi / 2)  # theta_10 (l_hip)
    lo[t0 + 11], hi[t0 + 11] = 0.0, np.pi  # theta_11 (l_back_knee): |th-pi/2|<=pi/2
    sym(t0 + 12, np.pi / 2)  # theta_12 (r_hip)
    lo[t0 + 13], hi[t0 + 13] = 0.0, np.pi  # theta_13
    return lo, hi


def pose_limits_25():
    lo45, hi45 = pose_limits_45()
    return lo45[ACTIVE_IDX_ORDERED], hi45[ACTIVE_IDX_ORDERED]


# EKF process noise base std-devs per active param
# (src/all_optimizations.py:734-746)
EKF_QB = np.array(
    [
        5.0, 5.0, 5.0,
        10.0, 10.0, 10.0,
        5.0, 25.0, 5.0,
        50.0,
        5.0, 50.0, 25.0,
        100.0, 30.0,
        140.0, 40.0,
        350.0, 200.0,
        350.0, 200.0,
        450.0, 400.0,
        450.0, 400.0,
    ]
)

#: FTE weights — measurement std (px) and redescending knots
#: (src/all_optimizations.py:243, 25-27)
MEAS_STD_PX = 5.0
REDESC_A, REDESC_B, REDESC_C = 3.0, 10.0, 20.0


def to_skeleton_dict():
    """Export the hard-coded cheetah as a skeleton dictionary compatible
    with the generic builder / skeleton pickles (rest positions = the
    zero-pose marker layout; dofs from the joint table).

    Note: the generic-link FK (build_skeleton_model) composes each
    marker's rotation from its own part dofs, which is a slightly
    different factorization than the FTE chain (where eyes/nose ride the
    head frame); the exported dict is for interchange/visualization, the
    canonical FTE model remains `fk`. The dict therefore carries
    ``fk_equivalent=False``: ``build_skeleton_model`` refuses to compile
    it into a solvable generic model unless explicitly overridden
    (``allow_fk_mismatch=True``), closing the silent path where a user
    solves the exported dict and gets a different kinematic model than
    the flagship solver (VERDICT r3 item 8).
    """
    zero = np.asarray(fk(np.zeros(N_POSE)))
    positions = {m: list(map(float, zero[i])) for i, m in enumerate(MARKERS)}
    # marker -> owning joint dofs
    dof_map = {}
    joint_names = list(JOINTS)
    for name, _base, frame_j, _off in MARKER_SPECS:
        _parent, hx, hy, hz = JOINTS[joint_names[frame_j]]
        dof_map[name] = [int(hx), int(hy), int(hz)]
    links = [
        ["nose", "neck_base"], ["neck_base", "spine"], ["spine", "tail_base"],
        ["tail_base", "tail1"], ["tail1", "tail2"],
        ["neck_base", "l_shoulder"], ["l_shoulder", "l_front_knee"],
        ["l_front_knee", "l_front_ankle"],
        ["neck_base", "r_shoulder"], ["r_shoulder", "r_front_knee"],
        ["r_front_knee", "r_front_ankle"],
        ["tail_base", "l_hip"], ["l_hip", "l_back_knee"], ["l_back_knee", "l_back_ankle"],
        ["tail_base", "r_hip"], ["r_hip", "r_back_knee"], ["r_back_knee", "r_back_ankle"],
        ["nose", "l_eye"], ["nose", "r_eye"],
    ]
    return dict(links=links, dofs=dof_map, positions=positions,
                markers=list(MARKERS), model="cheetah_fte",
                fk_equivalent=False)
