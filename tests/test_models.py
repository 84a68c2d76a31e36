"""FK tests: cheetah chain vs an independent NumPy oracle + structural checks."""
import numpy as np
import jax
import jax.numpy as jnp

from acinoset_tpu.models import cheetah
from acinoset_tpu.models.skeleton import build_skeleton_model, generic_pose_limits
from acinoset_tpu.pipeline import data


# --- independent NumPy oracle transcribing the documented kinematic chain
# (SURVEY.md §2.2.1 / src/all_optimizations.py:100-165) -------------------

def np_rx(a):
    c, s = np.cos(a), np.sin(a)
    return np.array([[1, 0, 0], [0, c, s], [0, -s, c]])


def np_ry(a):
    c, s = np.cos(a), np.sin(a)
    return np.array([[c, 0, -s], [0, 1, 0], [s, 0, c]])


def np_rz(a):
    c, s = np.cos(a), np.sin(a)
    return np.array([[c, s, 0], [-s, c, 0], [0, 0, 1]])


def oracle_fk(x):
    r, phi, th, ps = x[:3], x[3:17], x[17:31], x[31:45]
    R = {}
    R[0] = np_rz(ps[0]) @ np_rx(phi[0]) @ np_ry(th[0])
    R[1] = np_rz(ps[1]) @ np_rx(phi[1]) @ np_ry(th[1]) @ R[0]
    R[2] = np_ry(th[2]) @ R[1]
    R[3] = np_rz(ps[3]) @ np_rx(phi[3]) @ np_ry(th[3]) @ R[2]
    R[4] = np_rz(ps[4]) @ np_ry(th[4]) @ R[3]
    R[5] = np_rz(ps[5]) @ np_ry(th[5]) @ R[4]
    R[6] = np_ry(th[6]) @ R[2]
    R[7] = np_ry(th[7]) @ R[6]
    R[8] = np_ry(th[8]) @ R[2]
    R[9] = np_ry(th[9]) @ R[8]
    R[10] = np_ry(th[10]) @ R[3]
    R[11] = np_ry(th[11]) @ R[10]
    R[12] = np_ry(th[12]) @ R[3]
    R[13] = np_ry(th[13]) @ R[12]
    p = {}
    head = r
    p["l_eye"] = head + R[0].T @ np.array([0, 0.03, 0])
    p["r_eye"] = head + R[0].T @ np.array([0, -0.03, 0])
    p["nose"] = head + R[0].T @ np.array([0.055, 0, -0.055])
    p["neck_base"] = head + R[1].T @ np.array([-0.28, 0, 0])
    p["spine"] = p["neck_base"] + R[2].T @ np.array([-0.37, 0, 0])
    p["tail_base"] = p["spine"] + R[3].T @ np.array([-0.37, 0, 0])
    p["tail1"] = p["tail_base"] + R[4].T @ np.array([-0.28, 0, 0])
    p["tail2"] = p["tail1"] + R[5].T @ np.array([-0.36, 0, 0])
    p["l_shoulder"] = p["neck_base"] + R[2].T @ np.array([-0.04, 0.08, -0.10])
    p["l_front_knee"] = p["l_shoulder"] + R[6].T @ np.array([0, 0, -0.24])
    p["l_front_ankle"] = p["l_front_knee"] + R[7].T @ np.array([0, 0, -0.28])
    p["r_shoulder"] = p["neck_base"] + R[2].T @ np.array([-0.04, -0.08, -0.10])
    p["r_front_knee"] = p["r_shoulder"] + R[8].T @ np.array([0, 0, -0.24])
    p["r_front_ankle"] = p["r_front_knee"] + R[9].T @ np.array([0, 0, -0.28])
    p["l_hip"] = p["tail_base"] + R[3].T @ np.array([0.12, 0.08, -0.06])
    p["l_back_knee"] = p["l_hip"] + R[10].T @ np.array([0, 0, -0.32])
    p["l_back_ankle"] = p["l_back_knee"] + R[11].T @ np.array([0, 0, -0.25])
    p["r_hip"] = p["tail_base"] + R[3].T @ np.array([0.12, -0.08, -0.06])
    p["r_back_knee"] = p["r_hip"] + R[12].T @ np.array([0, 0, -0.32])
    p["r_back_ankle"] = p["r_back_knee"] + R[13].T @ np.array([0, 0, -0.25])
    return np.stack([p[m] for m in cheetah.MARKERS])


def test_cheetah_fk_matches_oracle(rng):
    for _ in range(20):
        x = rng.normal(scale=0.7, size=45)
        ours = np.asarray(cheetah.fk(x))
        ref = oracle_fk(x)
        np.testing.assert_allclose(ours, ref, atol=1e-12)


def test_cheetah_fk_zero_pose():
    p = np.asarray(cheetah.fk(np.zeros(45)))
    idx = {m: i for i, m in enumerate(cheetah.MARKERS)}
    np.testing.assert_allclose(p[idx["nose"]], [0.055, 0, -0.055], atol=1e-12)
    np.testing.assert_allclose(p[idx["spine"]], [-0.65, 0, 0], atol=1e-12)
    np.testing.assert_allclose(p[idx["tail2"]], [-1.66, 0, 0], atol=1e-12)
    np.testing.assert_allclose(p[idx["l_front_ankle"]], [-0.32, 0.08, -0.62], atol=1e-12)
    np.testing.assert_allclose(p[idx["r_hip"]], [-0.90, -0.08, -0.06], atol=1e-12)


def test_cheetah_link_lengths_invariant(rng):
    """Rigid segment lengths are pose-independent."""
    pairs = [("neck_base", "spine", 0.37), ("spine", "tail_base", 0.37),
             ("tail_base", "tail1", 0.28), ("tail1", "tail2", 0.36),
             ("l_shoulder", "l_front_knee", 0.24), ("l_front_knee", "l_front_ankle", 0.28),
             ("l_hip", "l_back_knee", 0.32), ("l_back_knee", "l_back_ankle", 0.25)]
    idx = {m: i for i, m in enumerate(cheetah.MARKERS)}
    for _ in range(5):
        x = rng.normal(scale=0.8, size=45)
        p = np.asarray(cheetah.fk(x))
        for a, b, expect in pairs:
            assert abs(np.linalg.norm(p[idx[a]] - p[idx[b]]) - expect) < 1e-9


def test_pose_params_and_active_mapping():
    pp = cheetah.get_pose_params()
    assert len(pp) == 25
    assert cheetah.N_ACTIVE == 25
    # 45-slot mapping: x,y,z then the documented active angles
    assert list(cheetah.ACTIVE_IDX_ORDERED[:3]) == [0, 1, 2]
    # psi_0 is slot 31 in the 45 layout (reference init_x[:,31] = psi_est)
    assert cheetah.ACTIVE_IDX_ORDERED[list(pp).index("psi_0")] == 31
    # expand/compress round-trip
    x25 = np.arange(25.0)
    x45 = np.asarray(cheetah.expand_pose(x25))
    assert x45.shape == (45,)
    np.testing.assert_array_equal(np.asarray(cheetah.compress_pose(x45)), x25)
    # inactive angles do not move markers
    x45_perturbed = x45.copy()
    inactive = sorted(set(range(45)) - set(cheetah.ACTIVE_IDX_ORDERED.tolist()))
    x45_perturbed[inactive] = 1.234
    np.testing.assert_allclose(
        np.asarray(cheetah.fk(x45)), np.asarray(cheetah.fk(x45_perturbed)), atol=1e-12
    )


def test_pose_limits():
    lo, hi = cheetah.pose_limits_45()
    t0 = 17
    assert hi[3] == np.pi / 6  # phi_0
    assert hi[31] == np.inf  # psi_0 (heading) unbounded
    assert lo[t0 + 7] == -np.pi and hi[t0 + 7] == 0.0  # l_front_knee
    assert lo[t0 + 11] == 0.0 and hi[t0 + 11] == np.pi  # l_back_knee
    lo25, hi25 = cheetah.pose_limits_25()
    assert lo25.shape == (25,)


def test_fk_jacobian_exact(rng):
    """jacfwd FK matches finite differences (replaces reference's eps=1e-3 FD)."""
    x = rng.normal(scale=0.3, size=25)
    J = np.asarray(jax.jacfwd(cheetah.fk25)(jnp.asarray(x)))
    eps = 1e-6
    for i in range(25):
        xp = x.copy()
        xp[i] += eps
        fd = (np.asarray(cheetah.fk25(xp)) - np.asarray(cheetah.fk25(x))) / eps
        np.testing.assert_allclose(J[:, :, i], fd, atol=1e-5)


# --- generic skeleton-dict FK --------------------------------------------


def test_generic_skeleton_zero_pose_matches_rest_offsets():
    sk = data.load_skeleton("/root/reference/skeletons/new_human.pickle")
    model = build_skeleton_model(sk)
    assert model.n_pose == 48  # matches traj_results.pickle x (100, 48)
    root = np.array([1.0, 2.0, 3.0])
    x = np.zeros(model.n_pose)
    x[:3] = root
    p = np.asarray(model.fk(x))
    rest = {k: np.asarray(v) for k, v in sk["positions"].items()}
    chin = rest["chin"]  # root part (first link's parent)
    for name, pos in zip(model.markers, p):
        np.testing.assert_allclose(pos, root + rest[name] - chin, atol=1e-12,
                                   err_msg=name)


def test_generic_skeleton_cheetah_pickle():
    sk = data.load_skeleton("/root/reference/skeletons/cheetah.pickle")
    model = build_skeleton_model(sk)
    assert model.n_markers == 18
    x = np.zeros(model.n_pose)
    p = np.asarray(model.fk(x))
    assert p.shape == (18, 3)
    # rigid link check under a random pose
    rng = np.random.default_rng(1)
    x2 = rng.normal(scale=0.5, size=model.n_pose)
    p2 = np.asarray(model.fk(x2))
    i = model.markers.index("neck_base")
    j = model.markers.index("spine")
    np.testing.assert_allclose(
        np.linalg.norm(p2[i] - p2[j]), 0.37, atol=1e-9
    )
    lo, hi = generic_pose_limits(model)
    assert lo.shape == (model.n_pose,)
    assert np.all(np.isinf(lo[:3]))


def test_skeleton_analytic_jacobian():
    """Tree skeletons get an analytic FK Jacobian equal to jacfwd at
    machine precision; since r5 multi-parent skeletons (the shipped
    human's double-parent hip1) get the DAG-generalized analytic path
    (per-occurrence suffix-product axes) — only reference-compat mode
    falls back to jacfwd (fk_and_jac None)."""
    import glob
    import pickle

    import jax

    from acinoset_tpu.models.skeleton import build_skeleton_model

    rng = np.random.default_rng(3)
    with open("/root/reference/skeletons/cheetah.pickle", "rb") as f:
        sd = pickle.load(f)
    m = build_skeleton_model(sd)
    assert m.fk_and_jac is not None
    for _ in range(3):
        x = jnp.asarray(rng.normal(scale=0.5, size=m.n_pose))
        np.testing.assert_allclose(
            np.asarray(m.fk_and_jac(x)[0]), np.asarray(m.fk(x)), atol=1e-12
        )
        np.testing.assert_allclose(
            np.asarray(m.fk_and_jac(x)[1]), np.asarray(jax.jacfwd(m.fk)(x)),
            atol=1e-12,
        )

    with open("/root/reference/skeletons/human.pickle", "rb") as f:
        hd = pickle.load(f)
    mh = build_skeleton_model(hd)
    assert mh.fk_and_jac is not None  # hip1 has two parents: DAG path
    for _ in range(3):
        x = jnp.asarray(rng.normal(scale=0.5, size=mh.n_pose))
        np.testing.assert_array_equal(
            np.asarray(mh.fk_and_jac(x)[0]), np.asarray(mh.fk(x))
        )
        np.testing.assert_allclose(
            np.asarray(mh.fk_and_jac(x)[1]),
            np.asarray(jax.jacfwd(mh.fk)(x)), atol=1e-12,
        )
    mref = build_skeleton_model(sd, compat="reference")
    assert mref.fk_and_jac is None
