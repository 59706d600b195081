"""Synthetic rendered world for end-to-end SLAM tests (SURVEY.md §4c).

Renders a textured multi-plane scene by homography warping — every frame has
exact ground-truth camera pose, realistic FAST-trackable texture, parallax
between the planes, and no dataset download.
"""
import cv2
import numpy as np

from morb_slam_tpu import lie
import jax.numpy as jnp


def _texture(size, seed, scale=None):
    """Fractal (1/f amplitude) noise: natural-image statistics, so local
    patches are DISTINCTIVE at every scale. A single-scale blob texture is
    pathologically repetitive — every blob matches its neighbor one window
    over, which lets a self-consistent wrong pose win (observed 16-degree
    one-frame pose jumps with 150 'inliers')."""
    rng = np.random.default_rng(seed)
    t = np.zeros((size, size), np.float32)
    base = 8
    amp = 1.0
    while base <= size // 2:
        layer = rng.standard_normal((base, base)).astype(np.float32)
        layer = cv2.resize(layer, (size, size),
                           interpolation=cv2.INTER_CUBIC)
        t += amp * layer
        base *= 2
        amp *= 0.55
    t = cv2.GaussianBlur(t, (0, 0), 1.0)
    return cv2.normalize(t, None, 0, 255, cv2.NORM_MINMAX)


def real_photo_textures():
    """Real photographs available in common installed packages (natural
    image statistics: JPEG noise, real lighting, repetitive man-made
    texture). Returns a list of float32 grayscale arrays in [0, 255], or
    an empty list when none are installed."""
    out = []
    candidates = []
    try:
        import sklearn.datasets
        import os
        d = os.path.join(os.path.dirname(sklearn.datasets.__file__),
                         "images")
        candidates += [os.path.join(d, f) for f in ("china.jpg",
                                                    "flower.jpg")]
    except ImportError:
        pass
    try:
        import matplotlib
        import os
        candidates.append(os.path.join(
            os.path.dirname(matplotlib.__file__),
            "mpl-data", "sample_data", "grace_hopper.jpg"))
    except ImportError:
        pass
    for p in candidates:
        img = cv2.imread(p, cv2.IMREAD_GRAYSCALE)
        if img is not None:
            out.append(cv2.normalize(img.astype(np.float32), None, 0, 255,
                                     cv2.NORM_MINMAX))
    return out


class PlaneWorld:
    """A set of textured planes, each given by an origin + two axes in world
    coordinates; plane i occludes plane j for i > j (painter's order).

    `textures`: optional list of grayscale images used cyclically for the
    planes (e.g. real_photo_textures() — perspective views of real
    photographs are exact homographies of real imagery, so the frames
    carry real texture statistics); default is procedural fractal noise.
    """

    def __init__(self, K, width, height, seed=0, textures=None):
        self.K = np.asarray(K, np.float64)
        self.w, self.h = width, height
        rng = np.random.default_rng(seed)
        self.planes = []
        n_tex = [0]

        def tex_for(size, tex_seed):
            if textures:
                # distinct random crop + orientation per plane: identical
                # copies of one photo on many planes alias catastrophically
                # (every plane matches every other) — real scenes repeat
                # TEXTURE STATISTICS, not whole surfaces
                trng = np.random.default_rng(tex_seed + 7777)
                t = textures[int(trng.integers(len(textures)))]
                n_tex[0] += 1
                side = int(min(t.shape) * trng.uniform(0.45, 1.0))
                y0 = int(trng.integers(0, t.shape[0] - side + 1))
                x0 = int(trng.integers(0, t.shape[1] - side + 1))
                sq = t[y0:y0 + side, x0:x0 + side]
                sq = np.rot90(sq, k=int(trng.integers(4)))
                if trng.integers(2):
                    sq = sq[:, ::-1]
                return cv2.resize(np.ascontiguousarray(sq), (size, size),
                                  interpolation=cv2.INTER_AREA)
            return _texture(size, tex_seed)

        # back wall at z=8 spanning the whole camera path
        self._add_plane(origin=(-8, -5, 8), ex=(1, 0, 0), ey=(0, 1, 0),
                        extent=(24, 10), tex=tex_for(3072, seed))
        # mid panels staggered along the path (always some near structure
        # in view — an all-distant view makes rotation/translation ambiguous
        # and mono tracking drifts)
        for k in range(10):
            ox = -3.5 + 1.3 * k + rng.uniform(-0.3, 0.3)
            oy = rng.uniform(-2.2, 0.4)
            z = rng.uniform(4.5, 5.8)
            self._add_plane(origin=(ox, oy, z), ex=(1, 0, 0), ey=(0, 1, 0),
                            extent=(2.2, 1.8),
                            tex=tex_for(512, seed + k + 1))
        # near posts all along the path at z ~ 3.5
        for k in range(8):
            ox = -2.0 + 1.0 * k + rng.uniform(-0.2, 0.2)
            oy = rng.uniform(-1.3, 0.4)
            z = rng.uniform(3.2, 3.9)
            self._add_plane(origin=(ox, oy, z), ex=(1, 0, 0), ey=(0, 1, 0),
                            extent=(1.1, 0.9),
                            tex=tex_for(256, seed + 20 + k))

    def _add_plane(self, origin, ex, ey, extent, tex):
        self.planes.append(dict(
            origin=np.asarray(origin, np.float64),
            ex=np.asarray(ex, np.float64), ey=np.asarray(ey, np.float64),
            extent=extent, tex=tex))

    def render(self, R_cw, t_cw):
        """Render the scene from camera pose T_cw. Returns float32 (H, W)."""
        R = np.asarray(R_cw, np.float64)
        t = np.asarray(t_cw, np.float64)
        img = np.zeros((self.h, self.w), np.float32)
        for p in self.planes:
            th, tw = p["tex"].shape
            sx = p["extent"][0] / tw
            sy = p["extent"][1] / th
            # homography: tex (u, v) -> world -> image
            a = R @ (p["ex"] * sx)
            b = R @ (p["ey"] * sy)
            c = R @ p["origin"] + t
            H = self.K @ np.stack([a, b, c], axis=1)
            warped = cv2.warpPerspective(
                p["tex"], H, (self.w, self.h), flags=cv2.INTER_LINEAR,
                borderMode=cv2.BORDER_CONSTANT, borderValue=-1.0)
            mask = warped >= 0
            # cheirality: only where the plane is in front of the camera
            img[mask] = warped[mask]
        return img


class RingWorld(PlaneWorld):
    """Textured panels on a ring, camera orbiting inside looking outward:
    covisibility genuinely BREAKS as the camera advances (a panel leaves
    the frustum after ~40 degrees and nothing global stays in view), so a
    full circuit produces the canonical loop-closure situation — revisited
    ground with no covisibility link, reachable only through place
    recognition. (The PlaneWorld corridor keeps its back wall in view
    forever, which keeps every keyframe covisibility-connected and makes a
    BoW-only loop impossible — for the reference too.)"""

    def __init__(self, K, width, height, n_panels=56, r_panel=6.0, seed=0):
        self.K = np.asarray(K, np.float64)
        self.w, self.h = width, height
        rng = np.random.default_rng(seed)
        self.planes = []
        for k in range(n_panels):
            phi = 2 * np.pi * k / n_panels
            tangent = np.array([np.cos(phi), 0.0, -np.sin(phi)])
            up = np.array([0.0, 1.0, 0.0])
            ex_w, ey_h = 1.7, 1.6
            origin = (r_panel * np.array([np.sin(phi), 0.0, np.cos(phi)])
                      - 0.5 * ex_w * tangent - 0.5 * ey_h * up
                      + np.array([0.0, rng.uniform(-0.25, 0.25), 0.0]))
            self._add_plane(origin=origin, ex=tangent, ey=up,
                            extent=(ex_w, ey_h),
                            tex=_texture(384, seed + 7 * k + 1))

    def render(self, R_cw, t_cw):
        """Painter render with a behind-camera cull: a panel on the far
        side of the ring would otherwise warp through the projective wrap
        and paint garbage."""
        R = np.asarray(R_cw, np.float64)
        t = np.asarray(t_cw, np.float64)
        img = np.zeros((self.h, self.w), np.float32)
        for p in self.planes:
            centre = p["origin"] + 0.5 * p["extent"][0] * p["ex"] \
                + 0.5 * p["extent"][1] * p["ey"]
            if (R @ centre + t)[2] < 0.5:
                continue
            th, tw = p["tex"].shape
            sx = p["extent"][0] / tw
            sy = p["extent"][1] / th
            a = R @ (p["ex"] * sx)
            b = R @ (p["ey"] * sy)
            c = R @ p["origin"] + t
            H = self.K @ np.stack([a, b, c], axis=1)
            warped = cv2.warpPerspective(
                p["tex"], H, (self.w, self.h), flags=cv2.INTER_LINEAR,
                borderMode=cv2.BORDER_CONSTANT, borderValue=-1.0)
            mask = warped >= 0
            img[mask] = warped[mask]
        return img


def ring_path(n_frames, circuits=1.15, r_cam=2.5):
    """Orbit inside the ring looking radially outward. Returns
    (R_cw, t_cw) list; the final ~0.15 circuit revisits the start."""
    poses = []
    for i in range(n_frames):
        th = 2 * np.pi * circuits * i / n_frames
        s, c = np.sin(th), np.cos(th)
        C = r_cam * np.array([s, 0.0, c])
        # camera axes in world: x = tangent, y = down/up, z = outward
        R_wc = np.array([[c, 0.0, s],
                         [0.0, 1.0, 0.0],
                         [-s, 0.0, c]])
        R_cw = R_wc.T
        t_cw = -R_cw @ C
        poses.append((R_cw.astype(np.float32), t_cw.astype(np.float32)))
    return poses


def camera_path(n_frames, step=0.04, seed=5):
    """Sideways translation with gentle yaw — good parallax, no pure
    rotation. Returns list of (R_cw, t_cw) world->camera."""
    rng = np.random.default_rng(seed)
    poses = []
    for i in range(n_frames):
        x = step * i
        yaw = 0.1 * np.sin(i * 0.08)
        pitch = 0.02 * np.sin(i * 0.13)
        # camera center moves along +x, camera looks roughly at -z offset
        center = np.array([x, 0.02 * np.sin(i * 0.2), 0.0])
        R_wc = np.asarray(
            lie.so3_exp(jnp.asarray([pitch, yaw, 0.0], jnp.float32)))
        R_cw = R_wc.T
        t_cw = -R_cw @ center
        poses.append((R_cw.astype(np.float32), t_cw.astype(np.float32)))
    return poses


# ---------------------------------------------------------------------------
# analytic trajectory + IMU generation (for inertial tests)
# ---------------------------------------------------------------------------

GRAVITY_W = np.array([0.0, 0.0, -9.81])


def analytic_pose(t, speed=1.0):
    """Continuous version of camera_path: t in seconds, 20 fps equivalent
    (frame i = t / 0.05). Returns (R_cw, t_cw) in FLOAT64 (IMU generation
    differentiates this trajectory — f32 would wreck the accelerations);
    world gravity is -z."""
    from scipy.spatial.transform import Rotation as _Rot
    i = t / 0.05
    yaw = 0.1 * np.sin(i * 0.08)
    pitch = 0.02 * np.sin(i * 0.13)
    # accelerated motion: scale is only IMU-observable with real
    # accelerations (~1 m/s^2 here), like the reference's requirement of
    # excited motion before mono-inertial init succeeds
    center = np.array([speed * t + 0.35 * np.sin(2.0 * t),
                       0.15 * np.sin(1.9 * t),
                       0.08 * np.sin(2.4 * t)])
    R_wc = _Rot.from_rotvec([pitch, yaw, 0.0]).as_matrix()
    R_cw = R_wc.T
    return R_cw, -R_cw @ center


def ring_pose(t, circuits=1.3, n_frames=300, r_cam=2.5, fps=20.0):
    """Continuous version of ring_path: frame i = t * fps. FLOAT64 (IMU
    generation differentiates this trajectory)."""
    th = 2 * np.pi * circuits * (t * fps) / n_frames
    s_, c_ = np.sin(th), np.cos(th)
    C = r_cam * np.array([s_, 0.0, c_])
    R_wc = np.array([[c_, 0.0, s_],
                     [0.0, 1.0, 0.0],
                     [-s_, 0.0, c_]])
    R_cw = R_wc.T
    return R_cw, -R_cw @ C


def imu_between(t0, t1, freq=200.0, rng=None, noise_g=0.0, noise_a=0.0,
                pose_fn=None):
    """IMU samples in (t0, t1]: finite-difference body rates and specific
    force from the analytic trajectory (f64 end to end). `pose_fn`
    replaces the default analytic_pose (e.g. ring_pose for circuits)."""
    from scipy.spatial.transform import Rotation as _Rot
    if pose_fn is None:
        pose_fn = analytic_pose
    global analytic_pose_saved
    h = 2e-3
    ts = np.arange(np.floor(t0 * freq) + 1, np.floor(t1 * freq) + 1) / freq
    acc, gyr = [], []
    for t in ts:
        R_cw, _ = pose_fn(t)
        R_wb = R_cw.T
        R_cw2, _ = pose_fn(t + h)
        W = R_wb.T @ R_cw2.T
        w = _Rot.from_matrix(W).as_rotvec() / h
        def center(tt):
            Rc, tc = pose_fn(tt)
            return -Rc.T @ tc
        a_w = (center(t + h) - 2 * center(t) + center(t - h)) / h ** 2
        f_b = R_wb.T @ (a_w - GRAVITY_W)
        acc.append(f_b)
        gyr.append(w)
    acc = np.asarray(acc, np.float32)
    gyr = np.asarray(gyr, np.float32)
    if rng is not None:
        acc = acc + rng.normal(0, noise_a, acc.shape).astype(np.float32)
        gyr = gyr + rng.normal(0, noise_g, gyr.shape).astype(np.float32)
    return ts, acc, gyr
