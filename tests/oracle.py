"""Scalar NumPy oracle renderer: an independent, per-pixel implementation
of the reference's math (src/render.cl) used to cross-validate the
vectorized TPU pipeline end-to-end.

Everything here is written in plain float32 scalar NumPy following the
reference formulas and RNG draw order exactly (render.cl:143-163, 396-523);
no code is shared with simple_raytracer_tpu.ops beyond the scene
containers, so agreement between the two is strong evidence of
correctness.
"""
import numpy as np

F = np.float32


# -- deterministic 3-vector helpers ------------------------------------------
# Sequential f32 expression order, shared verbatim by the scalar path and
# the vectorized path (render_vec) below: np.dot / np.linalg.norm / @ would
# delegate tiny reductions to BLAS whose accumulation order is an
# implementation detail, and a single-LSB difference can flip a Bernoulli
# branch and decohere a whole path.  With these, render() and render_vec()
# are BIT-IDENTICAL (asserted by tests/test_oracle_vec.py), so the fast
# vectorized form inherits the scalar form's independence evidence.

def dot3(a, b):
    return a[..., 0] * b[..., 0] + a[..., 1] * b[..., 1] + a[..., 2] * b[..., 2]


def cross3(a, b):
    return np.stack([a[..., 1] * b[..., 2] - a[..., 2] * b[..., 1],
                     a[..., 2] * b[..., 0] - a[..., 0] * b[..., 2],
                     a[..., 0] * b[..., 1] - a[..., 1] * b[..., 0]], axis=-1)


def norm3(a):
    return np.sqrt(dot3(a, a))


def normalize3(a):
    return a / norm3(a)[..., None]


# -- RNG (render.cl:143-163) ------------------------------------------------

def rand_float(seed):
    seed = (seed * 747796405 + 2891336453) & 0xFFFFFFFF
    result = (((seed >> ((seed >> 28) + 4)) ^ seed) * 277803737) & 0xFFFFFFFF
    result = (result >> 22) ^ result
    return seed, F(result) / F(0xFFFFFFFF)


def rand_normal(seed):
    seed, u1 = rand_float(seed)
    seed, u2 = rand_float(seed)
    theta = F(2.0 * np.pi) * u1
    rho = np.sqrt(F(-2.0) * np.log(u2))
    return seed, F(rho * np.cos(theta))


def rand_direction(seed):
    seed, x = rand_normal(seed)
    seed, y = rand_normal(seed)
    seed, z = rand_normal(seed)
    v = np.array([x, y, z], F)
    return seed, v / norm3(v)


def rand_hemisphere(normal, seed):
    seed, d = rand_direction(seed)
    return seed, d * np.sign(dot3(normal, d)).astype(F)


# -- intersections (render.cl:180-290) ---------------------------------------

def isect_sphere(center, radius, o, d):
    rc = center - o
    b = dot3(rc, d)
    c = dot3(rc, rc) - radius * radius
    disc = b * b - c
    if disc < 0:
        return None
    sq = np.sqrt(disc)
    t = b - sq
    if t < 0:
        t = b + sq
        if t < 0:
            return None
    return F(t)


def isect_plane(pos, n, o, d):
    denom = dot3(n, d)
    if abs(denom) == 0.0:
        return None
    t = dot3(n, pos - o) / denom
    if t < 0:
        return None
    return F(t)


def isect_triangle(v0, v1, v2, o, d):
    e1 = v1 - v0
    e2 = v2 - v0
    h = cross3(d, e2)
    a = dot3(e1, h)
    if a == 0:
        return None
    f = F(1.0) / a
    s = o - v0
    u = f * dot3(s, h)
    if u < 0 or u > 1:
        return None
    q = cross3(s, e1)
    v = f * dot3(d, q)
    if v < 0 or u + v > 1:
        return None
    t = f * dot3(e2, q)
    if t > 0:
        return F(t)
    return None


def bary_weights(v0, v1, v2, p):
    a = v1 - v0
    b = v2 - v0
    c = p - v0
    d00 = dot3(a, a)
    d01 = dot3(a, b)
    d11 = dot3(b, b)
    d20 = dot3(c, a)
    d21 = dot3(c, b)
    denom = d00 * d11 - d01 * d01
    w0 = (d11 * d20 - d01 * d21) / denom
    w1 = (d00 * d21 - d01 * d20) / denom
    w2 = F(1.0) - w0 - w1
    return w2, w0, w1  # rotated like render.cl:239-240


# -- scene glue ---------------------------------------------------------------

class OracleScene:
    """Extracts plain numpy arrays from a host Scene (pre-build)."""

    def __init__(self, scene):
        self.spheres = [(np.array(s.position, F), F(s.radius), s.material)
                        for s in scene.spheres]
        self.planes = [(np.array(p.position, F), np.array(p.normal, F),
                        p.material) for p in scene.planes]
        self.tris = []
        for m in scene.models:
            wpos, wnrm = m.world_triangles(scene.pool)
            for i in range(wpos.shape[0]):
                self.tris.append((wpos[i].astype(F), wnrm[i].astype(F),
                                  m.material))
        mats = scene.materials.materials
        self.materials = mats
        self.sky = scene.sky
        self.skybox = (None if scene.skybox is None
                       else np.asarray(scene.skybox, F))

    def closest(self, o, d):
        best_t = np.inf
        best = None  # (normal, material)
        for c, r, m in self.spheres:
            t = isect_sphere(c, r, o, d)
            if t is not None and t < best_t:
                best_t = t
                p = o + d * t
                best = ((p - c) / r, m)
        for pos, n, m in self.planes:
            t = isect_plane(pos, n, o, d)
            if t is not None and t < best_t:
                best_t = t
                best = (n.copy(), m)
        for (verts, norms, m) in self.tris:
            t = isect_triangle(verts[0], verts[1], verts[2], o, d)
            if t is not None and t < best_t:
                best_t = t
                p = o + d * t
                wx, wy, wz = bary_weights(verts[0], verts[1], verts[2], p)
                n = norms[0] * wx + norms[1] * wy + norms[2] * wz
                n = n / norm3(n)
                best = (n, m)
        if best is None:
            return None
        n, m = best
        p = o + d * best_t
        front = dot3(n, d) < 0.0
        if not front:
            n = -n
        return p, n, front, m

    def sky_color(self, d):
        s = self.sky
        sun_dir = np.array(s.sun_direction, F)
        sun_cos = max(dot3(d, -sun_dir), F(0.0))
        sun = (np.array(s.sun_color, F) * F(s.sun_intensity)
               * np.power(F(sun_cos), F(s.sun_focus)))
        if self.skybox is None:
            # analytic gradient (render.cl:381-389)
            def smoothstep(e0, e1, x):
                t = np.clip((x - e0) / (e1 - e0), 0.0, 1.0)
                return F(t * t * (3.0 - 2.0 * t))
            t = np.power(smoothstep(0.0, 0.4, d[1]), F(0.35))
            horizon = np.array(s.horizon_color, F)
            zenith = np.array(s.zenith_color, F)
            ground = np.array(s.ground_color, F)
            grad = horizon + (zenith - horizon) * t
            g2s = smoothstep(-0.01, 0.0, d[1])
            out = ground + (grad - ground) * g2s
            if g2s >= 1.0:
                out = out + sun
            return out.astype(F)
        u = np.arctan2(d[2], d[0]) / F(np.pi) * F(0.5) + F(0.5)
        v = d[1] * F(0.5) + F(0.5)
        h, w = self.skybox.shape[:2]
        fx = u * w - 0.5
        fy = v * h - 0.5
        x0 = int(np.floor(fx))
        y0 = int(np.floor(fy))
        ax = F(fx - x0)
        ay = F(fy - y0)
        x0c, x1c = np.clip([x0, x0 + 1], 0, w - 1)
        y0c, y1c = np.clip([y0, y0 + 1], 0, h - 1)
        img = self.skybox
        top = img[y0c, x0c] * (1 - ax) + img[y0c, x1c] * ax
        bot = img[y1c, x0c] * (1 - ax) + img[y1c, x1c] * ax
        return (top * (1 - ay) + bot * ay).astype(F) + sun


def shlick(mu, cos_theta):
    """render.cl:173-177.  The reference writes unsuffixed double
    literals, so an fp64-capable OpenCL device evaluates this chain in
    f64 and rounds at the float return; without cl_khr_fp64 the literals
    demote to float and the chain is pure f32.  This oracle (and the
    device path, ops/bsdf.shlick_reflectance) follow the f32 form — the
    two differ by ulps, which can flip the reflect/refract Bernoulli on
    exact-threshold draws; RMSE comparisons absorb that (PARITY.md)."""
    mu = F(mu)
    cos_theta = F(cos_theta)
    r0 = (F(1.0) - mu) / (F(1.0) + mu)
    r0 = r0 * r0
    return F(r0 + (F(1.0) - r0) * np.power(F(1.0) - cos_theta, 5))


def reflect(v, n):
    return v - 2.0 * dot3(v, n) * n


def trace(osc, o, d, seed, num_bounces, show_normals=False):
    """Mirrors trace (render.cl:396-471)."""
    color = np.zeros(3, F)
    mask = np.ones(3, F)
    for i in range(num_bounces):
        hit = osc.closest(o, d)
        if hit is None:
            sky = osc.sky_color(d)
            color = color + mask * sky
            break
        p, n, front, mi = hit
        if show_normals:
            return n * F(0.5) + F(0.5)
        mat = osc.materials[mi]
        color = color + mask * np.array(mat.emission, F) * F(mat.emission_strength)
        if i == num_bounces - 1:
            break
        o = p
        seed, hemi = rand_hemisphere(n, seed)
        rd_sum = n + hemi
        random_dir = (rd_sum / norm3(rd_sum)).astype(F)
        reflected = reflect(d, n).astype(F)
        seed, um = rand_float(seed)
        seed, us = rand_float(seed)
        is_metal = mat.metallic > um
        is_spec = mat.specular > us
        rough = random_dir + (reflected - random_dir) * F(mat.smoothness)
        seed, ut = rand_float(seed)
        is_trans = mat.transmittance > ut
        if not is_trans:
            # render.cl:432 is mix(random_dir, rough_dir, sel) — the LERP
            # x + (y - x) * a, which with a = 1.0f is NOT bitwise rough
            # (x + (y - x) can differ by 1 ulp); the device path's
            # vec.mix evaluates the same expression
            sel = F(1.0) if (is_metal or is_spec) else F(0.0)
            d = random_dir + (rough - random_dir) * sel
            if is_spec:
                pass  # untinted: mix(color, 1, 1) == 1 exactly in f32
            else:
                mask = mask * np.array(mat.color, F)
        else:
            in_dir = reflect(rough, n).astype(F)
            # f32 reciprocal like the device kernel (1.0f / float IOR,
            # render.cl:442) — a double 1/ri rounded to f32 differs for
            # ~30% of IOR values and flips Schlick/TIR thresholds
            mu = F(1.0) / F(mat.refraction_index) if front \
                else F(mat.refraction_index)
            cos_t = min(F(1.0), dot3(in_dir, -n))
            sin_t = np.sqrt(F(1.0) - cos_t * cos_t)
            if mu * sin_t > 1.0:
                refl = True
            else:
                seed, ur = rand_float(seed)
                refl = shlick(mu, cos_t) > ur
            if refl:
                d = rough
            else:
                out_perp = mu * (in_dir + cos_t * n)
                out_par = -np.sqrt(abs(F(1.0) - dot3(out_perp, out_perp))) * n
                d = (out_perp + out_par).astype(F)
                mask = mask * np.array(mat.color, F)
        d = (d / norm3(d)).astype(F)
        o = o + n * np.sign(dot3(n, d)).astype(F) * F(0.001)
    return color


def render(scene, camera, width, height, num_samples, num_bounces, time,
           show_normals=False):
    """Mirrors __kernel render (render.cl:483-523); returns (H, W, 3) f32."""
    osc = OracleScene(scene)
    rot = np.asarray(camera.rotation_matrix(), F)
    cam_pos = np.array(camera.position, F)
    aspect = F(width / height)
    fov_scale = F(camera.fov_scale)
    out = np.zeros((height, width, 3), F)
    for py in range(height):
        for px in range(width):
            pid = px + py * width
            acc = np.zeros(3, F)
            for s in range(num_samples):
                seed = ((s + pid * num_samples) * time * 5304) & 0xFFFFFFFF
                seed, u1 = rand_float(seed)
                seed, u2 = rand_float(seed)
                ndc_x = F((px + u1) / width)
                ndc_y = F((py + u2) / height)
                sx = (2 * ndc_x - 1) * aspect * fov_scale
                sy = (1 - 2 * ndc_y) * fov_scale
                v = np.array([sx, sy, -1.0], F)
                d = np.array([dot3(rot[0], v), dot3(rot[1], v),
                              dot3(rot[2], v)], F)
                d = (d / norm3(d)).astype(F)
                acc = acc + trace(osc, cam_pos.copy(), d, seed, num_bounces,
                                  show_normals)
            out[py, px] = acc / num_samples
    return out


# -- vectorized oracle (bit-identical to the scalar form) ---------------------
# One (R,) lane per ray, plain NumPy, same helper expressions as the scalar
# path above so every f32 operation executes in the same order — render()
# and render_vec() agree BIT-EXACTLY (tests/test_oracle_vec.py), which lets
# PARITY.md run the oracle at the full 960x540 showcase resolution (the
# scalar form is ~1000x too slow there).  Lane masking replaces the scalar
# control flow; per-lane RNG streams advance exactly as the scalar ones do
# (the one conditional draw, Schlick's ur at render.cl:452, is accepted
# per-lane with np.where).

def _rand_float_v(seed):
    """rand_float over a (R,) uint32 lane array (render.cl:143-150)."""
    seed = seed * np.uint32(747796405) + np.uint32(2891336453)
    result = ((seed >> ((seed >> np.uint32(28)) + np.uint32(4))) ^ seed) \
        * np.uint32(277803737)
    result = (result >> np.uint32(22)) ^ result
    return seed, result.astype(F) / F(0xFFFFFFFF)


def _rand_normal_v(seed):
    seed, u1 = _rand_float_v(seed)
    seed, u2 = _rand_float_v(seed)
    theta = F(2.0 * np.pi) * u1
    rho = np.sqrt(F(-2.0) * np.log(u2))
    return seed, (rho * np.cos(theta)).astype(F)


def _rand_direction_v(seed):
    seed, x = _rand_normal_v(seed)
    seed, y = _rand_normal_v(seed)
    seed, z = _rand_normal_v(seed)
    v = np.stack([x, y, z], axis=-1)
    return seed, v / norm3(v)[..., None]


def _rand_hemisphere_v(normal, seed):
    seed, d = _rand_direction_v(seed)
    return seed, d * np.sign(dot3(normal, d)).astype(F)[..., None]


def _reflect_v(v, n):
    return v - (2.0 * dot3(v, n))[..., None] * n


def _shlick_v(mu, cos_theta):
    r0 = (1.0 - mu) / (1.0 + mu)
    r0 = r0 * r0
    return r0 + (1.0 - r0) * np.power(1.0 - cos_theta, 5)


class OracleSceneVec(OracleScene):
    """OracleScene plus stacked-array forms for the lane-vector path."""

    def __init__(self, scene):
        super().__init__(scene)
        mats = self.materials
        self.m_color = np.array([m.color for m in mats], F)
        self.m_emission = np.array([m.emission for m in mats], F)
        self.m_estrength = np.array([m.emission_strength for m in mats], F)
        self.m_smooth = np.array([m.smoothness for m in mats], F)
        self.m_metal = np.array([m.metallic for m in mats], F)
        self.m_spec = np.array([m.specular for m in mats], F)
        self.m_trans = np.array([m.transmittance for m in mats], F)
        # f32 reciprocal of the f32 IOR, like the device kernel
        # (1.0f / material->refraction_index, render.cl:442) and the
        # scalar oracle path — an f64 1/ri rounded to f32 double-rounds
        # and shifts the Schlick/TIR thresholds for ~30% of IOR values
        ri = np.array([m.refraction_index for m in mats], F)
        self.m_ri = ri
        self.m_ri_inv = (F(1.0) / ri).astype(F)
        # stacked triangle arrays for the chunked loop below
        if self.tris:
            self.tri_v = np.stack([v for v, _, _ in self.tris])  # (T,3,3)
            self.tri_n = np.stack([n for _, n, _ in self.tris])
            self.tri_m = np.array([m for _, _, m in self.tris], np.int32)
            # inflated float64 bounds of the whole triangle set for the
            # conservative per-ray slab gate in closest_vec
            flat = self.tri_v.reshape(-1, 3).astype(np.float64)
            self.tri_lo = flat.min(axis=0) - 1e-4
            self.tri_hi = flat.max(axis=0) + 1e-4
            # per-tri-chunk bounds for the inner (ray, chunk) gate
            # (mesh-ordered triangles are spatially coherent, so chunk
            # boxes are tight); CH_T must match closest_vec's
            T = self.tri_v.shape[0]
            nc = -(-T // self.CH_T)
            self.chunk_lo = np.full((nc, 3), np.inf)
            self.chunk_hi = np.full((nc, 3), -np.inf)
            for ci in range(nc):
                seg = flat[ci * self.CH_T * 3:(ci + 1) * self.CH_T * 3]
                self.chunk_lo[ci] = seg.min(axis=0) - 1e-4
                self.chunk_hi[ci] = seg.max(axis=0) + 1e-4
        else:
            self.tri_v = np.zeros((0, 3, 3), F)

    CH_T = 128      # triangles per Moller-Trumbore chunk
    CH_R = 65536    # rays per chunk

    def closest_vec(self, o, d):
        """Vector form of closest(): strict-< first-wins updates in the
        same shape order (spheres, planes, triangles)."""
        R = o.shape[0]
        best_t = np.full(R, np.inf, F)
        best_n = np.zeros((R, 3), F)
        best_m = np.zeros(R, np.int32)
        hit = np.zeros(R, bool)
        with np.errstate(invalid="ignore", divide="ignore"):
            for c, r, m in self.spheres:
                rc = c[None, :] - o
                b = dot3(rc, d)
                cc = dot3(rc, rc) - r * r
                disc = b * b - cc
                sq = np.sqrt(np.maximum(disc, F(0.0)))
                t1 = b - sq
                t = np.where(t1 < 0, b + sq, t1)
                valid = (disc >= 0) & (t >= 0) & (t < best_t)
                p = o + d * t[:, None]
                n = (p - c[None, :]) / r
                best_t = np.where(valid, t, best_t)
                best_n = np.where(valid[:, None], n, best_n)
                best_m = np.where(valid, m, best_m)
                hit |= valid
            for pos, nrm, m in self.planes:
                denom = dot3(nrm[None, :], d)
                t = dot3(nrm, pos - o) / denom
                valid = (np.abs(denom) != 0.0) & (t >= 0) & (t < best_t)
                best_t = np.where(valid, t, best_t)
                best_n = np.where(valid[:, None], nrm[None, :], best_n)
                best_m = np.where(valid, m, best_m)
                hit |= valid
            # Triangles run CHUNKED (a (Rc, Tc) Moller-Trumbore batch per
            # step instead of one python iteration per triangle), which
            # is what makes full-resolution converged rows tractable for
            # the mesh showcase scene (~200x fewer interpreter turns).
            # Semantics are identical to the serial strict-< loop: within
            # a chunk np.argmin takes the FIRST minimal t (lowest list
            # index), across chunks the strict < keeps earlier winners —
            # together exactly "first triangle in list order with the
            # minimal t".  The winner's smooth normal is evaluated only
            # for the single winning triangle per ray, with the same
            # (R,)-shaped f32 expressions the serial loop used.
            T = self.tri_v.shape[0]
            CH_T, CH_R = self.CH_T, self.CH_R
            if T:
                # Conservative whole-set AABB gate (float64, inflated
                # bounds): a ray whose slab interval misses the box
                # bounding EVERY triangle, or opens beyond its current
                # best t, cannot produce a triangle win — the same
                # per-ray AABB skip the reference applies per model
                # (render.cl:316-331).  Elementwise per ray, so results
                # for admitted rays are bit-identical; secondaries that
                # head for the sky skip the whole Moller-Trumbore loop.
                o64 = o.astype(np.float64)
                d64 = d.astype(np.float64)
                inv = np.divide(1.0, d64, out=np.full_like(d64, np.inf),
                                where=d64 != 0)
                t1 = (self.tri_lo[None, :] - o64) * inv
                t2 = (self.tri_hi[None, :] - o64) * inv
                tn = np.where(np.isnan(t1), -np.inf, np.fmin(t1, t2))
                tf = np.where(np.isnan(t2), np.inf, np.fmax(t1, t2))
                near = tn.max(axis=1)
                far = tf.min(axis=1)
                adm = np.nonzero((np.maximum(near, 0.0) <= far)
                                 & (near <= best_t.astype(np.float64)))[0]
            else:
                adm = np.zeros(0, np.int64)
            for r0 in range(0, adm.size, CH_R):
                rs = adm[r0:r0 + CH_R]
                oc, dc = o[rs], d[rs]
                bt = best_t[rs]
                # per-(ray, tri-chunk) slab gate against the chunk's
                # inflated f64 box (same conservativeness argument as
                # the whole-set gate above): Moller-Trumbore runs only
                # on the rays whose interval touches this chunk
                oc64 = oc.astype(np.float64)
                dc64 = dc.astype(np.float64)
                invc = np.divide(1.0, dc64,
                                 out=np.full_like(dc64, np.inf),
                                 where=dc64 != 0)
                win_t = np.full(oc.shape[0], np.inf, F)
                win_j = np.zeros(oc.shape[0], np.int64)
                for c0 in range(0, T, CH_T):
                    ci = c0 // CH_T
                    t1 = (self.chunk_lo[ci][None, :] - oc64) * invc
                    t2 = (self.chunk_hi[ci][None, :] - oc64) * invc
                    tn = np.where(np.isnan(t1), -np.inf, np.fmin(t1, t2))
                    tf = np.where(np.isnan(t2), np.inf, np.fmax(t1, t2))
                    near = tn.max(axis=1)
                    far = tf.min(axis=1)
                    si = np.nonzero((np.maximum(near, 0.0) <= far)
                                    & (near <= bt.astype(np.float64)))[0]
                    if si.size == 0:
                        continue
                    cs = slice(c0, min(c0 + CH_T, T))
                    v0 = self.tri_v[cs, 0][None]           # (1, Tc, 3)
                    e1 = (self.tri_v[cs, 1] - self.tri_v[cs, 0])[None]
                    e2 = (self.tri_v[cs, 2] - self.tri_v[cs, 0])[None]
                    db = dc[si][:, None, :]                # (Rs, 1, 3)
                    h = cross3(db, e2)
                    a = dot3(e1, h)
                    f = F(1.0) / a
                    s = oc[si][:, None, :] - v0
                    u = f * dot3(s, h)
                    q = cross3(s, e1)
                    v = f * dot3(db, q)
                    t = f * dot3(e2, q)
                    valid = ((a != 0) & (u >= 0) & (u <= 1) & (v >= 0)
                             & (u + v <= 1) & (t > 0)
                             & (t < bt[si][:, None]))
                    t = np.where(valid, t, np.inf).astype(F)
                    j = np.argmin(t, axis=1)               # first minimum
                    tc = t[np.arange(t.shape[0]), j]
                    upd = tc < win_t[si]                   # earlier chunk
                    win_t[si] = np.where(upd, tc, win_t[si])  # wins ties
                    win_j[si] = np.where(upd, j + c0, win_j[si])
                tri_hit = np.isfinite(win_t) & (win_t < bt)
                if not tri_hit.any():
                    continue
                jv = win_j
                v0 = self.tri_v[jv, 0]
                v1 = self.tri_v[jv, 1]
                v2 = self.tri_v[jv, 2]
                nrm = self.tri_n[jv]
                p = oc + dc * win_t[:, None]
                wx, wy, wz = bary_weights(v0, v1, v2, p)
                n = (nrm[:, 0] * wx[:, None] + nrm[:, 1] * wy[:, None]
                     + nrm[:, 2] * wz[:, None])
                n = n / norm3(n)[:, None]
                best_t[rs] = np.where(tri_hit, win_t, bt)
                best_n[rs] = np.where(tri_hit[:, None], n, best_n[rs])
                best_m[rs] = np.where(tri_hit, self.tri_m[jv], best_m[rs])
                hit[rs] |= tri_hit
        p = o + d * best_t[:, None]
        front = dot3(best_n, d) < 0.0
        n = np.where(front[:, None], best_n, -best_n)
        return hit, p, n, front, best_m

    def sky_color_vec(self, d):
        s = self.sky
        sun_dir = np.array(s.sun_direction, F)
        sun_cos = np.maximum(dot3(d, -sun_dir[None, :]), F(0.0))
        sun = ((np.array(s.sun_color, F) * F(s.sun_intensity))[None, :]
               * np.power(sun_cos, F(s.sun_focus))[:, None])
        if self.skybox is None:
            def smoothstep(e0, e1, x):
                t = np.clip((x - e0) / (e1 - e0), 0.0, 1.0)
                return (t * t * (3.0 - 2.0 * t)).astype(F)
            t = np.power(smoothstep(0.0, 0.4, d[:, 1]), F(0.35))
            horizon = np.array(s.horizon_color, F)
            zenith = np.array(s.zenith_color, F)
            ground = np.array(s.ground_color, F)
            grad = horizon[None, :] + (zenith - horizon)[None, :] * t[:, None]
            g2s = smoothstep(-0.01, 0.0, d[:, 1])
            out = ground[None, :] + (grad - ground[None, :]) * g2s[:, None]
            return (out + np.where((g2s >= 1.0)[:, None], sun, F(0.0))
                    ).astype(F)
        u = np.arctan2(d[:, 2], d[:, 0]) / F(np.pi) * F(0.5) + F(0.5)
        v = d[:, 1] * F(0.5) + F(0.5)
        h, w = self.skybox.shape[:2]
        fx = u * w - 0.5
        fy = v * h - 0.5
        x0f = np.floor(fx)
        y0f = np.floor(fy)
        ax = (fx - x0f)[:, None]
        ay = (fy - y0f)[:, None]
        x0 = x0f.astype(np.int64)
        y0 = y0f.astype(np.int64)
        x0c = np.clip(x0, 0, w - 1)
        x1c = np.clip(x0 + 1, 0, w - 1)
        y0c = np.clip(y0, 0, h - 1)
        y1c = np.clip(y0 + 1, 0, h - 1)
        img = self.skybox
        top = img[y0c, x0c] * (1 - ax) + img[y0c, x1c] * ax
        bot = img[y1c, x0c] * (1 - ax) + img[y1c, x1c] * ax
        return (top * (1 - ay) + bot * ay).astype(F) + sun


def trace_vec(osc, o, d, seed, num_bounces, show_normals=False):
    """Lane-vector trace: (R,3) o/d, (R,) uint32 seeds; mirrors trace()
    (render.cl:396-471) with masks replacing control flow."""
    R = o.shape[0]
    color = np.zeros((R, 3), F)
    mask = np.ones((R, 3), F)
    alive = np.ones(R, bool)
    with np.errstate(invalid="ignore", divide="ignore", over="ignore"):
        for i in range(num_bounces):
            if i and not alive.all():
                # intersect only the live lanes: closest_vec is
                # elementwise per ray, so live-lane results are
                # bit-identical; dead lanes get inert zeros, which every
                # downstream consumer masks with `alive` (their seeds
                # advance identically either way — draws are
                # value-independent elementwise hashes)
                live = np.nonzero(alive)[0]
                hs, ps, ns, fs, ms = osc.closest_vec(o[live], d[live])
                hit = np.zeros(R, bool)
                hit[live] = hs
                p = np.zeros((R, 3), F)
                p[live] = ps
                n = np.zeros((R, 3), F)
                n[live] = ns
                front = np.zeros(R, bool)
                front[live] = fs
                mi = np.zeros(R, np.int32)
                mi[live] = ms
            else:
                hit, p, n, front, mi = osc.closest_vec(o, d)
            if show_normals:
                out = (n * F(0.5) + F(0.5)).astype(F)
                sky = osc.sky_color_vec(d)
                return np.where(hit[:, None], out, sky)
            miss = alive & ~hit
            if miss.any():
                sky = osc.sky_color_vec(d[miss])
                color[miss] = color[miss] + mask[miss] * sky
            alive = alive & hit
            if not alive.any():
                break
            em = ((mask * osc.m_emission[mi]) * osc.m_estrength[mi][:, None])
            color = np.where(alive[:, None], color + em, color)
            if i == num_bounces - 1:
                break
            seed, hemi = _rand_hemisphere_v(n, seed)
            rd_sum = n + hemi
            random_dir = (rd_sum / norm3(rd_sum)[:, None]).astype(F)
            reflected = _reflect_v(d, n).astype(F)
            seed, um = _rand_float_v(seed)
            seed, us = _rand_float_v(seed)
            is_metal = osc.m_metal[mi] > um
            is_spec = osc.m_spec[mi] > us
            rough = random_dir + (reflected - random_dir) \
                * osc.m_smooth[mi][:, None]
            seed, ut = _rand_float_v(seed)
            is_trans = osc.m_trans[mi] > ut
            # non-transmissive arm (render.cl:425-437); the direction
            # select is OpenCL mix's LERP x + (y - x) * sel, not a
            # bitwise pick (1-ulp different from rough for sel = 1)
            sel = (is_metal | is_spec).astype(F)[:, None]
            d_nt = random_dir + (rough - random_dir) * sel
            mask_nt = np.where(is_spec[:, None], mask,
                               mask * osc.m_color[mi])
            # transmissive arm (render.cl:438-462)
            in_dir = _reflect_v(rough, n).astype(F)
            mu = np.where(front, osc.m_ri_inv[mi], osc.m_ri[mi])
            cos_t = np.minimum(F(1.0), dot3(in_dir, -n))
            sin_t = np.sqrt(F(1.0) - cos_t * cos_t)
            tir = mu * sin_t > 1.0
            # the ONE conditional RNG draw: ur is consumed only by
            # transmissive non-TIR lanes, so only those lanes accept the
            # advanced seed (render.cl:452)
            seed_adv, ur = _rand_float_v(seed)
            need_ur = is_trans & ~tir & alive
            seed = np.where(need_ur, seed_adv, seed)
            refl = tir | (_shlick_v(mu, cos_t) > ur)
            out_perp = mu[:, None] * (in_dir + cos_t[:, None] * n)
            out_par = -np.sqrt(np.abs(F(1.0) - dot3(out_perp, out_perp))
                               )[:, None] * n
            d_refr = (out_perp + out_par).astype(F)
            d_tr = np.where(refl[:, None], rough, d_refr)
            mask_tr = np.where(refl[:, None], mask, mask * osc.m_color[mi])
            nd = np.where(is_trans[:, None], d_tr, d_nt)
            nm = np.where(is_trans[:, None], mask_tr, mask_nt)
            nd = (nd / norm3(nd)[:, None]).astype(F)
            no = p + n * np.sign(dot3(n, nd)).astype(F)[:, None] * F(0.001)
            d = np.where(alive[:, None], nd, d)
            o = np.where(alive[:, None], no, o)
            mask = np.where(alive[:, None], nm, mask)
    return color


def render_vec(scene, camera, width, height, num_samples, num_bounces,
               time, show_normals=False):
    """Vector form of render() (render.cl:483-523): same image, computed
    one sample-plane at a time over all pixels at once.  Sample planes
    accumulate sequentially so the f32 addition order matches the scalar
    per-pixel loop."""
    osc = OracleSceneVec(scene)
    rot = np.asarray(camera.rotation_matrix(), F)
    cam_pos = np.array(camera.position, F)
    aspect = F(width / height)
    fov_scale = F(camera.fov_scale)
    px = np.tile(np.arange(width, dtype=F), height)
    py = np.repeat(np.arange(height, dtype=F), width)
    pid = np.arange(width * height, dtype=np.uint64)
    acc = np.zeros((width * height, 3), F)
    for s in range(num_samples):
        seed0 = ((np.uint64(s) + pid * np.uint64(num_samples))
                 * np.uint64(time) * np.uint64(5304)).astype(np.uint32)
        seed, u1 = _rand_float_v(seed0)
        seed, u2 = _rand_float_v(seed)
        ndc_x = (px + u1) / width
        ndc_y = (py + u2) / height
        sx = (2 * ndc_x - 1) * aspect * fov_scale
        sy = (1 - 2 * ndc_y) * fov_scale
        v = np.stack([sx, sy, np.full_like(sx, F(-1.0))], axis=-1)
        d = np.stack([dot3(rot[0][None, :], v), dot3(rot[1][None, :], v),
                      dot3(rot[2][None, :], v)], axis=-1)
        d = (d / norm3(d)[:, None]).astype(F)
        o = np.broadcast_to(cam_pos, d.shape).copy()
        acc = acc + trace_vec(osc, o, d, seed, num_bounces, show_normals)
    return (acc / num_samples).reshape(height, width, 3)
