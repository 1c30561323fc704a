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
    return seed, v / np.linalg.norm(v).astype(F)


def rand_hemisphere(normal, seed):
    seed, d = rand_direction(seed)
    return seed, d * np.sign(np.dot(normal, d)).astype(F)


# -- intersections (render.cl:180-290) ---------------------------------------

def isect_sphere(center, radius, o, d):
    rc = center - o
    b = np.dot(rc, d)
    c = np.dot(rc, rc) - radius * radius
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
    denom = np.dot(n, d)
    if abs(denom) == 0.0:
        return None
    t = np.dot(n, pos - o) / denom
    if t < 0:
        return None
    return F(t)


def isect_triangle(v0, v1, v2, o, d):
    e1 = v1 - v0
    e2 = v2 - v0
    h = np.cross(d, e2)
    a = np.dot(e1, h)
    if a == 0:
        return None
    f = F(1.0) / a
    s = o - v0
    u = f * np.dot(s, h)
    if u < 0 or u > 1:
        return None
    q = np.cross(s, e1)
    v = f * np.dot(d, q)
    if v < 0 or u + v > 1:
        return None
    t = f * np.dot(e2, q)
    if t > 0:
        return F(t)
    return None


def bary_weights(v0, v1, v2, p):
    a = v1 - v0
    b = v2 - v0
    c = p - v0
    d00 = np.dot(a, a)
    d01 = np.dot(a, b)
    d11 = np.dot(b, b)
    d20 = np.dot(c, a)
    d21 = np.dot(c, b)
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
                n = n / np.linalg.norm(n).astype(F)
                best = (n, m)
        if best is None:
            return None
        n, m = best
        p = o + d * best_t
        front = np.dot(n, d) < 0.0
        if not front:
            n = -n
        return p, n, front, m

    def sky_color(self, d):
        s = self.sky
        sun_dir = np.array(s.sun_direction, F)
        sun_cos = max(np.dot(d, -sun_dir), F(0.0))
        sun = (np.array(s.sun_color, F) * F(s.sun_intensity)
               * F(sun_cos) ** F(s.sun_focus))
        if self.skybox is None:
            # analytic gradient (render.cl:381-389)
            def smoothstep(e0, e1, x):
                t = np.clip((x - e0) / (e1 - e0), 0.0, 1.0)
                return F(t * t * (3.0 - 2.0 * t))
            t = smoothstep(0.0, 0.4, d[1]) ** F(0.35)
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
    r0 = (1.0 - mu) / (1.0 + mu)
    r0 = r0 * r0
    return F(r0 + (1.0 - r0) * (1.0 - cos_theta) ** 5)


def reflect(v, n):
    return v - 2.0 * np.dot(v, n) * n


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
        random_dir = (rd_sum / np.linalg.norm(rd_sum)).astype(F)
        reflected = reflect(d, n).astype(F)
        seed, um = rand_float(seed)
        seed, us = rand_float(seed)
        is_metal = mat.metallic > um
        is_spec = mat.specular > us
        rough = random_dir + (reflected - random_dir) * F(mat.smoothness)
        seed, ut = rand_float(seed)
        is_trans = mat.transmittance > ut
        if not is_trans:
            if is_metal or is_spec:
                d = rough
            else:
                d = random_dir
            if is_spec:
                pass  # untinted
            else:
                mask = mask * np.array(mat.color, F)
        else:
            in_dir = reflect(rough, n).astype(F)
            mu = F(1.0 / mat.refraction_index) if front else F(mat.refraction_index)
            cos_t = min(F(1.0), np.dot(in_dir, -n))
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
                out_par = -np.sqrt(abs(F(1.0) - np.dot(out_perp, out_perp))) * n
                d = (out_perp + out_par).astype(F)
                mask = mask * np.array(mat.color, F)
        d = (d / np.linalg.norm(d)).astype(F)
        o = o + n * np.sign(np.dot(n, d)).astype(F) * F(0.001)
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
                d = rot @ np.array([sx, sy, -1.0], F)
                d = (d / np.linalg.norm(d)).astype(F)
                acc = acc + trace(osc, cam_pos.copy(), d, seed, num_bounces,
                                  show_normals)
            out[py, px] = acc / num_samples
    return out
