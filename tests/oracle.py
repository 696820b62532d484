"""Independent pure-NumPy path tracing oracle.

Implements the reference semantics (rayColor, CUDAKernels.h:102-145;
materials, Core/Material.cuh; camera, Core/Camera.cuh:32-44,159-182)
directly with Python loops + NumPy — deliberately structured like the
CUDA code rather than the JAX code so it is an independent check for the
golden/characterization tests (SURVEY.md §4 item 2). RNG differs, so
comparisons are statistical.
"""

from __future__ import annotations

import numpy as np

LAMBERTIAN, METAL, DIELECTRIC, DIFFUSE_LIGHT = 0, 1, 2, 3


def _normalize(v):
    return v / np.linalg.norm(v)


def _reflect(v, n):
    return v - 2.0 * np.dot(v, n) * n


def _refract(uv, n, eta):
    cos_theta = min(np.dot(-uv, n), 1.0)
    perp = eta * (uv + cos_theta * n)
    par = -np.sqrt(abs(1.0 - np.dot(perp, perp))) * n
    return perp + par


def _random_unit_vector(rng):
    while True:
        p = rng.uniform(-1, 1, 3)
        if np.dot(p, p) < 1:
            return _normalize(p)


def _random_in_unit_disk(rng):
    while True:
        p = np.array([rng.uniform(-1, 1), rng.uniform(-1, 1), 0.0])
        if np.dot(p, p) < 1:
            return p


class OracleScene:
    """Spheres + (optional) triangles with a shared material table."""

    def __init__(self, mat_type, albedo, emission, roughness, ior,
                 sph_center, sph_radius, sph_mat,
                 tri_verts=None, tri_faces=None, tri_mat=None):
        self.mat_type = np.asarray(mat_type)
        self.albedo = np.asarray(albedo, np.float64)
        self.emission = np.asarray(emission, np.float64)
        self.roughness = np.asarray(roughness, np.float64)
        self.ior = np.asarray(ior, np.float64)
        self.sph_center = np.asarray(sph_center, np.float64).reshape(-1, 3)
        self.sph_radius = np.asarray(sph_radius, np.float64)
        self.sph_mat = np.asarray(sph_mat)
        self.tri_faces = None if tri_faces is None else np.asarray(tri_faces).reshape(-1, 3)
        self.tri_verts = None if tri_verts is None else np.asarray(tri_verts, np.float64)
        self.tri_mat = None if tri_mat is None else np.asarray(tri_mat)

    @staticmethod
    def from_scene(scene):
        """Build from a raytracer_tpu Scene pytree."""
        import numpy as np

        m = scene.materials
        s = scene.spheres
        t = scene.mesh
        return OracleScene(
            np.asarray(m.type), np.asarray(m.albedo), np.asarray(m.emission),
            np.asarray(m.roughness), np.asarray(m.ior),
            np.asarray(s.center), np.asarray(s.radius), np.asarray(s.mat_id),
            np.asarray(t.vertices), np.asarray(t.faces), np.asarray(t.face_mat),
        )

    def hit(self, o, d, t_min, t_max):
        """Closest hit → (t, normal(front-facing), front, mat_id) or None."""
        best = None
        best_t = t_max
        # Spheres (Core/Sphere.cuh:18-47).
        for i in range(len(self.sph_radius)):
            oc = o - self.sph_center[i]
            a = np.dot(d, d)
            half_b = np.dot(oc, d)
            c = np.dot(oc, oc) - self.sph_radius[i] ** 2
            disc = half_b * half_b - a * c
            if disc < 0:
                continue
            sq = np.sqrt(disc)
            root = (-half_b - sq) / a
            if root < t_min or root > best_t:
                root = (-half_b + sq) / a
                if root < t_min or root > best_t:
                    continue
            p = o + root * d
            r = self.sph_radius[i] if self.sph_radius[i] != 0 else 1.0
            outward = (p - self.sph_center[i]) / r
            front = np.dot(d, outward) < 0
            n = outward if front else -outward
            best_t = root
            best = (root, p, n, front, int(self.sph_mat[i]))
        # Triangles (Core/Mesh.cuh:266-308).
        if self.tri_faces is not None:
            for f in range(len(self.tri_faces)):
                v0, v1, v2 = self.tri_verts[self.tri_faces[f]]
                e1, e2 = v1 - v0, v2 - v0
                h = np.cross(d, e2)
                a = np.dot(e1, h)
                if abs(a) < 1e-8:
                    continue
                fi = 1.0 / a
                s = o - v0
                u = fi * np.dot(s, h)
                if u < 0 or u > 1:
                    continue
                q = np.cross(s, e1)
                v = fi * np.dot(d, q)
                if v < 0 or u + v > 1:
                    continue
                t = fi * np.dot(e2, q)
                if t < t_min or t > best_t:
                    continue
                n = _normalize(np.cross(e1, e2))
                front = np.dot(d, n) < 0
                best_t = t
                best = (t, o + t * d, n if front else -n, front, int(self.tri_mat[f]))
        return best


def sky(d):
    u = _normalize(d)
    t = 0.5 * (u[1] + 1.0)
    return (1 - t) * np.array([1.0, 1.0, 1.0]) + t * np.array([0.5, 0.7, 1.0])


def ray_color(scene, o, d, rng, max_bounces=4, min_bounces=3, rr_max=0.95,
              emission_quirk=True):
    """Reference rayColor (CUDAKernels.h:102-145)."""
    throughput = np.ones(3)
    for bounce in range(max_bounces):
        if bounce >= min_bounces:
            survival = min(max(throughput), rr_max)
            if rng.uniform() > survival:
                return np.zeros(3)
            throughput = throughput / survival
        rec = scene.hit(o, d, 1e-3, np.inf)
        if rec is None:
            return throughput * sky(d)
        t, p, n, front, mid = rec
        mt = scene.mat_type[mid]
        if mt == DIFFUSE_LIGHT:
            e = scene.emission[mid]
            return e.copy() if emission_quirk else throughput * e
        if mt == LAMBERTIAN:
            nd = n + _random_unit_vector(rng)
            if np.all(np.abs(nd) < 1e-8):
                nd = n
            throughput = throughput * scene.albedo[mid]
            o, d = p, nd
        elif mt == METAL:
            refl = _normalize(_reflect(d, n)) + scene.roughness[mid] * _random_unit_vector(rng)
            if np.dot(refl, n) <= 0:
                return np.zeros(3)  # absorbed → Material::emit() == black
            throughput = throughput * scene.albedo[mid]
            o, d = p, refl
        elif mt == DIELECTRIC:
            ri = (1.0 / scene.ior[mid]) if front else scene.ior[mid]
            ud = _normalize(d)
            cos_t = min(np.dot(-ud, n), 1.0)
            sin_t = np.sqrt(max(1 - cos_t * cos_t, 0.0))
            r0 = ((1 - ri) / (1 + ri)) ** 2
            schlick = r0 + (1 - r0) * (1 - cos_t) ** 5
            if ri * sin_t > 1.0 or schlick > rng.uniform():
                nd = _reflect(ud, n)
            else:
                nd = _refract(ud, n, ri)
            o, d = p, nd
    return np.zeros(3)  # exhausted bounces → black (CUDAKernels.h:105)


def render(scene, width, height, spp, max_bounces, seed=0,
           position=(0, 4, 4), yaw=-90.0, pitch=0.0, fov=80.0,
           aperture=1e-6, focus_dist=None, emission_quirk=True):
    """Full oracle render → linear f32[H,W,3], row 0 = top."""
    rng = np.random.default_rng(seed)
    position = np.asarray(position, np.float64)
    if focus_dist is None:
        focus_dist = np.linalg.norm(position)
    # Camera basis (Core/Camera.cuh:159-182).
    yr, pr = np.radians(yaw), np.radians(pitch)
    front = _normalize(np.array([-np.cos(yr) * np.cos(pr), -np.sin(pr), -np.sin(yr) * np.cos(pr)]))
    right = _normalize(np.cross(front, [0, 1, 0]))
    up = _normalize(np.cross(right, front))
    h = np.tan(np.radians(fov) / 2)
    vph = 2 * h
    vpw = (width / height) * vph
    horizontal = focus_dist * vpw * right
    vertical = focus_dist * vph * up
    llc = position - horizontal / 2 - vertical / 2 - focus_dist * front
    lens_r = aperture / 2

    img = np.zeros((height, width, 3))
    for yi in range(height):
        y = height - 1 - yi  # row 0 = top
        for x in range(width):
            c = np.zeros(3)
            for _ in range(spp):
                rd = lens_r * _random_in_unit_disk(rng)
                offset = right * rd[0] + up * rd[1]
                u = (x + rng.uniform()) / width
                v = (y + rng.uniform()) / height
                o = position + offset
                d = llc + u * horizontal + v * vertical - position - offset
                c += ray_color(scene, o, d, rng, max_bounces, emission_quirk=emission_quirk)
            img[yi, x] = c / spp
    return img.astype(np.float32)
