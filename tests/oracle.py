"""Slow scalar CPU oracle renderer.

An *independent* NumPy implementation of the reference renderer's recursion
(camera.cuh:86-208, world.cuh:105-171, materials/textures/pdf dispatch),
operating on the same compiled SceneData/SceneMeta and consuming the same
counter-RNG draws (mort_tpu.rng slot layout) as the vectorised TPU
renderer.  Tests assert the wavefront renderer matches this oracle — the
test strategy prescribed in SURVEY.md section 4 (the reference itself ships
no tests; its scenes are the fixtures).

Everything here is deliberately scalar, per-pixel, branchy Python — the
shape of the reference CUDA code — so that agreement with the masked
lockstep TPU integrator is meaningful evidence.
"""

from __future__ import annotations

import numpy as np

from mort_tpu import rng as rngm
from mort_tpu.scene.types import (
    MAT_DIELECTRIC, MAT_DIFFUSE_LIGHT, MAT_ISOTROPIC, MAT_LAMBERTIAN,
    MAT_METAL, OBJ_SPHERE, TEX_CHECKER, TEX_IMAGE, TEX_NOISE,
)

F = np.float32
PI = F(np.pi)
T_MIN = F(1e-3)
INF = F(np.inf)


def _u4(seed, pixel, sample, bounce_plus1, slot):
    return rngm.uniform4_np(np.uint32(seed), np.uint32(pixel), np.uint32(sample),
                            np.uint32(bounce_plus1), np.uint32(slot))


def _unit(v):
    return v / F(np.linalg.norm(v))


def _unit_sphere_dir(u1, u2):
    z = F(1.0) - F(2.0) * u1
    r = np.sqrt(max(F(0), F(1) - z * z))
    phi = F(2.0) * PI * u2
    return np.array([r * np.cos(phi), r * np.sin(phi), z], F)


def _cosine_dir(u1, u2):
    phi = F(2.0) * PI * u1
    sq = np.sqrt(u2)
    return np.array([np.cos(phi) * sq, np.sin(phi) * sq,
                     np.sqrt(max(F(0), F(1) - u2))], F)


def _onb_from_w(w):
    unit_w = _unit(w)
    a = np.array([0, 1, 0], F) if abs(unit_w[0]) > 0.9 else np.array([1, 0, 0], F)
    v = _unit(np.cross(unit_w, a))
    u = np.cross(unit_w, v)
    return u, v, unit_w


def _reflect(v, n):
    return v - F(2.0) * F(np.dot(v, n)) * n


def _refract(uv, n, ratio):
    cos_theta = min(F(np.dot(-uv, n)), F(1.0))
    r_out_perp = ratio * (uv + cos_theta * n)
    r_out_par = -np.sqrt(abs(F(1.0) - F(np.dot(r_out_perp, r_out_perp)))) * n
    return r_out_perp + r_out_par


def _schlick(cosine, ref_idx):
    r0 = (F(1) - ref_idx) / (F(1) + ref_idx)
    r0 = r0 * r0
    return r0 + (F(1) - r0) * (F(1) - cosine) ** 5


class Oracle:
    def __init__(self, data, meta, cam, seed=rngm.DEFAULT_SEED):
        self.meta = meta
        self.seed = seed
        g = lambda x: np.asarray(x, F)
        self.sph_center = g(data.sph_center)
        self.sph_cvec = g(data.sph_cvec)
        self.sph_radius = g(data.sph_radius)
        self.sph_mat = np.asarray(data.sph_mat)
        self.sph_surface = np.asarray(data.sph_surface)
        self.quad_Q = g(data.quad_Q)
        self.quad_u = g(data.quad_u)
        self.quad_v = g(data.quad_v)
        self.quad_mat = np.asarray(data.quad_mat)
        self.quad_surface = np.asarray(data.quad_surface)
        self.mat_tex = np.asarray(data.mat_tex)
        self.mat_albedo = g(data.mat_albedo)
        self.mat_fuzz = g(data.mat_fuzz)
        self.mat_ior = g(data.mat_ior)
        self.tex_color = g(data.tex_color)
        self.tex_inv_scale = g(data.tex_inv_scale)
        self.tex_child_even = np.asarray(data.tex_child_even)
        self.tex_child_odd = np.asarray(data.tex_child_odd)
        self.tex_noise_scale = g(data.tex_noise_scale)
        self.tex_image_id = np.asarray(data.tex_image_id)
        self.images = [np.asarray(im, F) for im in data.images]
        self.med_nid = g(data.med_neg_inv_density)
        # per-quad frames (objects.cuh:170-185)
        n = np.cross(self.quad_u, self.quad_v)
        nn = np.sum(n * n, -1, keepdims=True)
        self.qn = n / np.sqrt(nn)
        self.qw = n / nn
        self.qD = np.sum(self.qn * self.quad_Q, -1)
        self.qarea = np.sqrt(nn[:, 0])
        self.cam = cam
        self.W = cam.image_width
        self.H = cam.image_height
        self.bg = np.asarray(cam.background, F)
        # camera basis (camera.cuh:47-84)
        theta = np.deg2rad(F(cam.vfov))
        h = np.tan(theta / 2)
        vh = F(2.0) * h * F(cam.focus_dist)
        vw = vh * (self.W / self.H)
        w = _unit(np.asarray(cam.lookfrom, F) - np.asarray(cam.lookat, F))
        u = _unit(np.cross(np.asarray(cam.vup, F), w))
        v = np.cross(w, u)
        viewport_u = vw * u
        viewport_v = vh * -v
        self.pdu = viewport_u / self.W
        self.pdv = -viewport_v / self.H
        self.center = np.asarray(cam.lookfrom, F)
        upper_left = self.center - F(cam.focus_dist) * w - viewport_u / 2 + viewport_v / 2
        self.pixel00 = upper_left + F(0.5) * (self.pdu + self.pdv)
        defocus_radius = F(cam.focus_dist) * np.tan(np.deg2rad(F(cam.defocus_angle) / 2))
        self.disk_u = u * defocus_radius
        self.disk_v = v * defocus_radius
        self.use_defocus = cam.defocus_angle > 0

    # -- textures ---------------------------------------------------------
    @staticmethod
    def _hash3(i, j, k, salt):
        """Mirror of render/textures._hash3 (uint32 wraparound)."""
        M = 0xFFFFFFFF
        h = (((i & M) * 0x8DA6B343) & M) ^ (((j & M) * 0xD8163841) & M) \
            ^ (((k & M) * 0xCB1AB31F) & M)
        h = (h + salt) & M
        h ^= h >> 13
        h = (h * 0x9E3779B1) & M
        return h ^ (h >> 16)

    @staticmethod
    def _grad_dot(h, wx, wy, wz):
        hh = h & 15
        u = wx if hh < 8 else wy
        v = wy if hh < 4 else (wx if hh in (12, 14) else wz)
        u = -u if (h & 1) else u
        v = -v if (h & 2) else v
        # unit-length gradient normalisation (render/textures._INV_SQRT2)
        return F(u + v) * F(0.7071067811865476)

    def _perlin_noise(self, p, nid):
        from mort_tpu.render.textures import noise_salt
        salt = noise_salt(nid)
        pf = np.floor(p)
        uvw = p - pf
        uvw1 = uvw * uvw * (3 - 2 * uvw)
        i, j, k = int(pf[0]), int(pf[1]), int(pf[2])
        uu = uvw1 * uvw1 * (3 - 2 * uvw1)
        accum = F(0)
        for di in (0, 1):
            for dj in (0, 1):
                for dk in (0, 1):
                    h = self._hash3(i + di, j + dj, k + dk, salt)
                    coeff = ((di * uu[0] + (1 - di) * (1 - uu[0]))
                             * (dj * uu[1] + (1 - dj) * (1 - uu[1]))
                             * (dk * uu[2] + (1 - dk) * (1 - uu[2])))
                    gd = self._grad_dot(h, F(uvw1[0] - di), F(uvw1[1] - dj),
                                        F(uvw1[2] - dk))
                    accum += F(coeff) * gd
        return F(accum)

    def _turb(self, p, nid, depth=7):
        accum = F(0)
        temp_p = p.copy()
        weight = F(1.0)
        for _ in range(depth):
            accum += weight * self._perlin_noise(temp_p, nid)
            weight *= F(0.5)
            temp_p = temp_p * 2
        return abs(accum)

    def _tex_base(self, tid, u, v, p):
        kind = self.meta.tex_kind[tid]
        if kind == TEX_IMAGE:
            img = self.images[self.tex_image_id[tid]]
            H, W = img.shape[:2]
            uc = min(max(u, F(0)), F(1))
            vc = F(1) - min(max(v, F(0)), F(1))
            i = min(int(uc * W), W - 1)
            j = min(int(vc * H), H - 1)
            return img[j, i]
        if kind == TEX_NOISE:
            nid = self.tex_image_id[tid]
            s = self.tex_noise_scale[tid] * p
            val = F(0.5) * (F(1) + np.sin(s[2] + F(10.0) * self._turb(s, nid)))
            return np.array([val, val, val], F)
        return self.tex_color[tid]

    def tex_value(self, tid, u, v, p):
        if self.meta.tex_kind[tid] == TEX_CHECKER:
            inv = self.tex_inv_scale[tid]
            xi = int(np.floor(inv * p[0]))
            yi = int(np.floor(inv * p[1]))
            zi = int(np.floor(inv * p[2]))
            child = (self.tex_child_even[tid] if (xi + yi + zi) % 2 == 0
                     else self.tex_child_odd[tid])
            return self._tex_base(child, u, v, p)
        return self._tex_base(tid, u, v, p)

    # -- intersection -----------------------------------------------------
    def _sphere_hit(self, row, ro, rd, time, t_min, t_max):
        c = self.sph_center[row] + time * self.sph_cvec[row]
        oc = ro - c
        a = F(np.dot(rd, rd))
        half_b = F(np.dot(oc, rd))
        c_term = F(np.dot(oc, oc)) - self.sph_radius[row] ** 2
        disc = half_b * half_b - a * c_term
        if disc < 0:
            return None
        sq = np.sqrt(disc)
        root = (-half_b - sq) / a
        if root < t_min or root > t_max:
            root = (-half_b + sq) / a
            if root < t_min or root > t_max:
                return None
        return F(root)

    def _quad_hit(self, row, ro, rd, t_min, t_max):
        nrm = self.qn[row]
        denom = F(np.dot(nrm, rd))
        if abs(denom) < 1e-8:
            return None
        t = (self.qD[row] - F(np.dot(nrm, ro))) / denom
        if t < t_min or t > t_max:
            return None
        p = ro + t * rd
        rel = p - self.quad_Q[row]
        alpha = F(np.dot(self.qw[row], np.cross(rel, self.quad_v[row])))
        beta = F(np.dot(self.qw[row], np.cross(self.quad_u[row], rel)))
        if alpha < 0 or alpha > 1 or beta < 0 or beta > 1:
            return None
        return F(t)

    def world_hit(self, ro, rd, time, pixel, sample, bounce):
        """world::hit semantics: surfaces by registry order, then media in
        order with running closest-t."""
        best = dict(t=INF, kind=None, idx=-1)
        for row in range(self.meta.n_spheres):
            if not self.sph_surface[row]:
                continue
            t = self._sphere_hit(row, ro, rd, time, T_MIN, best["t"])
            if t is not None and t < best["t"]:
                best = dict(t=t, kind="sphere", idx=row)
        for row in range(self.meta.n_quads):
            if not self.quad_surface[row]:
                continue
            t = self._quad_hit(row, ro, rd, T_MIN, best["t"])
            if t is not None and t < best["t"]:
                best = dict(t=t, kind="quad", idx=row)
        for m, med in enumerate(self.meta.media):
            cands = []
            for row in med.sphere_rows:
                c = self.sph_center[row]
                oc = ro - c
                a = F(np.dot(rd, rd))
                half_b = F(np.dot(oc, rd))
                c_term = F(np.dot(oc, oc)) - self.sph_radius[row] ** 2
                disc = half_b * half_b - a * c_term
                if disc >= 0:
                    sq = np.sqrt(disc)
                    cands += [(-half_b - sq) / a, (-half_b + sq) / a]
            for row in med.quad_rows:
                nrm = self.qn[row]
                denom = F(np.dot(nrm, rd))
                if abs(denom) < 1e-8:
                    continue
                t = (self.qD[row] - F(np.dot(nrm, ro))) / denom
                p = ro + t * rd
                rel = p - self.quad_Q[row]
                alpha = F(np.dot(self.qw[row], np.cross(rel, self.quad_v[row])))
                beta = F(np.dot(self.qw[row], np.cross(self.quad_u[row], rel)))
                if 0 <= alpha <= 1 and 0 <= beta <= 1:
                    cands.append(F(t))
            if not cands:
                continue
            t1 = min(cands)
            later = [t for t in cands if t > t1 + F(1e-4)]
            if not later:
                continue
            t2 = min(later)
            rec1 = max(t1, T_MIN)
            rec2 = min(t2, best["t"])
            if rec1 >= rec2:
                continue
            rec1 = max(rec1, F(0))
            ray_len = F(np.linalg.norm(rd))
            dist_inside = (rec2 - rec1) * ray_len
            u_m = _u4(self.seed, pixel, sample, 1 + bounce, rngm.SLOT_MEDIUM0)[m]
            hit_dist = self.med_nid[m] * np.log(u_m)
            if hit_dist > dist_inside:
                continue
            best = dict(t=rec1 + hit_dist / ray_len, kind="medium", idx=m)
        return best

    def hit_attrs(self, best, ro, rd, time):
        t = best["t"]
        p = ro + t * rd
        if best["kind"] == "sphere":
            row = best["idx"]
            c = self.sph_center[row] + time * self.sph_cvec[row]
            outward = (p - c) / self.sph_radius[row]
            front = F(np.dot(rd, outward)) < 0
            normal = outward if front else -outward
            theta = np.arccos(np.clip(-outward[1], -(1 - 2**-20), 1 - 2**-20))
            phi = np.arctan2(-outward[2], outward[0]) + PI
            return p, normal, front, F(phi / (2 * PI)), F(theta / PI), self.sph_mat[row]
        if best["kind"] == "quad":
            row = best["idx"]
            nrm = self.qn[row]
            rel = p - self.quad_Q[row]
            alpha = F(np.dot(self.qw[row], np.cross(rel, self.quad_v[row])))
            beta = F(np.dot(self.qw[row], np.cross(self.quad_u[row], rel)))
            front = F(np.dot(rd, nrm)) < 0
            normal = nrm if front else -nrm
            return p, normal, front, alpha, beta, self.quad_mat[row]
        med = self.meta.media[best["idx"]]
        return p, np.array([1, 0, 0], F), True, F(0), F(0), med.mat_row

    # -- light sampling (pdf.cuh:60-80, objects.cuh:110-145, 217-235) -----
    def light_pdf_value(self, p, direction):
        vals = []
        for light in self.meta.lights:
            if light.kind == OBJ_SPHERE:
                row = light.row
                # hittable_pdf uses ray time 0 (objects.cuh:114)
                t = self._sphere_hit(row, p, direction, F(0), T_MIN, INF)
                if t is None:
                    vals.append(F(0))
                    continue
                c = self.sph_center[row]
                r = self.sph_radius[row]
                arg = F(1) - r * r / F(np.dot(c - p, c - p))
                ctm = np.sqrt(arg) if arg > 0 else F(0)
                vals.append(F(1) / (F(2) * PI * (F(1) - ctm)))
            else:
                row = light.row
                t = self._quad_hit(row, p, direction, T_MIN, INF)
                if t is None:
                    vals.append(F(0))
                    continue
                dist_sq = t * t * F(np.dot(direction, direction))
                cosine = abs(F(np.dot(direction, self.qn[row]))) / F(np.linalg.norm(direction))
                vals.append(dist_sq / (cosine * self.qarea[row]))
        return F(sum(vals) / len(vals))

    def light_sample(self, p, pick_u, u1, u2):
        n = len(self.meta.lights)
        pick = min(int(pick_u * n), n - 1) if n > 1 else 0
        light = self.meta.lights[pick]
        if light.kind == OBJ_SPHERE:
            row = light.row
            direction = self.sph_center[row] - p
            dist_sq = F(np.dot(direction, direction))
            r = self.sph_radius[row]
            z = F(1) + u2 * (np.sqrt(max(F(0), F(1) - r * r / dist_sq)) - F(1))
            phi = F(2) * PI * u1
            s = np.sqrt(max(F(0), F(1) - z * z))
            local = np.array([np.cos(phi) * s, np.sin(phi) * s, z], F)
            bu, bv, bw = _onb_from_w(direction)
            return local[0] * bu + local[1] * bv + local[2] * bw
        row = light.row
        point = self.quad_Q[row] + u1 * self.quad_u[row] + u2 * self.quad_v[row]
        return point - p

    # -- integrator (forward fold of camera.cuh:86-176) -------------------
    def sample_radiance(self, pixel, sample):
        cam = self.cam
        x = pixel % self.W
        y = pixel // self.W
        s_i = sample % cam.sqrt_spp
        s_j = sample // cam.sqrt_spp
        u1, u2, u_time, _ = _u4(self.seed, pixel, sample, 0, rngm.SLOT_CAM_PIXEL)
        d1, d2, _, _ = _u4(self.seed, pixel, sample, 0, rngm.SLOT_CAM_LENS)
        recip = F(1.0 / cam.sqrt_spp)
        px = (s_i + u1) * recip - F(0.5)
        py = (s_j + u2) * recip - F(0.5)
        pixel_sample = self.pixel00 + (x + px) * self.pdu + (y + py) * self.pdv
        if self.use_defocus:
            r = np.sqrt(d1)
            phi = F(2) * PI * d2
            ro = self.center + r * np.cos(phi) * self.disk_u + r * np.sin(phi) * self.disk_v
        else:
            ro = self.center
        rd = pixel_sample - ro
        time = u_time

        L = np.zeros(3, F)
        beta = np.ones(3, F)
        for bounce in range(cam.bounce_limit):
            best = self.world_hit(ro, rd, time, pixel, sample, bounce)
            if not np.isfinite(best["t"]):
                L += beta * self.bg
                break
            p, normal, front, uu, vv, mat = self.hit_attrs(best, ro, rd, time)
            kind = self.meta.mat_kind[mat]

            mix_u, pick_u, diel_u, _ = _u4(self.seed, pixel, sample, 1 + bounce, rngm.SLOT_MIX)
            m1, m2, _, _ = _u4(self.seed, pixel, sample, 1 + bounce, rngm.SLOT_MAT_DIR)
            l1, l2, _, _ = _u4(self.seed, pixel, sample, 1 + bounce, rngm.SLOT_LIGHT_DIR)
            f1, f2, _, _ = _u4(self.seed, pixel, sample, 1 + bounce, rngm.SLOT_FUZZ)

            if kind == MAT_DIFFUSE_LIGHT:
                if front:
                    L += beta * self.tex_value(self.mat_tex[mat], uu, vv, p)
                break

            if kind == MAT_METAL:
                refl = _reflect(rd, normal)
                rd = _unit(refl) + self.mat_fuzz[mat] * _unit_sphere_dir(f1, f2)
                beta = beta * self.mat_albedo[mat]
                ro = p
                continue

            if kind == MAT_DIELECTRIC:
                ior = self.mat_ior[mat]
                ratio = F(1) / ior if front else ior
                ud = _unit(rd)
                cos_theta = min(F(np.dot(-ud, normal)), F(1))
                sin_theta = np.sqrt(max(F(0), F(1) - cos_theta * cos_theta))
                if ratio * sin_theta > 1 or _schlick(cos_theta, ratio) > diel_u:
                    rd = _reflect(ud, normal)
                else:
                    rd = _refract(ud, normal, ratio)
                ro = p
                continue

            # lambertian / isotropic
            attenuation = self.tex_value(self.mat_tex[mat], uu, vv, p)
            bu, bv, bw = _onb_from_w(normal)
            if kind == MAT_ISOTROPIC:
                mat_dir = _unit_sphere_dir(m1, m2)
            else:
                local = _cosine_dir(m1, m2)
                mat_dir = local[0] * bu + local[1] * bv + local[2] * bw

            # NB: one shared cosine feeds both mat_pdf and spdf (matching the
            # device renderer; mathematically identical to the reference's
            # separately-computed cosθ/π pair, pdf.cuh:46-49 +
            # materials.cuh:52-55, but immune to rounding-ratio blowup).
            if self.meta.lights:
                light_dir = self.light_sample(p, pick_u, l1, l2)
                gen_dir = light_dir if mix_u < 0.5 else mat_dir
            else:
                gen_dir = mat_dir

            if kind == MAT_ISOTROPIC:
                mp = spdf = F(1) / (F(4) * PI)
            else:
                cos_c = F(np.dot(_unit(gen_dir), bw)) / PI
                mp = max(F(0), cos_c)
                spdf = F(0) if cos_c < 0 else cos_c

            if self.meta.lights:
                lp = self.light_pdf_value(p, gen_dir)
                pdf = F(0.5) * lp + F(0.5) * mp
            else:
                pdf = mp

            if pdf > 0:
                beta = beta * attenuation * (spdf / pdf)
            else:
                beta = beta * F(0)
            ro = p
            rd = gen_dir
        return L

    def render(self, xs=None, ys=None):
        """Render (a sub-grid of) the image; returns [len(ys), len(xs), 3]
        linear radiance means, NaN-scrubbed like camera.cuh:196-198."""
        cam = self.cam
        xs = range(self.W) if xs is None else xs
        ys = range(self.H) if ys is None else ys
        spp = cam.sqrt_spp ** 2
        out = np.zeros((len(ys), len(xs), 3), F)
        for oy, y in enumerate(ys):
            for ox, x in enumerate(xs):
                acc = np.zeros(3, F)
                pixel = x + y * self.W
                for s in range(spp):
                    acc += self.sample_radiance(pixel, s)
                acc /= F(spp)
                acc[np.isnan(acc)] = 0
                out[oy, ox] = acc
        return out
