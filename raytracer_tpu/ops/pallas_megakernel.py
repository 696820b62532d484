"""Fused path-loop megakernel — the whole integrator in ONE Pallas kernel.

The reference pays its launch overhead ONCE per frame: the entire
sample × bounce × traversal loop lives inside a single CUDA kernel
(CUDAKernels.h:102-166). The round-2 TPU pipeline instead ran one
traversal KERNEL per bounce sweep with the integrator in XLA around it,
paying per wavefront-iteration: ~18 ms of XLA machinery (RNG, regen,
select sweeps), a 32 ms camera sweep, and per-packet fixed costs —
~45+ times per frame (scripts/xla_iter_probe.py).

This kernel is the TPU restatement of the reference's architecture:
each (8,128) packet of 1024 pixels runs its FULL path loop in-kernel —
camera ray generation, Russian roulette, sphere sweep + brute pre-pass +
BVH traversal (ops/pallas_traverse.traverse_tile, shared), material
scatter for all four reference materials, sky/emission accumulation,
and immediate per-lane sample regeneration (a lane that terminates a
sample starts its pixel's next sample on the next loop iteration —
the lane-stable wavefront discipline of models/wavefront.py, but with
zero XLA round-trips).

RNG is utils/ktf.py (counter-based Threefry-2x32 on plain int32 vector
ops — no bitcast, no gather): draws depend only on (pixel, sample,
bounce, purpose), so this kernel is equality-testable against the XLA
integrators running cfg.rng_impl="ktf" (tests/test_fused_megakernel.py)
— the same invariant family that ties wavefront to megakernel.

Semantics reproduced exactly (same formulas, same select order as
models/wavefront.py + ops/intersect.trace_frame_fused +
ops/materials.scatter_params):
  * thin-lens camera (Core/Camera.cuh:32-44),
  * RR from bounce `min_bounces`, survival = min(max throughput, 0.95)
    (CUDAKernels.h:113-121),
  * 4 materials with the reference's sampling (Core/Material.cuh),
  * unattenuated-emission quirk (CUDAKernels.h:133-134), sky on miss,
    max-bounce black.

Static shape/budget limits (asserted, with graceful caller fallback):
<= 16 spheres (one 128-lane row), <= 28 materials (two rows), camera
basis in one row. The outer path loop counts down from the static bound
spp*max_bounces + 2 (a lane spends at most max_bounces iterations per
sample); the inner traversal loop keeps its own bound (CLAUDE.md rule:
data-dependent-only while conds fault the 2026-08-18 backend).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from raytracer_tpu.ops.bvh4 import Bvh4
from raytracer_tpu.ops.pallas_interleave import traverse_tiles
from raytracer_tpu.ops.pallas_traverse import (
    BIG, P_LANE, P_SUB, PACKET, STACK_CAP, TRI_STRIDE,
    _pack_tables_v6, hoist_invariants, traverse_tile)
from raytracer_tpu.utils import ktf

MAX_SPHERES = 16    # 8 lanes each in one (1,128) row
MAX_MATERIALS = 28  # 9 lanes each over two (1,128) rows (14 per row)
MAX_PACKETS_PER_MEGA_CALL = 128  # bounds single-dispatch wall time


def _default_interleave() -> int:
    """Packets per merged path loop (1 or 2). G=2 interleaves two
    packets' traversal latency chains in one while loop
    (ops/pallas_interleave.traverse_tiles). Overridable for A/B studies via
    RAYTRACER_TPU_INTERLEAVE."""
    import os

    return int(os.environ.get("RAYTRACER_TPU_INTERLEAVE", "1"))

EPS_NEAR_ZERO = np.float32(1e-8)   # vecmath.EPS_NEAR_ZERO
SKY_TOP = (0.5, 0.7, 1.0)          # tonemap (CRTUtility.cuh:34-38)


def pack_cam_row(basis, position) -> jnp.ndarray:
    """Camera basis → one f32 (1,128) row:
    [ll(3) horizontal(3) vertical(3) pos(3) right(3) up(3) lens_radius]."""
    vals = jnp.concatenate([
        basis["lower_left"], basis["horizontal"], basis["vertical"],
        jnp.asarray(position, jnp.float32).reshape(3),
        basis["right"], basis["up"],
        jnp.reshape(basis["lens_radius"], (1,)),
    ])
    return jnp.concatenate([vals, jnp.zeros((128 - vals.shape[0],), jnp.float32)])[None, :]


def pack_sphere_row(spheres) -> jnp.ndarray:
    """Sphere list → one f32 (1,128) row, 8 lanes per sphere:
    [cx cy cz radius mat_id(float-enc) pad3]."""
    s = spheres.center.shape[0]
    assert s <= MAX_SPHERES, f"{s} spheres > fused-kernel budget {MAX_SPHERES}"
    vals = jnp.concatenate([
        spheres.center,
        spheres.radius[:, None],
        spheres.mat_id.astype(jnp.float32)[:, None],
        jnp.zeros((s, 3), jnp.float32),
    ], axis=1).reshape(-1)
    return jnp.concatenate([vals, jnp.zeros((128 - vals.shape[0],), jnp.float32)])[None, :]


def pack_mat_rows(materials) -> jnp.ndarray:
    """Material table → f32 (2,128); material m at row m//14, lanes
    9*(m%14): [type albedo(3) emission(3) roughness ior]."""
    m = materials.type.shape[0]
    assert m <= MAX_MATERIALS, f"{m} materials > fused-kernel budget {MAX_MATERIALS}"
    vals = jnp.concatenate([
        materials.type.astype(jnp.float32)[:, None],
        materials.albedo, materials.emission,
        materials.roughness[:, None], materials.ior[:, None],
    ], axis=1)  # [m, 9]
    pad = jnp.zeros((MAX_MATERIALS - m, 9), jnp.float32)
    flat = jnp.concatenate([vals, pad]).reshape(2, 14 * 9)
    return jnp.concatenate([flat, jnp.zeros((2, 128 - 14 * 9), jnp.float32)], axis=1)


def _make_mega_kernel(cfg_static: dict, n_packets: int, stack_cap: int,
                      zero_row: int, brute_rows: tuple, trav_iters: int,
                      n_children: int, n_spheres: int, n_materials: int,
                      profile: bool = False, interleave: int = 1):
    assert interleave in (1, 2)
    assert not (profile and interleave != 1), "profile implies interleave=1"
    if interleave == 2:
        assert n_packets % 2 == 0
    spp = cfg_static["spp"]
    width = cfg_static["width"]
    height = cfg_static["height"]
    max_bounces = cfg_static["max_bounces"]
    min_bounces = cfg_static["min_bounces"]
    rr_max_prob = np.float32(cfg_static["rr_max_prob"])
    t_min = cfg_static["t_min"]
    emission_quirk = cfg_static["reference_emission_quirk"]
    path_iters = spp * max_bounces + 2

    def kernel(sc_ref, node_ref, tri_ref, pix_ref, pxf_ref, pyf_ref,
               cam_ref, sph_ref, mat_ref,
               ax_ref, ay_ref, az_ref, cost_ref, aux_ref,
               ntask_ref, sp_ref, ltask_ref, lsp_ref, stack_ref, lstack_ref,
               ispare_ref, lspare_ref):
        # cost_ref/aux_ref are None unless profile=True (the production
        # kernel declares only the 3 radiance outputs).
        K = n_children
        brute_trows, root_lo, root_hi = hoist_invariants(
            node_ref, tri_ref, brute_rows, K)

        # Launch-invariant hoists: camera / sphere / material columns as
        # (8,1) sublane-replicated slices (non-lane-0 extracts are the
        # slow Mosaic op — CLAUDE.md; replicate-row + column-slice is
        # the sanctioned pattern).
        crow = jnp.concatenate([cam_ref[0:1]] * P_SUB, axis=0)   # (8,128)
        srow = jnp.concatenate([sph_ref[0:1]] * P_SUB, axis=0)
        mrow0 = jnp.concatenate([mat_ref[0:1]] * P_SUB, axis=0)
        mrow1 = jnp.concatenate([mat_ref[1:2]] * P_SUB, axis=0)

        def ccol(i):
            return crow[:, i:i + 1]                              # (8,1)

        llx, lly, llz = ccol(0), ccol(1), ccol(2)
        hx, hy, hz = ccol(3), ccol(4), ccol(5)
        vx, vy, vz = ccol(6), ccol(7), ccol(8)
        posx, posy, posz = ccol(9), ccol(10), ccol(11)
        rgx, rgy, rgz = ccol(12), ccol(13), ccol(14)
        upx, upy, upz = ccol(15), ccol(16), ccol(17)
        lens_r = ccol(18)

        sph_cols = []
        for s in range(n_spheres):
            b = 8 * s
            sph_cols.append(tuple(srow[:, b + j:b + j + 1] for j in range(5)))
        mat_cols = []
        for m in range(n_materials):
            row = mrow0 if m < 14 else mrow1
            b = 9 * (m % 14)
            mat_cols.append(tuple(row[:, b + j:b + j + 1] for j in range(9)))

        k0 = sc_ref[0, 0]
        k1 = sc_ref[0, 1]
        soff = sc_ref[0, 2]

        inv_w = np.float32(1.0 / width)
        inv_h = np.float32(1.0 / height)

        zero = jnp.zeros((P_SUB, P_LANE), jnp.float32)
        one = jnp.ones((P_SUB, P_LANE), jnp.float32)
        i0 = jnp.zeros((P_SUB, P_LANE), jnp.int32)

        def pre_trav(pix, pxf, pyf, sub):
            """Path-loop phase BEFORE traversal for one packet: sample
            claim + camera regen, Russian roulette, sphere sweep.
            Returns (sub', rays, ctx) — sub' the 15 updated carries,
            rays the traversal operands, ctx what post_trav needs."""
            (ox, oy, oz, dx, dy, dz, tx, ty, tz,
             ax, ay, az, sample, bounce_st, active_i) = sub
            active = active_i != 0

            bounce = jnp.where(active, bounce_st, 0)
            claim = ~active & (sample < spp)
            s_eff = sample + soff

            if True:  # (indentation-preserving block for the body below)
                # --- Camera regeneration (Core/Camera.cuh:32-44) on
                # claiming lanes; draws keyed at bounce 0 like the
                # wavefront's skeys (models/wavefront.py).
                smp0 = ktf.KtfSampler(k0=k0, k1=k1, pixel=pix,
                                      sample=s_eff, bounce=i0)
                ldx, ldy = smp0.disk_parts(ktf.LENS)
                rdx = lens_r * ldx
                rdy = lens_r * ldy
                offx = rgx * rdx + upx * rdy
                offy = rgy * rdx + upy * rdy
                offz = rgz * rdx + upz * rdy
                ju, jv = smp0.uniform_pair(ktf.JITTER)
                u = (pxf + ju) * inv_w
                v = (pyf + jv) * inv_h
                o_nx = posx + offx
                o_ny = posy + offy
                o_nz = posz + offz
                d_nx = llx + u * hx + v * vx - posx - offx
                d_ny = lly + u * hy + v * vy - posy - offy
                d_nz = llz + u * hz + v * vz - posz - offz
                ox = jnp.where(claim, o_nx, ox)
                oy = jnp.where(claim, o_ny, oy)
                oz = jnp.where(claim, o_nz, oz)
                dx = jnp.where(claim, d_nx, dx)
                dy = jnp.where(claim, d_ny, dy)
                dz = jnp.where(claim, d_nz, dz)
                tx = jnp.where(claim, one, tx)
                ty = jnp.where(claim, one, ty)
                tz = jnp.where(claim, one, tz)
                active = active | claim

                # --- Russian roulette (CUDAKernels.h:113-121).
                smp_b = ktf.KtfSampler(k0=k0, k1=k1, pixel=pix,
                                       sample=s_eff, bounce=bounce)
                do_rr = bounce >= min_bounces
                survival = jnp.minimum(jnp.maximum(jnp.maximum(tx, ty), tz),
                                       rr_max_prob)
                u_rr = smp_b.uniform(ktf.RR)
                rr_kill = active & do_rr & (u_rr > survival)
                survived = active & ~rr_kill
                rr_scale = jnp.where(survived & do_rr,
                                     1.0 / jnp.maximum(survival, 1e-12), 1.0)
                tx = tx * rr_scale
                ty = ty * rr_scale
                tz = tz * rr_scale

                # --- Sphere sweep (ops/intersect.trace_frame_fused
                # select order reproduced exactly).
                a_q = dx * dx + dy * dy + dz * dz
                t_sph = jnp.full((P_SUB, P_LANE), BIG, jnp.float32)
                cselx = zero
                csely = zero
                cselz = zero
                r_sel = one
                m_self = zero  # float-encoded sphere mat id
                for s in range(n_spheres):
                    scx, scy, scz, srad, smat = sph_cols[s]
                    ocx = ox - scx
                    ocy = oy - scy
                    ocz = oz - scz
                    half_b = ocx * dx + ocy * dy + ocz * dz
                    c_q = ocx * ocx + ocy * ocy + ocz * ocz - srad * srad
                    disc = half_b * half_b - a_q * c_q
                    sq = jnp.sqrt(jnp.maximum(disc, 0.0))
                    root_near = (-half_b - sq) / a_q
                    root_far = (-half_b + sq) / a_q
                    near_ok = (root_near >= t_min) & (root_near <= t_sph)
                    far_ok = (root_far >= t_min) & (root_far <= t_sph)
                    root = jnp.where(near_ok, root_near, root_far)
                    valid = (disc >= 0.0) & (near_ok | far_ok)
                    better = valid & (root < t_sph)
                    t_sph = jnp.where(better, root, t_sph)
                    cselx = jnp.where(better, scx, cselx)
                    csely = jnp.where(better, scy, csely)
                    cselz = jnp.where(better, scz, cselz)
                    r_sel = jnp.where(better,
                                      jnp.where(srad != 0.0, srad, 1.0), r_sel)
                    m_self = jnp.where(better, smat, m_self)

                # --- Traversal happens between pre_trav and post_trav.
                t_lim = jnp.where(survived, t_sph, -1.0)
                sub1 = (ox, oy, oz, dx, dy, dz, tx, ty, tz,
                        ax, ay, az, sample, bounce_st, active_i)
                rays = (ox, oy, oz, dx, dy, dz, t_lim)
                ctx = (active, survived, bounce, s_eff, a_q,
                       cselx, csely, cselz, r_sel, m_self, t_sph)
                return sub1, rays, ctx

        def post_trav(pix, sub, ctx, trav6):
            """Path-loop phase AFTER traversal: hit resolution, material
            select, scatter, accumulation, per-lane regen bookkeeping."""
            (ox, oy, oz, dx, dy, dz, tx, ty, tz,
             ax, ay, az, sample, bounce_st, active_i) = sub
            (active, survived, bounce, s_eff, a_q,
             cselx, csely, cselz, r_sel, m_self, t_sph) = ctx
            t_tri, _best, mat_tri, nxg, nyg, nzg = trav6
            smp_b = ktf.KtfSampler(k0=k0, k1=k1, pixel=pix,
                                   sample=s_eff, bounce=bounce)

            if True:  # (indentation-preserving block for the body below)
                tri_wins = t_tri < t_sph
                t_hit = jnp.where(tri_wins, t_tri, t_sph)
                ray_hit = t_hit < BIG
                px_ = ox + t_hit * dx
                py_ = oy + t_hit * dy
                pz_ = oz + t_hit * dz
                outx = (px_ - cselx) / r_sel
                outy = (py_ - csely) / r_sel
                outz = (pz_ - cselz) / r_sel
                rnx = jnp.where(tri_wins, nxg, outx)
                rny = jnp.where(tri_wins, nyg, outy)
                rnz = jnp.where(tri_wins, nzg, outz)
                inv_nn = 1.0 / jnp.sqrt(jnp.maximum(
                    rnx * rnx + rny * rny + rnz * rnz, 1e-24))
                nnx = rnx * inv_nn
                nny = rny * inv_nn
                nnz = rnz * inv_nn
                front = (dx * nnx + dy * nny + dz * nnz) < 0.0
                fsign = jnp.where(front, 1.0, -1.0)
                nx_ = nnx * fsign
                ny_ = nny * fsign
                nz_ = nnz * fsign
                mat_idf = jnp.where(tri_wins, mat_tri.astype(jnp.float32), m_self)

                # --- Material table select (ops/materials.lookup_params).
                mtype = zero
                albx = zero
                alby = zero
                albz = zero
                emx = zero
                emy = zero
                emz = zero
                rough = zero
                ior = one
                for m in range(n_materials):
                    (mt, abx, aby, abz, exq, eyq, ezq, rg, io) = mat_cols[m]
                    sel = mat_idf == np.float32(m)
                    mtype = jnp.where(sel, mt, mtype)
                    albx = jnp.where(sel, abx, albx)
                    alby = jnp.where(sel, aby, alby)
                    albz = jnp.where(sel, abz, albz)
                    emx = jnp.where(sel, exq, emx)
                    emy = jnp.where(sel, eyq, emy)
                    emz = jnp.where(sel, ezq, emz)
                    rough = jnp.where(sel, rg, rough)
                    ior = jnp.where(sel, io, ior)

                # --- Scatter (ops/materials.scatter_params formulas).
                uvx, uvy, uvz = smp_b.unit_vector_parts(ktf.SCATTER)
                u_die = smp_b.uniform(ktf.DIELECTRIC)

                # Lambertian.
                lamx = nx_ + uvx
                lamy = ny_ + uvy
                lamz = nz_ + uvz
                nz_mask = ((jnp.abs(lamx) < EPS_NEAR_ZERO)
                           & (jnp.abs(lamy) < EPS_NEAR_ZERO)
                           & (jnp.abs(lamz) < EPS_NEAR_ZERO))
                lamx = jnp.where(nz_mask, nx_, lamx)
                lamy = jnp.where(nz_mask, ny_, lamy)
                lamz = jnp.where(nz_mask, nz_, lamz)

                # Metal: normalize(reflect(d, n)) + roughness * unit_vec.
                d_dot_n = dx * nx_ + dy * ny_ + dz * nz_
                refx = dx - 2.0 * d_dot_n * nx_
                refy = dy - 2.0 * d_dot_n * ny_
                refz = dz - 2.0 * d_dot_n * nz_
                inv_rl = 1.0 / jnp.sqrt(jnp.maximum(
                    refx * refx + refy * refy + refz * refz,
                    np.float32(1e-20) * np.float32(1e-20)))
                metx = refx * inv_rl + rough * uvx
                mety = refy * inv_rl + rough * uvy
                metz = refz * inv_rl + rough * uvz
                metal_ok = (metx * nx_ + mety * ny_ + metz * nz_) > 0.0

                # Dielectric (Core/Material.cuh:109-137).
                ri = jnp.where(front, 1.0 / ior, ior)
                inv_dl = 1.0 / jnp.sqrt(a_q)
                uix = dx * inv_dl
                uiy = dy * inv_dl
                uiz = dz * inv_dl
                cos_t = jnp.minimum(-(uix * nx_ + uiy * ny_ + uiz * nz_), 1.0)
                sin_t = jnp.sqrt(jnp.maximum(1.0 - cos_t * cos_t, 0.0))
                cannot = (ri * sin_t) > 1.0
                r0 = jnp.square((1.0 - ri) / (1.0 + ri))
                one_mc = 1.0 - cos_t
                omc2 = one_mc * one_mc
                schlick = r0 + (1.0 - r0) * omc2 * omc2 * one_mc
                do_reflect = cannot | (schlick > u_die)
                u_dot = uix * nx_ + uiy * ny_ + uiz * nz_
                drx = uix - 2.0 * u_dot * nx_
                dry = uiy - 2.0 * u_dot * ny_
                drz = uiz - 2.0 * u_dot * nz_
                rpx = ri * (uix + cos_t * nx_)
                rpy = ri * (uiy + cos_t * ny_)
                rpz = ri * (uiz + cos_t * nz_)
                rp2 = rpx * rpx + rpy * rpy + rpz * rpz
                rpar = -jnp.sqrt(jnp.maximum(jnp.abs(1.0 - rp2), 1e-12))
                rfx = rpx + rpar * nx_
                rfy = rpy + rpar * ny_
                rfz = rpz + rpar * nz_
                diex = jnp.where(do_reflect, drx, rfx)
                diey = jnp.where(do_reflect, dry, rfy)
                diez = jnp.where(do_reflect, drz, rfz)

                is_lam = mtype == 0.0
                is_metal = mtype == 1.0
                is_die = mtype == 2.0
                is_light = mtype == 3.0

                scdx = jnp.where(is_metal, metx, lamx)
                scdy = jnp.where(is_metal, mety, lamy)
                scdz = jnp.where(is_metal, metz, lamz)
                scdx = jnp.where(is_die, diex, scdx)
                scdy = jnp.where(is_die, diey, scdy)
                scdz = jnp.where(is_die, diez, scdz)
                attx = jnp.where(is_die, one, albx)
                atty = jnp.where(is_die, one, alby)
                attz = jnp.where(is_die, one, albz)
                scattered = is_lam | (is_metal & metal_ok) | is_die

                # --- Accumulation & state update (wavefront body order).
                hit = ray_hit & survived
                light_hit = hit & is_light
                miss = survived & ~ray_hit
                cont = hit & scattered & (bounce + 1 < max_bounces)

                if emission_quirk:
                    gex, gey, gez = emx, emy, emz
                else:
                    gex, gey, gez = tx * emx, ty * emy, tz * emz
                # Sky gradient (CRTUtility.cuh:34-38) on current dirs.
                sky_t = 0.5 * (dy * inv_dl + 1.0)
                skx = (1.0 - sky_t) + sky_t * np.float32(SKY_TOP[0])
                sky = (1.0 - sky_t) + sky_t * np.float32(SKY_TOP[1])
                skz = (1.0 - sky_t) + sky_t * np.float32(SKY_TOP[2])
                cx = jnp.where(light_hit, gex, zero)
                cy = jnp.where(light_hit, gey, zero)
                cz = jnp.where(light_hit, gez, zero)
                cx = jnp.where(miss, tx * skx, cx)
                cy = jnp.where(miss, ty * sky, cy)
                cz = jnp.where(miss, tz * skz, cz)

                terminated = active & ~cont
                ax = ax + jnp.where(terminated, cx, zero)
                ay = ay + jnp.where(terminated, cy, zero)
                az = az + jnp.where(terminated, cz, zero)
                sample = jnp.where(terminated, sample + 1, sample)

                tx = jnp.where(cont, tx * attx, tx)
                ty = jnp.where(cont, ty * atty, ty)
                tz = jnp.where(cont, tz * attz, tz)
                ox = jnp.where(cont, px_, ox)
                oy = jnp.where(cont, py_, oy)
                oz = jnp.where(cont, pz_, oz)
                dx = jnp.where(cont, scdx, dx)
                dy = jnp.where(cont, scdy, dy)
                dz = jnp.where(cont, scdz, dz)
                bounce_st = jnp.where(cont, bounce + 1, bounce)

                return (ox, oy, oz, dx, dy, dz, tx, ty, tz,
                        ax, ay, az, sample, bounce_st,
                        cont.astype(jnp.int32))

        sub_init = (zero, zero, zero, one, one, one,   # o, d
                    one, one, one,                      # throughput
                    zero, zero, zero,                   # acc
                    i0, i0, i0)                         # sample, bounce, active

        def pending_of(sub):
            sample, active_i = sub[12], sub[14]
            return jnp.sum(jnp.maximum(active_i,
                                       (sample < spp).astype(jnp.int32)))

        def per_packet(p, _):
            pix = pix_ref[pl.ds(p, 1)][0]                        # (8,128) i32
            pxf = pxf_ref[pl.ds(p, 1)][0]                        # (8,128) f32
            pyf = pyf_ref[pl.ds(p, 1)][0]

            # The `active` mask is carried as int32 0/1 — Mosaic cannot
            # legalize a vector<8x128xi1> while_loop carry (scf.yield
            # legalization failure on the 2026-08 backend).
            def cond(carry):
                return (carry[0] > 0) & (pending_of(carry[1:]) > 0)

            def body(carry):
                iters = carry[0]
                sub = carry[1:16]
                if profile:
                    cost, lockstep = carry[16], carry[17]
                sub, rays, ctx = pre_trav(pix, pxf, pyf, sub)
                trav_out = traverse_tile(
                    t_min, stack_cap, zero_row, trav_iters, K,
                    brute_trows, root_lo, root_hi, node_ref, tri_ref,
                    *rays,
                    ntask_ref, sp_ref, ltask_ref, lsp_ref,
                    stack_ref, lstack_ref, ispare_ref, lspare_ref,
                    profile=profile)
                if profile:
                    # Per-lane cost proxy: the lane's chain's traversal
                    # iterations plus one for the path-loop body itself
                    # (raytracer_tpu/schedule.py); plus the packet's
                    # LOCKSTEP traversal-iteration bill for this call
                    # (scripts/kernel_stats.py decomposition).
                    cost = (cost + trav_out[6]
                            + jnp.where(ctx[0], 1.0, 0.0))
                    lockstep = lockstep + trav_out[7]
                sub = post_trav(pix, sub, ctx, trav_out[:6])
                out_c = (iters - 1,) + sub
                return out_c + (cost, lockstep) if profile else out_c

            init = (jnp.int32(path_iters),) + sub_init
            if profile:
                init = init + (zero, jnp.int32(0))      # per-lane cost, lockstep
            out = jax.lax.while_loop(cond, body, init)
            ax_ref[pl.ds(p, 1)] = out[10][None]
            ay_ref[pl.ds(p, 1)] = out[11][None]
            az_ref[pl.ds(p, 1)] = out[12][None]
            if profile:
                cost_ref[pl.ds(p, 1)] = out[16][None]
                # Aux plane: row 0 = packet lockstep traversal iterations,
                # row 1 = packet outer path iterations, rest zero.
                # (Scalar→(1,128) splats then concat; a direct
                # (1,1)→(8,128) broadcast is unsupported in Mosaic.)
                lock_row = jnp.full((1, P_LANE), out[17].astype(jnp.float32))
                outer_row = jnp.full(
                    (1, P_LANE),
                    (jnp.int32(path_iters) - out[0]).astype(jnp.float32))
                zrows = jnp.zeros((P_SUB - 2, P_LANE), jnp.float32)
                aux_ref[pl.ds(p, 1)] = jnp.concatenate(
                    [lock_row, outer_row, zrows], axis=0)[None]
            return 0

        def per_pair(pp, _):
            """G=2 INTERLEAVED path loops: two packets share one while
            loop; their traversals run MERGED in traverse_tiles (chains
            0-7 / 8-15), whose independent latency chains interleave
            (~15% — kernel_interleave_probe). A packet whose traversal
            drained skips its vector phases via lax.cond inside
            traverse_tiles, so the longer packet does not pay max-of-16
            lockstep widening. Per-packet results are identical to the
            G=1 kernel (chain decisions depend only on chain state)."""
            p0 = 2 * pp
            p1 = 2 * pp + 1
            pix0 = pix_ref[pl.ds(p0, 1)][0]
            pxf0 = pxf_ref[pl.ds(p0, 1)][0]
            pyf0 = pyf_ref[pl.ds(p0, 1)][0]
            pix1 = pix_ref[pl.ds(p1, 1)][0]
            pxf1 = pxf_ref[pl.ds(p1, 1)][0]
            pyf1 = pyf_ref[pl.ds(p1, 1)][0]

            def cond(carry):
                return (carry[0] > 0) & (
                    (pending_of(carry[1:16]) + pending_of(carry[16:31])) > 0)

            def body(carry):
                iters = carry[0]
                sub0 = carry[1:16]
                sub1 = carry[16:31]
                sub0, rays0, ctx0 = pre_trav(pix0, pxf0, pyf0, sub0)
                sub1, rays1, ctx1 = pre_trav(pix1, pxf1, pyf1, sub1)
                res0, res1 = traverse_tiles(
                    t_min, stack_cap, zero_row, trav_iters, K,
                    brute_trows, root_lo, root_hi, node_ref, tri_ref,
                    [rays0, rays1],
                    ntask_ref, sp_ref, ltask_ref, lsp_ref,
                    stack_ref, lstack_ref, ispare_ref, lspare_ref)
                sub0 = post_trav(pix0, sub0, ctx0, res0)
                sub1 = post_trav(pix1, sub1, ctx1, res1)
                return (iters - 1,) + sub0 + sub1

            init = (jnp.int32(path_iters),) + sub_init + sub_init
            out = jax.lax.while_loop(cond, body, init)
            ax_ref[pl.ds(p0, 1)] = out[10][None]
            ay_ref[pl.ds(p0, 1)] = out[11][None]
            az_ref[pl.ds(p0, 1)] = out[12][None]
            ax_ref[pl.ds(p1, 1)] = out[25][None]
            ay_ref[pl.ds(p1, 1)] = out[26][None]
            az_ref[pl.ds(p1, 1)] = out[27][None]
            return 0

        if interleave == 2:
            jax.lax.fori_loop(0, n_packets // 2, per_pair, 0)
        else:
            jax.lax.fori_loop(0, n_packets, per_packet, 0)

    def kernel_scoped(sc_ref, node_ref, tri_ref, pix_ref, pxf_ref, pyf_ref,
                      cam_ref, sph_ref, mat_ref, ax_ref, ay_ref, az_ref,
                      *maybe_profile_refs):
        cost_ref, aux_ref = (maybe_profile_refs if profile else (None, None))

        def scoped(ntask_ref, sp_ref, ltask_ref, lsp_ref, stack_ref,
                   lstack_ref, ispare_ref, lspare_ref):
            kernel(sc_ref, node_ref, tri_ref, pix_ref, pxf_ref, pyf_ref,
                   cam_ref, sph_ref, mat_ref, ax_ref, ay_ref, az_ref,
                   cost_ref, aux_ref,
                   ntask_ref, sp_ref, ltask_ref, lsp_ref, stack_ref,
                   lstack_ref, ispare_ref, lspare_ref)

        nc = interleave * P_SUB  # chains (traverse_tiles uses G*P_SUB)
        pl.run_scoped(scoped,
                      pltpu.SMEM((nc,), jnp.int32),
                      pltpu.SMEM((nc,), jnp.int32),
                      pltpu.SMEM((nc,), jnp.int32),
                      pltpu.SMEM((nc,), jnp.int32),
                      pltpu.SMEM((nc * stack_cap,), jnp.int32),
                      pltpu.SMEM((nc * stack_cap,), jnp.int32),
                      pltpu.SMEM((nc,), jnp.int32),
                      pltpu.SMEM((nc,), jnp.int32))

    return kernel_scoped


@functools.partial(
    jax.jit,
    static_argnames=("cfg_static", "interpret", "stack_cap", "n_brute_rows",
                     "n_children", "n_spheres", "n_materials", "profile",
                     "interleave"))
def _render_packets_fused(sc_words, node_pack, tri_pack, pix_pk, pxf_pk, pyf_pk,
                          cam_row, sph_row, mat_rows,
                          cfg_static, interpret=False, stack_cap=STACK_CAP,
                          n_brute_rows=0, n_children=4, n_spheres=1,
                          n_materials=1, profile=False, interleave=1):
    """Launch the fused megakernel over packet chunks. Returns
    (ax, ay, az) each f32[g,8,128] — SUM of per-sample radiance —
    plus a per-lane cost plane when profile=True."""
    cfg_static = dict(cfg_static)  # hashable tuple form → dict
    g = pix_pk.shape[0]
    zero_row = tri_pack.shape[0] - 1
    brute_rows = tuple(range(zero_row - n_brute_rows, zero_row))
    trav_iters = node_pack.shape[0] + (zero_row - n_brute_rows) + 8
    n_out = 5 if profile else 3
    # Odd packet counts fall back to the unpaired loop (the preflight
    # gate is 5 packets); timed 2K chunks are even by construction.
    if interleave == 2 and g % 2:
        interleave = 1

    def launch(args):
        pix_c, pxf_c, pyf_c = args
        gc = pix_c.shape[0]
        return pl.pallas_call(
            _make_mega_kernel(cfg_static, gc, stack_cap, zero_row, brute_rows,
                              trav_iters, n_children, n_spheres, n_materials,
                              profile, interleave),
            in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM)]
            + [pl.BlockSpec(memory_space=pltpu.VMEM)] * 8,
            out_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * n_out,
            out_shape=[jax.ShapeDtypeStruct((gc, P_SUB, P_LANE), jnp.float32)] * n_out,
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=100 * 1024 * 1024),
            interpret=interpret,
        )(sc_words, node_pack, tri_pack, pix_c, pxf_c, pyf_c,
          cam_row, sph_row, mat_rows)

    chunk = MAX_PACKETS_PER_MEGA_CALL
    if g <= chunk:
        return launch((pix_pk, pxf_pk, pyf_pk))
    pad_g = (-g) % chunk
    if pad_g:
        def padp(x):
            return jnp.concatenate([x, jnp.zeros((pad_g,) + x.shape[1:], x.dtype)])

        pix_pk, pxf_pk, pyf_pk = padp(pix_pk), padp(pxf_pk), padp(pyf_pk)
    n_chunks = (g + pad_g) // chunk
    pix_c = pix_pk.reshape((n_chunks, chunk) + pix_pk.shape[1:])
    pxf_c = pxf_pk.reshape((n_chunks, chunk) + pxf_pk.shape[1:])
    pyf_c = pyf_pk.reshape((n_chunks, chunk) + pyf_pk.shape[1:])
    outs = jax.lax.map(launch, (pix_c, pxf_c, pyf_c))
    return tuple(x.reshape((-1,) + x.shape[2:])[:g] for x in outs)


def fused_megakernel_available(scene, n_rays: int) -> bool:
    """True when the fused path-loop kernel can run this scene."""
    return (scene.bvh4 is not None
            and scene.bvh4.face_mat is not None
            and n_rays % PACKET == 0
            and scene.spheres.center.shape[0] <= MAX_SPHERES
            and scene.materials.type.shape[0] <= MAX_MATERIALS)


def render_tiles_fused(scene, cam, cfg, key, px, py, spp=None,
                       sample_offset=0, interpret=None,
                       profile=False, host_chunk_packets=None,
                       interleave=None) -> jnp.ndarray:
    """Mean linear radiance f32[N,3] over spp samples for tile-ordered
    pixels (models/wavefront._tiled_pixel_grid order; N % 1024 == 0).
    Whole integrator in one kernel; RNG = utils/ktf.py, so this equals
    the XLA integrators under cfg.rng_impl='ktf' (fp tolerance).

    `profile=True` returns (rgb, cost, aux): cost f32[N] is the lane's
    sub-warp-chain traversal iterations summed over the whole path loop
    plus its active path iterations (raytracer_tpu/schedule.py); aux
    f32[N] reshaped [g,8,128] holds per packet: row 0 = lockstep
    traversal iterations, row 1 = outer path iterations
    (scripts/kernel_stats.py cost decomposition).

    `host_chunk_packets` splits the frame into SEPARATE device
    dispatches of ~that many packets (async-enqueued, so they overlap;
    measured overhead <2%). The tunnel wedges on multi-second
    dispatches (CLAUDE.md: keep single dispatches under ~2-3 s), so the
    2K bench/flagship pass ~1024 here instead of one 8+ s dispatch."""
    from raytracer_tpu.camera import camera_basis

    if interpret is None:
        try:
            interpret = jax.devices()[0].platform != "tpu"
        except Exception:
            interpret = True
    spp = cfg.spp if spp is None else spp
    n = px.shape[0]
    assert fused_megakernel_available(scene, n)

    pixel_ids = (py * cfg.width + px).astype(jnp.int32)
    g = n // PACKET
    if host_chunk_packets and g > host_chunk_packets and not profile:
        # Balanced equal-size dispatch chunks (pad the tail with packet
        # 0 duplicates; their lanes are sliced off). One compiled shape.
        n_chunks = -(-g // host_chunk_packets)
        chunk = -(-g // n_chunks)
        pad = n_chunks * chunk - g

        def padded(x):
            if not pad:
                return x
            return jnp.concatenate([x, jnp.tile(x[:PACKET], (pad,))])

        pxp, pyp = padded(px), padded(py)
        parts = []
        for i in range(n_chunks):
            lo = i * chunk * PACKET
            parts.append(render_tiles_fused(
                scene, cam, cfg, key,
                pxp[lo:lo + chunk * PACKET], pyp[lo:lo + chunk * PACKET],
                spp=spp, sample_offset=sample_offset, interpret=interpret,
                interleave=interleave))
        return jnp.concatenate(parts)[:n]
    pix_pk = pixel_ids.reshape(g, P_SUB, P_LANE)
    pxf_pk = px.astype(jnp.float32).reshape(g, P_SUB, P_LANE)
    pyf_pk = py.astype(jnp.float32).reshape(g, P_SUB, P_LANE)

    basis = camera_basis(cam)
    cam_row = pack_cam_row(basis, cam.position)
    sph_row = pack_sphere_row(scene.spheres)
    mat_rows = pack_mat_rows(scene.materials)

    bvh4: Bvh4 = scene.bvh4
    fmat = bvh4.face_mat
    node_pack, tri_pack, _, n_brute_rows = _pack_tables_v6(bvh4, fmat)
    stack_cap = bvh4.stack_depth + 4
    assert stack_cap <= STACK_CAP

    k0, k1 = ktf.key_words(key)
    sc_words = jnp.stack([k0, k1, jnp.asarray(sample_offset, jnp.int32),
                          jnp.int32(0)]).reshape(1, 4)

    cfg_static = dict(
        spp=int(spp), width=cfg.width, height=cfg.height,
        max_bounces=cfg.max_bounces, min_bounces=cfg.min_bounces,
        rr_max_prob=cfg.rr_max_prob, t_min=cfg.t_min,
        reference_emission_quirk=cfg.reference_emission_quirk)
    outs = _render_packets_fused(
        sc_words, node_pack, tri_pack, pix_pk, pxf_pk, pyf_pk,
        cam_row, sph_row, mat_rows,
        cfg_static=tuple(sorted(cfg_static.items())), interpret=interpret,
        stack_cap=stack_cap, n_brute_rows=n_brute_rows,
        n_children=int(bvh4.children.shape[1]),
        n_spheres=int(scene.spheres.center.shape[0]),
        n_materials=int(scene.materials.type.shape[0]), profile=profile,
        interleave=_default_interleave() if interleave is None else interleave)
    ax, ay, az = outs[:3]
    inv_spp = np.float32(1.0 / spp)
    rgb = jnp.stack([ax.reshape(-1), ay.reshape(-1), az.reshape(-1)],
                    axis=-1) * inv_spp
    if profile:
        return rgb, outs[3].reshape(-1), outs[4].reshape(-1)
    return rgb
