"""Contact shadows: screen-space ray march toward the light.

Port of the Tiny Glade / kajiya hybrid-root-finder technique as used in
gltf.frag:114-363 (upstream: the vendored raymarch.hlsl): 8 jittered linear
steps + 4 bisection steps against the scene depth buffer, sampled with BOTH
bilinear and nearest filters (the dual-sampler trick that rejects
stair-step and shrink-wrap artifacts, gltf.frag:143-169).

The loop is batch-parallel over pixels — exactly the shape TPUs like; the
sequential `break` in the shader becomes a carried `intersected` mask.

Depth source: the reference binds the depth buffer of swapchain image 0 and
never updates that descriptor (gltf_renderer.rs:408-416), so it effectively
ray-marches against a *stale* depth buffer from a previous frame. We define
this cleanly: the previous frame's depth is carried state (prev_depth in
the frame state), giving the same one-frame-lagged behavior without the
race.

Depth linearization: the reference approximates linear depth as
1/ndc_depth (gltf.frag:159-160, 270) — a reverse-Z-ism left over from the
kajiya source that, fed with a VALID standard-Z depth buffer, makes every
surface "hit" immediately (the whole ground darkens ~15% and the model
fully self-shadows; in the reference build the artifact is masked because
the bound depth image is in an un-sampleable layout). We implement the
algorithm's documented intent instead: exact view-space linearization
d = near*far / (far - z*(far-near)) (the formula in gltf.frag:132-139's
own comment), with the depth-thickness test in real world units.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..ops.sampling import quad_pack, sample_depth_dual_packed
from .shadow_filter import interleaved_gradient_noise
from .uniforms import FrameUniforms

LINEAR_STEPS = 8        # gltf.frag:345
BISECTION_STEPS = 4     # gltf.frag:346
TRACE_DISTANCE = 0.5    # gltf.frag:335
DEPTH_THICKNESS = 0.05  # gltf.frag:347
MAX_DARKNESS = 0.8      # gltf.frag:359


def _smoothstep(e0, e1, x):
    t = jnp.clip((x - e0) / (e1 - e0), 0.0, 1.0)
    return t * t * (3.0 - 2.0 * t)


NEAR = 0.1     # the actual projection planes (gltf_renderer.rs:1818) —
FAR = 100.0    # NOT getLinearDepth's stale 1000 constant (gltf.frag:137)


def _linearize(ndc_z):
    """Exact view-space depth from standard-Z NDC depth
    (gltf.frag:132-139's documented formula)."""
    denom = jnp.maximum(FAR - ndc_z * (FAR - NEAR), 1e-3)
    return NEAR * FAR / denom


def _sample_depth_dual(depth_packed, uv):
    """gltf.frag:150-169: linearized depth from both filter modes,
    max for hit detection, min for penetration. depth_packed is the
    quad-packed (H, W, 4) depth buffer — one gathered row yields BOTH the
    bilinear and nearest reads (the reference needs two sampler binds;
    we need one row fetch)."""
    raw_linear, raw_nearest = sample_depth_dual_packed(depth_packed, uv)
    d_lin = _linearize(raw_linear)
    d_nst = _linearize(raw_nearest)
    return jnp.maximum(d_lin, d_nst), jnp.minimum(d_lin, d_nst)


def compute_contact_shadow(world: jnp.ndarray, normal: jnp.ndarray,
                           uni: FrameUniforms, prev_depth: jnp.ndarray,
                           y0=0) -> jnp.ndarray:
    """gltf.frag:324-363. Returns (h, W) shadow factor in [0, 1] for the
    row slab at global row y0; prev_depth is always full-frame (rays can
    cross slab boundaries)."""
    h, w = world.shape[:2]
    # barrier: keep the packing rolls out of the probes' gather fusions
    depth_packed = jax.lax.optimization_barrier(quad_pack(prev_depth))
    light_dir = uni.light_dir

    n_dot_l = jnp.sum(normal * light_dir, axis=-1)
    facing = n_dot_l > 0.0

    start = world + normal * 0.01                      # gltf.frag:332
    end = start + light_dir * TRACE_DISTANCE

    vp = uni.proj @ uni.view
    ones = jnp.ones((h, w, 1), jnp.float32)

    def to_cs(p):
        clip = jnp.einsum("ij,hwj->hwi",
                          vp, jnp.concatenate([p, ones], axis=-1))
        return clip[..., :3] / jnp.where(
            jnp.abs(clip[..., 3:4]) > 1e-12, clip[..., 3:4], 1e-12)

    start_cs = to_cs(start)
    end_cs = to_cs(end)
    ray_dir = end_cs - start_cs

    # Slab-clip the ray to NDC bounds: XY to [-1,1], Z to [0,1]
    # (gltf.frag:209-236).
    t_min = jnp.zeros((h, w), jnp.float32)
    t_max = jnp.ones((h, w), jnp.float32)
    for axis, lo, hi in ((0, -1.0, 1.0), (1, -1.0, 1.0), (2, 0.0, 1.0)):
        d = ray_dir[..., axis]
        s = start_cs[..., axis]
        safe_d = jnp.where(jnp.abs(d) > 1e-4, d, 1.0)
        t1 = (lo - s) / safe_d
        t2 = (hi - s) / safe_d
        t_lo = jnp.minimum(t1, t2)
        t_hi = jnp.maximum(t1, t2)
        moving = jnp.abs(d) > 1e-4
        t_min = jnp.where(moving, jnp.maximum(t_min, t_lo), t_min)
        t_max = jnp.where(moving, jnp.minimum(t_max, t_hi), t_max)

    on_screen = t_min < t_max

    march_start = start_cs + ray_dir * t_min[..., None]
    march_dir = (start_cs + ray_dir * t_max[..., None]) - march_start

    # Jitter (gltf.frag:338): IGN of fragCoord + frame offset.
    frame = uni.debug_flags[3]
    frag_x = jnp.broadcast_to(
        jnp.arange(w, dtype=jnp.float32)[None, :] + 0.5, (h, w))
    frag_y = jnp.broadcast_to(
        jnp.arange(h, dtype=jnp.float32)[:, None] + 0.5
        + jnp.asarray(y0, jnp.float32), (h, w))
    jitter = interleaved_gradient_noise(jnp.stack(
        [frag_x + frame * 13.37, frag_y + frame * 17.17], axis=-1))

    min_t = jnp.zeros((h, w), jnp.float32)
    max_t = jnp.ones((h, w), jnp.float32)
    intersected = jnp.zeros((h, w), bool)
    last_pen = jnp.zeros((h, w), jnp.float32)

    def probe(t):
        """Sample along the ray at parameter t: returns
        (hit_condition, penetration, uv_in_bounds)."""
        cs = march_start + march_dir * t[..., None]
        uv = cs[..., :2] * 0.5 + 0.5
        inb = ((uv[..., 0] >= 0.0) & (uv[..., 0] <= 1.0)
               & (uv[..., 1] >= 0.0) & (uv[..., 1] <= 1.0))
        d_max, d_min = _sample_depth_dual(depth_packed, uv)
        ray_depth = _linearize(cs[..., 2])
        # ray behind the surface (farther than stored depth) => occluded
        distance = d_max - ray_depth
        penetration = ray_depth - d_min
        valid = penetration < DEPTH_THICKNESS
        return (distance < 0.0) & valid, penetration, inb

    # Linear phase with first-hit semantics (gltf.frag:253-290).
    for step in range(LINEAR_STEPS):
        t = (step + jitter) / LINEAR_STEPS
        hit, pen, inb = probe(t)
        active = ~intersected & inb        # `continue` skips oob samples
        new_hit = active & hit
        max_t = jnp.where(new_hit, t, max_t)
        last_pen = jnp.where(new_hit, pen, last_pen)
        min_t = jnp.where(active & ~hit, t, min_t)
        intersected = intersected | new_hit

    # Bisection refinement (gltf.frag:293-312).
    for _ in range(BISECTION_STEPS):
        mid = 0.5 * (min_t + max_t)
        hit, pen, _ = probe(mid)
        go = intersected
        max_t = jnp.where(go & hit, mid, max_t)
        last_pen = jnp.where(go & hit, pen, last_pen)
        min_t = jnp.where(go & ~hit, mid, min_t)

    hit_final = intersected & on_screen & facing

    # Soft falloff (gltf.frag:351-362).
    strength = 1.0 - _smoothstep(0.0, 0.5, max_t)
    pen_fade = 1.0 - _smoothstep(0.0, DEPTH_THICKNESS, last_pen)
    shadowed = 1.0 - strength * pen_fade * MAX_DARKNESS
    return jnp.where(hit_final, shadowed, 1.0)
