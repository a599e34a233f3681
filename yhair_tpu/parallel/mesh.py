"""Device-mesh sharding for rendering and inverse rendering.

TPU-native replacement for the reference's CPU thread pool
(`parallel_for` over pixel tiles [U:libs/yocto/yocto_trace.cpp],
SURVEY.md §2.12 parallelism table): the ray batch (pixel x sample) is the
data-parallel axis, sharded over a 1-D mesh with `shard_map`; the scene
and BVH are replicated (hair scenes are far smaller than HBM); hair-
parameter gradients are `psum`-all-reduced across devices inside the
training step so XLA can overlap the reduction with the backward pass.

RNG is counter-based per (pixel, sample) — fold_in of global ids — so a
render is bit-identical for any device count (SURVEY.md §5 checkpoint row,
tested in tests/test_sharding.py).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P

from ..core.camera import Camera, camera_rays
from ..core.rng import n_uniform_dims
from ..core.scene import Scene
from ..integrator import path as jpath

AXIS = "rays"
TILE_W, TILE_H = 16, 8


def tile_pixel_permutation(width, height, tile_w=TILE_W, tile_h=TILE_H):
    """Static pixel ordering that groups rays into screen tiles.

    Ray blocks then cover compact image tiles instead of row strips, which
    tightens the Pallas kernel's per-block cluster lists (measured 2.3x
    fewer cluster visits on the hairball). Returns (perm, inverse) numpy
    index arrays over H*W pixels."""
    if width % tile_w or height % tile_h:
        perm = np.arange(width * height)
        return perm, perm
    pix = np.arange(width * height)
    x, y = pix % width, pix // width
    tile = (y // tile_h) * (width // tile_w) + (x // tile_w)
    within = (y % tile_h) * tile_w + (x % tile_w)
    perm = np.argsort(tile * (tile_w * tile_h) + within, kind="stable")
    inv = np.argsort(perm, kind="stable")
    return perm, inv


def make_mesh(devices=None, axis=AXIS) -> Mesh:
    devices = devices if devices is not None else jax.devices()
    return Mesh(np.asarray(devices), (axis,))


def _key_seed(key):
    """Collapse a jax PRNG key to one uint32 seed word."""
    data = jax.random.key_data(key).astype(jnp.uint32).reshape(-1)
    return (data[0] * jnp.uint32(0x9E3779B1)) ^ data[-1]


def _ray_uniforms(key, pixel_ids, sample_ids, max_depth, dtype):
    """Per-ray uniforms from global (pixel, sample, dim) counters.

    Counter-based hash generator (murmur3-style finalizer over the
    (pixel, sample, dim, seed) tuple) — the reference's per-pixel PCG32
    analogue. A vmapped threefry fold_in was numerically fine but produced
    programs the TPU toolchain took minutes to compile; this is pure
    vectorized uint32 math, compiles instantly, and keeps the same
    contract: reproducible per (pixel, sample) independent of sharding."""
    nd = n_uniform_dims(max_depth)
    seed = _key_seed(key)
    pid = pixel_ids.astype(jnp.uint32)[:, None]
    sid = sample_ids.astype(jnp.uint32)[:, None]
    dim = jnp.arange(nd, dtype=jnp.uint32)[None, :]

    h = (pid * jnp.uint32(0x9E3779B1)
         ^ sid * jnp.uint32(0x85EBCA77)
         ^ dim * jnp.uint32(0xC2B2AE3D)) + seed
    for mult in (0x7FEB352D, 0x846CA68B):
        h = h ^ (h >> jnp.uint32(16))
        h = h * jnp.uint32(mult)
    h = h ^ (h >> jnp.uint32(16))
    # 24 mantissa-safe bits -> [0, 1)
    return (h >> jnp.uint32(8)).astype(dtype) * jnp.asarray(
        1.0 / (1 << 24), dtype)


def _trace_pixels(scene: Scene, cam: Camera, width, height, pixel_ids,
                  sample_ids, key, max_depth, chunk, nearest_segments,
                  sampler="path", edge_softness=0.0):
    """Trace one flat batch of (pixel, sample) rays -> (B, 3) radiance."""
    dt = scene.env.dtype
    u = _ray_uniforms(key, pixel_ids, sample_ids, max_depth, dt)
    i = (pixel_ids % width).astype(dt)
    j = (pixel_ids // width).astype(dt)
    o, d = camera_rays(cam, width, height, i, j, u[:, :4])
    return jpath.trace(scene, o, d, u, max_depth=max_depth, chunk=chunk,
                       nearest_segments=nearest_segments, sampler=sampler,
                       edge_softness=edge_softness)


def render_fn(width, height, spp, max_depth=6, chunk=2048,
              nearest_segments=None, mesh: Mesh | None = None,
              sampler="path", edge_softness=0.0):
    """Build a render function (scene, cam, key) -> (H, W, 3) image.

    With a mesh, the flat ray batch is sharded over AXIS via shard_map;
    without, it runs single-device. Identical results either way.
    """
    n_rays = width * height * spp
    perm, inv = tile_pixel_permutation(width, height)

    def flat_ids():
        pid = jnp.asarray(np.repeat(perm, spp).astype(np.int32))
        sid = jnp.asarray(np.tile(np.arange(spp, dtype=np.int32),
                                  width * height))
        return pid, sid

    def assemble(L):
        pix = L.reshape(-1, spp, 3).mean(1)   # in tile order
        return pix[jnp.asarray(inv)].reshape(height, width, 3)

    def body(scene, cam, key, pixel_ids, sample_ids):
        L = _trace_pixels(scene, cam, width, height, pixel_ids, sample_ids,
                          key, max_depth, chunk, nearest_segments, sampler,
                          edge_softness)
        return L

    if mesh is None:
        def render(scene, cam, key):
            pid, sid = flat_ids()
            return assemble(body(scene, cam, key, pid, sid))
        return render

    n_dev = mesh.devices.size
    if n_rays % n_dev:
        raise ValueError(f"rays {n_rays} not divisible by devices {n_dev}")

    # check_vma=False: Pallas interpret mode emits program_id/loop counters
    # with empty varying-axis sets inside the kernel jaxpr, which the vma
    # checker rejects under shard_map (JAX suggests this exact workaround);
    # semantics are unchanged — out_specs still shard the ray axis.
    sharded = jax.shard_map(
        body, mesh=mesh,
        in_specs=(P(), P(), P(), P(AXIS), P(AXIS)),
        out_specs=P(AXIS), check_vma=False)

    def render(scene, cam, key):
        pid, sid = flat_ids()
        return assemble(sharded(scene, cam, key, pid, sid))

    return render


# valid ranges for the physical hair parameters: gradient steps must not
# leave the model's domain (beta^20 terms explode past 1; negative
# absorption is meaningless) — applied after every optimizer update
PARAM_BOUNDS = {
    "beta_m": (1e-3, 1.0),
    "beta_n": (1e-3, 1.0),
    "alpha": (0.0, 0.2),
    "sigma_a": (0.0, 20.0),
    "eta": (1.0, 2.0),
}


def train_step_fn(width, height, spp, max_depth=6, chunk=2048,
                  nearest_segments=None, mesh: Mesh | None = None,
                  optimizer=None, pixel_batch=None, edge_softness=0.0,
                  sanitize_grads=True, param_bounds=True):
    """Build an inverse-rendering step:
    (params, opt_state, scene, cam, target, key) ->
        (params, opt_state, loss, grads)

    params is a dict of hair-parameter leaves (subset of HairMaterial
    fields). Loss = mean squared error against the target image. Gradients
    are psum'd across the mesh inside the sharded region.

    pixel_batch: optional stochastic minibatching — each step samples
    that many pixels (drawn as whole screen TILES so ray blocks stay
    coherent for the intersection kernel) and descends on the minibatch
    MSE, an unbiased estimate of the full-image loss. This is what makes
    inverse rendering at BASELINE config-5 scale (1024x1024x64spp = 67M
    camera rays per full image) tractable: a 64-step run touches 64
    minibatches instead of 64 full renders. Must be a multiple of the
    tile size (128) and divide width*height.
    """
    import optax

    optimizer = optimizer or optax.adam(5e-2)
    n_rays = width * height * spp

    perm, _inv = tile_pixel_permutation(width, height)
    tile_px = TILE_W * TILE_H
    if pixel_batch is not None:
        if pixel_batch % tile_px or (width * height) % tile_px:
            raise ValueError(f"pixel_batch must be a multiple of "
                             f"{tile_px} and tile the image")
        n_rays = pixel_batch * spp

    def local_loss(params, scene, cam, key, pixel_ids, sample_ids,
                   target_rows):
        """target_rows are per-RAY (each pixel's target repeated spp times,
        rays of one pixel contiguous) so a flat ray shard always contains
        whole pixels and per-pixel sample means stay local."""
        hair = scene.hair._replace(**params)
        sc = scene._replace(hair=hair)
        L = _trace_pixels(sc, cam, width, height, pixel_ids, sample_ids,
                          key, max_depth, chunk, nearest_segments,
                          edge_softness=edge_softness)
        img_pix = L.reshape(-1, spp, 3).mean(1)
        tgt_pix = target_rows.reshape(-1, spp, 3)[:, 0]
        return jnp.mean((img_pix - tgt_pix) ** 2)

    loss_and_grad = jax.value_and_grad(local_loss)

    if mesh is not None:
        n_dev = mesh.devices.size
        if (width * height) % n_dev:
            raise ValueError("pixel count must divide the mesh size")

        def shard_body(params, scene, cam, key, pixel_ids, sample_ids,
                       target_rows):
            loss, grads = loss_and_grad(params, scene, cam, key, pixel_ids,
                                        sample_ids, target_rows)
            # cross-device reduction of the data-parallel gradient; XLA's
            # latency-hiding scheduler overlaps it with the backward pass
            grads = jax.tree.map(lambda g: jax.lax.pmean(g, AXIS), grads)
            return jax.lax.pmean(loss, AXIS), grads

        compute = jax.shard_map(
            shard_body, mesh=mesh,
            in_specs=(P(), P(), P(), P(), P(AXIS), P(AXIS), P(AXIS)),
            out_specs=(P(), P()), check_vma=False)
    else:
        compute = loss_and_grad

    perm_tiles = jnp.asarray(perm.reshape(-1, tile_px).astype(np.int32))

    def step(params, opt_state, scene, cam, target, key):
        if pixel_batch is None:
            pid = jnp.asarray(np.repeat(perm, spp).astype(np.int32))
            sid = jnp.asarray(np.tile(np.arange(spp, dtype=np.int32),
                                      width * height))
        else:
            # whole random tiles keep camera-ray blocks coherent; the
            # key split leaves the trace uniforms (derived from `key`
            # downstream) decorrelated from the tile choice
            tkey = jax.random.fold_in(key, 0x7113)
            tiles = jax.random.choice(tkey, perm_tiles.shape[0],
                                      (pixel_batch // tile_px,),
                                      replace=False)
            pid = jnp.repeat(perm_tiles[tiles].reshape(-1), spp)
            sid = jnp.tile(jnp.arange(spp, dtype=jnp.int32), pixel_batch)
        tgt_rows = target.reshape(-1, 3)[pid]
        loss, grads = compute(params, scene, cam, key, pid, sid, tgt_rows)
        from ..utils import debug
        debug.assert_finite(loss, "train_step loss")
        debug.assert_finite(grads, "train_step grads")
        if sanitize_grads:
            # one degenerate sample in a minibatch must not poison the
            # whole run (standard differentiable-rendering guard; a
            # single inf/NaN component otherwise NaNs Adam's moments
            # permanently). YHAIR_CHECK_FINITE=1 still surfaces the
            # event via the asserts above.
            #
            # Root-caused on the chip (config-5 inverse at spec): the
            # beta_m gradient NaN'd on 5/16 minibatch tiles, but
            # jax_debug_nans' DE-OPTIMIZED re-execution of the exact
            # same tile was CLEAN ("jit optimizations causing the
            # invalid value") — an XLA/Mosaic fusion materializes an
            # inf*0 the unfused program never forms, and only in the
            # 3-parameter backward (the beta_m-only backward of the
            # same rays is finite). Source-level clamps cannot reach a
            # compiler-introduced intermediate, so this guard is the
            # correct fix; the recovery it unblocked is committed in
            # goldens/config5_recovered.json.
            grads = jax.tree.map(
                lambda g: jnp.where(jnp.isfinite(g), g, 0.0), grads)
        updates, opt_state = optimizer.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        if param_bounds:
            params = {k: (jnp.clip(v, *PARAM_BOUNDS[k])
                          if k in PARAM_BOUNDS else v)
                      for k, v in params.items()}
        return params, opt_state, loss, grads

    step.optimizer = optimizer
    return step
