"""THE rasterizer measurement harness: named experiments over one scene.

Consolidates the round-2/3 one-off probes (perf_r3{,b,c}, perf_probe,
perf_ops2, perf_sortprobe, perf_cumstages, perf_ab*, perf_stages,
perf_tiered — VERDICT r3 item 9) into one discoverable surface. Every
opt-in knob on main has a variant here, so "measure, then default-on or
delete" can run as one chip session.

Usage:
    python scripts/perf_matrix.py variants [name ...]   # end-to-end A/B
    python scripts/perf_matrix.py stages                # cumulative stages
    python scripts/perf_matrix.py fwd                   # forward-only A/B

Run ONE process at a time on the chip (memory: tpu-tunnel-wedge). Each
variant asserts zero overflow and checks image parity vs the default
before timing, so recorded numbers are for correct configurations only.
"""
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parent.parent))

import jax

jax.config.update("jax_compilation_cache_dir", str(Path(__file__).parent.parent / ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp
import numpy as np

from bench import build_scene
from riggs_tpu.camera import make_camera

N = 100_000
SIZE = 800
MAX_PER_TILE = 640
ITERS = 20

# measured-best ladder for the bench scene's sorted-count curve (625 tiles)
LADDER = ((64, 640), (128, 512), (192, 384), (241, 256))
TIER4 = dict(max_tiles_per_gaussian=4, mid_cap=8192, mid_side=4)

# name -> (render kwargs, module flags {(module, attr): value})
VARIANTS = {
    "plain": (dict(), {}),
    "tier4": (dict(**TIER4), {}),
    "ladder": (dict(tile_ladder=LADDER), {}),
    "default": (dict(tile_ladder=LADDER, **TIER4), {}),  # bench.py default
    # round-4 chip A/Bs (decided & deleted): struct-bwd 33.8 ms, packed-sort
    # 25.4 ms (both regressions vs default 21.4); gm 21.3 ms (now the
    # unconditional ladder layout). Remaining live knobs:
    "default+bwd256": (
        dict(tile_ladder=LADDER, **TIER4),
        {("pallas_blend", "BWD_CHUNK"): 256},
    ),
    "default+bwd384": (
        dict(tile_ladder=LADDER, **TIER4),
        {("pallas_blend", "BWD_CHUNK"): 384},
    ),
}


def _mod(name):
    import riggs_tpu.render.binning as binning
    import riggs_tpu.render.pallas_blend as pallas_blend
    import riggs_tpu.render.tiles as tiles

    return {"binning": binning, "pallas_blend": pallas_blend, "tiles": tiles}[name]


def _set_flags(flags):
    saved = {}
    for (m, a), v in flags.items():
        saved[(m, a)] = getattr(_mod(m), a)
        setattr(_mod(m), a, v)
    return saved


def _scene():
    cam = make_camera(np.eye(3), np.array([0, 0, 2.5]), SIZE, SIZE, fovx=0.9, fovy=0.9)
    return cam, build_scene(N), jnp.zeros(3)


def timed(fn, *args, iters=ITERS, warmup=None):
    t0 = time.time()
    out = fn(*args)
    jax.block_until_ready(out)
    comp = time.time() - t0
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / iters * 1e3, comp


def run_variants(names=None, fwd_only=False):
    from riggs_tpu.render.tiles import rasterize_tiled

    cam, (means, colors, opacity, scales, rots), bg = _scene()
    ref_img = None
    rows = []
    for name in names or VARIANTS:
        kw, flags = VARIANTS[name]
        saved = _set_flags(flags)
        try:
            out = _check_and_time(
                name, kw, rasterize_tiled, cam, means, colors, opacity, scales,
                rots, bg, ref_img, rows, fwd_only,
            )
            if ref_img is None:
                ref_img = out
        except AssertionError as e:  # record and keep measuring the rest
            print(f"{name:24s}: FAILED {e}", flush=True)
        finally:
            _set_flags(saved)
    return rows


def _check_and_time(name, kw, rasterize_tiled, cam, means, colors, opacity,
                    scales, rots, bg, ref_img, rows, fwd_only):
    """Parity-check one variant vs the reference image, then time it.

    Returns the variant's image (the first call establishes the reference).
    Raises AssertionError on overflow or divergence — caller records and
    continues with the remaining variants.
    """
    out = rasterize_tiled(
        cam, means, colors, opacity, scales, rots, bg,
        max_per_tile=MAX_PER_TILE, **kw,
    )
    ov = int(out["overflow"])
    assert ov == 0, f"overflow {ov} — not a valid timing config"
    img = np.asarray(out["image"])
    if ref_img is not None:
        err = float(np.abs(img - ref_img).max())
        assert err < 1e-3, f"image diverges from reference by {err}"

    if fwd_only:
        step = jax.jit(
            lambda m, c, o, s, r: rasterize_tiled(
                cam, m, c, o, s, r, bg, max_per_tile=MAX_PER_TILE, **kw
            )["image"]
        )
    else:
        def loss_fn(m, c, o, s, r):
            res = rasterize_tiled(
                cam, m, c, o, s, r, bg, max_per_tile=MAX_PER_TILE, **kw
            )
            return jnp.mean(res["image"])

        step = jax.jit(jax.grad(loss_fn, argnums=(0, 1, 2, 3, 4)))
    ms, comp = timed(step, means, colors, opacity, scales, rots)
    mpix = SIZE * SIZE / ms / 1e3
    print(f"{name:24s}: {ms:7.2f} ms  {mpix:6.1f} Mpix/s  (compile {comp:.0f}s)", flush=True)
    rows.append((name, ms))
    return img


def run_stages():
    """Cumulative pipeline prefixes; successive differences = stage costs."""
    from riggs_tpu.render.binning import bin_gaussians_sorted
    from riggs_tpu.render.project import build_cov3d_packed, project_gaussians
    from riggs_tpu.render.tiles import rasterize_tiled

    cam, (means, colors, opacity, scales, rots), bg = _scene()

    def s_proj(m, c, o, s, r):
        proj = project_gaussians(cam, m, build_cov3d_packed(s, r))
        return jnp.sum(proj.mean2d) + jnp.sum(proj.conic) + jnp.sum(proj.depth)

    def _bins(m, o, s, r):
        proj = project_gaussians(cam, m, build_cov3d_packed(s, r))
        op_cull = jax.lax.stop_gradient(jnp.where(proj.mask, o, 0.0))
        return proj, bin_gaussians_sorted(
            proj, SIZE, SIZE, max_per_tile=MAX_PER_TILE, opacity=op_cull, **TIER4
        )

    def s_bin(m, c, o, s, r):
        proj, bins = _bins(m, o, s, r)
        return jnp.sum(proj.depth) + jnp.sum(bins.idx) * 0.0 + jnp.sum(bins.count) * 0.0

    def s_gather(m, c, o, s, r):
        proj, bins = _bins(m, o, s, r)
        packed = jnp.concatenate(
            [proj.mean2d, proj.conic, jnp.where(proj.mask, o, 0.0)[:, None], c,
             proj.depth[:, None]], axis=-1,
        )
        return jnp.sum(packed[bins.idx])

    def s_full(m, c, o, s, r):
        out = rasterize_tiled(
            cam, m, c, o, s, r, bg, max_per_tile=MAX_PER_TILE,
            tile_ladder=LADDER, **TIER4,
        )
        return jnp.mean(out["image"])

    a = (means, colors, opacity, scales, rots)
    for tag, f in [("proj", s_proj), ("+binning", s_bin), ("+gather", s_gather),
                   ("full (default)", s_full)]:
        ms, comp = timed(jax.jit(jax.grad(f, argnums=(0, 1, 2, 3, 4))), *a)
        print(f"{tag:24s}: {ms:7.2f} ms fwd+bwd  (compile {comp:.0f}s)", flush=True)


def _stage1_setup(capacity, size, node_num, n_init):
    """A refpoint-shaped stage-1 state + frame WITHOUT the expensive scene
    build: the step cost is content-independent, so random clouds and a
    random GT image time identically to the biped scene (232 s saved)."""
    from riggs_tpu.data.dataset import Frame, SceneData
    from riggs_tpu.train import stage1 as S1
    from riggs_tpu.train.config import Config

    rng = np.random.default_rng(0)
    pts = rng.uniform(-1, 1, (n_init, 3)).astype(np.float32)
    cols = rng.uniform(0, 1, (n_init, 3)).astype(np.float32)
    scene = SceneData(
        train_frames=[], test_frames=[], init_points=pts, init_colors=cols,
        cameras_extent=2.0,
    )
    cfg = Config()
    cfg.model.capacity = capacity
    cfg.model.node_num = node_num
    cfg.pipe.max_per_tile = 768
    state = S1.init_stage1(jax.random.PRNGKey(0), scene, cfg)
    cam = make_camera(np.eye(3), np.array([0, 0, 2.5]), size, size, fovx=0.9, fovy=0.9)
    P = 1024
    frame = Frame(
        cam=cam,
        image=jnp.asarray(rng.uniform(0, 1, (size, size, 3)).astype(np.float32)),
        alpha_mask=jnp.zeros((size, size)),
        thinned=jnp.asarray(rng.uniform(0, size, (P, 2)).astype(np.float32)),
        thinned_mask=jnp.ones(P, bool),
    )
    return state, frame, cfg


def run_step(small=False):
    """Decompose the FULL stage-1 phase-B train step (VERDICT r4 item 2).

    The round-4 refpoint run measured 182.74 ms/iter steady at 800²/131k vs
    20.75 ms rasterizer fwd+bwd — this experiment names where the other
    ~160 ms go, separating device compute (loss prefixes, adam) from
    host-loop overhead (per-step lr puts, key splits, the overflow sync) on
    the tunneled chip, where every host<->device interaction costs ~25-35 ms.
    Reference step: /root/reference/train_gui.py:1000-1207.
    """
    import dataclasses

    from riggs_tpu.camera.camera import project_nodes_2d
    from riggs_tpu.models import gaussians as G
    from riggs_tpu.models import node_warp as NW
    from riggs_tpu.ops.knn import chamfer_distance
    from riggs_tpu.render.api import render
    from riggs_tpu.train import losses as L
    from riggs_tpu.train import optim as O
    from riggs_tpu.train import stage1 as S1

    capacity, size, nodes, ninit = (
        (4096, 128, 64, 2048) if small else (131_072, 800, 512, 60_000)
    )
    state, frame, cfg = _stage1_setup(capacity, size, nodes, ninit)
    bg = jnp.zeros(3)
    gauss_lrs, warp_lrs = S1.stage1_lr_fns(cfg)
    lrs_gs = S1._to_device_lrs(gauss_lrs(1000))
    lrs_warp = S1._to_device_lrs(warp_lrs(1000))
    key = jax.random.PRNGKey(1)
    lam = jnp.float32(0.1)
    mpt = cfg.pipe.max_per_tile
    pp = cfg.pipe
    tiers = (pp.max_tiles_per_gaussian, pp.mid_cap, pp.mid_side)
    kw = dict(
        lambda_chamfer=1e-3, warm=False, active_sh=3, use_chamfer=True,
        use_motion_loss=False, use_flow_loss=False, lambda_dssim=0.2,
        max_per_tile=mpt, isotropic=False, tile_ladder=None, tiers=tiers,
    )

    # ---- cumulative loss prefixes (device compute) ----------------------
    params = {"gs": state.gs.params_dict(), "warp": state.warp.params_dict()}

    def _warp(p):
        warp = state.warp.replace_params(p["warp"])
        gs = state.gs.replace_params(p["gs"])
        d = NW.warp_forward(
            warp, jax.lax.stop_gradient(gs.xyz), frame.fid, gs.feature,
            gs.motion_mask, local_frame=warp.net.local_frame,
        )
        return d, gs, warp

    def l_warp(p):
        d, _, _ = _warp(p)
        return jnp.sum(d["d_xyz"]) + jnp.sum(d["d_rotation"])

    def _render(p):
        d, gs, warp = _warp(p)
        from riggs_tpu.render.api import tier_kwargs

        out = render(
            frame.cam, gs, bg, d_xyz=d["d_xyz"], d_rotation=d["d_rotation"],
            d_scaling=jnp.zeros_like(d["d_scaling"]), active_sh_degree=3,
            max_per_tile=mpt, **tier_kwargs(tiers),
        )
        return d, warp, out

    def l_render_l1(p):
        _, _, out = _render(p)
        return L.l1_loss(out["render"], frame.image)

    def l_render_ssim(p):
        _, _, out = _render(p)
        return L.photometric_loss(out["render"], frame.image, 0.2)

    def l_arap(p):
        d, warp, out = _render(p)
        return L.photometric_loss(out["render"], frame.image, 0.2) + 0.1 * NW.arap_loss(warp, key)

    def l_full(p):
        d, warp, out = _render(p)
        loss = L.photometric_loss(out["render"], frame.image, 0.2)
        loss = loss + 0.1 * NW.arap_loss(warp, key)
        proj = project_nodes_2d(frame.cam, d["d_nodes"])
        loss = loss + 1e-3 * chamfer_distance(
            proj, frame.thinned, y_mask=frame.thinned_mask, norm=1
        )
        return loss

    for tag, f in [
        ("warp fwd+bwd", l_warp),
        ("+render+L1", l_render_l1),
        ("+ssim", l_render_ssim),
        ("+arap", l_arap),
        ("+chamfer (full loss)", l_full),
    ]:
        ms, comp = timed(jax.jit(jax.grad(f)), params, iters=10)
        print(f"{tag:24s}: {ms:7.2f} ms  (compile {comp:.0f}s)", flush=True)

    # ---- adam + densify-stats (the step's non-loss device work) ---------
    def opt_only(p):
        g1, o1 = O.adam_update(p["gs"], state.opt_gs, p["gs"], lrs_gs)
        g2, o2 = O.adam_update(p["warp"], state.opt_warp, p["warp"], lrs_warp)
        return g1, o1, g2, o2

    ms, comp = timed(jax.jit(opt_only), params, iters=10)
    print(f"{'adam (gs+warp)':24s}: {ms:7.2f} ms  (compile {comp:.0f}s)", flush=True)

    # ---- the jitted step: pipelined vs synced vs host-loop --------------
    def step(st, k):
        return S1.phase_b_step(st, frame, bg, lrs_gs, lrs_warp, k, lam, lam, **kw)

    t0 = time.time()
    st, mets = step(state, key)
    jax.block_until_ready(st)
    print(f"{'step compile':24s}: {time.time() - t0:7.1f} s", flush=True)
    try:
        ma = S1.phase_b_step.lower(
            state, frame, bg, lrs_gs, lrs_warp, key, lam, lam, **kw
        ).compile().memory_analysis()
        print(
            f"{'step peak memory':24s}: {ma.peak_memory_in_bytes / 2**30:7.2f} GB "
            f"(args {ma.argument_size_in_bytes / 2**30:.2f} GB, "
            f"temps {ma.temp_size_in_bytes / 2**30:.2f} GB)",
            flush=True,
        )
    except Exception as e:  # pragma: no cover - informational
        print(f"step memory_analysis unavailable: {e}", flush=True)

    n = 4 if small else 15
    st = state
    t0 = time.perf_counter()
    for _ in range(n):
        st, mets = step(st, key)
    jax.block_until_ready(st)
    print(f"{'step piped (device)':24s}: {(time.perf_counter() - t0) / n * 1e3:7.2f} ms", flush=True)

    t0 = time.perf_counter()
    for _ in range(n):
        st2, mets = step(state, key)
        jax.block_until_ready(st2)
    print(f"{'step synced':24s}: {(time.perf_counter() - t0) / n * 1e3:7.2f} ms", flush=True)

    # emulate the round-4 host loop exactly: fresh lr puts, a key split,
    # traced lambda puts and the every-step overflow int() sync
    t0 = time.perf_counter()
    k = key
    for it in range(n):
        lr1 = S1._to_device_lrs(gauss_lrs(it))
        lr2 = S1._to_device_lrs(warp_lrs(it))
        k, sk = jax.random.split(k)
        st2, mets = S1.phase_b_step(
            st, frame, bg, lr1, lr2, sk, jnp.asarray(0.1, jnp.float32),
            jnp.asarray(0.1, jnp.float32), **kw
        )
        _ = int(mets["overflow_tiles"])
    print(f"{'step hostloop (as r4)':24s}: {(time.perf_counter() - t0) / n * 1e3:7.2f} ms", flush=True)

    # the round-5 auto loop as train_stage1 now runs it: on-device schedules
    # (state.it), split-chain keys, overflow read one step delayed
    import dataclasses as dc

    step_auto = S1.make_phase_b_auto(cfg)
    kwa = dict(
        use_chamfer=True, use_motion_loss=False, use_flow_loss=False,
        lambda_dssim=0.2, max_per_tile=mpt, isotropic=False, tile_ladder=None,
    )
    cur = dc.replace(state, it=jnp.zeros((), jnp.int32))
    t0 = time.time()
    st2, mets = step_auto(cur, frame, bg, key, **kwa)
    jax.block_until_ready(st2)
    print(f"{'auto step compile':24s}: {time.time() - t0:7.1f} s", flush=True)
    prev_m = None
    k = key
    t0 = time.perf_counter()
    for it in range(n):
        k, sk = jax.random.split(k)
        cur, mets = step_auto(cur, frame, bg, sk, **kwa)
        if prev_m is not None:
            _ = int(prev_m["overflow_tiles"])
        prev_m = mets
    jax.block_until_ready(cur)
    print(f"{'step autoloop (r5)':24s}: {(time.perf_counter() - t0) / n * 1e3:7.2f} ms", flush=True)


def main():
    what = sys.argv[1] if len(sys.argv) > 1 else "variants"
    if what == "variants":
        run_variants(sys.argv[2:] or None)
    elif what == "fwd":
        run_variants(sys.argv[2:] or None, fwd_only=True)
    elif what == "stages":
        run_stages()
    elif what == "step":
        run_step(small="small" in sys.argv[2:])
    else:
        raise SystemExit(f"unknown experiment {what!r}; use variants|fwd|stages|step")


if __name__ == "__main__":
    main()
