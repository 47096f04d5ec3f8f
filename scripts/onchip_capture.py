"""Opportunistic on-chip capture: wait for the axon tunnel, then run the
round-2 measurement sequence in one process (the tunnel has been flapping;
one process = one init).  Logs to stdout; run under nohup/timeout."""

import subprocess
import sys
import time


def wait_for_tpu(max_wait_s: float) -> bool:
    """Probe with a FRESH subprocess each attempt: a backend init that
    started while the tunnel was down stays wedged even after recovery,
    so in-process waiting can never succeed."""
    deadline = time.time() + max_wait_s
    attempt = 0
    while time.time() < deadline:
        attempt += 1
        try:
            r = subprocess.run(
                [sys.executable, "-c", "import jax; jax.devices()"],
                capture_output=True, timeout=150)
            if r.returncode == 0:
                return True
        except subprocess.TimeoutExpired:
            pass
        print(f"[capture] attempt {attempt}: TPU down, "
              f"{int(deadline - time.time())}s left", flush=True)
        time.sleep(45)
    return False


def precision_check():
    import jax
    import numpy as np
    sys.path.insert(0, "tests")
    from webdgs_tpu.config import RenderSettings
    from webdgs_tpu.core.camera import default_camera
    from webdgs_tpu.ops import binning as binning_ops
    from webdgs_tpu.ops.projection import project_gaussians
    from webdgs_tpu.render.renderer import render
    from test_render_forward import random_scene
    from reference_raster import render_reference

    n, (w, h) = 60, (64, 48)
    scene = random_scene(n, seed=0)
    cam = default_camera(w, h, position=(0.0, 0.0, -5.0))
    for tier in ("bf16x3", "highest"):
        settings = RenderSettings(chunk=128, matmul_precision=tier)
        res = jax.jit(lambda s: render(s, cam, w, h, settings))(scene)
        attrs, aux = project_gaussians(scene.params(), scene.alive, cam,
                                       w, h, scene.sh_deg, settings)
        bins = binning_ops.bin_splats(aux, w, h, settings)
        ntx, nty = binning_ops.tile_grid(w, h, settings)
        np_attrs = {k: np.asarray(v) for k, v in attrs._asdict().items()}
        ref_img, ref_t, ref_nc = render_reference(
            np_attrs, np.asarray(bins.entry_gauss),
            np.asarray(bins.entry_valid), np.asarray(bins.tile_offsets),
            ntx, nty, w, h, settings.tile_w, settings.tile_h)
        img = np.asarray(res.image)
        d = np.abs(img - ref_img)
        dt = np.abs(np.asarray(res.t_final) - ref_t)
        nc = np.asarray(res.n_contrib)
        print(f"[precision] tier={tier}: img max={d.max():.3e} "
              f"mean={d.mean():.3e} | t max={dt.max():.3e} | "
              f"nc mismatch={np.mean(nc != ref_nc):.4f}", flush=True)


def main():
    budget = float(sys.argv[1]) if len(sys.argv) > 1 else 7200.0
    if not wait_for_tpu(budget):
        print("[capture] TPU never came up", flush=True)
        return 2
    print("[capture] TPU is up; running precision check", flush=True)
    t0 = time.time()
    try:
        precision_check()
    except Exception as e:
        print(f"[capture] precision check failed: {e!r}", flush=True)
    print(f"[capture] precision done at +{time.time()-t0:.0f}s; profile",
          flush=True)
    try:
        import scripts.profile_breakdown as pb
        pb.main()
    except Exception as e:
        print(f"[capture] profile failed: {e!r}", flush=True)
    print(f"[capture] profile done at +{time.time()-t0:.0f}s; bench",
          flush=True)
    try:
        import bench
        bench.main()
    except SystemExit as e:
        print(f"[capture] bench exited {e.code}", flush=True)
    except Exception as e:
        print(f"[capture] bench failed: {e!r}", flush=True)
    print(f"[capture] all done at +{time.time()-t0:.0f}s", flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
