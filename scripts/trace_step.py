"""Capture a jax.profiler trace of the bench-shape train step and print the
op-level time breakdown — the fine-grained companion to
scripts/profile_breakdown.py (which times whole jitted stages).

The reference has no equivalent; its only hooks are the live iters/s meter
(src/trainer.ts:648-651) and console buffer-size diagnostics.  Here one chip
window yields a persistent xplane trace that can be re-analyzed offline after
the tunnel drops.

Usage:
    python scripts/trace_step.py [trace_dir]       # capture + analyze
    python scripts/trace_step.py --analyze DIR     # re-analyze a saved trace

Env:
    WEBDGS_TRACE_SCALE=tiny   toy shapes on CPU (plumbing smoke test)
    WEBDGS_TRACE_STEPS=N      steps inside the trace window (default 10)
"""

import collections
import glob
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def analyze(trace_dir: str, top: int = 40) -> None:
    """Parse every .xplane.pb under ``trace_dir`` and print, per device
    plane, the top ops by total self time."""
    from jax.profiler import ProfileData

    paths = sorted(glob.glob(
        os.path.join(trace_dir, "**", "*.xplane.pb"), recursive=True))
    if not paths:
        print(f"no .xplane.pb under {trace_dir}")
        return
    # each capture writes a new timestamped session subdir; re-runs into
    # the same trace_dir (watcher retries) must not mix stale sessions
    # into the breakdown — analyze the NEWEST session only
    newest = max({os.path.dirname(p) for p in paths}, key=os.path.getmtime)
    paths = [p for p in paths if os.path.dirname(p) == newest]
    for path in paths:
        data = ProfileData.from_file(path)
        for plane in data.planes:
            name = plane.name
            # op timelines live on the device plane (TPU: '/device:TPU:N',
            # lines 'XLA Ops'/'XLA Modules') or, on the CPU backend, on the
            # '/host:CPU' threadpool lines; skip pure python planes (they
            # duplicate the jitted-stage timings profile_breakdown collects)
            if not any(k in name for k in ("TPU", "GPU", "/device:",
                                           "/host:CPU")):
                continue
            per_op = collections.Counter()
            calls = collections.Counter()
            total = 0
            for line in plane.lines:
                if line.name == "python":
                    continue
                for ev in line.events:
                    # 'end: <op>' pairs and threadpool listener callbacks
                    # are markers, not op self time
                    if (ev.name.startswith("end:") or "Listener" in ev.name
                            or "ThunkExecutor" in ev.name):
                        continue
                    dur = ev.duration_ns
                    per_op[ev.name] += dur
                    calls[ev.name] += 1
                    total += dur
            if not per_op:
                continue
            print(f"\n== plane: {name}  ({os.path.basename(path)}; "
                  f"{total/1e6:.2f} ms total across lines) ==")
            for op, ns in per_op.most_common(top):
                print(f"{ns/1e6:9.3f} ms  x{calls[op]:<5d} {op[:110]}")


def capture(trace_dir: str) -> None:
    import numpy as np

    import jax

    tiny = os.environ.get("WEBDGS_TRACE_SCALE") == "tiny"
    if tiny:
        jax.config.update("jax_platforms", "cpu")
    from webdgs_tpu.config import enable_compilation_cache
    enable_compilation_cache()

    import functools

    from webdgs_tpu.config import RenderSettings
    from webdgs_tpu.core.camera import default_camera
    from webdgs_tpu.core.scene import scene_from_arrays
    from webdgs_tpu.ops.adam import init_adam_state
    from webdgs_tpu.render.renderer import render
    from webdgs_tpu.train.step import train_step

    n = 2_000 if tiny else 100_000
    w, h = (128, 96) if tiny else (800, 600)
    rng = np.random.default_rng(0)
    quats = rng.normal(0, 1, (n, 4)).astype(np.float32)
    quats /= np.linalg.norm(quats, axis=1, keepdims=True)
    scene = scene_from_arrays(
        rng.normal(0, 1.5, (n, 3)).astype(np.float32), quats=quats,
        log_scales=rng.uniform(-4.5, -2.5, (n, 3)).astype(np.float32),
        opacity_logits=rng.uniform(-1, 3, (n,)).astype(np.float32),
        colors=rng.uniform(0, 1, (n, 3)).astype(np.float32))
    settings = RenderSettings(chunk=128)
    cam = default_camera(w, h, position=(0.0, 0.0, -8.0))
    # jitted, not eager: an eager render/train_step dispatches hundreds of
    # per-op TPU programs — ~20 min of compiles when the cache is cold
    # (the round-5 bench.py lesson)
    target = jax.jit(lambda sc: render(sc, cam, w, h, settings).image)(scene)
    opt = init_adam_state(scene.params())
    # entry capacity exactly like bench.py: 1.2x the observed (post-cull)
    # per-frame entry demand, so the trace ranks the ops the bench runs
    probe = jax.jit(functools.partial(train_step, img_w=w, img_h=h,
                                      settings=settings))
    _, _, m0 = probe(scene, opt, cam, target)
    observed = float(m0["tile_entries"])
    cap = max(-int(-observed * 1.2 // settings.chunk) * settings.chunk,
              settings.chunk * 8)
    print(f"entry demand {observed:.0f} -> capacity {cap}")

    @functools.partial(jax.jit, donate_argnums=(0, 1))
    def step(s, o):
        return train_step(s, o, cam, target, img_w=w, img_h=h,
                          settings=settings, entry_capacity=cap)

    s, o, _ = step(scene, opt)  # compile outside the trace window
    jax.block_until_ready(s.means)

    steps = int(os.environ.get("WEBDGS_TRACE_STEPS", "10"))
    with jax.profiler.trace(trace_dir):
        for _ in range(steps):
            s, o, _ = step(s, o)
        jax.block_until_ready(s.means)
    print(f"trace written to {trace_dir} ({steps} steps)")


def main():
    args = sys.argv[1:]
    if args and args[0] == "--analyze":
        analyze(args[1] if len(args) > 1 else "/tmp/jaxtrace_r3")
        return
    trace_dir = args[0] if args else "/tmp/jaxtrace_r3"
    capture(trace_dir)
    analyze(trace_dir)


if __name__ == "__main__":
    main()
