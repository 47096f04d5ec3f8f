"""Densify-event cost inside a real training run (VERDICT r4 task 5,
carried from r3 task 6): time every Trainer.step() over a window of the
30k schedule on the on-disk synthetic COLMAP dataset and report what share
of wall time the densify/prune events (importance replay + compaction +
capacity growth) actually take.

The reference interleaves the same work in its multi-view metrics loop
(src/trainer.ts:373-426); the question here is whether the Pallas
importance replay needs the row-band treatment (TODO.md) — only if events
dominate.  Prints one JSON summary line; also captures an xplane trace
spanning one densify event into /tmp/jaxtrace_densify.
"""

import json
import os
import subprocess
import sys
import time

sys.path.insert(0, ".")

import numpy as np


def main():
    import jax

    from webdgs_tpu.config import enable_compilation_cache
    enable_compilation_cache()

    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    ds = "/tmp/scene1"
    if not os.path.isdir(os.path.join(ds, "sparse")):
        subprocess.run([sys.executable,
                        os.path.join(root, "scripts",
                                     "make_synthetic_colmap.py"),
                        ds, "--views", "48", "--width", "400",
                        "--height", "300"], check=True)

    from webdgs_tpu.io.colmap import load_cameras
    from webdgs_tpu.io.images import load_images, numeric_key
    from webdgs_tpu.io.ply import load_point_cloud
    from webdgs_tpu.train.trainer import Trainer

    scene = load_point_cloud(os.path.join(ds, "sparse/0/points3D.bin"))
    cameras = load_cameras([os.path.join(ds, "sparse/0/images.bin"),
                            os.path.join(ds, "sparse/0/cameras.bin")])
    images = load_images(os.path.join(ds, "images"))
    cameras = sorted(cameras, key=lambda c: numeric_key(c.img_name))
    n = min(len(cameras), len(images))
    trainer = Trainer(scene, cameras[:n], images[:n])

    # run through warmup + a dozen densify events (default schedule:
    # warmup 500, interval 100)
    total_iters = 2000
    warm = 20  # drop compile-heavy first steps from the timing
    step_ms = []          # (iteration, ms, had_event)
    traced = False
    for i in range(total_iters):
        ev_before = trainer.last_densify_iteration
        nxt = trainer.next_densify_iteration()
        do_trace = (not traced and nxt is not None
                    and trainer.iteration + 1 == nxt
                    and trainer.iteration > 600)
        if do_trace:
            jax.profiler.start_trace("/tmp/jaxtrace_densify")
        t0 = time.perf_counter()
        trainer.step()
        # step() is async; sync so the host timer sees the device work
        jax.block_until_ready(trainer.scene.means)
        dt = (time.perf_counter() - t0) * 1e3
        if do_trace:
            jax.profiler.stop_trace()
            traced = True
        had_event = trainer.last_densify_iteration != ev_before
        if i >= warm:
            step_ms.append((trainer.iteration, dt, had_event))

    normal = [ms for _, ms, ev in step_ms if not ev]
    events = [ms for _, ms, ev in step_ms if ev]
    total = sum(ms for _, ms, _ in step_ms)
    # event cost = event-step time minus a normal step's work
    med_normal = float(np.median(normal)) if normal else 0.0
    event_extra = sum(max(ms - med_normal, 0.0) for ms in events)
    # events >50x the median step hit a capacity-rung RECOMPILE (XLA
    # compile, not device work; observed 5-80 s against a slow remote
    # compile service) — report the warm-event stats separately, they are
    # the steady-state cost the reference's metrics loop should be
    # compared against
    warm = [ms for ms in events if ms < 50.0 * max(med_normal, 1.0)]
    warm_extra = sum(max(ms - med_normal, 0.0) for ms in warm)
    warm_total = total - (sum(events) - sum(warm))
    print(json.dumps({
        "warm_events": len(warm),
        "mean_warm_event_step_ms": (round(float(np.mean(warm)), 2)
                                    if warm else None),
        "warm_densify_share_of_wall_pct": round(
            100.0 * warm_extra / max(warm_total, 1e-9), 2),
    }), flush=True)
    print(json.dumps({
        "iters_timed": len(step_ms),
        "events": len(events),
        "points_final": trainer.num_points,
        "median_step_ms": round(med_normal, 2),
        "mean_event_step_ms": (round(float(np.mean(events)), 2)
                               if events else None),
        "max_event_step_ms": (round(float(np.max(events)), 2)
                              if events else None),
        "densify_extra_ms_total": round(event_extra, 1),
        "densify_share_of_wall_pct": round(100.0 * event_extra / total, 2),
        "wall_s": round(total / 1e3, 1),
        "iters_per_sec_incl_events": round(len(step_ms) / (total / 1e3), 1),
    }, ), flush=True)


if __name__ == "__main__":
    main()
