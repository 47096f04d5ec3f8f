"""grad_rows_f16 quality delta (VERDICT r4 task 3): the round-4 gradient
path gathers the per-entry gradient rows in f16 by default
(RenderSettings.grad_rows_f16, ops/rasterize.py) — a new precision class
in the backward pass that has never been quality-confirmed.  Train the
800x600 synthetic COLMAP scene twice over a 10k-iteration schedule
(densify on), identical seeds, f16 vs f32 rows, and report train/holdout
PSNR/SSIM for both.  One JSON line per variant.
"""

import dataclasses
import json
import os
import subprocess
import sys

sys.path.insert(0, ".")


def main():
    from webdgs_tpu.config import DEFAULT_SETTINGS, enable_compilation_cache
    enable_compilation_cache()

    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    ds = "/tmp/scene8"
    if not os.path.isdir(os.path.join(ds, "sparse")):
        subprocess.run([sys.executable,
                        os.path.join(root, "scripts",
                                     "make_synthetic_colmap.py"),
                        ds, "--views", "48", "--width", "800",
                        "--height", "600"], check=True)

    from webdgs_tpu.io.colmap import load_cameras
    from webdgs_tpu.io.images import load_images, numeric_key
    from webdgs_tpu.io.ply import load_point_cloud
    from webdgs_tpu.train.config import TrainerConfig
    from webdgs_tpu.train.trainer import Trainer

    cameras = load_cameras([os.path.join(ds, "sparse/0/images.bin"),
                            os.path.join(ds, "sparse/0/cameras.bin")])
    images = load_images(os.path.join(ds, "images"))
    cameras = sorted(cameras, key=lambda c: numeric_key(c.img_name))
    n = min(len(cameras), len(images))
    cameras, images = cameras[:n], images[:n]
    hold_c = [c for i, c in enumerate(cameras) if i % 8 == 0]
    hold_i = [m for i, m in enumerate(images) if i % 8 == 0]
    train_c = [c for i, c in enumerate(cameras) if i % 8 != 0]
    train_i = [m for i, m in enumerate(images) if i % 8 != 0]

    iters = int(os.environ.get("WEBDGS_F16_ITERS", "10000"))
    for f16 in (True, False):
        scene = load_point_cloud(os.path.join(ds, "sparse/0/points3D.bin"))
        settings = dataclasses.replace(DEFAULT_SETTINGS, grad_rows_f16=f16)
        tr = Trainer(scene, train_c, train_i,
                     TrainerConfig(max_iterations=iters), settings)
        tr.train(num_iterations=iters, log_every=2000)
        rep = {"grad_rows_f16": f16, "iterations": iters,
               "points": tr.num_points,
               "iters_per_sec": round(tr.iters_per_sec, 1)}
        rep["train"] = {k: (round(float(v), 4) if not isinstance(v, int)
                            else v)
                        for k, v in tr.evaluate(max_views=8).items()}
        rep["holdout"] = {k: round(float(v), 4) if not isinstance(v, int)
                          else v
                          for k, v in tr.evaluate(
                              views=(hold_c, hold_i)).items()}
        print(json.dumps(rep), flush=True)


if __name__ == "__main__":
    main()
