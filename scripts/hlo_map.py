"""Map the train step's hot compiled-HLO ops (as named in trace_step.py's
breakdown) back to jax source: dump the TPU-compiled HLO of the exact
trace_step shape and print each requested op with its op_name metadata and
source file:line.

Usage:
    python scripts/hlo_map.py [op-name-substring ...]
        (defaults to the usual suspects from the trace breakdown)
"""

import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

DEFAULT_OPS = [
    "%fusion ", "%fusion.1 ", "%fusion.2 ", "%fusion.3 ", "%fusion.4 ",
    "%fusion.5 ", "%fusion.6 ", "%fusion.171 ", "%slice_reduce_fusion.1 ",
    "%select_bitcast_fusion.1 ", "%copy.91 ", "%copy.96 ", "%copy.97 ",
    "%sort.0 ", "%sort.2 ", "%sort.3 ", "%copy-start.4 ",
]


def main():
    import functools

    import numpy as np
    import jax

    from webdgs_tpu.config import RenderSettings, enable_compilation_cache
    from webdgs_tpu.core.camera import default_camera
    from webdgs_tpu.core.scene import scene_from_arrays
    from webdgs_tpu.ops.adam import init_adam_state
    from webdgs_tpu.render.renderer import render
    from webdgs_tpu.train.step import train_step

    enable_compilation_cache()
    wanted = sys.argv[1:] or DEFAULT_OPS

    n = 100_000
    w, h = 800, 600
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
    target = jax.jit(lambda sc: render(sc, cam, w, h,
        settings).image)(scene)
    opt = init_adam_state(scene.params())

    @functools.partial(jax.jit, donate_argnums=(0, 1))
    def step(s, o):
        return train_step(s, o, cam, target, img_w=w, img_h=h,
                          settings=settings,
                          entry_capacity=int(os.environ.get(
                              "WEBDGS_HLO_CAP", "786432")))

    txt = step.lower(scene, opt).compile().as_text()
    out = os.environ.get("WEBDGS_HLO_OUT")
    if out:
        with open(out, "w") as f:
            f.write(txt)
        print(f"full HLO -> {out} ({len(txt)} bytes)")

    meta_re = re.compile(r'metadata=\{([^}]*)\}')
    for line in txt.splitlines():
        ls = line.strip()
        if not any(w in ls for w in wanted):
            continue
        m = meta_re.search(ls)
        meta = m.group(1) if m else "(no metadata)"
        head = ls.split(" metadata=")[0]
        print(f"{head[:160]}\n    {meta[:300]}\n")


if __name__ == "__main__":
    main()
