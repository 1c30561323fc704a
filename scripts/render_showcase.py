"""Render the three showcase reconstructions converged on the TPU
(960x540, 2 spp, 10 bounces, 1000 steps) into showcase/."""
import sys
import time

sys.path.insert(0, "/root/repo")

from simple_raytracer_tpu.engine import Renderer
from simple_raytracer_tpu.io.image import save_png
from simple_raytracer_tpu.models.showcase import SHOWCASES


def main():
    steps = int(sys.argv[1]) if len(sys.argv) > 1 else 1000
    for name, builder in SHOWCASES.items():
        scene, camera, options = builder()
        r = Renderer(options, scene=scene)
        t0 = time.time()
        for t in range(1, steps + 1):
            r.step(camera, time=t)
        img = r.image()
        out = f"showcase/{name}.png"
        save_png(out, img)
        print(f"{name}: {steps} steps in {time.time()-t0:.0f}s -> {out}")


if __name__ == "__main__":
    main()
