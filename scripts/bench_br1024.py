from simple_raytracer_tpu.engine import Renderer, RenderOptions
from simple_raytracer_tpu.models.presets import config4_mesh_glass
import simple_raytracer_tpu.ops.pallas.cluster_kernel as ck

W, H = 1920, 1080
for br, ksize in [(512, 1024), (1024, 512), (2048, 256)]:
    orig = ck.intersect_triangles_clustered
    def patched(o, d, a, aabb, table, block_r=512, interpret=False, _br=br):
        return orig(o, d, a, aabb, table, block_r=_br, interpret=interpret)
    ck.intersect_triangles_clustered = patched
    try:
        from simple_raytracer_tpu.models.scene import Scene
        Scene.cluster_size = ksize
        scene, cam, _ = config4_mesh_glass()
        opts = RenderOptions(width=W, height=H, num_samples=1, num_bounces=4,
                             tri_backend="clustered")
        import simple_raytracer_tpu.ops.trace as tr
        tr.make_render_step.cache_clear()
        r = Renderer(opts, scene=scene)
        st = r.benchmark_step(cam, iters=8, warmup=2)
        print(f"br={br} K={ksize}: {st['seconds_per_step']*1e3:7.1f} ms "
              f"{st['mrays_per_second']:5.1f} Mrays/s", flush=True)
    except Exception as e:
        print(f"br={br} K={ksize}: FAILED {type(e).__name__}", flush=True)
    finally:
        ck.intersect_triangles_clustered = orig
        Scene.cluster_size = 1024
